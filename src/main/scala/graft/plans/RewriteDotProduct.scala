package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

import graft.functions.DotProduct

/** Optimizer rule: rewrite the idiomatic higher-order dot product
  *
  * {{{ aggregate(zip_with(a, b, (x, y) -> x * y), 0.0d, (acc, v) -> acc + v) }}}
  *
  * into the native [[DotProduct]] expression. The higher-order
  * formulation is what a user naturally writes (and what dotFold in
  * this codebase is), but ArrayAggregate/ZipWith are CodegenFallback —
  * interpreted, allocating a zipped array per row. The native
  * expression is a codegen'd primitive loop with IDENTICAL
  * left-to-right accumulation order, so the rewrite is bit-exact, not
  * just approximately equal.
  *
  * The match is deliberately narrow: double arrays, multiply inside
  * the zip, 0.0 seed, `acc + v` in that argument order (addition order
  * is semantically load-bearing in IEEE arithmetic), identity finish.
  * Anything else is left untouched.
  *
  * Registered via GraftExtensions.injectOptimizerRule; sessions built
  * without the extension simply keep the interpreted form.
  */
class RewriteDotProduct extends Rule[LogicalPlan] {

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  /** (x, y) -> x * y over exactly the lambda's own two arguments. */
  private def isPairwiseMultiply(f: Expression): Boolean = f match {
    case LambdaFunction(Multiply(x: NamedLambdaVariable, y: NamedLambdaVariable, _), Seq(a1: NamedLambdaVariable, a2: NamedLambdaVariable), _) =>
      x.exprId == a1.exprId && y.exprId == a2.exprId
    case _ => false
  }

  /** (acc, v) -> acc + v — argument order preserved. */
  private def isAccumulateAdd(f: Expression): Boolean = f match {
    case LambdaFunction(Add(acc: NamedLambdaVariable, v: NamedLambdaVariable, _), Seq(a1: NamedLambdaVariable, a2: NamedLambdaVariable), _) =>
      acc.exprId == a1.exprId && v.exprId == a2.exprId
    case _ => false
  }

  /** acc -> acc (ArrayAggregate's default finish). */
  private def isIdentity(f: Expression): Boolean = f match {
    case LambdaFunction(v: NamedLambdaVariable, Seq(a1: NamedLambdaVariable), _) => v.exprId == a1.exprId
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(zip: ZipWith, Literal(0.0, DoubleType), merge, finish)
        if isPairwiseMultiply(zip.function) && isAccumulateAdd(merge) && isIdentity(finish) &&
          isDoubleArray(zip.left) && isDoubleArray(zip.right) =>
      DotProduct(zip.left, zip.right)
  }
}
