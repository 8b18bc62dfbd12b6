package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.functions.call_function

/** Registry glue for graft's native expressions.
  *
  * Production path: `spark.sql.extensions=graft.functions.GraftExtensions`
  * (or `builder.withExtensions(new GraftExtensions)`) — the standard
  * SparkSessionExtensions hook, so `graft_dot` is available to
  * `spark.sql(...)` as well as the DataFrame API. For sessions built
  * without the extension (tests, the driver's plain sessions),
  * [[GraftFunctions.ensureRegistered]] is an idempotent runtime
  * registration into the session's FunctionRegistry.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftFunctions.dotDescriptor)
    // rewrite interpreted aggregate(zip_with(..)) dot products into the
    // native codegen'd expression (bit-exact; see RewriteDotProduct)
    ext.injectOptimizerRule(_ => new graft.plans.RewriteDotProduct)
  }
}

object GraftFunctions {

  val dotDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_dot"),
    new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
    (children: Seq[Expression]) => DotProduct(children.head, children(1))
  )

  /** Idempotently register graft's functions in an existing session. */
  def ensureRegistered(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    if (!registry.functionExists(dotDescriptor._1)) {
      registry.registerFunction(dotDescriptor._1, dotDescriptor._2, dotDescriptor._3)
    }
  }

  /** Column-API entry point; requires the function registered in the
    * resolving session (extension or ensureRegistered).
    */
  def dot(a: Column, b: Column): Column = call_function("graft_dot", a, b)
}
