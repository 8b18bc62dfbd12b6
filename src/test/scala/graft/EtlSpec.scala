package graft

import org.apache.spark.sql.types.LongType
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.{Cleanse, ColumnSpec, TableSpec}

class EtlSpec extends AnyFunSuite {
  import TestSpark._

  test("TableSpec resolves aliases in declaration order and skips absent specs") {
    import spark.implicits._
    val df = Seq((1L, "a")).toDF("P001001", "name")
    val spec = TableSpec(
      Seq(
        // canonical spelling absent; second alias present
        ColumnSpec("P1_001N", "total_pop", Some(LongType), aliases = Seq("P0010001", "P001001")),
        ColumnSpec("name", "label"),
        ColumnSpec("missing_everywhere", "skipped", aliases = Seq("also_missing"))
      )
    )
    val out = spec(df)
    assert(out.columns.toSeq == Seq("total_pop", "label"))
    assert(out.head.getLong(0) == 1L)
  }

  test("Templates renders all fields per binding and rejects unbound variables") {
    import graft.etl.Templates
    val tpl = Seq(ColumnSpec("${p}_x", "x_${v}", aliases = Seq("${p}_x_old")))
    val spec = Templates.renderSpec(tpl, Map("p" -> "a", "v" -> "2010"))
    assert(spec.columns.head == ColumnSpec("a_x", "x_2010", aliases = Seq("a_x_old")))
    intercept[RuntimeException](Templates.render("${missing}", Map.empty))
    // replacement values containing '$' must come through literally
    assert(Templates.render("${p}_y", Map("p" -> "a$b")) == "a$b_y")
  }

  test("replaceInStringColumns treats regex metacharacters literally on both sides") {
    import spark.implicits._
    val df = Seq(("a/b", 1)).toDF("s", "n")
    // '$1 \\ x' would throw or corrupt as a raw regex replacement
    val out = Cleanse.replaceInStringColumns(df, "/", "$1 \\ x")
    assert(out.head.getString(0) == "a$1 \\ xb")
  }
}
