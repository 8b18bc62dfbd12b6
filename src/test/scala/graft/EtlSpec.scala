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

  test("replaceInStringColumns treats regex metacharacters literally on both sides") {
    import spark.implicits._
    val df = Seq(("a/b", 1)).toDF("s", "n")
    // '$1 \\ x' would throw or corrupt as a raw regex replacement
    val out = Cleanse.replaceInStringColumns(df, "/", "$1 \\ x")
    assert(out.head.getString(0) == "a$1 \\ xb")
  }
}
