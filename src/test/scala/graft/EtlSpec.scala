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

  test("CensusAliases derives the three name formats and feeds TableSpec resolution") {
    import spark.implicits._
    import graft.etl.CensusAliases
    import org.apache.spark.sql.functions.col
    // derivation round-trips between formats exactly as the reference
    val derived = Seq("P1_001N", "P001001", "P0010001", "P3_042N", "not_a_census_name")
      .toDF("name")
      .select(
        col("name"),
        CensusAliases.alias2020(col("name")).as("a20"),
        CensusAliases.alias2010Six(col("name")).as("a6"),
        CensusAliases.alias2010Seven(col("name")).as("a7"),
        CensusAliases.canonicalName(col("name")).as("canon")
      )
      .collect()
      .map(r => r.getString(0) -> r)
      .toMap
    for (n <- Seq("P1_001N", "P001001", "P0010001")) {
      assert(derived(n).getString(1) == "P1_001N", s"$n alias_2020")
      assert(derived(n).getString(2) == "P001001", s"$n alias_2010_6")
      assert(derived(n).getString(3) == "P0010001", s"$n alias_2010_7")
    }
    assert(derived("P3_042N").getString(2) == "P003042")
    assert(derived("not_a_census_name").isNullAt(1), "unrecognized format must derive null aliases")
    // redundant cross-table names collapse; canonical names are fixed points
    assert(derived("P1_001N").getString(4) == "P1_001N")
    val canon2 = Seq("P2_001N").toDF("n").select(CensusAliases.canonicalName(col("n"))).head.getString(0)
    assert(canon2 == "P1_001N")
    // TableSpec fed by DERIVED aliases resolves a 2010-vintage frame:
    // the spec declares only the 2020 spelling; its aliases come from
    // the derivation, not hand-written lists
    val spellings = Seq("P1_001N").toDF("name").select(
      CensusAliases.alias2020(col("name")),
      CensusAliases.alias2010Six(col("name")),
      CensusAliases.alias2010Seven(col("name"))
    ).head
    val spec = TableSpec(Seq(
      ColumnSpec(spellings.getString(0), "total_pop", Some(LongType),
        aliases = Seq(spellings.getString(1), spellings.getString(2))),
      ColumnSpec("geoid", "geoid")
    ))
    val vintage2010 = Seq((41L, "g1")).toDF("P001001", "geoid")
    val out = spec(vintage2010)
    assert(out.columns.toSeq == Seq("total_pop", "geoid"))
    assert(out.head.getLong(0) == 41L)
    // label parsing: the comma-bug label and a Not-Hispanic lineage
    val lbl = Seq(
      "Total:!!Population of two or more races:!!Population of two races:!!Black or African American, Some Other Race",
      "Total:!!Not Hispanic or Latino:!!Population of one race:!!White alone",
      "Total"
    ).toDF("label").select(
      CensusAliases.shortName(col("label")).as("s"),
      CensusAliases.hispanicFlag(col("label")).as("h")
    ).collect()
    assert(lbl(0).getString(0) == "black_other" && lbl(0).isNullAt(1))
    assert(lbl(1).getString(0) == "white" && lbl(1).getInt(1) == 0)
    assert(lbl(2).getString(0) == "total" && lbl(2).isNullAt(1))
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
