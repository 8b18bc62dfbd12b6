package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.etl._
import graft.sources.Tables

/** §2.A — relational / ETL core. Each entry mirrors a concrete
  * reference behavior (cited per query); oracle SQL lives alongside.
  *
  * Scale notes: dims (nation/region/override maps) are broadcast; all
  * aggregations are plain groupBys of codegen'd builtins (map-side
  * partial agg); anti/semi joins shuffle once on the key. No driver
  * loops, no UDFs.
  */
object RelationalQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // q02: dim mapping join (pl_localities.py:228 fips→name maps).
    "q02_join_broadcast" -> { (s, dir) =>
      val c = Tables.customer(s, dir)
      val n = Tables.nation(s, dir)
      val r = Tables.region(s, dir)
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(
          count(lit(1)).as("n_customers"),
          round(sum(col("c_acctbal")), 2).as("total_acctbal")
        )
    },

    // q03: config-driven projection + filter; both reach the parquet
    // scan (PushedFilters/ReadSchema) — the 100 TB version reads only
    // 4 of 11 columns and skips row groups by shipdate stats.
    "q03_filter_project" -> { (s, dir) =>
      Tables
        .lineitem(s, dir)
        .filter(
          col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
            col("l_quantity") > 45
        )
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_shipdate")
    },

    // q04: whole-row exact dedup (pl_geo.py:114 drop_duplicates).
    "q04_dedup_exact" -> { (s, dir) =>
      Cleanse.dropExactDuplicates(Tables.documents(s, dir).select("lang", "source"))
    },

    // q05: set-difference via LEFT ANTI join (pl_localities.py:147
    // legacy counties = 2010 keys minus 2020 keys). Right side filtered
    // (customers with no high-value order) so the difference is
    // non-degenerate at every SF.
    "q05_anti_join" -> { (s, dir) =>
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir).filter(col("o_totalprice") > 450000)
      c.join(o.select("o_custkey"), c("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
    },

    // q06: cross-vintage reconciliation (pl_localities.py:146-157):
    // current rows + legacy rows whose key vanished, tagged by vintage.
    "q06_union_reconcile" -> { (s, dir) =>
      val o = Tables.orders(s, dir).select("o_orderkey", "o_custkey", "o_orderdate")
      val cutoff = lit("1998-01-01").cast("timestamp")
      val current = o.filter(col("o_orderdate") >= cutoff).select("o_orderkey", "o_custkey")
      val legacy = o.filter(col("o_orderdate") < cutoff).select("o_orderkey", "o_custkey")
      Reconcile.crossVintageUnion(current, legacy, "o_custkey", "2020", "2010")
    },

    // q07: string cleansing + derived id (pl_geo.py:103-107 '/'→'--';
    // pl_pop_tables.py:161-170 concat id + level prefix; __init__.py:59
    // pathify).
    "q07_derived_id" -> { (s, dir) =>
      val c = Cleanse.replaceInStringColumns(Tables.customer(s, dir), "/", "--")
      c.select(
        col("c_custkey"),
        Identifiers
          .qualifiedId(concat(col("c_custkey"), lit("-"), lower(col("c_mktsegment"))), lit("cust"))
          .as("qual_id"),
        Identifiers.pathify(col("c_name")).as("path")
      )
    },

    // q08: group → ordered member list (pl_geo.py:118 geos_by_county).
    // collect_list is bounded per group (county-sized), CSV-encoded so
    // the oracle hash is representation-stable.
    "q08_group_collect" -> { (s, dir) =>
      Tables
        .orders(s, dir)
        .groupBy(col("o_custkey"))
        .agg(
          concat_ws(",", sort_array(collect_list(col("o_orderkey")))).as("orderkeys_csv"),
          count(lit(1)).as("n_orders")
        )
    },

    // q09: conditional categorization (pl_geo.py:132 trust/reservation
    // suffix classes) as a when/otherwise chain.
    "q09_conditional_class" -> { (s, dir) =>
      Tables
        .events(s, dir)
        .withColumn(
          "kind",
          when(col("event_type") === "purchase", "revenue")
            .when(col("event_type") === "signup", "growth")
            .otherwise("engagement")
        )
        .groupBy(col("kind"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
    },

    // q10: collision merge (pl_geo.py:149-190): one hash aggregate
    // replaces the reference's driver-side dict loop.
    "q10_collision_merge" -> { (s, dir) =>
      CollisionMerge
        .merge(
          Tables.lineitem(s, dir),
          key = "l_orderkey",
          measures = Seq("l_quantity", "l_extendedprice"),
          carried = Seq("l_linestatus"),
          classCol = Some("l_returnflag")
        )
        .withColumn("l_extendedprice", round(col("l_extendedprice"), 2))
    },

    // q11: wide→long melt (db.py:71-147 load_column_values) — narrow
    // explode, no shuffle.
    "q11_melt" -> { (s, dir) =>
      Reshape.melt(
        Tables.lineitem(s, dir),
        idCols = Seq("l_orderkey", "l_linenumber"),
        valueCols = Seq("l_quantity", "l_discount", "l_tax"),
        nameCol = "measure",
        valueCol = "value"
      )
    },

    // q12: long→wide pivot (inverse of q11; client-facing wide view).
    // Pivot values are explicit, so no extra distinct-discovery scan.
    "q12_pivot" -> { (s, dir) =>
      val kinds = Seq("click", "error", "purchase", "signup", "view")
      val wide = Reshape.pivot(
        Tables.events(s, dir).select("user_id", "event_type", "value"),
        idCols = Seq("user_id"),
        nameCol = "event_type",
        valueCol = "value",
        names = kinds
      )
      wide.select(col("user_id") +: kinds.map(k => round(col(k), 2).as(k)): _*)
    },

    // q13: SCD2 versioned upsert (db.py:123-147 deprecate+insert).
    "q13_scd2_upsert" -> { (s, dir) =>
      val o = Tables.orders(s, dir)
      val ts0 = to_timestamp(lit("2024-01-01 00:00:00"))
      val ts1 = to_timestamp(lit("2024-06-01 00:00:00"))
      val history = o
        .select(col("o_orderkey"), col("o_orderstatus"))
        .withColumn("valid_from", ts0)
        .withColumn("valid_to", lit(null).cast("timestamp"))
      val incoming =
        o.filter(col("o_totalprice") > 400000).select(col("o_orderkey"), lit("U").as("o_orderstatus"))
      Versioned.upsert(history, incoming, Seq("o_orderkey"), ts1)
    },

    // q14: latest version per key (GeoSetVersion "current" lookup) via
    // row_number window with deterministic tiebreak.
    "q14_window_latest" -> { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      Tables
        .orders(s, dir)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(
          col("o_custkey"),
          col("o_orderkey").as("latest_orderkey"),
          col("o_orderdate").as("latest_orderdate")
        )
    },

    // q15: modal value per group (pl_localities.py:86-92 modal UTM
    // zone) — count + rank, never a driver-side Counter.
    "q15_modal_agg" -> { (s, dir) =>
      val counts = Tables
        .events(s, dir)
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("n").desc, col("event_type").asc)
      counts
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_type").as("modal_event_type"), col("n"))
    },

    // q16: global sort + top-k (pl_localities.py:233 sort_values).
    // TakeOrderedAndProject: no full sort materialization at scale.
    "q16_sort_topk" -> { (s, dir) =>
      Tables
        .orders(s, dir)
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    },

    // q17: star join — the full pipeline shape; facts shuffle on join
    // keys, dims broadcast. Flagship.
    "q17_star_join" -> { (s, dir) =>
      val li = Tables.lineitem(s, dir)
      val o = Tables.orders(s, dir)
      val c = Tables.customer(s, dir)
      val n = Tables.nation(s, dir)
      val r = Tables.region(s, dir)
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"), year(col("o_orderdate")).cast(LongType).as("order_year"))
        .agg(
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"),
          count(lit(1)).as("n_items")
        )
    },

    // q18: hierarchical spine rollup (state→county aggregation shape).
    "q18_rollup" -> { (s, dir) =>
      val c = Tables.customer(s, dir)
      val n = Tables.nation(s, dir)
      val r = Tables.region(s, dir)
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_customers"), round(sum(col("c_acctbal")), 2).as("total_acctbal"))
    },

    // q19: presence check via LEFT SEMI join (pl_pop_tables.py:194-198
    // "geographies must already exist").
    "q19_semi_join" -> { (s, dir) =>
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir)
      c.join(o.select("o_custkey"), c("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_mktsegment")
    },

    // q20: config-driven rename/cast (TabularConfig, __init__.py:64-93;
    // pl_pop_tables.py:172-179 lowercase rename + typed cast). The
    // brand spec's canonical spelling is a newer-vintage name absent
    // from this source, so resolution falls through to the alias —
    // the P1_001N ↔ P001001 case of pl_pop_table_columns.py:90-116.
    "q20_alias_normalize" -> { (s, dir) =>
      val spec = TableSpec(
        Seq(
          ColumnSpec("p_partkey", "part_id", Some(LongType), aliases = Seq("partkey", "p_pk")),
          ColumnSpec("brand_v2020", "brand", aliases = Seq("p_brandname", "p_brand")),
          ColumnSpec("p_type", "type_name"),
          ColumnSpec("p_size", "size_d", Some(DoubleType)),
          ColumnSpec("p_retailprice", "retail_price"),
          ColumnSpec("not_present", "skipped") // reference skips absent sources
        )
      )
      spec(Tables.part(s, dir))
    },

    // q21: lookup-with-override map (pl_localities.py:39-77,252-261) —
    // literal override table broadcast, coalesce with derived default.
    "q21_path_overrides" -> { (s, dir) =>
      import s.implicits._
      val overrides = Seq(
        ("UNITED STATES", "north-america/usa"),
        ("UNITED KINGDOM", "europe/uk"),
        ("CHINA", "asia/prc")
      ).toDF("n_name", "override_path")
      Tables
        .nation(s, dir)
        .join(broadcast(overrides), Seq("n_name"), "left")
        .select(
          col("n_nationkey"),
          col("n_name"),
          coalesce(col("override_path"), Identifiers.pathify(col("n_name"))).as("canonical_path")
        )
    },

    // q22: templated name/path construction (pl_localities.py:230-232
    // full_name = NAMELSAD + ", " + state_name; __init__.py pathify).
    "q22_string_template" -> { (s, dir) =>
      val c = Tables.customer(s, dir)
      val n = Tables.nation(s, dir)
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .select(
          col("c_custkey"),
          concat(col("c_name"), lit(", "), col("n_name")).as("full_name"),
          concat(Identifiers.pathify(col("n_name")), lit("/"), Identifiers.pathify(col("c_name")))
            .as("canonical_path")
        )
    },

    // q51: templated column-set creation (templated_columns.py:27-58) —
    // ONE spec template rendered per vintage binding, then applied as a
    // config-driven projection. The rendered source falls back through
    // aliases like q20, so the same template serves vintages that ship
    // different spellings.
    "q51_templated_columns" -> { (s, dir) =>
      val template = Seq(
        ColumnSpec("${prefix}_partkey", "part_id", Some(LongType)),
        ColumnSpec("${prefix}_brand", "brand_${vintage}"),
        ColumnSpec("${prefix}_type", "type_${vintage}"),
        ColumnSpec("${prefix}_size", "size_${vintage}", Some(DoubleType))
      )
      val spec = Templates.renderSpec(template, Map("prefix" -> "p", "vintage" -> "2020"))
      spec(Tables.part(s, dir))
    },

    // q86: programmatic Census column aliasing + longform label
    // parsing (CensusAliases — reference pl_pop_table_columns.py
    // column_aliases/parse_labels). The variables frame is synthesized
    // deterministically from `part` so both engines derive identical
    // inputs: names cycle through the three Census formats, labels
    // through the longform shapes (bare Total, "alone" races,
    // multi-race "; " lists, the 2010 comma-bug spelling, Hispanic /
    // Not-Hispanic lineages), predicate types exercise the keep
    // filter. Everything downstream of the scan is one Column tree —
    // no shuffle, no UDF — so raw variable metadata of any size
    // normalizes at scan speed.
    "q86_census_aliases" -> { (s, dir) =>
      val pk = col("p_partkey")
      val t = (pk % 4 + 1).cast("string")
      val c = lpad((pk % 73 + 1).cast("string"), 3, "0")
      val name = when(pk % 3 === 0, concat(lit("P"), t, lit("_"), c, lit("N")))
        .when(pk % 3 === 1, concat(lit("P00"), t, c))
        .otherwise(concat(lit("P00"), t, lit("0"), c))
      val lv = pk % 8
      val label = when(lv === 0, lit("Total"))
        .when(lv === 1, lit("Total:!!Population of one race:!!White alone"))
        .when(lv === 2, lit("Total:!!Population of one race:!!Black or African American alone"))
        .when(lv === 3, lit("Total:!!Population of two or more races:!!Population of two races:!!White; Black or African American"))
        .when(lv === 4, lit("Total:!!Population of two or more races:!!Population of two races:!!Black or African American, Some Other Race"))
        .when(lv === 5, lit("Total:!!Hispanic or Latino"))
        .when(lv === 6, lit("Total:!!Not Hispanic or Latino:!!Population of one race:!!American Indian and Alaska Native alone"))
        .otherwise(lit("Total:!!Not Hispanic or Latino:!!Population of one race:!!Native Hawaiian and Other Pacific Islander alone"))
      val ptype = when(pk % 11 === 0, lit("string")).otherwise(lit("int"))
      Tables
        .part(s, dir)
        .select(name.as("var_name"), label.as("label"), ptype.as("predicate_type"))
        .filter(CensusAliases.keepVariable(col("label"), col("predicate_type")))
        .select(
          col("var_name"),
          CensusAliases.canonicalName(col("var_name")).as("canonical_name"),
          CensusAliases.alias2020(col("var_name")).as("alias_2020"),
          CensusAliases.alias2010Six(col("var_name")).as("alias_2010_6"),
          CensusAliases.alias2010Seven(col("var_name")).as("alias_2010_7"),
          CensusAliases.cleanLabel(col("label")).as("label_clean"),
          CensusAliases.shortName(col("label")).as("short_name"),
          CensusAliases.hispanicFlag(col("label")).as("hispanic")
        )
    }
  )

  private def pathifySql(c: String): String =
    s"replace(replace(lower(trim($c)), ' ', '-'), '.', '')"

  def oracle: Map[String, String] = Map(
    "q02_join_broadcast" ->
      """SELECT r_name, n_name, count(*) AS n_customers, round(sum(c_acctbal), 2) AS total_acctbal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name""".stripMargin,
    "q03_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_shipdate FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_quantity > 45""".stripMargin,
    "q04_dedup_exact" -> "SELECT DISTINCT lang, source FROM documents",
    "q05_anti_join" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 450000)""".stripMargin,
    "q06_union_reconcile" ->
      """SELECT o_orderkey, o_custkey, '2020' AS vintage FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
        |UNION ALL
        |SELECT l.o_orderkey, l.o_custkey, '2010' AS vintage FROM orders l
        |WHERE l.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND NOT EXISTS (SELECT 1 FROM orders c
        |                  WHERE c.o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
        |                    AND c.o_custkey = l.o_custkey)""".stripMargin,
    "q07_derived_id" ->
      s"""SELECT c_custkey,
         |       concat('cust', ':', c_custkey, '-', lower(c_mktsegment)) AS qual_id,
         |       ${pathifySql("c_name")} AS path
         |FROM customer""".stripMargin,
    "q08_group_collect" ->
      """SELECT o_custkey,
        |       string_agg(CAST(o_orderkey AS VARCHAR), ',' ORDER BY o_orderkey) AS orderkeys_csv,
        |       count(*) AS n_orders
        |FROM orders GROUP BY o_custkey""".stripMargin,
    "q09_conditional_class" ->
      """SELECT CASE WHEN event_type = 'purchase' THEN 'revenue'
        |            WHEN event_type = 'signup' THEN 'growth'
        |            ELSE 'engagement' END AS kind,
        |       count(*) AS n, round(sum(value), 2) AS total_value
        |FROM events GROUP BY 1""".stripMargin,
    "q10_collision_merge" ->
      """SELECT l_orderkey,
        |       sum(l_quantity) AS l_quantity,
        |       round(sum(l_extendedprice), 2) AS l_extendedprice,
        |       min(l_linestatus) AS l_linestatus,
        |       CASE WHEN count(*) > 1 THEN 'union' ELSE min(l_returnflag) END AS l_returnflag,
        |       count(*) - 1 AS collision_count
        |FROM lineitem GROUP BY l_orderkey""".stripMargin,
    "q11_melt" ->
      """SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure, CAST(l_quantity AS DOUBLE) AS value FROM lineitem
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'l_discount', CAST(l_discount AS DOUBLE) FROM lineitem
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'l_tax', CAST(l_tax AS DOUBLE) FROM lineitem""".stripMargin,
    "q12_pivot" ->
      """SELECT user_id,
        |       round(sum(CASE WHEN event_type = 'click' THEN value END), 2) AS click,
        |       round(sum(CASE WHEN event_type = 'error' THEN value END), 2) AS error,
        |       round(sum(CASE WHEN event_type = 'purchase' THEN value END), 2) AS purchase,
        |       round(sum(CASE WHEN event_type = 'signup' THEN value END), 2) AS signup,
        |       round(sum(CASE WHEN event_type = 'view' THEN value END), 2) AS view
        |FROM events GROUP BY user_id""".stripMargin,
    "q13_scd2_upsert" ->
      """SELECT o_orderkey, o_orderstatus,
        |       TIMESTAMP '2024-01-01 00:00:00' AS valid_from,
        |       CASE WHEN o_totalprice > 400000 THEN TIMESTAMP '2024-06-01 00:00:00' END AS valid_to
        |FROM orders
        |UNION ALL
        |SELECT o_orderkey, 'U' AS o_orderstatus,
        |       TIMESTAMP '2024-06-01 00:00:00' AS valid_from,
        |       CAST(NULL AS TIMESTAMP) AS valid_to
        |FROM orders WHERE o_totalprice > 400000""".stripMargin,
    "q14_window_latest" ->
      """SELECT o_custkey, latest_orderkey, latest_orderdate FROM (
        |  SELECT o_custkey, o_orderkey AS latest_orderkey, o_orderdate AS latest_orderdate,
        |         row_number() OVER (PARTITION BY o_custkey
        |                            ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |  FROM orders) WHERE rn = 1""".stripMargin,
    "q15_modal_agg" ->
      """SELECT user_id, modal_event_type, n FROM (
        |  SELECT user_id, event_type AS modal_event_type, count(*) AS n,
        |         row_number() OVER (PARTITION BY user_id
        |                            ORDER BY count(*) DESC, event_type ASC) AS rn
        |  FROM events GROUP BY user_id, event_type) WHERE rn = 1""".stripMargin,
    "q16_sort_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin,
    "q17_star_join" ->
      """SELECT r_name, n_name, year(o_orderdate) AS order_year,
        |       round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
        |       count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name, year(o_orderdate)""".stripMargin,
    "q18_rollup" ->
      """SELECT r_name, n_name, count(*) AS n_customers, round(sum(c_acctbal), 2) AS total_acctbal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)""".stripMargin,
    "q19_semi_join" ->
      """SELECT c_custkey, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,
    "q20_alias_normalize" ->
      """SELECT p_partkey AS part_id, p_brand AS brand, p_type AS type_name,
        |       CAST(p_size AS DOUBLE) AS size_d, p_retailprice AS retail_price
        |FROM part""".stripMargin,
    "q21_path_overrides" ->
      s"""SELECT n_nationkey, n_name,
         |       coalesce(o.override_path, ${pathifySql("n_name")}) AS canonical_path
         |FROM nation
         |LEFT JOIN (VALUES ('UNITED STATES', 'north-america/usa'),
         |                  ('UNITED KINGDOM', 'europe/uk'),
         |                  ('CHINA', 'asia/prc')) AS o(n_name, override_path)
         |  USING (n_name)""".stripMargin,
    "q22_string_template" ->
      s"""SELECT c_custkey,
         |       concat(c_name, ', ', n_name) AS full_name,
         |       concat(${pathifySql("n_name")}, '/', ${pathifySql("c_name")}) AS canonical_path
         |FROM customer JOIN nation ON c_nationkey = n_nationkey""".stripMargin,
    "q51_templated_columns" ->
      """SELECT CAST(p_partkey AS BIGINT) AS part_id, p_brand AS brand_2020,
        |       p_type AS type_2020, CAST(p_size AS DOUBLE) AS size_2020
        |FROM part""".stripMargin,
    "q86_census_aliases" -> q86Sql
  )

  /** q86 oracle: the DuckDB twin of CensusAliases, with the COL_LABELS
    * map and the redundant-column table rendered from the SAME Scala
    * constants, so the mapping under test cannot silently diverge
    * between engines.
    */
  private lazy val q86Sql: String = {
    val partCase = CensusAliases.ColLabels
      .map { case (k, v) => s"WHEN '$k' THEN '$v'" }
      .mkString(" ")
    val canonCase = CensusAliases.RedundantToCanonical
      .map { case (k, v) => s"WHEN '$k' THEN '$v'" }
      .mkString(" ")
    s"""WITH base AS (
       |  SELECT p_partkey AS pk,
       |         CAST(p_partkey % 4 + 1 AS VARCHAR) AS t,
       |         lpad(CAST(p_partkey % 73 + 1 AS VARCHAR), 3, '0') AS c
       |  FROM part),
       |v AS (
       |  SELECT CASE WHEN pk % 3 = 0 THEN 'P' || t || '_' || c || 'N'
       |              WHEN pk % 3 = 1 THEN 'P00' || t || c
       |              ELSE 'P00' || t || '0' || c END AS var_name,
       |         CASE pk % 8
       |           WHEN 0 THEN 'Total'
       |           WHEN 1 THEN 'Total:!!Population of one race:!!White alone'
       |           WHEN 2 THEN 'Total:!!Population of one race:!!Black or African American alone'
       |           WHEN 3 THEN 'Total:!!Population of two or more races:!!Population of two races:!!White; Black or African American'
       |           WHEN 4 THEN 'Total:!!Population of two or more races:!!Population of two races:!!Black or African American, Some Other Race'
       |           WHEN 5 THEN 'Total:!!Hispanic or Latino'
       |           WHEN 6 THEN 'Total:!!Not Hispanic or Latino:!!Population of one race:!!American Indian and Alaska Native alone'
       |           ELSE 'Total:!!Not Hispanic or Latino:!!Population of one race:!!Native Hawaiian and Other Pacific Islander alone'
       |         END AS label,
       |         CASE WHEN pk % 11 = 0 THEN 'string' ELSE 'int' END AS predicate_type
       |  FROM base),
       |k AS (SELECT * FROM v WHERE label = 'Total' OR predicate_type = 'int'),
       |f AS (
       |  SELECT var_name, label,
       |         CASE WHEN regexp_matches(var_name, '^P[0-9]_[0-9]{3}N$$') THEN substr(var_name, 2, 1)
       |              WHEN regexp_matches(var_name, '^P00[0-9]{4}$$') THEN substr(var_name, 4, 1)
       |              WHEN regexp_matches(var_name, '^P00[0-9]0[0-9]{3}$$') THEN substr(var_name, 4, 1) END AS t,
       |         CASE WHEN regexp_matches(var_name, '^P[0-9]_[0-9]{3}N$$') THEN substr(var_name, 4, 3)
       |              WHEN regexp_matches(var_name, '^P00[0-9]{4}$$') THEN substr(var_name, 5, 3)
       |              WHEN regexp_matches(var_name, '^P00[0-9]0[0-9]{3}$$') THEN substr(var_name, 6, 3) END AS cc
       |  FROM k),
       |lab AS (
       |  SELECT var_name, t, cc, label,
       |         replace(trim(replace(string_split(replace(label, ':', ''), '!!')[-1], 'alone', '')),
       |                 ', Some Other Race', '; Some Other Race') AS label_clean
       |  FROM f)
       |SELECT var_name,
       |       CASE var_name $canonCase ELSE var_name END AS canonical_name,
       |       'P' || t || '_' || cc || 'N' AS alias_2020,
       |       'P00' || t || cc AS alias_2010_6,
       |       'P00' || t || '0' || cc AS alias_2010_7,
       |       label_clean,
       |       array_to_string(list_transform(string_split(label_clean, '; '),
       |                                      p -> CASE p $partCase ELSE p END), '_') AS short_name,
       |       CASE WHEN label LIKE '%Hispanic or Latino%'
       |            THEN CASE WHEN label LIKE '%Not Hispanic or Latino%' THEN 0 ELSE 1 END
       |       END AS hispanic
       |FROM lab""".stripMargin
  }
}
