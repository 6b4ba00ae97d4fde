package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.sources.Tables
import graft.operators.{AsOfJoin, DailyRollup, Dedup, Reshape, Similarity, Upsert}
import graft.functions.{Functions => F, TextFunctions => T, VectorFunctions => V}

/** The engine's query catalog: one named entry per operator family in
  * SURVEY.md §2, exercised over the harness tables (TESTDATA.md), each
  * with an ANSI-SQL oracle the driver replays in DuckDB.
  *
  * Determinism discipline (the driver hash-compares values):
  *  - every aggregate over doubles goes through a decimal cast
  *    (`decSum`), which is bit-reproducible across engines and
  *    partitionings — no float-summation-order drift;
  *  - every window/top-k has a total ordering (explicit tiebreaks);
  *  - column names are aliased identically on both sides.
  */
object Queries {

  final case class Q(
      fn: (SparkSession, String) => DataFrame,
      oracle: Option[String],
      /** include in the BENCH headline set */
      bench: Boolean = true)

  private def T_(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables.read(spark, dir, name)

  /** Bit-reproducible sum of a double column: double → decimal (no
    * representable ties ⇒ identical rounding in any engine) → exact
    * decimal sum → back to double.
    */
  private def decSum(c: Column, scale: Int = 8): Column =
    sum(c.cast(s"decimal(27,$scale)")).cast("double")

  private def decAvg(c: Column, scale: Int = 8): Column =
    (sum(c.cast(s"decimal(27,$scale)")).cast("double") / count(c)).cast("double")

  /** SQL fragment mirroring decSum. */
  private def sqlDecSum(expr: String, scale: Int = 8): String =
    s"CAST(SUM(CAST($expr AS DECIMAL(27,$scale))) AS DOUBLE)"

  private def sqlDecAvg(expr: String, scale: Int = 8): String =
    s"CAST(SUM(CAST($expr AS DECIMAL(27,$scale))) AS DOUBLE) / COUNT($expr)"

  // ===========================================================
  // S — sources / sinks / constraints (SURVEY §2.1)
  // ===========================================================

  /** S1/S2 + P-series: parameterized scan; filters and projection push
    * down to the parquet reader (PushedFilters / ReadSchema in
    * .explain — the Spark analog of the reference's parameterized
    * Postgres fetchers).
    */
  val s2_pushdown_scan = Q(
    (s, dir) => T_(s, dir, "lineitem")
      .filter(col("l_shipdate").between("1996-01-01", "1996-12-31")
        && col("l_returnflag").isin("R", "A")
        && col("l_quantity") > 45)
      .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"),
        col("l_returnflag"), col("l_shipdate")),
    Some("""SELECT l_orderkey, l_partkey, l_quantity, l_returnflag, l_shipdate
      FROM lineitem
      WHERE l_shipdate BETWEEN '1996-01-01' AND '1996-12-31'
        AND l_returnflag IN ('R','A') AND l_quantity > 45"""))

  /** S3 — upsert/dedup-by-key: keep the newest row per key
    * (MERGE parity; reference upserts row-at-a-time with Cypher MERGE,
    * graph_fields.py:14-30). Key = l_orderkey, newest = max
    * l_linenumber.
    */
  val s3_upsert_dedup = Q(
    (s, dir) => Upsert.dedupByKey(
      T_(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("l_quantity")),
      Seq("l_orderkey"),
      // total order: (orderkey, linenumber) pairs are NOT unique in the
      // data, so the "newest" pick needs a full tiebreak chain
      Seq(col("l_linenumber"), col("l_partkey"), col("l_quantity"))),
    Some("""SELECT l_orderkey, l_linenumber, l_partkey, l_quantity
      FROM (SELECT l_orderkey, l_linenumber, l_partkey, l_quantity,
              row_number() OVER (PARTITION BY l_orderkey
                ORDER BY l_linenumber DESC, l_partkey DESC, l_quantity DESC) AS rn
            FROM lineitem) WHERE rn = 1"""))

  /** S3b — keep-existing-non-null merge (FertilizerProduct semantics,
    * graph_fertilizer_product.py:211-219): incoming rows overwrite,
    * but a null incoming value preserves the existing one.
    */
  val s3_merge_keep_existing = Q(
    (s, dir) => {
      val sup = T_(s, dir, "supplier")
      val existing = sup.select(col("s_suppkey"), col("s_name"), col("s_acctbal"))
      val incoming = sup.filter(col("s_suppkey") % 2 === 0)
        .select(col("s_suppkey"), upper(col("s_name")).as("s_name"),
          lit(null).cast("double").as("s_acctbal"))
      Upsert.merge(existing, incoming, Seq("s_suppkey"))
        .orderBy("s_suppkey")
    },
    Some("""SELECT s_suppkey,
             CASE WHEN s_suppkey % 2 = 0 THEN upper(s_name) ELSE s_name END AS s_name,
             s_acctbal
      FROM supplier ORDER BY s_suppkey"""))

  /** S6 — uniqueness-constraint check as a query: duplicate key groups
    * (graph_constraints.py:2-133 re-expressed as an assertion).
    */
  val s6_constraint_dups = Q(
    (s, dir) => Upsert.duplicateKeys(
      T_(s, dir, "lineitem"), Seq("l_partkey", "l_suppkey"))
      .withColumn("n", col("n").cast("long")),
    Some("""SELECT l_partkey, l_suppkey, count(*) AS n
      FROM lineitem GROUP BY l_partkey, l_suppkey HAVING count(*) > 1"""))

  /** S6b — referential integrity: order rows whose customer is absent
    * (left-anti join; edge-endpoint existence check per SURVEY §5.4).
    */
  val s6_orphans = Q(
    (s, dir) => Upsert.orphans(
      T_(s, dir, "orders").select(col("o_orderkey"), col("o_custkey")),
      T_(s, dir, "customer"), Seq(("o_custkey", "c_custkey"))),
    Some("""SELECT o_orderkey, o_custkey FROM orders o
      WHERE NOT EXISTS (SELECT 1 FROM customer c
                        WHERE c.c_custkey IS NOT DISTINCT FROM o.o_custkey)"""))

  // ===========================================================
  // P — projections / filters (SURVEY §2.2)
  // ===========================================================

  /** P1/P2 — projection + rename (graph_fields.py:14-29 shape). */
  val p1_project_rename = Q(
    (s, dir) => T_(s, dir, "customer")
      .select(col("c_custkey").as("field_id"), col("c_name").as("name"),
        col("c_nationkey").cast("long").as("region_ref"),
        col("c_mktsegment").as("segment")),
    Some("""SELECT c_custkey AS field_id, c_name AS name,
             CAST(c_nationkey AS BIGINT) AS region_ref,
             c_mktsegment AS segment FROM customer"""))

  /** P3/P5 — null-guard + membership predicate (IN-list semi-filter,
    * graph_weather_day.py:165-186).
    */
  val p3_null_guard_isin = Q(
    (s, dir) => T_(s, dir, "events")
      .filter(col("user_id").isNotNull && col("value").isNotNull
        && col("event_type").isin("click", "view", "purchase"))
      .select(col("event_id"), col("user_id"), col("event_type"), col("value")),
    Some("""SELECT event_id, user_id, event_type, value FROM events
      WHERE user_id IS NOT NULL AND value IS NOT NULL
        AND event_type IN ('click','view','purchase')"""))

  // ===========================================================
  // J — joins (SURVEY §2.3)
  // ===========================================================

  /** J1/J2 — dim joins, broadcast: revenue per region name
    * (field×station loop → broadcast hash join chain). All three dims
    * are broadcast; the fact table never shuffles for the join, only
    * for the final 5-group aggregate.
    */
  val j1_broadcast_agg = Q(
    (s, dir) => {
      val o = T_(s, dir, "orders")
      val c = broadcast(T_(s, dir, "customer"))
      val n = broadcast(T_(s, dir, "nation"))
      val r = broadcast(T_(s, dir, "region"))
      o.join(c, o("o_custkey") === c("c_custkey"))
        .join(n, c("c_nationkey") === n("n_nationkey"))
        .join(r, n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"))
        // region totals exceed 2^53 scaled units at sf0.1, so the sum
        // must stay integer-exact — but wide DECIMAL outputs don't
        // hash portably across engines. Ship BIGINT cents: per-row
        // money → exact cents (lossless for a 2-dp column), summed as
        // 64-bit integers. Fits BIGINT to sf1000 (~2.3e16 cents) and
        // both engines agree bit-for-bit.
        .agg(sum(expr(
            "CAST(CAST(o_totalprice AS DECIMAL(27,2)) * 100 AS BIGINT)"))
          .as("revenue_cents"),
          count(lit(1)).as("n_orders"))
    },
    Some("""SELECT r_name,
             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(27,2)) * 100 AS BIGINT)) AS BIGINT) AS revenue_cents,
             count(*) AS n_orders
      FROM orders JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name"""))

  /** J4 — edge-endpoint equi-join: the (lineitem→part, lineitem→
    * supplier) "edges" with endpoint payloads (MATCH+MATCH+MERGE
    * re-expressed, §1.3).
    */
  val j4_edge_join = Q(
    (s, dir) => {
      val li = T_(s, dir, "lineitem").filter(col("l_quantity") >= 49)
      li.join(broadcast(T_(s, dir, "part")), col("l_partkey") === col("p_partkey"))
        .join(broadcast(T_(s, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
        .select(col("l_orderkey"), col("l_linenumber"), col("p_name"),
          col("s_name"), col("l_quantity"))
    },
    Some("""SELECT l_orderkey, l_linenumber, p_name, s_name, l_quantity
      FROM lineitem JOIN part ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
      WHERE l_quantity >= 49"""))

  /** J5 — nearest-timestamp (as-of) join: for each order of a user
    * with events, the event closest in time, tiebreak on event_id
    * (graph_product_application.py:179-216 semantics). The left side
    * is sampled by key modulus so the candidate set stays bounded per
    * scale factor.
    */
  val j5_asof_nearest = Q(
    (s, dir) => {
      val o = T_(s, dir, "orders")
        .filter(col("o_orderkey") % 20 === 0)
        .select(col("o_orderkey"), col("o_custkey").as("user_id"), col("o_orderdate"))
      val e = T_(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("ts"))
      AsOfJoin.nearest(o, e, Seq("user_id"), "o_orderdate", "ts",
        tiebreak = Seq("event_id"))
        .select(col("o_orderkey"), col("user_id"), col("event_id"))
    },
    Some("""SELECT o_orderkey, user_id, event_id
      FROM (SELECT o.o_orderkey, o.o_custkey AS user_id, e.event_id,
              row_number() OVER (PARTITION BY o.o_orderkey
                ORDER BY abs(floor(epoch(o.o_orderdate)) - floor(epoch(e.ts))) ASC NULLS LAST,
                         e.event_id ASC) AS rn
            FROM orders o LEFT JOIN events e ON e.user_id = o.o_custkey
            WHERE o.o_orderkey % 20 = 0)
      WHERE rn = 1"""))

  /** J6 — existence guard: customers having orders (left-semi). */
  val j6_semi = Q(
    (s, dir) => T_(s, dir, "customer")
      .join(T_(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name")),
    Some("""SELECT c_custkey, c_name FROM customer
      WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)"""))

  /** J6b — anti: customers with no orders. */
  val j6_anti = Q(
    (s, dir) => T_(s, dir, "customer")
      .join(T_(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name")),
    Some("""SELECT c_custkey, c_name FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)"""))

  /** J7 — lookup-enrichment: lineitems enriched from the part master
    * by FK, null-tolerant (nutrients-from-product-master semantics,
    * graph_app_nutrient_content.py:306-349).
    */
  val j7_enrichment = Q(
    (s, dir) => {
      val li = T_(s, dir, "lineitem").filter(col("l_linenumber") === 7)
        .select(col("l_orderkey"), col("l_partkey"), col("l_extendedprice"))
      li.join(broadcast(T_(s, dir, "part").select(col("p_partkey"),
        col("p_brand"), col("p_retailprice"))),
        col("l_partkey") === col("p_partkey"), "left")
        .select(col("l_orderkey"), col("l_partkey"),
          coalesce(col("p_brand"), lit("unknown")).as("brand"),
          (col("l_extendedprice").cast("decimal(27,8)") -
            col("p_retailprice").cast("decimal(27,8)")).cast("double").as("premium"))
    },
    Some("""SELECT l_orderkey, l_partkey,
             coalesce(p_brand, 'unknown') AS brand,
             CAST(CAST(l_extendedprice AS DECIMAL(27,8)) -
                  CAST(p_retailprice AS DECIMAL(27,8)) AS DOUBLE) AS premium
      FROM lineitem LEFT JOIN part ON l_partkey = p_partkey
      WHERE l_linenumber = 7"""))

  // ===========================================================
  // A — aggregations (SURVEY §2.4)
  // ===========================================================

  /** A1 — hourly→daily roll-up, weather flavor
    * (graph_weather_day.py:69-117): per (event_type, day) the 5-stat
    * family. One hash aggregate, partial+final.
    */
  val a1_daily_rollup = Q(
    (s, dir) => T_(s, dir, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("date"))
      .agg(decAvg(col("value")).as("data"),
        min(col("value")).as("min"), max(col("value")).as("max"),
        decAvg(col("value")).as("avg"),
        decSum(col("value")).as("sum"))
      // unit == the group key here; aggregating a string (min/first)
      // would force SortAggregate — var-length aggregation buffers
      // are not hash-aggregatable
      .withColumn("unit", col("event_type")),
    Some("""SELECT event_type, CAST(ts AS DATE) AS date,
             """ + sqlDecAvg("value") + """ AS data,
             MIN(value) AS min, MAX(value) AS max,
             """ + sqlDecAvg("value") + """ AS avg,
             """ + sqlDecSum("value") + """ AS sum,
             event_type AS unit
      FROM events GROUP BY event_type, CAST(ts AS DATE)"""))

  /** A2 — sentinel-flavor roll-up with the sum-0→null quirk
    * (§1.6.3; graph_irrigation_day.py:116) over the integer `k`
    * extracted from the JSON props column (R6).
    */
  val a2_sentinel_rollup = Q(
    (s, dir) => {
      val e = T_(s, dir, "events")
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      DailyRollup.sentinel(e, col("ts"), Seq(col("user_id")),
        vmin = col("k"), vmax = col("k"), vavg = col("k"), vsum = col("k"),
        unit = col("event_type"), zeroSumToNull = true)
        .select(col("user_id"), col("date"), col("min"), col("max"),
          col("avg"), col("sum"))
        .withColumn("avg", col("avg").cast("double"))
    },
    Some("""SELECT user_id, CAST(ts AS DATE) AS date,
             MIN(k) AS min, MAX(k) AS max,
             CAST(AVG(k) AS DOUBLE) AS avg,
             CAST(CASE WHEN SUM(k) <> 0 THEN SUM(k) END AS BIGINT) AS sum
      FROM (SELECT user_id, ts,
              CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
            FROM events)
      GROUP BY user_id, CAST(ts AS DATE)"""))

  /** A3 — daily-first-with-hourly-fallback union
    * (graph_weather_day.py:199-224): 'purchase' stats where present,
    * else 'click' stats for the missing (user, day) groups.
    */
  val a3_fallback_union = Q(
    (s, dir) => {
      val e = T_(s, dir, "events")
      def roll(t: String) = e.filter(col("event_type") === t)
        .groupBy(col("user_id"), to_date(col("ts")).as("date"))
        .agg(count(lit(1)).as("n"), decAvg(col("value")).as("avg_v"))
      DailyRollup.withFallback(roll("purchase"), roll("click"),
        Seq("user_id", "date"))
    },
    Some("""WITH d AS (
        SELECT user_id, CAST(ts AS DATE) AS date, count(*) AS n,
               """ + sqlDecAvg("value") + """ AS avg_v
        FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
      h AS (
        SELECT user_id, CAST(ts AS DATE) AS date, count(*) AS n,
               """ + sqlDecAvg("value") + """ AS avg_v
        FROM events WHERE event_type = 'click' GROUP BY 1, 2)
      SELECT * FROM d
      UNION ALL
      SELECT h.* FROM h WHERE NOT EXISTS
        (SELECT 1 FROM d WHERE d.user_id = h.user_id AND d.date = h.date)"""))

  /** A5/O5/A6 — min-per-group + sorted distinct-set aggregation
    * (earliest wetting per depth, graph_irrigation_event.py:167-196).
    */
  val a5_min_distinct_set = Q(
    // the distinct set is emitted as a sorted comma-joined string so the
    // driver's pandas compare can hash it (list columns are unhashable)
    (s, dir) => T_(s, dir, "events")
      .groupBy(col("user_id"))
      .agg(min(col("ts")).as("first_ts"),
        concat_ws(",", array_sort(collect_set(col("event_type")))).as("types")),
    Some("""SELECT user_id, min(ts) AS first_ts,
             array_to_string(list_sort(list_distinct(list(event_type))), ',') AS types
      FROM events GROUP BY user_id"""))

  /** A7 — dedup by composite key → distinct. */
  val a7_distinct = Q(
    (s, dir) => T_(s, dir, "lineitem")
      .select(col("l_returnflag"), col("l_linestatus")).distinct(),
    Some("SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem"))

  /** A10 — per-group running index in deterministic arrival order
    * (idx counter, graph_application_event.py:147-150).
    */
  val a10_running_idx = Q(
    (s, dir) => T_(s, dir, "orders")
      .withColumn("idx", row_number().over(
        Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)))
      .select(col("o_orderkey"), col("o_custkey"), col("idx")),
    Some("""SELECT o_orderkey, o_custkey,
             CAST(row_number() OVER (PARTITION BY o_custkey
               ORDER BY o_orderdate ASC, o_orderkey ASC) AS INTEGER) AS idx
      FROM orders"""))

  /** A13 — telemetry counters: one-row stage stats (df.observe
    * analog of the reference's [DBG] counters).
    */
  val a13_table_counts = Q(
    (s, dir) => {
      def cnt(n: String) = T_(s, dir, n).agg(count(lit(1)).as("n"))
        .withColumn("tbl", lit(n))
      cnt("lineitem").unionByName(cnt("orders")).unionByName(cnt("customer"))
        .unionByName(cnt("events")).select(col("tbl"), col("n"))
    },
    Some("""SELECT 'lineitem' AS tbl, count(*) AS n FROM lineitem
      UNION ALL SELECT 'orders', count(*) FROM orders
      UNION ALL SELECT 'customer', count(*) FROM customer
      UNION ALL SELECT 'events', count(*) FROM events"""))

  // ===========================================================
  // O — sorts / top-k (SURVEY §2.7)
  // ===========================================================

  /** O2/O3 — argmin per group with deterministic tiebreak: each
    * customer's cheapest order (best_idx pick,
    * graph_product_application.py:202-214).
    */
  val o3_argmin_per_group = Q(
    // argmin as an aggregate: min over the (price, key) ordering tuple
    // combines partially map-side — one row per customer crosses the
    // wire — where the row_number window form sort-shuffles every
    // order row just to discard all but rank 1
    (s, dir) => T_(s, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(min(struct(col("o_totalprice"), col("o_orderkey"))).as("best"))
      .select(col("o_custkey"), col("best.o_orderkey").as("cheapest_order"),
        col("best.o_totalprice").as("o_totalprice")),
    Some("""SELECT o_custkey, o_orderkey AS cheapest_order, o_totalprice
      FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
              ORDER BY o_totalprice ASC, o_orderkey ASC) AS rn FROM orders)
      WHERE rn = 1"""))

  /** O4 — global top-k with rank (sample limiting). orderBy+limit
    * plans as TakeOrderedAndProject — each partition keeps its local
    * top 25 and the driver merges — instead of a global row_number
    * window that would drag the full table into one partition. The
    * rank window then runs over the 25 survivors only.
    */
  val o4_topk = Q(
    (s, dir) => T_(s, dir, "orders")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(25)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("o_totalprice").desc, col("o_orderkey").asc)))
      .select(col("rank"), col("o_orderkey"), col("o_totalprice")),
    Some("""SELECT rank, o_orderkey, o_totalprice
      FROM (SELECT CAST(row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey ASC)
              AS INTEGER) AS rank, o_orderkey, o_totalprice FROM orders)
      WHERE rank <= 25"""))

  // ===========================================================
  // Set ops + windows (SURVEY §2.8)
  // ===========================================================

  val set_union_except = Q(
    (s, dir) => {
      val c = T_(s, dir, "customer")
      val o = T_(s, dir, "orders")
      c.filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
        .union(c.filter(col("c_nationkey") === 5).select(col("c_custkey")))
        .distinct()
        .except(o.select(col("o_custkey").as("c_custkey")))
    },
    Some("""SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      UNION SELECT c_custkey FROM customer WHERE c_nationkey = 5
      EXCEPT SELECT o_custkey FROM orders"""))

  val set_intersect = Q(
    (s, dir) => T_(s, dir, "customer")
      .filter(col("c_mktsegment") === "MACHINERY").select(col("c_custkey"))
      .intersect(T_(s, dir, "orders").select(col("o_custkey").as("c_custkey"))),
    Some("""SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY'
      INTERSECT SELECT o_custkey FROM orders"""))

  /** Window — running per-group sum (decimal-exact). */
  val w_running_sum = Q(
    (s, dir) => T_(s, dir, "orders")
      .withColumn("running_total",
        sum(col("o_totalprice").cast("decimal(27,8)")).over(
          Window.partitionBy(col("o_custkey"))
            .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double"))
      .select(col("o_orderkey"), col("o_custkey"), col("running_total")),
    Some("""SELECT o_orderkey, o_custkey,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(27,8))) OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate ASC, o_orderkey ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
               AS running_total
      FROM orders"""))

  // -----------------------------------------------------------
  // Registry
  // -----------------------------------------------------------

  val all: Map[String, Q] = Map(
    "s2_pushdown_scan" -> s2_pushdown_scan,
    "s3_upsert_dedup" -> s3_upsert_dedup,
    "s3_merge_keep_existing" -> s3_merge_keep_existing,
    "s6_constraint_dups" -> s6_constraint_dups,
    "s6_orphans" -> s6_orphans,
    "p1_project_rename" -> p1_project_rename,
    "p3_null_guard_isin" -> p3_null_guard_isin,
    "j1_broadcast_agg" -> j1_broadcast_agg,
    "j4_edge_join" -> j4_edge_join,
    "j5_asof_nearest" -> j5_asof_nearest,
    "j6_semi" -> j6_semi,
    "j6_anti" -> j6_anti,
    "j7_enrichment" -> j7_enrichment,
    "a1_daily_rollup" -> a1_daily_rollup,
    "a2_sentinel_rollup" -> a2_sentinel_rollup,
    "a3_fallback_union" -> a3_fallback_union,
    "a5_min_distinct_set" -> a5_min_distinct_set,
    "a7_distinct" -> a7_distinct,
    "a10_running_idx" -> a10_running_idx,
    "a13_table_counts" -> a13_table_counts,
    "o3_argmin_per_group" -> o3_argmin_per_group,
    "o4_topk" -> o4_topk,
    "set_union_except" -> set_union_except,
    "set_intersect" -> set_intersect,
    "w_running_sum" -> w_running_sum,
  )
}
