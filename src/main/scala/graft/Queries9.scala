package graft

import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.operators.{Checksum, Percentiles, SnapshotDiff, Upsert}
import Queries.Q

/** Batch 9: lake-operations breadth — keyed snapshot diff (CDC
  * between two runs of a MERGE pipeline), order-independent table
  * content checksums (cross-engine ingest validation), interpolated
  * continuous percentiles, and percentile-clipped (winsorized)
  * aggregates. Every query replays bit-for-bit in the DuckDB oracle.
  */
object Queries9 {

  private def T_(s: org.apache.spark.sql.SparkSession, dir: String, n: String) =
    Tables.read(s, dir, n)

  /** Per-dataset, per-JVM staging root — see [[graft.sources.Staging]]. */
  private def stagingDir(dir: String, name: String): String =
    graft.sources.Staging.path(dir, name)

  /** The poly31 row fingerprint as DuckDB SQL (same family/constants
    * as plans.TextExpressions.fingerprintFast — proven replayable by
    * `txt_fingerprint`). */
  private def fpSql(expr: String) =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
       list_transform(string_split($expr, ''), c -> CAST(ord(c) AS BIGINT))),
       (a, b) -> (a * 31 + b) % 2147483647)"""

  /** Null-canonicalized row serialization, mirroring
    * [[Checksum.tableChecksum]]'s coalesce-to-sentinel form. */
  private def rowSql(cols: Seq[String]) =
    cols.map(c => s"coalesce(CAST($c AS VARCHAR), '␀')")
      .mkString("concat_ws('|', ", ", ", ")")

  /** CDC between two snapshot states of the keyed event feed: the
    * latest row per (user, type) as of day 21 vs the latest over the
    * day-8+ window, full-outer diffed into added/removed/changed with
    * both sides' values. Each snapshot is the argmax AGGREGATE
    * (`Upsert.dedupByKey` — partial max_by, no rank window), and the
    * diff join reuses their (user, type) hash partitioning — no extra
    * exchange beyond the two snapshot shuffles.
    */
  val s9_snapshot_diff = Q(
    (s, dir) => {
      val ev = T_(s, dir, "events")
        .select(col("user_id"), col("event_type"), col("event_id"),
          col("ts"), col("value"))
      def snap(f: org.apache.spark.sql.Column) = Upsert.dedupByKey(
        ev.filter(f), Seq("user_id", "event_type"),
        Seq(col("ts"), col("event_id")))
        .select(col("user_id"), col("event_type"), col("event_id"), col("value"))
      SnapshotDiff.diff(
        snap(col("ts") < lit("2024-01-21").cast("timestamp")),
        snap(col("ts") >= lit("2024-01-08").cast("timestamp")),
        keys = Seq("user_id", "event_type"),
        cols = Seq("event_id", "value"))
    },
    Some("""WITH o AS (SELECT user_id, event_type,
        event_id AS old_event_id, value AS old_value, TRUE AS op
      FROM events WHERE ts < TIMESTAMP '2024-01-21'
      QUALIFY row_number() OVER (PARTITION BY user_id, event_type
        ORDER BY ts DESC, event_id DESC) = 1),
      n AS (SELECT user_id, event_type,
        event_id AS new_event_id, value AS new_value, TRUE AS np
      FROM events WHERE ts >= TIMESTAMP '2024-01-08'
      QUALIFY row_number() OVER (PARTITION BY user_id, event_type
        ORDER BY ts DESC, event_id DESC) = 1),
      j AS (SELECT COALESCE(o.user_id, n.user_id) AS user_id,
        COALESCE(o.event_type, n.event_type) AS event_type,
        old_event_id, old_value, new_event_id, new_value,
        CASE WHEN op IS NULL THEN 'added'
             WHEN np IS NULL THEN 'removed'
             WHEN old_event_id IS DISTINCT FROM new_event_id
               OR old_value IS DISTINCT FROM new_value THEN 'changed'
             ELSE 'unchanged' END AS change
      FROM o FULL JOIN n
        ON o.user_id = n.user_id AND o.event_type = n.event_type)
      SELECT user_id, event_type, old_event_id, old_value,
        new_event_id, new_value, change
      FROM j WHERE change <> 'unchanged'"""))

  /** Order-independent content checksums for the four mutable-ingest
    * tables — the cross-engine anti-entropy audit (source system vs
    * lake copy agree iff the canonical row multisets agree). Floats
    * are canonicalized to scaled integers and timestamps to epoch
    * micros BEFORE concatenation (float formatting is not
    * engine-portable; integer strings are). The poly31 sum stays
    * below 2^63 up to ~4e9 rows per table; beyond that widen the
    * accumulator to decimal(38,0).
    */
  val s10_table_checksum = Q(
    (s, dir) => Seq(
      Checksum.tableChecksum(T_(s, dir, "customer"), "customer", Seq(
        col("c_custkey"), col("c_name"), col("c_nationkey"),
        expr("cast(floor(c_acctbal * 100) as bigint)"), col("c_mktsegment"))),
      Checksum.tableChecksum(T_(s, dir, "orders"), "orders", Seq(
        col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        expr("cast(floor(o_totalprice * 100) as bigint)"),
        // parquet timestamp[ms] reads as TIMESTAMP_NTZ; the session is
        // UTC so the cast is instant-preserving and epoch_us-parity
        unix_micros(col("o_orderdate").cast("timestamp")),
        col("o_orderpriority"))),
      Checksum.tableChecksum(T_(s, dir, "lineitem"), "lineitem", Seq(
        col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_suppkey"),
        expr("cast(floor(l_quantity) as bigint)"),
        expr("cast(floor(l_extendedprice * 100) as bigint)"),
        col("l_returnflag"), col("l_linestatus"),
        unix_micros(col("l_shipdate").cast("timestamp")))),
      Checksum.tableChecksum(T_(s, dir, "events"), "events", Seq(
        col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")), expr("cast(floor(value * 1000) as bigint)")))
    ).reduce(_ unionByName _),
    Some(s"""SELECT 'customer' AS tbl, count(*) AS n_rows,
        CAST(SUM(${fpSql("s")}) AS BIGINT) AS checksum
      FROM (SELECT ${rowSql(Seq("c_custkey", "c_name", "c_nationkey",
        "CAST(floor(c_acctbal * 100) AS BIGINT)", "c_mktsegment"))} AS s
        FROM customer)
      UNION ALL
      SELECT 'orders', count(*), CAST(SUM(${fpSql("s")}) AS BIGINT)
      FROM (SELECT ${rowSql(Seq("o_orderkey", "o_custkey", "o_orderstatus",
        "CAST(floor(o_totalprice * 100) AS BIGINT)", "epoch_us(o_orderdate)",
        "o_orderpriority"))} AS s FROM orders)
      UNION ALL
      SELECT 'lineitem', count(*), CAST(SUM(${fpSql("s")}) AS BIGINT)
      FROM (SELECT ${rowSql(Seq("l_orderkey", "l_linenumber", "l_partkey",
        "l_suppkey", "CAST(floor(l_quantity) AS BIGINT)",
        "CAST(floor(l_extendedprice * 100) AS BIGINT)",
        "l_returnflag", "l_linestatus", "epoch_us(l_shipdate)"))} AS s
        FROM lineitem)
      UNION ALL
      SELECT 'events', count(*), CAST(SUM(${fpSql("s")}) AS BIGINT)
      FROM (SELECT ${rowSql(Seq("event_id", "user_id", "event_type",
        "epoch_us(ts)", "CAST(floor(value * 1000) AS BIGINT)"))} AS s
        FROM events)"""))

  /** Interpolated (percentile_cont-style) quantiles of line quantity
    * per return flag, from the frequency table — interpolation weights
    * carried as exact integers, one float expression at the end
    * written identically in both engines.
    */
  val a_quantile_cont = Q(
    (s, dir) => Percentiles.quantilesCont(T_(s, dir, "lineitem"),
        col("l_returnflag"), col("l_quantity"), Seq(2500, 5000, 9750))
      .select(col("g").as("l_returnflag"), col("pct_bp"), col("value")),
    Some("""WITH f AS (SELECT l_returnflag AS g, CAST(l_quantity AS DOUBLE) AS v,
        count(*) AS c FROM lineitem GROUP BY 1, 2),
      cum AS (SELECT g, v,
        sum(c) OVER (PARTITION BY g ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum,
        sum(c) OVER (PARTITION BY g) AS tot FROM f),
      p AS (SELECT unnest([2500, 5000, 9750]) AS pct_bp),
      t AS (SELECT g, v, cum, tot, pct_bp,
        CAST(pct_bp AS BIGINT) * (tot - 1) AS h10k FROM cum, p),
      r AS (SELECT g, pct_bp,
        min(CASE WHEN cum >= h10k // 10000 + 1 THEN v END) AS a,
        min(CASE WHEN cum >= least(h10k // 10000 + 2, tot) THEN v END) AS b,
        CAST(max(h10k % 10000) AS BIGINT) AS m
      FROM t GROUP BY 1, 2)
      SELECT g AS l_returnflag, pct_bp, a + (m / 10000.0) * (b - a) AS value
      FROM r"""))

  /** Winsorized revenue per return flag: clip extended price at the
    * per-flag p99 dollar bucket (exact frequency-table percentile over
    * `floor(price)` — the bucketing is what keeps the value domain
    * compressible at scale), then a decimal-exact clipped mean. The
    * 3-row threshold table broadcasts back onto the fact scan.
    */
  val a_winsorize = Q(
    (s, dir) => {
      val li = T_(s, dir, "lineitem")
      val thr = Percentiles.quantilesDisc(li, col("l_returnflag"),
          expr("cast(floor(l_extendedprice) as bigint)"), Seq(9900))
        .select(col("g"), col("value").cast("double").as("thr"))
      li.join(broadcast(thr), col("l_returnflag") === col("g"))
        .withColumn("clipped", least(col("l_extendedprice"), col("thr")))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).cast("int").as("n_rows"),
          sum(when(col("l_extendedprice") > col("thr"), 1).otherwise(0))
            .cast("int").as("n_clipped"),
          // micro-quantized integer mean, not a double: the exact
          // decimal sum's scaled units pass 2^53 at ~10x this bench
          // scale, where decimal->double casts split 1 ulp between
          // engines (caught by the round-8 amplified sweep). Integer
          // div of exact integers is engine-portable at any scale.
          sum((col("clipped").cast("decimal(27,6)") * 1000000)
              .cast("decimal(38,0)")).cast("decimal(38,0)").as("__s"),
          count(lit(1)).as("__n"))
        .withColumn("win_mean_micro", expr("cast(__s div __n as bigint)"))
        .drop("__s", "__n")
    },
    Some("""WITH f AS (SELECT l_returnflag AS g,
        CAST(floor(l_extendedprice) AS BIGINT) AS v, count(*) AS c
      FROM lineitem GROUP BY 1, 2),
      cum AS (SELECT g, v,
        sum(c) OVER (PARTITION BY g ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum,
        sum(c) OVER (PARTITION BY g) AS tot FROM f),
      thr AS (SELECT g, CAST(min(v) AS DOUBLE) AS thr FROM cum
        WHERE cum >= (9900 * tot + 9999) // 10000 GROUP BY g)
      SELECT l_returnflag, CAST(count(*) AS INTEGER) AS n_rows,
        CAST(sum(CASE WHEN l_extendedprice > thr THEN 1 ELSE 0 END) AS INTEGER)
          AS n_clipped,
        -- HUGEINT //: DuckDB's // on DECIMAL operands ROUNDS the
        -- decimal quotient; on integers it floors like Spark's div
        CAST(CAST(SUM(CAST(CAST(least(l_extendedprice, thr) AS DECIMAL(27,6))
              * 1000000 AS DECIMAL(38,0))) AS HUGEINT)
          // COUNT(*) AS BIGINT) AS win_mean_micro
      FROM lineitem JOIN thr ON l_returnflag = thr.g
      GROUP BY l_returnflag"""))

  /** Partition-pruned lake layout: write the event feed
    * date-partitioned (the layout a 100 TB event lake actually uses),
    * then aggregate ONE day — the read must plan with PartitionFilters
    * so only that day's directory is scanned (asserted in PlanSpec).
    * The oracle recomputes the same day from the unpartitioned source.
    */
  val s11_partition_prune = Q(
    (s, dir) => {
      val base = stagingDir(dir, "events_by_day")
      T_(s, dir, "events")
        .withColumn("day", to_date(col("ts")))
        .write.mode("overwrite").partitionBy("day").parquet(base)
      s.read.parquet(base)
        .filter(col("day") === lit("2024-01-15").cast("date"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(27,8)")).cast("double").as("total"))
    },
    Some("""SELECT event_type, count(*) AS n,
        CAST(SUM(CAST(value AS DECIMAL(27,8))) AS DOUBLE) AS total
      FROM events WHERE CAST(ts AS DATE) = DATE '2024-01-15'
      GROUP BY 1"""),
    bench = false)

  /** PII-style masking: redact every digit run in the raw props
    * payload and count the masked characters — the anonymization pass
    * a curation pipeline runs before sharing. One codegen'd
    * projection, no shuffle; the regex is dialect-portable and the
    * count is length arithmetic (no engine-specific match counters).
    */
  val txt_pii_mask = Q(
    (s, dir) => T_(s, dir, "events")
      .select(col("event_id"),
        regexp_replace(col("props"), "[0-9]+", "#").as("redacted"),
        (length(col("props")) -
          length(regexp_replace(col("props"), "[0-9]", "")))
          .cast("int").as("n_digits")),
    Some("""SELECT event_id,
        regexp_replace(props, '[0-9]+', '#', 'g') AS redacted,
        CAST(length(props) - length(regexp_replace(props, '[0-9]', '', 'g'))
          AS INTEGER) AS n_digits
      FROM events"""))

  /** Incremental materialized-view maintenance: the daily roll-up is
    * kept as ALGEBRAIC state (count + decimal sum — both mergeable),
    * so refreshing with a new day range is `state UNION delta` +
    * re-aggregate, never a full recompute. The query maintains the
    * first-20-days state on disk, applies the day-21+ delta, and the
    * oracle recomputes from scratch — merge == recompute is the
    * correctness claim. At 100 TB the delta pass reads ONLY the new
    * partitions (see `s11_partition_prune` for the layout) and the
    * merge shuffles state + delta, both already day-aggregated.
    */
  val s12_incremental_rollup = Q(
    (s, dir) => {
      val base = stagingDir(dir, "day_state")
      def rollup(f: org.apache.spark.sql.Column) = T_(s, dir, "events")
        .filter(f)
        .groupBy(col("user_id"), to_date(col("ts")).as("obs_day"),
          col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(27,8)")).as("sum_dec"))
      val cut = lit("2024-01-21").cast("timestamp")
      rollup(col("ts") < cut).write.mode("overwrite").parquet(base)
      val state = s.read.parquet(base)
      val delta = rollup(col("ts") >= cut)
      // algebraic merge: counts add, decimal sums add exactly
      state.unionByName(delta)
        .groupBy(col("user_id"), col("obs_day"), col("event_type"))
        .agg(sum(col("n")).as("n"),
          sum(col("sum_dec")).cast("double").as("total"))
    },
    Some("""SELECT user_id, CAST(ts AS DATE) AS obs_day, event_type,
        count(*) AS n,
        CAST(SUM(CAST(value AS DECIMAL(27,8))) AS DOUBLE) AS total
      FROM events GROUP BY 1, 2, 3"""),
    bench = false)

  /** Declarative domain checks (the S6 family beyond keys/orphans):
    * per-rule violation counts over the fact tables — the data-quality
    * gate an ingest pipeline runs before publishing a snapshot. One
    * scan per table, conditional-sum aggregates, zero rows moved.
    */
  val s6_domain_checks = Q(
    (s, dir) => {
      val li = T_(s, dir, "lineitem")
      val ev = T_(s, dir, "events")
      val liChecks = li.agg(
        sum(when(col("l_quantity") <= 0, 1).otherwise(0)).as("nonpositive_quantity"),
        sum(when(col("l_discount") < 0 || col("l_discount") > 1, 1).otherwise(0))
          .as("discount_out_of_range"),
        sum(when(!col("l_returnflag").isin("A", "N", "R"), 1).otherwise(0))
          .as("unknown_returnflag"))
      val evChecks = ev.agg(
        sum(when(!col("event_type").isin(
          "click", "view", "purchase", "signup", "error"), 1).otherwise(0))
          .as("unknown_event_type"),
        sum(when(col("ts") < lit("2024-01-01").cast("timestamp"), 1).otherwise(0))
          .as("ts_before_epoch"))
      liChecks.crossJoin(evChecks)
        .select(
          expr("stack(5, 'nonpositive_quantity', nonpositive_quantity," +
            " 'discount_out_of_range', discount_out_of_range," +
            " 'unknown_returnflag', unknown_returnflag," +
            " 'unknown_event_type', unknown_event_type," +
            " 'ts_before_epoch', ts_before_epoch) AS (rule, violations)"))
    },
    Some("""SELECT 'nonpositive_quantity' AS rule,
        CAST(SUM(CASE WHEN l_quantity <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS violations
        FROM lineitem
      UNION ALL SELECT 'discount_out_of_range',
        CAST(SUM(CASE WHEN l_discount < 0 OR l_discount > 1 THEN 1 ELSE 0 END) AS BIGINT)
        FROM lineitem
      UNION ALL SELECT 'unknown_returnflag',
        CAST(SUM(CASE WHEN l_returnflag NOT IN ('A', 'N', 'R') THEN 1 ELSE 0 END) AS BIGINT)
        FROM lineitem
      UNION ALL SELECT 'unknown_event_type',
        CAST(SUM(CASE WHEN event_type NOT IN ('click', 'view', 'purchase', 'signup', 'error')
          THEN 1 ELSE 0 END) AS BIGINT) FROM events
      UNION ALL SELECT 'ts_before_epoch',
        CAST(SUM(CASE WHEN ts < TIMESTAMP '2024-01-01' THEN 1 ELSE 0 END) AS BIGINT)
        FROM events"""))

  /** Skew profile / heavy hitters: the top-10 keys of the event feed
    * with their share of total traffic — the diagnostic you run BEFORE
    * deciding a join needs salting (`j10_salted_skew` is the cure;
    * this is the detector). Two-phase: hash aggregate to per-key
    * counts (map-side combining), then TakeOrderedAndProject over the
    * key-count table — no global sort, no single-reducer window.
    * Share arithmetic is exact-integer basis points.
    */
  val a_heavy_hitters = Q(
    (s, dir) => {
      val ev = T_(s, dir, "events")
      val counts = ev.groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      val total = ev.count() // one scalar, driver-side by design
      counts
        .withColumn("share_bp", expr(s"n * 10000 div ${total}L"))
        .orderBy(col("n").desc, col("user_id").asc)
        .limit(10)
    },
    Some("""SELECT user_id, n,
        n * 10000 // (SELECT count(*) FROM events) AS share_bp
      FROM (SELECT user_id, count(*) AS n FROM events GROUP BY user_id)
      ORDER BY n DESC, user_id ASC LIMIT 10"""))

  /** Text-format interchange (the source matrix beyond parquet):
    * stage the event feed as headered CSV, read it back with an
    * EXPLICIT schema (never inferSchema — an extra full pass and
    * type drift at scale), and aggregate. Timestamps travel as epoch
    * micros and doubles rely on Java's round-trip-safe formatting, so
    * the CSV hop is bit-lossless; the oracle computes from the
    * original parquet, which is exactly the claim.
    */
  val s13_csv_roundtrip = Q(
    (s, dir) => {
      val base = stagingDir(dir, "events_csv")
      T_(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("ts_us"), col("value"))
        .write.mode("overwrite").option("header", "true").csv(base)
      s.read
        .schema("event_id BIGINT, user_id BIGINT, event_type STRING, " +
          "ts_us BIGINT, value DOUBLE")
        .option("header", "true").csv(base)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          min(col("ts_us")).as("first_us"), max(col("ts_us")).as("last_us"),
          sum(col("value").cast("decimal(27,8)")).cast("double").as("total"))
    },
    Some("""SELECT event_type, count(*) AS n,
        min(epoch_us(ts)) AS first_us, max(epoch_us(ts)) AS last_us,
        CAST(SUM(CAST(value AS DECIMAL(27,8))) AS DOUBLE) AS total
      FROM events GROUP BY 1"""),
    bench = false)

  val all: Map[String, Q] = Map(
    "s9_snapshot_diff" -> s9_snapshot_diff,
    "s12_incremental_rollup" -> s12_incremental_rollup,
    "s6_domain_checks" -> s6_domain_checks,
    "a_heavy_hitters" -> a_heavy_hitters,
    "s13_csv_roundtrip" -> s13_csv_roundtrip,
    "s10_table_checksum" -> s10_table_checksum,
    "a_quantile_cont" -> a_quantile_cont,
    "a_winsorize" -> a_winsorize,
    "s11_partition_prune" -> s11_partition_prune,
    "txt_pii_mask" -> txt_pii_mask,
  )
}
