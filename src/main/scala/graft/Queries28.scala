package graft

import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.operators.AsOfJoin
import Queries.Q

/** Batch 28: first-touch attribution (as-of FORWARD + tolerance —
  * the last uncovered AsOfJoin mode) and the log-binned degree
  * histogram (power-law diagnostics).
  */
object Queries28 {

  private def T_(s: org.apache.spark.sql.SparkSession, dir: String, n: String) =
    Tables.read(s, dir, n)

  /** First-touch attribution: each signup joined to the user's FIRST
    * click within the following 24 h — [[AsOfJoin.nearest]]'s forward
    * + tolerance mode, completing direction coverage (nearest and
    * backward are already exercised). Same argmin-aggregate shape.
    */
  val j5_asof_firsttouch = Q(
    (s, dir) => {
      val e = T_(s, dir, "events")
      val su = e.filter(col("event_type") === "signup")
        .select(col("event_id").as("signup_id"), col("user_id"), col("ts"))
      val c = e.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"),
          col("ts").as("cts"))
      AsOfJoin.nearest(su, c, Seq("user_id"), "ts", "cts",
          direction = "forward", tolerance = Some(86400L),
          tiebreak = Seq("click_id"))
        .select(col("signup_id"), col("user_id"), col("click_id"))
    },
    Some("""WITH su AS (SELECT event_id AS signup_id, user_id, ts
            FROM events WHERE event_type = 'signup'),
        c AS (SELECT event_id AS click_id, user_id, ts AS cts
            FROM events WHERE event_type = 'click'),
        j AS (SELECT su.signup_id, su.user_id, c.click_id,
            CASE WHEN c.cts IS NOT NULL
                 AND floor(epoch(c.cts)) >= floor(epoch(su.ts))
                 AND abs(floor(epoch(c.cts)) - floor(epoch(su.ts))) <= 86400
              THEN abs(floor(epoch(c.cts)) - floor(epoch(su.ts))) END AS vdiff
          FROM su LEFT JOIN c ON su.user_id = c.user_id),
        r AS (SELECT signup_id, user_id, click_id, vdiff,
            row_number() OVER (PARTITION BY signup_id
              ORDER BY coalesce(vdiff, 9223372036854775807) ASC,
                       click_id ASC) AS rn
          FROM j)
      SELECT signup_id, user_id,
        CASE WHEN vdiff IS NOT NULL THEN click_id END AS click_id
      FROM r WHERE rn = 1"""))

  /** Log₂-binned degree histogram over the hierarchy graph — the
    * power-law diagnostic every graph pipeline plots first. Two hash
    * aggregates (degrees, then bins); the bin is integer bit-length
    * arithmetic, so the buckets replay exactly.
    */
  val g_degree_histogram = Q(
    (s, dir) => {
      val o = T_(s, dir, "orders")
        .select((col("o_orderkey") + 10000000L).as("src"),
          (col("o_custkey") + 10000L).as("dst"))
      val c = T_(s, dir, "customer")
        .select((col("c_custkey") + 10000L).as("src"),
          (col("c_nationkey").cast("long") + 100L).as("dst"))
      val n = T_(s, dir, "nation")
        .select((col("n_nationkey").cast("long") + 100L).as("src"),
          col("n_regionkey").cast("long").as("dst"))
      val und = o.unionByName(c).unionByName(n)
      val deg = und.select(col("src").as("id"))
        .unionByName(und.select(col("dst").as("id")))
        .groupBy(col("id")).agg(count(lit(1)).as("deg"))
      // floor(log2) via binary-string length — pure integer, no libm
      // (log2 of an exact power of two is the 1-ulp case where two
      // libms can floor to different bins)
      deg.groupBy((length(bin(col("deg"))) - 1).cast("int").as("bin"))
        .agg(count(lit(1)).as("n_vertices"),
          min(col("deg")).as("min_deg"), max(col("deg")).as("max_deg"))
    },
    Some("""WITH edges AS (
        SELECT 10000000 + o_orderkey AS src, 10000 + o_custkey AS dst FROM orders
        UNION ALL SELECT 10000 + c_custkey, 100 + c_nationkey FROM customer
        UNION ALL SELECT CAST(100 + n_nationkey AS BIGINT), CAST(n_regionkey AS BIGINT) FROM nation),
      deg AS (SELECT id, count(*) AS deg FROM (
          SELECT src AS id FROM edges UNION ALL SELECT dst FROM edges)
        GROUP BY 1)
      SELECT CAST(length(bin(deg)) - 1 AS INTEGER) AS bin,
        count(*) AS n_vertices,
        min(deg) AS min_deg, max(deg) AS max_deg
      FROM deg GROUP BY 1"""))

  val all: Map[String, Q] = Map(
    "j5_asof_firsttouch" -> j5_asof_firsttouch,
    "g_degree_histogram" -> g_degree_histogram,
  )
}
