package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.functions.{TextFunctions => T}
import Queries.Q

/** Batch 48 (round 7): binary Hamming retrieval over SimHash
  * fingerprints and deterministic-bootstrap confidence intervals.
  */
object Queries48 {

  private def T_(s: org.apache.spark.sql.SparkSession, dir: String, n: String) =
    Tables.read(s, dir, n)

  // ===========================================================
  // Binary top-k retrieval (64-bit Hamming)
  // ===========================================================

  /** BINARY HAMMING TOP-K: retrieve by 64-bit SimHash fingerprint —
    * score = bit_count(xor) against 3 probe documents, top-10 by
    * ascending Hamming (tie: id). The 64x-compressed retrieval tier
    * every large corpus keeps in front of float rescoring: the scan
    * side carries ONE long per document, the probes broadcast, and
    * the whole distance is two codegen'd bit ops. Fingerprints are
    * the same replayable poly31 kernel `dd_simhash` verifies.
    */
  val vec_hamming_topk = Q(
    (s, dir) => {
      val fp = graft.operators.Dedup.simhashBulk(
        T_(s, dir, "documents")
          .select(col("doc_id"), split(T.normText(col("text")), " ").as("toks"))
          .select(col("doc_id"), T.wordShinglesFrom(col("toks"), 2).as("sh")),
        "doc_id", "sh", replayable = true)
      val probes = fp.filter(col("doc_id") < 3)
        .select(col("doc_id").as("qid"), col("simhash").as("qf"))
      fp.crossJoin(broadcast(probes))
        .filter(col("doc_id") =!= col("qid"))
        .select(col("qid"), col("doc_id").as("id"),
          expr("CAST(bit_count(simhash ^ qf) AS INT)").as("hamming"))
        .withColumn("rank", row_number().over(Window.partitionBy(col("qid"))
          .orderBy(col("hamming").asc, col("id").asc)))
        .filter(col("rank") <= 10)
        .orderBy(col("qid"), col("rank"))
    },
    Some(s"""WITH fp AS (SELECT doc_id, simhash FROM
          (${Queries3.dd_simhash.oracle.get})),
        probes AS (SELECT doc_id AS qid, simhash AS qf FROM fp
          WHERE doc_id < 3)
      SELECT qid, id, hamming, rank FROM (
        SELECT p.qid, f.doc_id AS id,
          CAST(bit_count(xor(f.simhash, p.qf)) AS INTEGER) AS hamming,
          CAST(row_number() OVER (PARTITION BY p.qid
            ORDER BY bit_count(xor(f.simhash, p.qf)) ASC, f.doc_id ASC)
            AS INTEGER) AS rank
        FROM fp f JOIN probes p ON f.doc_id != p.qid)
      WHERE rank <= 10 ORDER BY qid, rank"""))

  // ===========================================================
  // Deterministic-bootstrap confidence intervals
  // ===========================================================

  private val bootReplicas = 32

  /** BOOTSTRAP CONFIDENCE INTERVALS without randomness the engines
    * can't replay: 32 resampling replicas where each event's weight
    * in replica b is bit_count(detHash2(event_id·64 + b) mod 4) —
    * the {0:¼, 1:½, 2:¼} multiplicity distribution with mean 1, the
    * deterministic stand-in for Poisson(1) bootstrap weights. Each
    * replica's milli-mean is an exact integer ratio; the interval is
    * the 2nd..31st order statistic of the 32 replica means (a
    * central ~94% interval). The whole thing is ONE pass over the
    * fact table per replica batch (the explode is map-side, replica
    * aggregation partial-combines on (type, b)) — resampling
    * inference with zero driver-side state, the distributed
    * bootstrap shape.
    */
  val a_bootstrap_ci = Q(
    (s, dir) => {
      val ev = T_(s, dir, "events")
        .select(col("event_id"), col("event_type"),
          expr("CAST(CAST(value AS DECIMAL(27,3)) * 1000 AS BIGINT)").as("v"))
      val reps = ev
        .select(col("event_id"), col("event_type"), col("v"),
          explode(expr(s"sequence(0, ${bootReplicas - 1})")).as("b"))
        .withColumn("w", expr(
          "bit_count(((event_id * 64 + b) % 94906249) * 1103515245 % 2147483647" +
            " % 94906249 * 1103515245 % 2147483647 % 4)").cast("long"))
        .groupBy(col("event_type"), col("b"))
        .agg(expr("sum(w * v) div sum(w)").as("m"))
      val w = Window.partitionBy(col("event_type"))
      val ranked = reps
        .withColumn("rn", row_number().over(w.orderBy(col("m").asc, col("b").asc)))
      val base = ev.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), expr("sum(v) div count(1)").as("mean_milli"))
      base
        .join(ranked.filter(col("rn") === 2)
          .select(col("event_type"), col("m").as("lo_milli")), "event_type")
        .join(ranked.filter(col("rn") === bootReplicas - 1)
          .select(col("event_type"), col("m").as("hi_milli")), "event_type")
        .orderBy(col("event_type"))
    },
    Some {
      val h = "((event_id * 64 + b) % 94906249) * 1103515245 % 2147483647" +
        " % 94906249 * 1103515245 % 2147483647"
      s"""WITH ev AS (SELECT event_id, event_type,
            CAST(CAST(value AS DECIMAL(27,3)) * 1000 AS BIGINT) AS v
          FROM events),
        reps AS (SELECT event_type, b,
            CAST(SUM(w * v) AS BIGINT) // CAST(SUM(w) AS BIGINT) AS m
          FROM (SELECT event_type, v,
              CAST(bit_count(($h) % 4) AS BIGINT) AS w, b
            FROM ev, (SELECT unnest(range(0, $bootReplicas)) AS b))
          GROUP BY 1, 2),
        ranked AS (SELECT event_type, m,
            row_number() OVER (PARTITION BY event_type
              ORDER BY m ASC, b ASC) AS rn
          FROM reps),
        base AS (SELECT event_type, count(*) AS n,
            CAST(SUM(v) AS BIGINT) // count(*) AS mean_milli
          FROM ev GROUP BY 1)
      SELECT base.event_type, n, mean_milli, lo.m AS lo_milli, hi.m AS hi_milli
      FROM base
      JOIN (SELECT event_type, m FROM ranked WHERE rn = 2) lo USING (event_type)
      JOIN (SELECT event_type, m FROM ranked WHERE rn = ${bootReplicas - 1}) hi
        USING (event_type)
      ORDER BY event_type"""
    })

  val all: Map[String, Q] = Map(
    "vec_hamming_topk" -> vec_hamming_topk,
    "a_bootstrap_ci" -> a_bootstrap_ci,
  )
}
