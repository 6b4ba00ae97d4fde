package graft

import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.operators.Similarity
import Queries.Q

/** Batch 39 (round 7): leakage-safe train/test splitting, top-mover
  * change detection, and prefix-dimension (matryoshka) retrieval
  * eval.
  */
object Queries39 {

  private def T_(s: org.apache.spark.sql.SparkSession, dir: String, n: String) =
    Tables.read(s, dir, n)

  private val hash1 = "(doc_id % 94906249) * 1103515245 % 2147483647"

  /** LEAKAGE-SAFE train/test split: the assignment hashes the
    * exact-duplicate CLUSTER, not the document, so every copy of a
    * duplicated text lands on the same side — the split invariant
    * that keeps test answers out of the training set. The cluster
    * key is the min doc_id per normalized text (one keyed argmin);
    * the side gate is the deterministic basis-point hash on that
    * key. Emits per-doc assignment plus the cluster id so the
    * invariant is checkable downstream; the oracle replays key,
    * gate, and assignment exactly.
    */
  val samp_split_leakage_safe = Q(
    (s, dir) => {
      val docs = T_(s, dir, "documents")
        .withColumn("__k",
          sha2(regexp_replace(lower(trim(col("text"))), "\\s+", " "), 256))
      val clusters = docs.groupBy(col("__k"))
        .agg(min(col("doc_id")).as("cluster_id"))
      docs.join(clusters, "__k")
        .withColumn("side",
          when(expr("((((cluster_id % 94906249) * 1103515245 % 2147483647)" +
            " % 94906249) * 1103515245 % 2147483647) % 10 < 8"), "train")
            .otherwise("test"))
        .select(col("doc_id"), col("cluster_id"), col("side"))
        .orderBy(col("doc_id"))
    },
    Some {
      val h2c = "(((cluster_id % 94906249) * 1103515245 % 2147483647)" +
        " % 94906249) * 1103515245 % 2147483647"
      s"""WITH d AS (SELECT doc_id,
            regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS k
          FROM documents),
        c AS (SELECT k, min(doc_id) AS cluster_id FROM d GROUP BY 1)
      SELECT d.doc_id, c.cluster_id,
        CASE WHEN ($h2c) % 10 < 8 THEN 'train' ELSE 'test' END AS side
      FROM d JOIN c USING (k)
      ORDER BY d.doc_id"""
    })

  /** TOP MOVERS: the parts whose daily revenue changed most between
    * the last two order days — snapshot-over-snapshot change
    * detection with cents-exact deltas and a TakeOrdered top-15
    * under a total order. Two filtered aggregates over one scan
    * (conditional sums), no self-join of the fact table.
    */
  val a_top_movers = Q(
    (s, dir) => {
      val li = T_(s, dir, "lineitem")
        .withColumn("sd", to_date(col("l_shipdate")))
      val days = li.agg(max(col("sd")).as("d1"))
        .select(col("d1"), date_sub(col("d1"), 1).as("d0"))
      val cents = (sum(when(col("sd") === col("d1"),
        col("l_extendedprice").cast("decimal(27,2)").*(lit(100))
          .cast("long")).otherwise(0L))).as("rev1")
      val cents0 = (sum(when(col("sd") === col("d0"),
        col("l_extendedprice").cast("decimal(27,2)").*(lit(100))
          .cast("long")).otherwise(0L))).as("rev0")
      li.crossJoin(broadcast(days))
        .filter(col("sd") === col("d1") || col("sd") === col("d0"))
        .groupBy(col("l_partkey"))
        .agg(cents, cents0)
        .withColumn("delta_cents", col("rev1") - col("rev0"))
        .orderBy(abs(col("delta_cents")).desc, col("l_partkey").asc)
        .limit(15)
    },
    Some("""WITH li AS (SELECT l_partkey, l_extendedprice,
            CAST(l_shipdate AS DATE) AS sd FROM lineitem),
        days AS (SELECT max(sd) AS d1, max(sd) - 1 AS d0 FROM li),
        g AS (SELECT l_partkey,
            CAST(SUM(CASE WHEN sd = d1 THEN
              CAST(CAST(l_extendedprice AS DECIMAL(27,2)) * 100 AS BIGINT)
              ELSE 0 END) AS BIGINT) AS rev1,
            CAST(SUM(CASE WHEN sd = d0 THEN
              CAST(CAST(l_extendedprice AS DECIMAL(27,2)) * 100 AS BIGINT)
              ELSE 0 END) AS BIGINT) AS rev0
          FROM li, days
          WHERE sd = d1 OR sd = d0
          GROUP BY 1)
      SELECT l_partkey, rev1, rev0, rev1 - rev0 AS delta_cents
      FROM g
      ORDER BY abs(rev1 - rev0) DESC, l_partkey ASC LIMIT 15"""))

  /** MATRYOSHKA (prefix-dimension) RETRIEVAL EVAL: recall@10 of
    * search over only the first 16 embedding dimensions against the
    * full-64 exact top-10 — the eval that tells you how far the
    * index can truncate stored vectors (matryoshka representation
    * learning's deployment question). Both sides are the exact
    * brute-force operator; only the vector view differs (a codegen'd
    * slice).
    */
  val vec_prefix_recall = Q(
    (s, dir) => {
      val emb = T_(s, dir, "embeddings")
      val full = Similarity.bruteForceTopK(emb,
          emb.filter(col("vec_id") < 3), "embedding", "vec_id", "vec_id",
          k = 10)
        .select(col("qid"), col("id"))
      val sliced = emb.select(col("vec_id"),
        slice(col("embedding"), 1, 16).as("emb16"))
      val prefix = Similarity.bruteForceTopK(sliced,
          sliced.filter(col("vec_id") < 3), "emb16", "vec_id", "vec_id",
          k = 10)
        .select(col("qid"), col("id"), lit(1).as("__found"))
      full.join(prefix, Seq("qid", "id"), "left")
        .groupBy(col("qid"))
        .agg(count(lit(1)).as("n_true"),
          sum(when(col("__found").isNotNull, 1L).otherwise(0L))
            .as("n_found"))
        .withColumn("recall_bp", expr("10000L * n_found div n_true"))
        .orderBy(col("qid"))
    },
    Some {
      def topkSql(vExpr: String) =
        s"""SELECT qid, id FROM (
          SELECT qid, id, row_number() OVER (PARTITION BY qid
            ORDER BY cos DESC NULLS LAST, id ASC) AS rank
          FROM (SELECT q.qid, c.id, ${Queries3.cosineSql("c.v", "q.qv")} AS cos
            FROM (SELECT vec_id AS id, $vExpr AS v FROM embeddings) c,
              (SELECT vec_id AS qid, $vExpr AS qv FROM embeddings
                WHERE vec_id < 3) q))
        WHERE rank <= 10"""
      s"""WITH full_t AS (${topkSql("embedding")}),
        pre AS (${topkSql("embedding[1:16]")})
      SELECT f.qid, count(*) AS n_true,
        CAST(SUM(CASE WHEN p.id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
          AS n_found,
        10000 * CAST(SUM(CASE WHEN p.id IS NOT NULL THEN 1 ELSE 0 END)
          AS BIGINT) // count(*) AS recall_bp
      FROM full_t f LEFT JOIN pre p ON f.qid = p.qid AND f.id = p.id
      GROUP BY 1 ORDER BY 1"""
    })

  val all: Map[String, Q] = Map(
    "samp_split_leakage_safe" -> samp_split_leakage_safe,
    "a_top_movers" -> a_top_movers,
    "vec_prefix_recall" -> vec_prefix_recall,
  )
}
