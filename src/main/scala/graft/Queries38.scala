package graft

import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.operators.Similarity
import Queries.Q

/** Batch 38 (round 7): product-quantization codes (the vector-DB
  * compression pass), seasonal-naive backtesting, and the streaming
  * CUSUM twin.
  */
object Queries38 {

  private def T_(s: org.apache.spark.sql.SparkSession, dir: String, n: String) =
    Tables.read(s, dir, n)

  private val pqSubspaces = 4
  private val pqSubDim = 16
  private val pqCells = 4

  /** PRODUCT QUANTIZATION codes: split the 64-dim embedding into 4
    * subspaces of 16, run the deterministic seeded k-means
    * ([[Similarity.ivfKMeans]], 1 Lloyd round, 4 cells) per
    * subspace, and emit each vector's (subspace, cell) code — the
    * 4-byte compressed representation an IVF-PQ index stores. Every
    * subspace replays its seed pick, Lloyd update, and argmax
    * assignment in the oracle (nested per-subspace WITH blocks, so
    * the four runs cannot interfere). Cost: 4 small k-means over
    * sliced arrays — the slice is a codegen'd projection, the corpus
    * is scanned once per subspace, no d×d or all-pairs work.
    */
  val vec_pq_codes = Q(
    (s, dir) => {
      val emb = T_(s, dir, "embeddings")
      (0 until pqSubspaces).map { b =>
        val sub = emb.select(col("vec_id"),
          slice(col("embedding"), b * pqSubDim + 1, pqSubDim).as("sub"))
        val (indexed, _) = Similarity.ivfKMeans(sub, "sub", "vec_id",
          nCells = pqCells, iters = 1)
        indexed.select(lit(b).as("subspace"), col("id").as("vec_id"),
          col("cell"))
      }.reduce(_ unionByName _)
        .orderBy(col("subspace"), col("vec_id"))
    },
    Some {
      def subspaceSql(b: Int) = {
        val lo = b * pqSubDim + 1
        val hi = (b + 1) * pqSubDim
        s"""(WITH c AS (SELECT vec_id AS id, embedding[$lo:$hi] AS v
              FROM embeddings),
          cent0 AS (SELECT id AS cell,
              [CAST(v[i] AS DOUBLE) FOR i IN range(1, len(v) + 1)] AS cv
            FROM c
            QUALIFY row_number() OVER (ORDER BY
              (CAST(id AS BIGINT) % 94906249) * 1103515245 % 2147483647 ASC,
              id ASC) <= $pqCells),
          ${Queries3.lloydRoundSql(1, "cent0")}
          SELECT $b AS subspace, id AS vec_id, cell FROM (
            SELECT c.id, cent1.cell,
              row_number() OVER (PARTITION BY c.id
                ORDER BY ${Queries3.cosineSql("v", "cv")} DESC NULLS LAST,
                  cent1.cell ASC) AS rn
            FROM c, cent1) WHERE rn = 1)"""
      }
      (0 until pqSubspaces).map(subspaceSql)
        .mkString("SELECT * FROM (\n", "\nUNION ALL ",
          "\n) ORDER BY subspace, vec_id")
    })

  /** SEASONAL-NAIVE BACKTEST: forecast each (event_type, day) daily
    * value total as the total 7 days earlier and score the absolute
    * error — the baseline every forecasting deploy must beat, as an
    * exact-integer eval: values milli-quantized, per-type MAE shipped
    * as (sum of |err|, n) decimal pairs. One daily aggregate, one
    * 7-lag window, one scoring aggregate.
    */
  val ts_backtest_snaive = Q(
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val daily = T_(s, dir, "events")
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(sum(col("value").cast("decimal(27,3)").*(lit(1000))
          .cast("long")).as("v_milli"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("day").asc)
      daily
        .withColumn("f_milli", lag(col("v_milli"), 7).over(w))
        .filter(col("f_milli").isNotNull)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_eval"),
          sum(abs(col("v_milli") - col("f_milli")).cast("decimal(38,0)"))
            .cast("decimal(38,0)").cast("string").as("abs_err_sum"),
          max(abs(col("v_milli") - col("f_milli"))).as("max_err"))
        .orderBy(col("event_type"))
    },
    Some("""WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
            CAST(SUM(CAST(CAST(value AS DECIMAL(27,3)) * 1000 AS BIGINT))
              AS BIGINT) AS v_milli
          FROM events GROUP BY 1, 2),
        f AS (SELECT event_type, day, v_milli,
            lag(v_milli, 7) OVER (PARTITION BY event_type ORDER BY day)
              AS f_milli
          FROM daily)
      SELECT event_type, count(*) AS n_eval,
        CAST(CAST(SUM(CAST(abs(v_milli - f_milli) AS HUGEINT))
          AS DECIMAL(38,0)) AS VARCHAR) AS abs_err_sum,
        max(abs(v_milli - f_milli)) AS max_err
      FROM f WHERE f_milli IS NOT NULL
      GROUP BY 1 ORDER BY 1"""))

  /** The CUSUM volume monitor as a STREAM
    * ([[graft.streaming.StreamingCusum]]): daily counts maintained
    * by a watermarked incremental aggregate, the exact drawdown tail
    * shared with [[Queries32.ts_cusum]] — same oracle.
    */
  val stream_cusum = Q(
    (s, dir) => graft.streaming.StreamingCusum.cusumOnce(
      s, s"$dir/events.parquet"),
    Queries32.ts_cusum.oracle,
    bench = false)

  val all: Map[String, Q] = Map(
    "vec_pq_codes" -> vec_pq_codes,
    "ts_backtest_snaive" -> ts_backtest_snaive,
    "stream_cusum" -> stream_cusum,
  )
}
