package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode, Trigger}

import graft.operators.Sketches

/** Streaming KMV cardinality sketch (the incremental form of
  * [[graft.operators.Sketches]]): per-group distinct-count telemetry
  * maintained with BOUNDED state — exactly k retained hashes per
  * group — where a streaming `COUNT(DISTINCT)` would grow state with
  * the key universe. The retention set is order-insensitive
  * (`retain_k` is a semilattice merge), so the final state equals the
  * batch sketch over the same rows no matter how the stream was
  * micro-batched — which is precisely what the oracle checks.
  */
object StreamingSketch {

  /** Retained k-minimum hashes + a monotone update version (the
    * version lets the verify query pick each group's FINAL emission
    * from the update-mode memory sink). */
  final case class KmvState(hashes: Array[Long], ver: Int)
  final case class KmvRow(g: String, ver: Int, k_n: Long, kth_hash: Long)

  /** Run the sketch over a parquet path to exhaustion and return the
    * final per-group summary (g, k_n, kth_hash, est) — the same
    * schema/arithmetic as [[Sketches.estimate]].
    */
  def kmvOnce(spark: SparkSession, parquetPath: String,
              groupCol: String, idCol: String, k: Int,
              queryName: String = "stream_kmv"): DataFrame = {
    require(k >= 2, "KMV needs k >= 2") // match the batch API contract
    import spark.implicits._
    val src = StreamSource.parquet(spark, parquetPath)
      .select(col(groupCol).cast("string").as("g"),
        graft.operators.Sampling.detHash(col(idCol)).as("h"))
      .as[(String, Long)]
    val updated = src.groupByKey(_._1)
      .mapGroupsWithState[KmvState, KmvRow](GroupStateTimeout.NoTimeout) {
        case (g, rows, state) =>
          // O(k) state, O(log k) per row: insert, evict the max when
          // over capacity — never materialize the batch iterator
          val set = scala.collection.mutable.TreeSet.empty[Long]
          if (state.exists) set ++= state.get.hashes
          rows.foreach { r =>
            val h = r._2
            if (set.size < k) set += h
            else if (h < set.max && !set.contains(h)) { set -= set.max; set += h }
          }
          val ver = (if (state.exists) state.get.ver else 0) + 1
          state.update(KmvState(set.toArray, ver))
          KmvRow(g, ver, set.size.toLong, set.max)
      }
    val q = updated.toDF().writeStream
      .outputMode(OutputMode.Update())
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()
    // update mode appends one row per (group, trigger); the final state
    // is the max-version row per group
    val numer = Sketches.kmvNumerator(k)
    val fin = spark.table(queryName)
      .groupBy(col("g"))
      .agg(max_by(struct(col("k_n"), col("kth_hash")), col("ver")).as("s"))
      .select(col("g"), col("s.k_n").as("k_n"), col("s.kth_hash").as("kth_hash"))
    fin.withColumn("est",
      when(col("k_n") < k, col("k_n").cast("double"))
        .otherwise(lit(numer.toDouble) / col("kth_hash").cast("double")))
  }
}
