package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType

/** The one `private[sql]` door the engine needs: wrap an
  * `RDD[InternalRow]` back into a DataFrame WITHOUT a
  * Row-encode/decode round trip. Used by the bucket-pruned standing-
  * store probes ([[graft.cypher.BucketedFrame]]): a probe takes a
  * materialized (localCheckpoint'd) frame's internal RDD, prunes it
  * to the key buckets a delta can possibly touch
  * (`PartitionPruningRDD` — public DeveloperApi), and re-enters SQL
  * here. Same mechanism `Dataset.checkpoint` itself uses to re-wrap
  * its materialized RDD; nothing else in the internal API surface is
  * touched.
  */
object SqlShim {
  def internalCreateDataFrame(spark: SparkSession, rdd: RDD[InternalRow],
                              schema: StructType): DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema, isStreaming = false)
}
