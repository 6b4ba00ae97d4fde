package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr

/** Shared file-stream construction for the bounded verify-against-batch
  * runners: a parquet "table" is either a directory of part files
  * (stream it directly) or a bare single file (stream the parent,
  * glob-matched to this file — the file source only accepts
  * directories). Also normalizes a TIMESTAMP(NANOS) `ts` column the
  * way [[graft.sources.Tables.read]] does for batch.
  */
object StreamSource {

  def parquet(spark: SparkSession, parquetPath: String): DataFrame = {
    val schema = spark.read.parquet(parquetPath).schema
    val s0 =
      if (new java.io.File(parquetPath).isDirectory)
        spark.readStream.schema(schema).parquet(parquetPath)
      else {
        val dir = parquetPath.replaceAll("/[^/]+$", "")
        val fileName = parquetPath.substring(parquetPath.lastIndexOf('/') + 1)
        spark.readStream.schema(schema)
          .option("pathGlobFilter", fileName).parquet(dir)
      }
    if (schema.exists(f => f.name == "ts" &&
        f.dataType == org.apache.spark.sql.types.LongType))
      s0.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else s0
  }
}
