package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr

/** Readers over the harness parquet tables (TESTDATA.md).
  *
  * The reference's sources are parameterized Postgres fetchers
  * (SURVEY §2.1 S1/S2, e.g. /root/reference/main_graph_topraq.py:99-106);
  * here every source is a parquet scan and the fetcher parameters become
  * Catalyst filters, which push down to the parquet reader
  * (PushedFilters in .explain). At cluster scale the same call sites
  * switch to `spark.read.format("jdbc")` or a partitioned lake layout
  * without touching downstream operators.
  */
object Tables {
  def read(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // The events table stores ts as parquet TIMESTAMP(NANOS), which
    // Spark's TimestampType (micros) cannot represent; sessions set
    // spark.sql.legacy.parquet.nanosAsLong and the nanos column is
    // normalized here (integer `div` — a double intermediate would
    // lose precision above 2^53 ns).
    df.schema.find(f => f.name == "ts" && f.dataType == org.apache.spark.sql.types.LongType)
      .map(_ => df.withColumn("ts", expr("timestamp_micros(ts div 1000)")))
      .getOrElse(df)
  }

  /** Write `df` as a bucketed + sorted table so later equi-joins and
    * aggregations on `keys` are co-located: two tables bucketed the
    * same way sort-merge-join with NO exchange and NO sort (the scan
    * already satisfies the required distribution/ordering). At 100 TB
    * this converts every repeated join against a fact table from a
    * full shuffle into a local merge — pay one clustered write, save a
    * shuffle per downstream consumer.
    */
  def writeBucketed(df: DataFrame, name: String, keys: Seq[String],
                    buckets: Int, path: String): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .option("path", path)
      .format("parquet")
      .saveAsTable(name)

  def lineitem(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "region")
  def events(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "events")
  def documents(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "embeddings")
}
