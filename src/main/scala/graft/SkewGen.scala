package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew-soak fixture generator: the same star-schema tables as the
  * harness testdata, at ~10x the sf0.1 row counts, in two variants —
  *
  *   - `skew`: the adversarial shapes a 100 TB corpus actually has:
  *     one boilerplate passage at 20% document frequency (the LSH/
  *     simhash band-bucket hot spot), one hub customer owning ~10^4
  *     orders (a 10^4-degree vertex in the order graph), one hot part
  *     on ~10^4 qualifying lineitems (a hub in the co-purchase motif
  *     graph), and one event_type carrying 60% of all events (the hot
  *     join key `j10_salted_skew` salts against);
  *   - `uniform`: identical row counts and generators with the hot
  *     spots disabled — the control the soak compares against (a
  *     skew/uniform wall-clock ratio far above 1 on matched sizes is
  *     the superlinear-blowup signal).
  *
  * All columns are pure hash functions of the row id (xxhash64 → pmod),
  * so both fixtures are deterministic, partition-count-independent, and
  * regenerate bit-identically anywhere.
  *
  * Usage: `runMain graft.SkewGen <outDir> skew|uniform [multiplier]`
  * (multiplier scales the sf0.1 row counts; default 10).
  */
object SkewGen {

  private def h(salt: Int, m: Long): Column =
    pmod(xxhash64(lit(salt), col("id")), lit(m))

  /** 64-word pool for synthetic prose (hash-indexed). */
  private val pool: Seq[String] =
    ("the quick brown fox jumps over lazy dog data table scan filter " +
      "join merge sort shuffle spark plan query batch stream row column " +
      "key value hash index graph node edge rank core part order line " +
      "event user time window group count sum mean total daily metric " +
      "text token shingle band bucket pair cluster exact near dup src " +
      "dst deep wide fast slow hot cold").split(" ").toSeq
  require(pool.length == 64)

  /** `n` pool words picked by `hash(seed, id, i)`, joined by spaces. */
  private def prose(seed: Int, n: Column): Column = {
    val words = transform(sequence(lit(1), n),
      i => element_at(
        lit(pool.toArray),
        (pmod(xxhash64(lit(seed), col("id"), i), lit(64)) + 1).cast("int")))
    concat_ws(" ", words)
  }

  /** The 20%-frequency boilerplate passage (~80 words, fills most of
    * the dedup normalization window, so boilerplate documents are
    * near-dups of each other but not byte-identical — the shape exact
    * dedup CANNOT collapse and banded LSH must survive).
    */
  val boilerplate: String =
    (0 until 80).map(i => pool((i * 13 + 5) % 64)).mkString(" ")

  def documents(spark: SparkSession, n: Long, skew: Boolean): DataFrame = {
    val base = spark.range(n)
    val body = prose(1, lit(60) + h(2, 60))
    val text =
      if (skew)
        // ids 0..n/5: boilerplate + a short unique tail (Jaccard vs
        // each other ~0.7 — inside near-dup range, outside exact)
        when(col("id") < n / 5,
          concat(lit(boilerplate), lit(" "), prose(3, lit(12))))
          .otherwise(body)
      else body
    base.select(
      col("id").as("doc_id"),
      text.as("text"),
      element_at(lit(Array("en", "de", "fr", "es")),
        (h(4, 4) + 1).cast("int")).as("lang"),
      concat(lit("src_"), h(5, 5)).as("source"))
      .withColumn("n_chars", length(col("text")))
  }

  def events(spark: SparkSession, n: Long, skew: Boolean): DataFrame = {
    val types = Array("click", "view", "purchase", "scroll",
      "hover", "submit", "login", "share")
    val et =
      if (skew)
        // 60% of all events on one type: the hot join key
        when(h(10, 100) < 60, lit("click"))
          .otherwise(element_at(lit(types), (h(11, 7) + 2).cast("int")))
      else element_at(lit(types), (h(11, 8) + 1).cast("int"))
    val user =
      if (skew) when(h(12, 100) < 5, lit(42L)).otherwise(h(13, 50000L))
      else h(13, 50000L)
    spark.range(n).select(
      col("id").as("event_id"),
      (lit("2024-01-01").cast("timestamp").cast("long") + h(14, 30L * 86400))
        .cast("timestamp").as("ts"),
      user.as("user_id"),
      et.as("event_type"),
      (h(15, 100000L).cast("double") / 100.0).as("value"),
      concat(lit("""{"k":"""), h(16, 100), lit("}")).as("props"))
  }

  def orders(spark: SparkSession, n: Long, nCust: Long, skew: Boolean): DataFrame = {
    val cust =
      if (skew)
        // hub: customer 1 owns the first 10^4 orders — a 10^4-degree
        // vertex in the order->customer graph pageRank runs on
        when(col("id") < 10000L, lit(1L)).otherwise(h(20, nCust) + 1)
      else h(20, nCust) + 1
    spark.range(n).select(
      col("id").as("o_orderkey"),
      cust.as("o_custkey"),
      element_at(lit(Array("O", "F", "P")), (h(21, 3) + 1).cast("int"))
        .as("o_orderstatus"),
      (h(22, 1000000L).cast("double") / 100.0).as("o_totalprice"),
      (lit("2024-01-01").cast("timestamp").cast("long") + h(23, 365L * 86400))
        .cast("timestamp").as("o_orderdate"),
      // testdata-shaped priority domain (round 11): the cy_* oracle
      // sweep's `STARTS WITH '1'/'2'` predicates used to select
      // NOTHING on the old "P0".."P4" domain, leaving those entries
      // empty-but-agreeing at 10× — weak evidence. Same 5-way hash
      // split, real values.
      element_at(lit(Array("1-URGENT", "2-HIGH", "3-MEDIUM",
        "4-NOT SPECIFIED", "5-LOW")), (h(24, 5) + 1).cast("int"))
        .as("o_orderpriority"))
  }

  def customer(spark: SparkSession, n: Long): DataFrame =
    spark.range(n).select(
      (col("id") + 1).as("c_custkey"),
      concat(lit("Customer#"), col("id")).as("c_name"),
      h(30, 25).cast("int").as("c_nationkey"),
      (h(31, 1000000L).cast("double") / 100.0).as("c_acctbal"),
      element_at(lit(Array("BUILDING", "MACHINERY", "AUTOMOBILE",
        "HOUSEHOLD", "FURNITURE")), (h(32, 5) + 1).cast("int"))
        .as("c_mktsegment"))

  def nation(spark: SparkSession): DataFrame =
    spark.range(25).select(
      col("id").cast("int").as("n_nationkey"),
      concat(lit("NATION_"), col("id")).as("n_name"),
      h(40, 5).cast("int").as("n_regionkey"))

  def region(spark: SparkSession): DataFrame =
    spark.range(5).select(
      col("id").cast("int").as("r_regionkey"),
      concat(lit("REGION_"), col("id")).as("r_name"))

  def lineitem(spark: SparkSession, n: Long, skew: Boolean): DataFrame = {
    // ~4 lines per order (id div 4); the co-purchase graph pairs parts
    // within an order (l_quantity >= 25 qualifying filter)
    val hot = col("id") % 600 === 0 // 10^4 rows at n = 6M, all distinct orders
    val part =
      if (skew)
        // hub: part 1 on every 600th line, always qualifying — ~10^4
        // edges onto one vertex in the co-purchase graph
        when(hot, lit(1L)).otherwise(h(50, 200000L) + 2)
      else h(50, 200000L) + 2
    val qty =
      if (skew) when(hot, lit(30.0)).otherwise((h(51, 50) + 1).cast("double"))
      else (h(51, 50) + 1).cast("double")
    spark.range(n).select(
      (col("id") / 4).cast("long").as("l_orderkey"),
      part.as("l_partkey"),
      (h(52, 10000L) + 1).as("l_suppkey"),
      (col("id") % 4).cast("int").as("l_linenumber"),
      qty.as("l_quantity"),
      (h(53, 1000000L).cast("double") / 100.0).as("l_extendedprice"),
      (h(54, 10).cast("double") / 100.0).as("l_discount"),
      (h(55, 8).cast("double") / 100.0).as("l_tax"),
      element_at(lit(Array("A", "N", "R")), (h(56, 3) + 1).cast("int"))
        .as("l_returnflag"),
      element_at(lit(Array("O", "F")), (h(57, 2) + 1).cast("int"))
        .as("l_linestatus"),
      (lit("2024-01-01").cast("timestamp").cast("long") + h(58, 365L * 86400))
        .cast("timestamp").as("l_shipdate"))
  }

  /** Part dim covering lineitem's full l_partkey domain (hub key 1 +
    * hash range 2..200001), so part joins never dangle at any mult. */
  def part(spark: SparkSession, n: Long): DataFrame =
    spark.range(n).select(
      (col("id") + 1).as("p_partkey"),
      concat(lit("Part#"), col("id")).as("p_name"),
      concat(lit("Brand#"), h(60, 25)).as("p_brand"),
      concat(lit("TYPE_"), h(61, 6)).as("p_type"),
      (h(62, 50) + 1).cast("int").as("p_size"),
      (h(63, 100000L).cast("double") / 100.0).as("p_retailprice"))

  def generate(spark: SparkSession, outDir: String, skew: Boolean,
               mult: Long): Unit = {
    def w(df: DataFrame, name: String): Unit =
      df.write.mode("overwrite").parquet(s"$outDir/$name.parquet")
    w(documents(spark, 5000 * mult, skew), "documents")
    w(events(spark, 100000 * mult, skew), "events")
    w(orders(spark, 150000 * mult, 15000 * mult, skew), "orders")
    w(customer(spark, 15000 * mult), "customer")
    w(nation(spark), "nation")
    w(region(spark), "region")
    w(lineitem(spark, 600000 * mult, skew), "lineitem")
    w(part(spark, 200001), "part")
  }

  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("/tmp/graft_skew/skew")
    val mode = if (args.length > 1) args(1) else "skew"
    require(mode == "skew" || mode == "uniform", s"mode $mode")
    val mult = if (args.length > 2) args(2).toLong else 10L
    val spark = GraftSession.getOrCreate()
    generate(spark, outDir, mode == "skew", mult)
    println(s"""{"fixture":"$outDir","mode":"$mode","multiplier":$mult}""")
    spark.stop()
  }
}
