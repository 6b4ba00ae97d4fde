package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.pgwire.{PgWire, PgWireLoopbackServer}

/** The pgwire-v3 source end to end: codec round-trips, the DSv2 read
  * path over genuine TCP loopback sockets, and the flagship
  * assertions — pruned columns and pushed predicates VISIBLE in the
  * wire recording, range-partitioned reads opening one socket per
  * partition, residual (unpushable) filters still correct, and
  * server errors surfacing as reader failures.
  */
class PgWireSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def fixtureTables = Map("people" ->
    PgWireLoopbackServer.Table(
      Seq(("id", PgWire.OidInt8), ("score", PgWire.OidFloat8),
        ("name", PgWire.OidText)),
      (0L until 100L).map { i =>
        Array[Any](
          java.lang.Long.valueOf(i),
          if (i % 10 == 0) null else java.lang.Double.valueOf(i * 1.5),
          if (i % 7 == 0) null else s"name_${i % 5}")
      }))

  private def read(srv: PgWireLoopbackServer) =
    spark.read.format("pgwire")
      .option("host", srv.host).option("port", srv.port.toString)
      .option("table", "people")

  test("codec: startup, row description, and data rows round-trip " +
      "(nulls included)") {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    PgWire.writeStartup(out, Map("user" -> "graft", "database" -> "db'x"))
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bos.toByteArray))
    assert(PgWire.readStartup(in) ==
      Map("user" -> "graft", "database" -> "db'x"))

    val bos2 = new java.io.ByteArrayOutputStream()
    val out2 = new java.io.DataOutputStream(bos2)
    val fields = Seq(PgWire.Field("a", PgWire.OidInt8),
      PgWire.Field("b", PgWire.OidText))
    PgWire.writeRowDescription(out2, fields)
    PgWire.writeDataRow(out2, Seq("42", null))
    val in2 = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bos2.toByteArray))
    val t = PgWire.readMsg(in2)
    assert(t.tag.toChar == 'T' && PgWire.parseRowDescription(t.body) == fields)
    val d = PgWire.readMsg(in2)
    assert(d.tag.toChar == 'D' &&
      PgWire.parseDataRow(d.body).toSeq == Seq("42", null))
  }

  test("filtered pruned scan: predicates and projection cross the wire, " +
      "and the server applies them") {
    val srv = new PgWireLoopbackServer(fixtureTables)
    try {
      import org.apache.spark.sql.functions._
      val rows = read(srv).load()
        .filter(col("score") > lit(30.0) && col("name") === "name_2")
        .select(col("id"), col("score"))
        .collect()
      // truth: i*1.5 > 30 (i > 20, i % 10 != 0), name_2 → i % 5 == 2,
      // i % 7 != 0
      val expect = (0L until 100L)
        .filter(i => i % 10 != 0 && i * 1.5 > 30.0)
        .filter(i => i % 7 != 0 && i % 5 == 2)
      assert(rows.map(_.getLong(0)).sorted.toSeq == expect)
      assert(rows.forall(r => r.getDouble(1) == r.getLong(0) * 1.5))
      // the wire recording proves WHAT was pushed: the data query
      // must carry both predicates and only the pruned column list
      val dataQueries = srv.recordedStatements.filterNot(_.contains("LIMIT 0"))
      assert(dataQueries.nonEmpty)
      dataQueries.foreach { q =>
        assert(q.startsWith("SELECT id, score FROM people"), q)
        assert(q.contains("score > 30.0"), q)
        assert(q.contains("name = 'name_2'"), q)
      }
    } finally srv.close()
  }

  test("range-partitioned read: one socket and one range clause per " +
      "partition, rows exactly once") {
    val srv = new PgWireLoopbackServer(fixtureTables)
    try {
      val df = read(srv)
        .option("partitionColumn", "id")
        .option("numPartitions", "4")
        .option("lowerBound", "0").option("upperBound", "99")
        .load()
        .select("id")
      assert(df.rdd.getNumPartitions == 4)
      val ids = df.collect().map(_.getLong(0)).sorted.toSeq
      assert(ids == (0L until 100L)) // no dup, no loss across ranges
      val dataQueries = srv.recordedStatements.filterNot(_.contains("LIMIT 0"))
      assert(dataQueries.length == 4)
      assert(dataQueries.count(_.contains("id >= ")) == 3)
      assert(dataQueries.count(_.contains("id < ")) == 3)
      // 1 schema-inference connection + 4 partition readers
      assert(srv.connections.get == 5)
    } finally srv.close()
  }

  test("unpushable filters stay residual and results remain correct") {
    val srv = new PgWireLoopbackServer(fixtureTables)
    try {
      import org.apache.spark.sql.functions._
      // endsWith does not render to the wire subset → Spark evaluates
      // it post-scan; IsNotNull still pushes
      val rows = read(srv).load()
        .filter(col("name").endsWith("_3"))
        .select(col("id"))
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(rows == (0L until 100L).filter(i => i % 7 != 0 && i % 5 == 3))
      val dataQueries = srv.recordedStatements.filterNot(_.contains("LIMIT 0"))
      dataQueries.foreach { q =>
        assert(!q.toLowerCase.contains("endswith") && !q.contains("_3'"), q)
        assert(q.contains("name IS NOT NULL"), q)
      }
    } finally srv.close()
  }

  test("aggregate pushdown: GROUP BY + COUNT/SUM/MIN/MAX ship as ONE " +
      "wire query returning the answer, not the table") {
    val srv = new PgWireLoopbackServer(fixtureTables)
    try {
      import org.apache.spark.sql.functions._
      val got = read(srv).load()
        .filter(col("score") > lit(10.0))
        .groupBy(col("name"))
        .agg(count(lit(1)).as("n"), sum(col("id")).as("sum_id"),
          min(col("score")).as("min_s"), max(col("score")).as("max_s"))
        .collect()
        .map(r => (Option(r.getString(0)), r.getLong(1), r.getLong(2),
          r.getDouble(3), r.getDouble(4)))
        .sortBy(_._1.getOrElse(""))
      // truth from the fixture generator: score=i*1.5 (null at i%10==0),
      // name=name_{i%5} (null at i%7==0)
      val data = (0L until 100L)
        .filter(i => i % 10 != 0 && i * 1.5 > 10.0)
        .map(i => (if (i % 7 == 0) None else Some(s"name_${i % 5}"), i))
      val expect = data.groupBy(_._1).toSeq.map { case (name, rs) =>
        val ids = rs.map(_._2)
        (name, ids.size.toLong, ids.sum,
          ids.map(_ * 1.5).min, ids.map(_ * 1.5).max)
      }.sortBy(_._1.getOrElse(""))
      assert(got.toSeq == expect)
      // the wire saw ONE grouped query (group-count rows), never the table
      val dataQueries = srv.recordedStatements.filterNot(_.contains("LIMIT 0"))
      assert(dataQueries.length == 1, dataQueries)
      val q = dataQueries.head
      assert(q.contains("GROUP BY name"), q)
      assert(q.contains("COUNT(*) AS agg_0"), q)
      assert(q.contains("SUM(id) AS agg_1"), q)
      assert(q.contains("MIN(score) AS agg_2"), q)
      assert(q.contains("MAX(score) AS agg_3"), q)
      assert(q.contains("score > 10.0"), q)
    } finally srv.close()
  }

  test("limit pushdown: LIMIT crosses the wire; striped scans stay " +
      "partial so the global limit holds") {
    val srv = new PgWireLoopbackServer(fixtureTables)
    try {
      val single = read(srv).load().select("id").limit(7).collect()
      assert(single.length == 7)
      assert(srv.recordedStatements.exists(_.endsWith("LIMIT 7")))
      val striped = read(srv)
        .option("partitionColumn", "id")
        .option("numPartitions", "4")
        .option("lowerBound", "0").option("upperBound", "99")
        .load().select("id").limit(7).collect()
      // 4 partitions each LIMIT 7 on the wire, but exactly 7 survive
      assert(striped.length == 7)
      val stripedQs = srv.recordedStatements
        .filter(q => q.contains("id >= ") || q.contains("id < "))
      assert(stripedQs.nonEmpty && stripedQs.forall(_.endsWith("LIMIT 7")),
        stripedQs)
    } finally srv.close()
  }

  test("server errors surface: unknown table fails the read") {
    val srv = new PgWireLoopbackServer(fixtureTables)
    try {
      val e = intercept[Exception] {
        spark.read.format("pgwire")
          .option("host", srv.host).option("port", srv.port.toString)
          .option("table", "nope").load().collect()
      }
      def chain(t: Throwable): List[Throwable] =
        if (t == null) Nil else t :: chain(t.getCause)
      assert(chain(e).exists(t =>
        String.valueOf(t.getMessage).contains("unknown table")))
    } finally srv.close()
  }

  test("s1_pgwire_scan matches the plain parquet replay") {
    val dir = "/root/testdata/sf0.001"
    import org.apache.spark.sql.functions._
    val got = SparkEntry.queries("s1_pgwire_scan")(spark, dir).collect()
    val want = graft.sources.Tables.read(spark, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING" &&
        col("c_acctbal") > lit(1000.0))
      .select(col("c_custkey"), col("c_nationkey").cast("long"),
        col("c_acctbal").cast("double"))
      .orderBy(col("c_custkey"))
      .collect()
    assert(got.length == want.length && got.nonEmpty)
    got.zip(want).foreach { case (g, w) => assert(g == w) }
    graft.operators.CacheScope.global.release()
  }
}
