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

  test("COPY text codec: escapes and the null sentinel round-trip") {
    val nasty = Seq(
      Seq("plain", null, ""),
      Seq("tab\there", "line\nbreak", "back\\slash"),
      Seq("\\N", "cr\rchar", "unié中"),
      Seq("N", "\t\n\\", null))
    nasty.foreach { row =>
      val line = PgWire.copyEncodeRow(row)
      assert(line.endsWith("\n"))
      // encoded form carries no raw tab/newline inside cells: the only
      // raw tabs are separators, the only raw newline the terminator
      assert(line.dropRight(1).count(_ == '\t') == row.length - 1)
      assert(!line.dropRight(1).contains('\n'))
      assert(PgWire.copyDecodeLine(line.dropRight(1)).toSeq == row)
    }
    // empty string and null are DISTINCT through the format
    assert(PgWire.copyDecodeLine(PgWire.copyEncodeRow(
      Seq("", null)).dropRight(1)).toSeq == Seq("", null))
  }

  test("distributed COPY: 4 partitions stream 4 concurrent statements; " +
      "nulls, escapes, and types land byte-exact in the store") {
    val srv = new PgWireLoopbackServer(Map.empty)
    try {
      srv.defineTable("sink_t", Seq(("k", PgWire.OidInt8),
        ("v", PgWire.OidFloat8), ("s", PgWire.OidText)))
      import spark.implicits._
      val data = (0L until 200L).map { i =>
        (i,
          if (i % 9 == 0) None else Some(i * 0.25),
          if (i % 11 == 0) None
          else Some(s"s\t$i\n\\${i % 3}")) // hostile: tab+newline+backslash
      }
      val df = data.toDF("k", "v", "s")
        .selectExpr("k", "v", "s").repartition(4)
      graft.sources.pgwire.PgWireCopySink.copyTo(
        df, srv.host, srv.port, "sink_t")
      assert(srv.rowCount("sink_t") == 200)
      val copies = srv.recordedStatements.filter(_.startsWith("COPY"))
      assert(copies.length == 4 &&
        copies.forall(_ == "COPY sink_t (k, v, s) FROM STDIN"), copies)
      assert(srv.connections.get == 4)
      // read back over the wire and compare cell-exact
      val got = spark.read.format("pgwire")
        .option("host", srv.host).option("port", srv.port.toString)
        .option("table", "sink_t").load()
        .collect()
        .map(r => (r.getLong(0),
          if (r.isNullAt(1)) None else Some(r.getDouble(1)),
          if (r.isNullAt(2)) None else Some(r.getString(2))))
        .sortBy(_._1).toSeq
      assert(got == data)
    } finally srv.close()
  }

  test("COPY is all-or-nothing: a malformed cell rejects the whole " +
      "statement and the store stays empty") {
    val srv = new PgWireLoopbackServer(Map.empty)
    try {
      srv.defineTable("strict_t", Seq(("k", PgWire.OidInt8)))
      import spark.implicits._
      // text cells into an int8 column: the server's Long parse fails
      // on the non-numeric row AFTER valid ones were seen in-stream
      val df = Seq("1", "2", "not_a_number", "4").toDF("k").coalesce(1)
      val e = intercept[Exception] {
        graft.sources.pgwire.PgWireCopySink.copyTo(
          df, srv.host, srv.port, "strict_t")
      }
      def chain(t: Throwable): List[Throwable] =
        if (t == null) Nil else t :: chain(t.getCause)
      assert(chain(e).exists(t =>
        String.valueOf(t.getMessage).contains("COPY failed")))
      assert(srv.rowCount("strict_t") == 0) // valid rows did NOT splice in
    } finally srv.close()
  }

  test("COPY to an unknown table is rejected at the wire") {
    val srv = new PgWireLoopbackServer(Map.empty)
    try {
      import spark.implicits._
      val e = intercept[Exception] {
        graft.sources.pgwire.PgWireCopySink.copyTo(
          Seq(1L).toDF("k").coalesce(1), srv.host, srv.port, "nope")
      }
      def chain(t: Throwable): List[Throwable] =
        if (t == null) Nil else t :: chain(t.getCause)
      assert(chain(e).exists(t =>
        String.valueOf(t.getMessage).contains("unknown COPY table")))
    } finally srv.close()
  }

  test("unsupported column types are rejected on the driver at plan time") {
    import spark.implicits._
    val df = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
      .toDF("k", "ts")
    val srv = new PgWireLoopbackServer(Map.empty)
    try {
      srv.defineTable("t2", Seq(("k", PgWire.OidInt8)))
      val e = intercept[IllegalArgumentException] {
        graft.sources.pgwire.PgWireCopySink.copyTo(
          df, srv.host, srv.port, "t2")
      }
      assert(e.getMessage.contains("cast to long/double/string first"))
      assert(srv.connections.get == 0) // rejected before any socket
    } finally srv.close()
  }

  test("streaming COPY: 4 micro-batches land in 4 per-batch tables; " +
      "union equals the batch replay; replay is idempotent") {
    val srv = new PgWireLoopbackServer(Map.empty)
    val dir = java.nio.file.Files
      .createTempDirectory("stream_pgcopy").toString
    try {
      val orders = graft.sources.Tables
        .read(spark, "/root/testdata/sf0.001", "orders")
      orders.repartition(4).write.mode("overwrite").parquet(dir)
      val total = orders.count()
      val cols = Seq(
        ("o_orderkey", PgWire.OidInt8), ("o_custkey", PgWire.OidInt8),
        ("cents", PgWire.OidInt8), ("priority", PgWire.OidText))
      def runOnce() = graft.streaming.StreamingPgCopy.runOnce(
        graft.streaming.StreamingPgCopy.ordersFeed(
          spark, dir, maxFilesPerTrigger = Some(1)),
        srv.host, srv.port, "ord_s", t => srv.defineTable(t, cols))
      val tables = runOnce()
      assert(tables.length == 4 &&
        tables == (0 until 4).map(i => s"ord_s_b$i"))
      assert(tables.map(srv.rowCount).sum == total)
      // a full REPLAY (fresh stream, same batch ids from scratch)
      // truncates and re-lands every batch table: same store after
      val again = runOnce()
      assert(again == tables)
      assert(tables.map(srv.rowCount).sum == total)
      // union across batch tables == direct batch aggregate
      import org.apache.spark.sql.functions._
      val got = tables.map { t =>
          spark.read.format("pgwire")
            .option("host", srv.host).option("port", srv.port.toString)
            .option("table", t).load()
        }.reduce(_ unionByName _)
        .agg(count(lit(1)).as("n"), sum("cents").as("c")).collect()(0)
      val want = orders
        .agg(count(lit(1)).as("n"),
          sum((col("o_totalprice").cast("decimal(27,2)") * 100)
            .cast("long")).as("c")).collect()(0)
      assert(got == want)
    } finally {
      srv.close()
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
      ()
    }
  }

  test("stream_pgwire_copy matches the plain parquet replay") {
    val dir = "/root/testdata/sf0.001"
    import org.apache.spark.sql.functions._
    val got = SparkEntry.queries("stream_pgwire_copy")(spark, dir)
      .collect()
    val want = graft.sources.Tables.read(spark, dir, "orders")
      .groupBy(col("o_orderpriority").as("priority"))
      .agg(count(lit(1)).as("n_orders"),
        sum((col("o_totalprice").cast("decimal(27,2)") * 100).cast("long"))
          .as("sum_cents"))
      .orderBy(col("priority"))
      .collect()
    assert(got.length == want.length && got.nonEmpty)
    got.zip(want).foreach { case (g, w) => assert(g == w) }
    graft.operators.CacheScope.global.release()
  }

  test("s1_pgwire_copy_roundtrip matches the plain parquet replay") {
    val dir = "/root/testdata/sf0.001"
    import org.apache.spark.sql.functions._
    val got = SparkEntry.queries("s1_pgwire_copy_roundtrip")(spark, dir)
      .collect()
    val want = graft.sources.Tables.read(spark, dir, "orders")
      .groupBy(col("o_orderpriority").as("priority"))
      .agg(count(lit(1)).as("n_orders"),
        sum((col("o_totalprice").cast("decimal(27,2)") * 100).cast("long"))
          .as("sum_cents"))
      .orderBy(col("priority"))
      .collect()
    assert(got.length == want.length && got.nonEmpty)
    got.zip(want).foreach { case (g, w) => assert(g == w) }
    graft.operators.CacheScope.global.release()
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

  // ---- extended-query protocol (Parse/Bind/Describe/Execute/Sync) ----

  test("binary cell codec: int8/float8 round-trip at the edges; mixed " +
      "text/binary rows carry nulls") {
    Seq(0L, 1L, -1L, Long.MaxValue, Long.MinValue, 1234567890123L).foreach {
      v => assert(PgWire.binToInt8(PgWire.binInt8(v)) == v) }
    Seq(0.0, -0.0, 1.5, -273.15, Double.MaxValue, Double.MinPositiveValue,
        Double.PositiveInfinity, Double.NegativeInfinity).foreach { v =>
      assert(PgWire.binToFloat8(PgWire.binFloat8(v)) == v) }
    assert(java.lang.Double.isNaN(
      PgWire.binToFloat8(PgWire.binFloat8(Double.NaN))))
    // encodeCell/decodeCell agree in both formats
    assert(PgWire.decodeCell(PgWire.encodeCell(42L, PgWire.OidInt8, 1),
      PgWire.OidInt8, 1) == 42L)
    assert(PgWire.decodeCell(PgWire.encodeCell(42L, PgWire.OidInt8, 0),
      PgWire.OidInt8, 0) == 42L)
    assert(PgWire.decodeCell(PgWire.encodeCell("héllo", PgWire.OidText, 1),
      PgWire.OidText, 1) == "héllo")
    // a mixed-format DataRow with a null round-trips raw
    val bos = new java.io.ByteArrayOutputStream()
    PgWire.writeDataRowRaw(new java.io.DataOutputStream(bos),
      Seq(PgWire.binInt8(7L), null, "x".getBytes("UTF-8")))
    val m = PgWire.readMsg(new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bos.toByteArray)))
    val cells = PgWire.parseDataRowRaw(m.body)
    assert(PgWire.binToInt8(cells(0)) == 7L && cells(1) == null &&
      new String(cells(2), "UTF-8") == "x")
  }

  test("extended message codec: Parse/Bind/Describe/Execute round-trip") {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    PgWire.writeParse(out, "s1", "SELECT id FROM people WHERE id > $1",
      Seq(PgWire.OidInt8))
    PgWire.writeBind(out, "p1", "s1", Seq(1), Seq(PgWire.binInt8(5L), null),
      Seq(1, 0))
    PgWire.writeDescribe(out, 'P', "p1")
    PgWire.writeExecute(out, "p1", 25)
    PgWire.writeSync(out)
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bos.toByteArray))
    val p = PgWire.readMsg(in)
    assert(p.tag.toChar == 'P' && PgWire.parseParse(p.body) ==
      (("s1", "SELECT id FROM people WHERE id > $1", Seq(PgWire.OidInt8))))
    val b = PgWire.readMsg(in)
    val (portal, stmt, pf, params, rf) = PgWire.parseBind(b.body)
    assert(b.tag.toChar == 'B' && portal == "p1" && stmt == "s1" &&
      pf == Seq(1) && PgWire.binToInt8(params.head) == 5L &&
      params(1) == null && rf == Seq(1, 0))
    val d = PgWire.readMsg(in)
    assert(d.tag.toChar == 'D' && PgWire.parseDescribe(d.body) == (('P', "p1")))
    val e = PgWire.readMsg(in)
    assert(e.tag.toChar == 'E' && PgWire.parseExecute(e.body) == (("p1", 25)))
    assert(PgWire.readMsg(in).tag.toChar == 'S')
  }

  test("extended-protocol scan: values ride as bound parameters (no " +
      "literal in any SQL), numeric cells return binary, results equal " +
      "the simple-protocol read") {
    import org.apache.spark.sql.functions._
    def run(protocol: String, srv: PgWireLoopbackServer) =
      read(srv).option("protocol", protocol)
        .option("partitionColumn", "id")
        .option("numPartitions", "3")
        .option("lowerBound", "0").option("upperBound", "99")
        .load()
        .filter(col("score") > lit(30.0) && col("name") === "name_2")
        .select(col("id"), col("score"))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).sorted.toSeq
    val srvS = new PgWireLoopbackServer(fixtureTables)
    val simple = try run("simple", srvS) finally srvS.close()
    val srv = new PgWireLoopbackServer(fixtureTables)
    try {
      val ext = run("extended", srv)
      assert(ext == simple && ext.nonEmpty)
      val parametrized = srv.recordedStatements.filter(_.contains(" WHERE "))
      assert(parametrized.length == 3) // one Parse per range partition
      parametrized.foreach { q =>
        assert(q.contains("$1") && q.contains("$2"), q)
        assert(!q.contains("30.0") && !q.contains("name_2"), q)
        assert(q.startsWith("SELECT id, score FROM people"), q)
      }
      // every Bind carried the filter values and asked binary results
      val binds = srv.recordedBinds
      assert(binds.length == 3)
      binds.foreach { case (sql, params, rFormats) =>
        assert(sql.contains("$1"))
        assert(params.contains(30.0) && params.contains("name_2"), params)
        assert(rFormats == Seq(1, 1), rFormats) // id, score both binary
      }
      // range-cut bounds are parameters too: the middle stripe binds 4
      assert(binds.map(_._2.length).sorted == Seq(3, 3, 4))
    } finally srv.close()
  }

  test("portal suspension: Execute with maxRows pages through the " +
      "result like a JDBC fetchSize cursor") {
    val srv = new PgWireLoopbackServer(fixtureTables)
    val sock = new java.net.Socket(srv.host, srv.port)
    try {
      sock.setTcpNoDelay(true)
      val in = new java.io.DataInputStream(
        new java.io.BufferedInputStream(sock.getInputStream))
      val out = new java.io.DataOutputStream(
        new java.io.BufferedOutputStream(sock.getOutputStream))
      PgWire.writeStartup(out, Map("user" -> "t"))
      var m = PgWire.readMsg(in)
      while (m.tag.toChar != 'Z') m = PgWire.readMsg(in)
      PgWire.writeParse(out, "", "SELECT id FROM people WHERE id >= $1",
        Seq(PgWire.OidInt8))
      PgWire.writeBind(out, "", "", Seq(1), Seq(PgWire.binInt8(40L)), Seq(1))
      PgWire.writeDescribe(out, 'P', "")
      var ids = Seq.empty[Long]
      var finished = false
      var executes = 0
      while (!finished) {
        PgWire.writeExecute(out, "", 25) // 60 rows → 25 + 25 + 10
        executes += 1
        var burst = true
        while (burst) {
          val msg = PgWire.readMsg(in)
          msg.tag.toChar match {
            case 'D' =>
              ids :+= PgWire.binToInt8(PgWire.parseDataRowRaw(msg.body)(0))
            case 's' => burst = false // PortalSuspended: more remains
            case 'C' => burst = false; finished = true
            case '1' | '2' | 'T' => ()
            case other => fail(s"unexpected tag '$other'")
          }
        }
      }
      PgWire.writeSync(out)
      assert(PgWire.readMsg(in).tag.toChar == 'Z')
      assert(executes == 3)
      assert(ids == (40L until 100L))
    } finally { sock.close(); srv.close() }
  }

  test("extended-protocol errors poison the pipeline until Sync, then " +
      "the connection recovers; NULL parameters compare to nothing") {
    val srv = new PgWireLoopbackServer(fixtureTables)
    val sock = new java.net.Socket(srv.host, srv.port)
    try {
      sock.setTcpNoDelay(true)
      val in = new java.io.DataInputStream(
        new java.io.BufferedInputStream(sock.getInputStream))
      val out = new java.io.DataOutputStream(
        new java.io.BufferedOutputStream(sock.getOutputStream))
      PgWire.writeStartup(out, Map("user" -> "t"))
      var m = PgWire.readMsg(in)
      while (m.tag.toChar != 'Z') m = PgWire.readMsg(in)
      // bind to a statement that was never parsed → error; the queued
      // Execute is SKIPPED (no rows, no CommandComplete) until Sync
      PgWire.writeBind(out, "", "nope", Nil, Nil, Nil)
      PgWire.writeExecute(out, "", 0)
      PgWire.writeSync(out)
      assert(PgWire.readMsg(in).tag.toChar == 'E')
      assert(PgWire.readMsg(in).tag.toChar == 'Z') // straight to ReadyForQuery
      // connection recovers: NULL param → three-valued logic, 0 rows
      PgWire.writeParse(out, "", "SELECT id FROM people WHERE score > $1",
        Seq(PgWire.OidFloat8))
      PgWire.writeBind(out, "", "", Seq(1), Seq(null), Seq(0))
      PgWire.writeDescribe(out, 'P', "")
      PgWire.writeExecute(out, "", 0)
      PgWire.writeSync(out)
      var rows = 0
      var done = false
      while (!done) {
        val msg = PgWire.readMsg(in)
        msg.tag.toChar match {
          case 'D' => rows += 1
          case 'Z' => done = true
          case 'E' => fail("recovered pipeline errored: " +
            PgWire.parseError(msg.body))
          case _ => ()
        }
      }
      assert(rows == 0)
    } finally { sock.close(); srv.close() }
  }

  // ---- SCRAM-SHA-256 authentication ----

  test("SCRAM-SHA-256 matches the RFC 7677 published test vector") {
    import graft.sources.pgwire.Scram
    // RFC 7677 §3: user "user", password "pencil", the fixed nonces
    val clientFirst = "n,,n=user,r=rOprNGfwEbeRWgbNEkqO"
    val serverFirst = "r=rOprNGfwEbeRWgbNEkqO%hvYDpWUa2RaTCAfuxFIlj)hNlF$k0," +
      "s=W22ZaJ0SNY7soEsUEjb6gQ==,i=4096"
    val (fullNonce, salt, iterations) = Scram.parseServerFirst(serverFirst)
    assert(iterations == 4096)
    val authMsg = Scram.authMessage(
      Scram.clientFirstBare(clientFirst), serverFirst, fullNonce)
    val proof = Scram.clientProof("pencil", salt, iterations, authMsg)
    assert(Scram.b64(proof) == "dHzbZapWIk4jUhN+Ute9ytag9zjfMHgsqmmiz7AndVQ=")
    val verifier = Scram.deriveVerifier("pencil", salt, iterations)
    assert(Scram.verifyProof(verifier, authMsg, proof))
    assert(Scram.b64(Scram.serverSignature(verifier, authMsg)) ==
      "6rriTRBi23WpRR/wtup+mMhUZUn/dB5nLTJRsjl95G4=")
    // and the negative: one flipped password character kills the proof
    assert(!Scram.verifyProof(verifier, authMsg,
      Scram.clientProof("pencil2", salt, iterations, authMsg)))
    // mutual-auth property: a server without the right verifier cannot
    // forge the v= signature the client checks
    val impostor = Scram.deriveVerifier("not-pencil", salt, iterations)
    assert(!java.security.MessageDigest.isEqual(
      Scram.serverSignature(impostor, authMsg),
      Scram.serverSignatureFromPassword("pencil", salt, iterations, authMsg)))
    // RFC 5802 username escaping round-trips
    assert(Scram.unescape(Scram.escape("we=ird,user")) == "we=ird,user")
    assert(!Scram.escape("we=ird,user").contains(","))
  }

  test("authenticated scan: SCRAM succeeds with the right password, " +
      "rejects the wrong one, and matches the trusted read") {
    import org.apache.spark.sql.functions._
    val trusted = {
      val srv = new PgWireLoopbackServer(fixtureTables)
      try read(srv).load().filter(col("id") < 50)
        .collect().map(_.toSeq).toSeq
      finally srv.close()
    }
    val srv = new PgWireLoopbackServer(fixtureTables)
    srv.requireAuth("alice", "correct horse battery")
    try {
      def rd(user: String, pw: String) =
        read(srv).option("user", user).option("password", pw)
          .option("partitionColumn", "id")
          .option("numPartitions", "2")
          .option("lowerBound", "0").option("upperBound", "99")
          .load().filter(col("id") < 50)
      val got = rd("alice", "correct horse battery")
        .collect().map(_.toSeq).toSeq
      assert(got.sortBy(_.head.asInstanceOf[Long]) ==
        trusted.sortBy(_.head.asInstanceOf[Long]))
      // schema-inference + 2 partition sockets all authenticated
      assert(srv.authAttempts.size >= 3)
      srv.authAttempts.forEach(a => assert(a == (("alice", true))))
      val bad = intercept[Exception] { rd("alice", "wrong").collect() }
      val msgs = Iterator.iterate(bad: Throwable)(_.getCause)
        .takeWhile(_ != null).take(10)
        .flatMap(t => Option(t.getMessage)).mkString("; ")
      assert(msgs.contains("authentication failed"), msgs)
      val missing = intercept[Exception] {
        read(srv).load().collect() // no password configured at all
      }
      val msgs2 = Iterator.iterate(missing: Throwable)(_.getCause)
        .takeWhile(_ != null).take(10)
        .flatMap(t => Option(t.getMessage)).mkString("; ")
      assert(msgs2.contains("SCRAM-SHA-256"), msgs2)
    } finally srv.close()
  }

  test("s1_pgwire_scram matches the plain parquet replay") {
    val dir = "/root/testdata/sf0.001"
    import org.apache.spark.sql.functions._
    val got = SparkEntry.queries("s1_pgwire_scram")(spark, dir).collect()
    val want = graft.sources.Tables.read(spark, dir, "customer")
      .filter(col("c_acctbal") >= lit(9000.0))
      .select(col("c_custkey"), col("c_mktsegment"),
        col("c_acctbal").cast("double"))
      .orderBy(col("c_custkey"))
      .collect()
    assert(got.length == want.length && got.nonEmpty)
    got.zip(want).foreach { case (g, w) => assert(g == w) }
    graft.operators.CacheScope.global.release()
  }

  test("s1_pgwire_extended matches the plain parquet replay") {
    val dir = "/root/testdata/sf0.001"
    import org.apache.spark.sql.functions._
    val got = SparkEntry.queries("s1_pgwire_extended")(spark, dir).collect()
    val want = graft.sources.Tables.read(spark, dir, "customer")
      .filter(col("c_mktsegment") === "MACHINERY" &&
        col("c_acctbal") < lit(5000.0))
      .select(col("c_custkey"), col("c_nationkey").cast("long"),
        col("c_acctbal").cast("double"))
      .orderBy(col("c_custkey"))
      .collect()
    assert(got.length == want.length && got.nonEmpty)
    got.zip(want).foreach { case (g, w) => assert(g == w) }
    graft.operators.CacheScope.global.release()
  }

  test("SparkSqlPgServer answers SSLRequest with 'N' then serves (libpq)") {
    import graft.sources.pgwire.SparkSqlPgServer
    import spark.implicits._
    Seq((1, "x")).toDF("k", "s").createOrReplaceTempView("pg_ssl_t")
    val srv = new SparkSqlPgServer(spark)
    try {
      // bytes-level client doing what unmodified libpq does: SSLRequest
      // first, expect a single 'N', then the real startup
      val sock = new java.net.Socket(srv.host, srv.port)
      try {
        val out = new java.io.DataOutputStream(sock.getOutputStream)
        val in = new java.io.DataInputStream(sock.getInputStream)
        out.writeInt(8); out.writeInt(80877103); out.flush() // SSLRequest
        assert(in.read() == 'N'.toInt)
        PgWire.writeStartup(out, Map("user" -> "u", "database" -> "d"))
        var m = PgWire.readMsg(in)
        while (m.tag.toChar != 'Z') m = PgWire.readMsg(in)
        PgWire.writeQuery(out, "SELECT COUNT(*) AS n FROM pg_ssl_t")
        out.flush()
        val rows = scala.collection.mutable.ArrayBuffer.empty[String]
        m = PgWire.readMsg(in)
        while (m.tag.toChar != 'Z') {
          if (m.tag.toChar == 'D') rows += PgWire.parseDataRow(m.body)(0)
          m = PgWire.readMsg(in)
        }
        assert(rows.toSeq == Seq("1"))
      } finally sock.close()
    } finally srv.close()
  }

  test("SparkSqlPgServer: SCRAM demanded, wrong password refused") {
    import graft.sources.pgwire.{Scram, SparkSqlPgServer}
    import spark.implicits._
    Seq((1, "x")).toDF("k", "s").createOrReplaceTempView("pg_scram_t")
    val salt = Array.tabulate[Byte](16)(i => (i * 11 + 1).toByte)
    val srv = new SparkSqlPgServer(spark,
      Map("u1" -> Scram.deriveVerifier("pw1", salt, 4096)))
    try {
      val (_, rows) = SparkSqlPgServer.simpleQuery(srv.host, srv.port,
        "SELECT COUNT(*) AS n FROM pg_scram_t",
        user = "u1", password = Some("pw1"))
      assert(rows.map(_.toSeq) == Seq(Seq("1")))
      val bad = intercept[java.io.IOException](
        SparkSqlPgServer.simpleQuery(srv.host, srv.port,
          "SELECT 1 AS x", user = "u1", password = Some("wrong")))
      assert(bad.getMessage.contains("auth"))
      val noUser = intercept[java.io.IOException](
        SparkSqlPgServer.simpleQuery(srv.host, srv.port,
          "SELECT 1 AS x", user = "ghost", password = Some("pw1")))
      assert(noUser.getMessage.contains("auth"))
    } finally srv.close()
  }

  test("SparkSqlPgServer: SQL over the wire, errors keep the connection") {
    import graft.sources.pgwire.SparkSqlPgServer
    import spark.implicits._
    Seq((1, "a", 2.5), (2, "b", 1.0), (3, "a", 4.0))
      .toDF("k", "grp", "v").createOrReplaceTempView("pg_sql_t")
    val srv = new SparkSqlPgServer(spark)
    try {
      val (fields, rows) = SparkSqlPgServer.simpleQuery(srv.host, srv.port,
        "SELECT grp, COUNT(*) AS n, SUM(v) AS s FROM pg_sql_t GROUP BY 1 ORDER BY 1")
      assert(fields.map(_.name) == Seq("grp", "n", "s"))
      // OIDs from the Spark schema: text, int8, float8
      assert(fields.map(_.oid) == Seq(25, 20, 701))
      assert(rows.map(_.toSeq) ==
        Seq(Seq("a", "2", "6.5"), Seq("b", "1", "1.0")))
      // a bad statement is an ErrorResponse, not a dead socket — and
      // the SAME server keeps answering fresh connections
      val e = intercept[IllegalStateException](
        SparkSqlPgServer.simpleQuery(srv.host, srv.port,
          "SELECT definitely_not_a_column FROM pg_sql_t"))
      assert(e.getMessage.contains("server error"))
      val (_, again) = SparkSqlPgServer.simpleQuery(srv.host, srv.port,
        "SELECT COUNT(*) AS n FROM pg_sql_t")
      assert(again.map(_.toSeq) == Seq(Seq("3")))
    } finally srv.close()
  }

  test("SparkSqlPgServer is read-only: DDL/DML rejected before execution") {
    import graft.sources.pgwire.SparkSqlPgServer
    import spark.implicits._
    Seq((1, "a")).toDF("k", "s").createOrReplaceTempView("pg_ro_t")
    val srv = new SparkSqlPgServer(spark)
    try {
      // commands and INSERTs are refused with SQLSTATE 25006 and the
      // session state they would have mutated is untouched
      Seq(
        "DROP VIEW pg_ro_t",
        "CREATE TABLE pg_ro_mk AS SELECT 1 AS x",
        "SET spark.sql.shuffle.partitions=1",
        "CACHE TABLE pg_ro_t",
        "INSERT INTO pg_ro_t VALUES (9, 'z')",
      ).foreach { stmt =>
        val e = intercept[IllegalStateException](
          SparkSqlPgServer.simpleQuery(srv.host, srv.port, stmt))
        assert(e.getMessage.contains("25006") ||
               e.getMessage.contains("read-only"), s"$stmt → ${e.getMessage}")
      }
      // the view survived the DROP attempt; plain queries still serve
      val (_, rows) = SparkSqlPgServer.simpleQuery(srv.host, srv.port,
        "SELECT COUNT(*) AS n FROM pg_ro_t")
      assert(rows.map(_.toSeq) == Seq(Seq("1")))
      // ...and the gate is a policy, not a capability hole: the
      // allowWrites constructor flag restores full spark.sql
      val rw = new SparkSqlPgServer(spark, allowWrites = true)
      try {
        SparkSqlPgServer.simpleQuery(rw.host, rw.port,
          "CREATE OR REPLACE TEMP VIEW pg_ro_mk AS SELECT 1 AS x")
        val (_, r2) = SparkSqlPgServer.simpleQuery(rw.host, rw.port,
          "SELECT x FROM pg_ro_mk")
        assert(r2.map(_.toSeq) == Seq(Seq("1")))
      } finally rw.close()
    } finally srv.close()
  }

  test("SparkSqlPgServer routes CYPHER statements to the graph") {
    import graft.sources.pgwire.SparkSqlPgServer
    import org.apache.spark.sql.functions.lit
    import spark.implicits._
    val g = graft.cypher.PropertyGraph(
      Seq(("Person:1", "Person", Map("name" -> "ann")),
          ("Person:2", "Person", Map("name" -> "bob")))
        .toDF("id", "label", "props"),
      Seq(("Person:1", "Person:2", "KNOWS"))
        .toDF("src", "dst", "rel")
        .withColumn("props", lit(null).cast("map<string,string>")))
    val srv = new SparkSqlPgServer(spark, graph = Some(g))
    try {
      val (fields, rows) = SparkSqlPgServer.simpleQuery(srv.host, srv.port,
        """CYPHER MATCH (a:Person)-[:KNOWS]->(b:Person)
           RETURN a.name AS who, b.name AS whom""")
      assert(fields.map(_.name) == Seq("who", "whom"))
      assert(rows.map(_.toSeq) == Seq(Seq("ann", "bob")))
      // no graph registered → loud error, connection survives
      val bare = new SparkSqlPgServer(spark)
      try {
        val e = intercept[IllegalStateException](
          SparkSqlPgServer.simpleQuery(bare.host, bare.port,
            "CYPHER MATCH (x) RETURN id(x) AS i"))
        assert(e.getMessage.contains("no property graph"))
      } finally bare.close()
      // a read-only graph (no store) refuses CYPHER writes
      val e2 = intercept[IllegalStateException](
        SparkSqlPgServer.simpleQuery(srv.host, srv.port,
          "CYPHER MERGE (p:Person {pid: 9})"))
      assert(e2.getMessage.contains("25006") ||
             e2.getMessage.contains("writable"))
    } finally srv.close()
  }

  test("SparkSqlPgServer executes CYPHER writes against a GraphStore") {
    import graft.sources.pgwire.SparkSqlPgServer
    import graft.cypher.{GraphStore, PropertyGraph}
    import spark.implicits._
    val empty = PropertyGraph(
      Seq.empty[(String, String, Map[String, String])]
        .toDF("id", "label", "props"),
      Seq.empty[(String, String, String, Map[String, String])]
        .toDF("src", "dst", "rel", "props"))
    val gs = new GraphStore(empty, Map("Person" -> Seq("pid")))
    val srv = new SparkSqlPgServer(spark, store = Some(gs))
    try {
      // write, write, link — all as psql simple-query statements
      SparkSqlPgServer.simpleQuery(srv.host, srv.port,
        "CYPHER MERGE (p:Person {pid: 1}) SET p.name = 'ann'")
      SparkSqlPgServer.simpleQuery(srv.host, srv.port,
        "CYPHER MERGE (p:Person {pid: 2}) SET p.name = 'bob'")
      SparkSqlPgServer.simpleQuery(srv.host, srv.port,
        """CYPHER MATCH (a:Person {pid: 1}) MATCH (b:Person {pid: 2})
           MERGE (a)-[:KNOWS]->(b)""")
      // read back through the same wire
      val (fields, rows) = SparkSqlPgServer.simpleQuery(srv.host, srv.port,
        """CYPHER MATCH (a:Person)-[:KNOWS]->(b:Person)
           RETURN a.name AS who, b.name AS whom""")
      assert(fields.map(_.name) == Seq("who", "whom"))
      assert(rows.map(_.toSeq) == Seq(Seq("ann", "bob")))
      assert(gs.graph.vertices.count() == 2)
    } finally srv.close()
  }
}
