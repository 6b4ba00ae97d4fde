package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.sinks.{CypherSink, InMemoryBolt}
import graft.sinks.bolt.{BoltFailure, BoltLoopbackServer, BoltSocketSessionFactory, PackStream}

/** The real-socket Bolt transport end-to-end: PackStream codec
  * round-trips, version negotiation, chunked framing past the 64 KiB
  * chunk limit, FAILURE propagation, and the flagship property — the
  * SAME writeGraph call routed through genuine TCP loopback sockets
  * produces a store byte-equal to the in-memory factory's, while the
  * wire recorder confirms what actually crossed the network (batched
  * UNWIND statements, labeled index-backed edge MATCHes, F12
  * datetime component maps).
  */
class BoltSocketSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def roundtrip(v: Any): Any = PackStream.unpack(PackStream.pack(v))

  test("PackStream round-trips every value class the sink emits") {
    // integers across every encoding width boundary
    for (l <- Seq(0L, 1L, -1L, -16L, -17L, 127L, 128L, -128L, -129L,
        32767L, -32768L, 32768L, Int.MaxValue.toLong, Int.MaxValue + 1L,
        Long.MaxValue, Long.MinValue))
      assert(roundtrip(l) == l, s"long $l")
    assert(roundtrip(null) == null)
    assert(roundtrip(true) == true && roundtrip(false) == false)
    assert(roundtrip(3.25) == 3.25)
    // strings across tiny/8/16 size boundaries (incl. multi-byte UTF-8)
    for (n <- Seq(0, 1, 15, 16, 255, 256, 70000)) {
      val s = "ü" * n
      assert(roundtrip(s) == s, s"string len $n")
    }
    // nested list-of-maps — the UNWIND $rows parameter shape
    val rows: Any = Seq(
      Map("id" -> 10L, "name" -> "st-a",
        "observed_at" -> Map("year" -> 2024L, "month" -> 3L, "day" -> 5L)),
      Map("id" -> 11L, "name" -> null))
    assert(roundtrip(Map("rows" -> rows)) == Map("rows" -> rows))
    // lists across size boundaries
    for (n <- Seq(0, 15, 16, 255, 256, 70000)) {
      val l = (0 until n).map(_.toLong)
      assert(roundtrip(l) == l, s"list len $n")
    }
    // structures
    val st = PackStream.Struct(0x10, Seq("RETURN 1", Map.empty[String, Any],
      Map.empty[String, Any]))
    assert(roundtrip(st) == st)
  }

  test("PackStream BYTES markers: Array[Byte] round-trips byte-equal " +
      "at every width (not as LIST<INTEGER>)") {
    for (n <- Seq(0, 1, 255, 256, 65535, 65536, 70000)) {
      val a = Array.tabulate(n)(i => (i % 251).toByte)
      val back = roundtrip(a)
      assert(back.isInstanceOf[Array[Byte]], s"bytes len $n decoded as ${back.getClass}")
      assert(back.asInstanceOf[Array[Byte]].sameElements(a), s"bytes len $n")
    }
    // on the wire it must be the spec's BYTES_8 marker + size + raw
    // payload — 5 bytes total for 3 payload bytes, not a LIST of ints
    val packed = PackStream.pack(Array[Byte](1, 2, 3))
    assert((packed(0) & 0xFF) == 0xCC && (packed(1) & 0xFF) == 3)
    assert(packed.length == 5)
    // and a BinaryType-shaped property inside the UNWIND rows map
    // survives the nesting
    val m = PackStream.unpack(PackStream.pack(
      Map("rows" -> Seq(Map("payload" -> Array[Byte](9, 8, 7))))))
    val payload = m.asInstanceOf[Map[String, Any]]("rows")
      .asInstanceOf[Seq[Any]].head.asInstanceOf[Map[String, Any]]("payload")
    assert(payload.asInstanceOf[Array[Byte]].sameElements(Array[Byte](9, 8, 7)))
  }

  test("PackStream rejects what the wire cannot carry") {
    assertThrows[IllegalArgumentException](
      PackStream.pack(new java.util.Date()))
    assertThrows[IllegalArgumentException](
      PackStream.pack(PackStream.Struct(0x01, Seq.fill(16)(1L))))
  }

  private def graph = {
    val ts = Timestamp.valueOf("2024-03-05 10:20:30")
    val v = Seq(
      (10L, "Station", "st-a", ts),
      (11L, "Station", "st-b", ts),
      (20L, "WeatherDay", "wd-1", Timestamp.valueOf("2024-03-06 00:00:00"))
    ).toDF("id", "label", "name", "observed_at")
    val e = Seq((10L, 20L, "HAS_WEATHER_DAY"), (11L, 20L, "HAS_WEATHER_DAY"))
      .toDF("src", "dst", "rel")
    (v, e)
  }

  test("binary props ride the BYTES markers over TCP byte-equal " +
      "(null, sign bytes, multibyte source, >64 KiB chunked)") {
    val payloads = Map[Long, Array[Byte]](
      1L -> Array[Byte](0, 1, -1, 127, -128),
      2L -> "münchen ü§".getBytes("UTF-8"),
      3L -> Array.tabulate(70000)(i => (i % 251).toByte)) // BYTES32 + multi-chunk
    val v = (payloads.toSeq.map { case (id, b) => (id, "Blob", b) } :+
        ((4L, "Blob", null: Array[Byte])))
      .toDF("id", "label", "payload")
    val e = Seq.empty[(Long, Long, String)].toDF("src", "dst", "rel")
    val srv = new BoltLoopbackServer("bolt_bin_rt")
    InMemoryBolt.drop("bolt_bin_rt")
    try {
      CypherSink.writeGraph(v, e,
        BoltSocketSessionFactory(srv.host, srv.port), batchSize = 2)
      val st = InMemoryBolt.store("bolt_bin_rt")
      assert(st.nodes.size == 4)
      payloads.foreach { case (id, expect) =>
        val got = st.nodes(("Blob", id))("payload")
        assert(got.isInstanceOf[Array[Byte]],
          s"payload $id decoded as ${got.getClass}")
        assert(got.asInstanceOf[Array[Byte]].sameElements(expect), s"payload $id")
      }
      assert(st.nodes(("Blob", 4L))("payload") == null)
    } finally { srv.close(); InMemoryBolt.drop("bolt_bin_rt") }
  }

  test("writeGraph over TCP equals writeGraph in memory, and the wire " +
      "saw batched labeled statements") {
    val (v, e) = graph
    val srv = new BoltLoopbackServer("bolt_socket_rt", recordParams = true)
    InMemoryBolt.drop("bolt_socket_rt")
    InMemoryBolt.drop("bolt_mem_rt")
    try {
      val (nv, ne) = CypherSink.writeGraph(v, e,
        BoltSocketSessionFactory(srv.host, srv.port), batchSize = 2)
      assert((nv, ne) == (3L, 2L))
      // reference run through the direct in-memory factory
      CypherSink.writeGraph(v, e, InMemoryBolt.Factory("bolt_mem_rt"),
        batchSize = 2)
      val viaWire = InMemoryBolt.store("bolt_socket_rt")
      val direct = InMemoryBolt.store("bolt_mem_rt")
      assert(viaWire.nodes == direct.nodes,
        "socket transport must deliver byte-equal node upserts")
      assert(viaWire.edges == direct.edges)
      assert(viaWire.constraints == direct.constraints)
      // wire-level assertions from the recorder
      val stmts = srv.recordedRuns
      assert(stmts.exists(_._1.startsWith("CREATE CONSTRAINT")))
      val runs = stmts.filter(_._1.startsWith("UNWIND"))
      assert(runs.nonEmpty && runs.forall(_._2.contains("rows")),
        "every UNWIND must carry a $rows batch parameter")
      assert(runs.exists(_._1.contains("MATCH (s:`Station`")),
        "edge MATCH must be label-qualified (index-backed)")
      // F12: the timestamp prop crossed the wire as a component map
      val vertexRows = runs.filter(_._1.contains("MERGE (n:`Station`"))
        .flatMap(_._2("rows").asInstanceOf[Seq[Map[String, Any]]])
      val om = vertexRows.head("observed_at").asInstanceOf[Map[String, Any]]
      assert(om("year") == 2024L && om("month") == 3L)
      assert(srv.negotiated.peek() == 0x00000105,
        "server picked the most-preferred proposed version (5.1)")
    } finally { srv.close(); InMemoryBolt.drop("bolt_socket_rt")
      InMemoryBolt.drop("bolt_mem_rt") }
  }

  test("chunked framing survives a message larger than one 64 KiB chunk") {
    val big = Seq.tabulate(300)(i => (i.toLong, "Doc", "x" * 400))
      .toDF("id", "label", "body")
    val noEdges = Seq.empty[(Long, Long, String)].toDF("src", "dst", "rel")
    val srv = new BoltLoopbackServer("bolt_socket_big")
    InMemoryBolt.drop("bolt_socket_big")
    try {
      // batchSize 300 → one UNWIND with 300 × 400-char rows ≈ 120 KiB,
      // forcing the multi-chunk write AND the multi-chunk read path
      val (nv, _) = CypherSink.writeGraph(big, noEdges,
        BoltSocketSessionFactory(srv.host, srv.port), batchSize = 300)
      assert(nv == 300L)
      val st = InMemoryBolt.store("bolt_socket_big")
      assert(st.nodes.size == 300 &&
        st.nodes(("Doc", 7L))("body") == "x" * 400)
    } finally { srv.close(); InMemoryBolt.drop("bolt_socket_big") }
  }

  test("a 5.1-only server forces the LOGON auth flow and still round-trips") {
    val (v, e) = graph
    val srv = new BoltLoopbackServer("bolt_socket_51",
      supported = Set(0x00000105))
    InMemoryBolt.drop("bolt_socket_51")
    try {
      val (nv, ne) = CypherSink.writeGraph(v, e,
        BoltSocketSessionFactory(srv.host, srv.port), batchSize = 2)
      assert((nv, ne) == (3L, 2L))
      assert(srv.negotiated.peek() == 0x00000105, "server picked Bolt 5.1")
      assert(InMemoryBolt.store("bolt_socket_51").nodes.size == 3)
    } finally { srv.close(); InMemoryBolt.drop("bolt_socket_51") }
  }

  test("idempotent retry redelivers through transient failures") {
    val (v, e) = graph
    val srv = new BoltLoopbackServer("bolt_socket_retry",
      failTransientOnce = true)
    InMemoryBolt.drop("bolt_socket_retry")
    try {
      val (nv, ne) = CypherSink.writeGraph(v, e,
        BoltSocketSessionFactory(srv.host, srv.port,
          maxRetries = 2, retryBackoffMs = 5L), batchSize = 2)
      assert((nv, ne) == (3L, 2L))
      val st = InMemoryBolt.store("bolt_socket_retry")
      assert(st.nodes.size == 3 && st.edges.size == 2,
        "every batch must land exactly once despite first-attempt failures")
      // each distinct statement was delivered at least twice: the
      // transient-failed first attempt plus the successful retry
      val counts = srv.recordedStatements.groupBy(identity).map(_._2.size)
      assert(counts.forall(_ >= 2), s"redelivery missing: $counts")
    } finally { srv.close(); InMemoryBolt.drop("bolt_socket_retry") }
  }

  test("client errors are NOT retried even with retries enabled") {
    val (v, e) = graph
    val srv = new BoltLoopbackServer("bolt_socket_noretry",
      failOn = Some("CREATE CONSTRAINT"))
    InMemoryBolt.drop("bolt_socket_noretry")
    try {
      val ex = intercept[BoltFailure](CypherSink.writeGraph(v, e,
        BoltSocketSessionFactory(srv.host, srv.port,
          maxRetries = 3, retryBackoffMs = 5L)))
      assert(ex.code.startsWith("Neo.ClientError"))
      assert(srv.recordedStatements.count(
        _.startsWith("CREATE CONSTRAINT")) == 1,
        "a ClientError must not be redelivered")
    } finally { srv.close(); InMemoryBolt.drop("bolt_socket_noretry") }
  }

  test("a server FAILURE surfaces as BoltFailure with the server's code") {
    val (v, e) = graph
    val srv = new BoltLoopbackServer("bolt_socket_fail",
      failOn = Some("CREATE CONSTRAINT"))
    InMemoryBolt.drop("bolt_socket_fail")
    try {
      val ex = intercept[BoltFailure](CypherSink.writeGraph(v, e,
        BoltSocketSessionFactory(srv.host, srv.port)))
      assert(ex.code == "Neo.ClientError.Statement.SyntaxError")
    } finally { srv.close(); InMemoryBolt.drop("bolt_socket_fail") }
  }
}
