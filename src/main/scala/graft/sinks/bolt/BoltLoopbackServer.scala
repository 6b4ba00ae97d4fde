package graft.sinks.bolt

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream, EOFException}
import java.net.{ServerSocket, Socket, SocketException}
import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicLong

import scala.jdk.CollectionConverters._

import graft.sinks.InMemoryBolt

/** In-process Bolt wire-protocol server — the loopback stand-in for a
  * live Neo4j endpoint in this zero-egress build. Speaks the REAL
  * protocol over genuine TCP sockets (handshake, chunked PackStream
  * framing, HELLO/RUN/PULL/GOODBYE) and interprets the statements with
  * the same [[InMemoryBolt]] MERGE interpreter the in-memory factory
  * uses, so a `writeGraph` routed through
  * [[BoltSocketSessionFactory]] exercises every production layer —
  * client codec, framing, version negotiation, concurrent per-task
  * connections — short of the remote endpoint itself (the reference's
  * terminal artifact, app/neo4j_pool.py:6-19).
  *
  * Recording: statement texts are always recorded (one short string
  * per batch — bounded by batch count). Full parameter recording is
  * OFF by default — a corpus-scale write would otherwise duplicate
  * every row in the recorder — and enabled per-test via
  * `recordParams = true`.
  *
  * `failOn`: statements containing the marker get a Bolt FAILURE
  * response (failure-propagation tests). `failTransientOnce`: the
  * FIRST arrival of each distinct statement text gets a
  * `Neo.TransientError` FAILURE before interpretation — the
  * idempotent-retry test shape (the statement is NOT applied, a
  * retried delivery succeeds). `supported` narrows the Bolt versions
  * the server accepts (e.g. 5.1-only to force the LOGON auth flow;
  * at ≥5.1 a RUN before LOGON is rejected as a security error, per
  * protocol).
  */
final class BoltLoopbackServer(storeToken: String,
                               failOn: Option[String] = None,
                               recordParams: Boolean = false,
                               failTransientOnce: Boolean = false,
                               supported: Set[Int] =
                                 Set(0x00000105, 0x00000005, 0x00000404)) {
  private val server = new ServerSocket(0, 256,
    java.net.InetAddress.getLoopbackAddress)
  val port: Int = server.getLocalPort
  val host: String = server.getInetAddress.getHostAddress

  /** Statement text of every RUN, arrival order across connections. */
  val statements = new ConcurrentLinkedQueue[String]()
  /** (statement, params) — populated only when `recordParams`. */
  val recorded = new ConcurrentLinkedQueue[(String, Map[String, Any])]()
  val connections = new AtomicLong(0L)
  val negotiated = new ConcurrentLinkedQueue[Integer]()
  private val failedOnce =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  // every accepted connection socket, so close() can sever them too —
  // otherwise a straggling handler thread (each holds an InMemoryBolt
  // session) could keep writing to a store recreated under the same
  // token after the server is "shut down"
  private val accepted =
    java.util.concurrent.ConcurrentHashMap.newKeySet[Socket]()

  def recordedStatements: Seq[String] = statements.iterator().asScala.toSeq
  def recordedRuns: Seq[(String, Map[String, Any])] =
    recorded.iterator().asScala.toSeq

  @volatile private var running = true
  private val acceptor = new Thread(() => {
    while (running) {
      try {
        val s = server.accept()
        accepted.add(s)
        connections.incrementAndGet()
        val t = new Thread(() => serve(s), s"bolt-conn-${connections.get}")
        t.setDaemon(true)
        t.start()
      } catch {
        case _: SocketException => () // closed
      }
    }
  }, s"bolt-acceptor-$port")
  acceptor.setDaemon(true)
  acceptor.start()

  def close(): Unit = {
    running = false
    server.close()
    // sever live connections as well: handler threads are daemon, but
    // "server closed" must mean no handler can mutate the store after
    // this call returns to the caller's drop/recreate sequence
    accepted.iterator().asScala.foreach { s =>
      try s.close() catch { case _: java.io.IOException => () }
    }
    accepted.clear()
  }

  private def serve(sock: Socket): Unit = {
    // tiny SUCCESS frames must leave immediately: without NODELAY,
    // Nagle + delayed-ACK holds each ~10-byte response ~40 ms, which
    // at one response per UNWIND batch dominates the whole write
    // (measured 17 s → ~4 s on the sf0.1 fixture graph)
    sock.setTcpNoDelay(true)
    val in = new DataInputStream(
      new BufferedInputStream(sock.getInputStream, 1 << 16))
    val out = new DataOutputStream(
      new BufferedOutputStream(sock.getOutputStream, 1 << 16))
    try {
      // handshake: magic + 4 proposed versions; pick the first we know
      val magic = new Array[Byte](4); in.readFully(magic)
      require(magic.sameElements(BoltSocket.Magic), "bad Bolt magic")
      val proposed = Seq.fill(4)(in.readInt())
      val chosen = proposed.find(supported.contains).getOrElse(0)
      out.writeInt(chosen); out.flush()
      if (chosen == 0) { sock.close(); return }
      negotiated.add(chosen)
      val (major, minor) = BoltSocket.versionParts(chosen)
      val needsLogon = major > 5 || (major == 5 && minor >= 1)
      var loggedOn = !needsLogon

      val session = InMemoryBolt.Factory(storeToken).open()
      var open = true
      // the Bolt failed-connection state machine: after a FAILURE,
      // every subsequent request is IGNORED until a RESET (which this
      // sink's client never sends — it abandons the connection), so
      // the pipelined PULL after a failed RUN gets IGNORED, not a
      // stale SUCCESS that would desync request/response pairing
      var failedState = false
      def fail(code: String, m: String): Unit = {
        failedState = true; failure(out, code, m)
      }
      while (open) {
        val msg =
          try BoltSocket.readMessage(in)
          catch { case _: EOFException => open = false; null }
        if (open) msg.signature match {
          case BoltSocket.MsgHello =>
            success(out, Map("server" -> "Neo4j/5.0-loopback-fixture",
              "connection_id" -> s"bolt-${connections.get}"))
          case BoltSocket.MsgLogon =>
            loggedOn = true
            success(out, Map.empty[String, Any])
          case BoltSocket.MsgGoodbye =>
            open = false
          case _ if failedState =>
            BoltSocket.writeMessage(out,
              PackStream.Struct(BoltSocket.MsgIgnored, Seq.empty))
          case BoltSocket.MsgRun =>
            val stmt = msg.fields.head.asInstanceOf[String]
            val params = msg.fields(1).asInstanceOf[Map[String, Any]]
            statements.add(stmt)
            if (recordParams) recorded.add((stmt, params))
            if (!loggedOn) {
              fail("Neo.ClientError.Security.Unauthorized",
                "RUN before LOGON on a 5.1+ connection")
            } else if (failOn.exists(stmt.contains)) {
              fail("Neo.ClientError.Statement.SyntaxError",
                s"fixture-injected failure for: ${stmt.take(40)}")
            } else if (failTransientOnce && failedOnce.add(stmt)) {
              // first delivery of this statement: transient-fail
              // WITHOUT applying it — the retry must redeliver
              fail("Neo.TransientError.Transaction.DeadlockDetected",
                "fixture-injected transient failure (first attempt)")
            } else {
              // an interpreter error must surface as a FAILURE frame,
              // not a dead thread + bare EOF at the client
              try {
                session.run(stmt, params)
                success(out, Map("fields" -> Seq.empty[Any]))
              } catch {
                case scala.util.control.NonFatal(e) =>
                  fail("Neo.ClientError.Statement.SemanticError",
                    s"${e.getClass.getSimpleName}: ${e.getMessage}")
              }
            }
          case BoltSocket.MsgPull =>
            success(out, Map.empty[String, Any])
          case other =>
            fail("Neo.ClientError.Request.Invalid",
              f"fixture does not handle message 0x$other%02X")
        }
      }
    } catch {
      case _: EOFException | _: SocketException => () // client went away
    } finally { sock.close(); accepted.remove(sock) }
  }

  private def success(out: DataOutputStream, meta: Map[String, Any]): Unit =
    BoltSocket.writeMessage(out,
      PackStream.Struct(BoltSocket.MsgSuccess, Seq(meta)))

  private def failure(out: DataOutputStream, code: String, m: String): Unit =
    BoltSocket.writeMessage(out,
      PackStream.Struct(BoltSocket.MsgFailure,
        Seq(Map[String, Any]("code" -> code, "message" -> m))))
}
