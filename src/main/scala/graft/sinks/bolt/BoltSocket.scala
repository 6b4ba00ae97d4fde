package graft.sinks.bolt

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream}
import java.net.{InetSocketAddress, Socket}

import graft.sinks.{BoltSession, BoltSessionFactory}

/** Real-socket Bolt transport for [[graft.sinks.CypherSink]]: the
  * network twin of the reference's async Neo4j driver pool
  * (app/neo4j_pool.py:6-19), built directly on the PUBLIC Bolt wire
  * protocol (handshake + chunked PackStream messages) so it needs no
  * driver jar — this build is zero-dependency. One [[BoltSocketSession]]
  * is one Bolt connection in autocommit mode, exactly how
  * `CypherSink.writeGraph` uses a session: open per partition, a
  * sequence of RUN+PULL round-trips, close.
  *
  * Protocol subset (Bolt ≤ 5.0, auth carried in HELLO):
  *
  *   - handshake: magic `60 60 B0 17` + 4 proposed versions; the
  *     server answers with the one it picks (5.0 preferred, 4.4
  *     fallback — both use the same message shapes this client sends)
  *   - messages out: HELLO 0x01, RUN 0x10, PULL 0x3F, GOODBYE 0x02
  *   - messages in: SUCCESS 0x70, RECORD 0x71 (drained and discarded
  *     — MERGE statements return no rows), IGNORED 0x7E,
  *     FAILURE 0x7F (surfaced as an exception carrying the server's
  *     code/message)
  *   - framing: 2-byte big-endian chunk sizes, 0x0000 terminator;
  *     zero-size chunks BETWEEN messages are NOOP keepalives
  *
  * Scale shape: `writeGraph` opens `executors × cores` concurrent
  * sessions, each pipelining one UNWIND batch per RUN — the same
  * fan-out discipline as the reference pool's `max_connection_pool
  * _size`. Backpressure is the socket itself: a slow server blocks
  * the writer thread, never queues unbounded rows.
  */
object BoltSocket {
  val Magic: Array[Byte] =
    Array(0x60.toByte, 0x60.toByte, 0xB0.toByte, 0x17.toByte)

  // proposed versions, most-preferred first: 5.1 (LOGON auth), 5.0,
  // 4.4 (both auth-in-HELLO). Encoding per spec: 4 bytes each, minor
  // in byte 2, major in byte 3.
  val ProposedVersions: Seq[Int] = Seq(0x00000105, 0x00000005, 0x00000404, 0)

  /** (major, minor) of a negotiated version int. */
  def versionParts(v: Int): (Int, Int) = (v & 0xFF, (v >> 8) & 0xFF)

  final val MsgHello = 0x01.toByte
  final val MsgGoodbye = 0x02.toByte
  final val MsgReset = 0x0F.toByte
  final val MsgLogon = 0x6A.toByte
  final val MsgRun = 0x10.toByte
  final val MsgBegin = 0x11.toByte
  final val MsgCommit = 0x12.toByte
  final val MsgRollback = 0x13.toByte
  final val MsgPull = 0x3F.toByte
  final val MsgSuccess = 0x70.toByte
  final val MsgRecord = 0x71.toByte
  final val MsgIgnored = 0x7E.toByte
  final val MsgFailure = 0x7F.toByte

  /** Write one message as chunked PackStream. */
  def writeMessage(out: DataOutputStream, msg: PackStream.Struct): Unit = {
    val bytes = PackStream.pack(msg)
    var off = 0
    while (off < bytes.length) {
      val n = math.min(0xFFFF, bytes.length - off)
      out.writeShort(n)
      out.write(bytes, off, n)
      off += n
    }
    out.writeShort(0) // end-of-message
    out.flush()
  }

  /** Read one message (assembling chunks; zero-size chunks before any
    * payload are NOOPs). */
  def readMessage(in: DataInputStream): PackStream.Struct = {
    val buf = new java.io.ByteArrayOutputStream()
    var done = false
    while (!done) {
      val size = in.readUnsignedShort()
      if (size == 0) {
        if (buf.size() > 0) done = true // terminator
        // else: NOOP keepalive — keep waiting
      } else {
        val chunk = new Array[Byte](size)
        in.readFully(chunk)
        buf.write(chunk)
      }
    }
    PackStream.unpack(buf.toByteArray) match {
      case s: PackStream.Struct => s
      case other => throw new IllegalStateException(
        s"Bolt message is not a structure: $other")
    }
  }
}

/** A failure the server reported (Bolt FAILURE message). */
final class BoltFailure(val code: String, message: String)
    extends RuntimeException(s"$code: $message")

final class BoltSocketSession(host: String, port: Int, userAgent: String,
                              connectTimeoutMs: Int) extends BoltSession {
  import BoltSocket._

  private val socket = new Socket()
  socket.setTcpNoDelay(true)
  socket.connect(new InetSocketAddress(host, port), connectTimeoutMs)
  private val out = new DataOutputStream(
    new BufferedOutputStream(socket.getOutputStream, 1 << 16))
  private val in = new DataInputStream(
    new BufferedInputStream(socket.getInputStream, 1 << 16))
  // handshake + auth inside one guard: a constructor failure would
  // otherwise orphan the connected socket with no reference for any
  // caller to close (one leaked FD per attempt under the retry loop)
  val negotiatedVersion: Int =
    try { val v = handshake(); hello(v); v }
    catch {
      case e: Throwable =>
        try socket.close() catch { case _: java.io.IOException => () }
        throw e
    }

  private def handshake(): Int = {
    out.write(Magic)
    ProposedVersions.foreach(out.writeInt)
    out.flush()
    val v = in.readInt()
    require(ProposedVersions.contains(v) && v != 0,
      f"server picked unsupported Bolt version 0x$v%08X")
    v
  }

  private def hello(version: Int): Unit = {
    val (major, minor) = versionParts(version)
    val logonAuth = major > 5 || (major == 5 && minor >= 1)
    // 5.1+ moved authentication out of HELLO into a LOGON message;
    // ≤5.0 carries the auth scheme in the HELLO map
    val meta = if (logonAuth) Map[String, Any]("user_agent" -> userAgent)
               else Map[String, Any]("user_agent" -> userAgent,
                 "scheme" -> "none")
    writeMessage(out, PackStream.Struct(MsgHello, Seq(meta)))
    await("HELLO")
    if (logonAuth) {
      writeMessage(out, PackStream.Struct(MsgLogon,
        Seq(Map[String, Any]("scheme" -> "none"))))
      await("LOGON")
    }
  }

  /** One autocommit statement: RUN + PULL pipelined, both confirmed.
    * Records are drained and discarded (the MERGE write path returns
    * no rows; a sink must still consume them to keep the stream in
    * sync). */
  override def run(cypher: String, params: Map[String, Any]): Unit = {
    writeMessage(out, PackStream.Struct(MsgRun,
      Seq(cypher, params, Map.empty[String, Any])))
    writeMessage(out, PackStream.Struct(MsgPull,
      Seq(Map[String, Any]("n" -> -1L))))
    await("RUN")
    await("PULL")
  }

  /** One READ statement over the wire: RUN + PULL pipelined; returns
    * (field names from the RUN SUCCESS meta, record rows). The sink
    * path keeps using [[run]] (drain-and-discard); this is the query
    * path a Bolt CLIENT of the engine's own
    * [[graft.cypher.BoltQueryServer]] uses. */
  def query(cypher: String, params: Map[String, Any] = Map.empty)
      : (Seq[String], Seq[Seq[Any]]) = {
    writeMessage(out, PackStream.Struct(MsgRun,
      Seq(cypher, params, Map.empty[String, Any])))
    writeMessage(out, PackStream.Struct(MsgPull,
      Seq(Map[String, Any]("n" -> -1L))))
    val runMeta = await("RUN")
    val fields = runMeta.get("fields") match {
      case Some(s: Seq[_]) => s.map(_.toString)
      case _ => Seq.empty[String]
    }
    val rows = scala.collection.mutable.ArrayBuffer.empty[Seq[Any]]
    await("PULL", Some(rows))
    (fields, rows.toSeq)
  }

  /** Explicit-transaction messages (Bolt BEGIN 0x11 / COMMIT 0x12 /
    * ROLLBACK 0x13) and RESET 0x0F — what a real driver's
    * `execute_write` / `execute_read` unit-of-work sends. Statements
    * between [[begin]] and [[commit]] apply atomically on COMMIT;
    * [[rollback]] provably discards them; [[reset]] clears a failed
    * connection back to ready. */
  def begin(): Unit = {
    writeMessage(out, PackStream.Struct(MsgBegin,
      Seq(Map.empty[String, Any])))
    await("BEGIN"): Unit
  }

  def commit(): Unit = {
    writeMessage(out, PackStream.Struct(MsgCommit, Seq.empty))
    await("COMMIT"): Unit
  }

  def rollback(): Unit = {
    writeMessage(out, PackStream.Struct(MsgRollback, Seq.empty))
    await("ROLLBACK"): Unit
  }

  def reset(): Unit = {
    writeMessage(out, PackStream.Struct(MsgReset, Seq.empty))
    await("RESET"): Unit
  }

  /** Read until SUCCESS (collecting RECORDs into `sink` when given,
    * draining otherwise); FAILURE throws. Returns the SUCCESS meta. */
  private def await(what: String,
                    sink: Option[scala.collection.mutable.Growable[Seq[Any]]] =
                      None): Map[String, Any] = {
    while (true) {
      val msg = readMessage(in)
      msg.signature match {
        case MsgSuccess =>
          return msg.fields.headOption match {
            case Some(m: Map[_, _]) => m.asInstanceOf[Map[String, Any]]
            case _ => Map.empty[String, Any]
          }
        case MsgRecord =>
          sink.foreach(_ += (msg.fields.headOption match {
            case Some(s: Seq[_]) => s.asInstanceOf[Seq[Any]]
            case _ => Seq.empty[Any]
          }))
        case MsgIgnored => throw new IllegalStateException(
          s"$what was IGNORED — connection is in a failed state")
        case MsgFailure =>
          val meta = msg.fields.headOption match {
            case Some(m: Map[_, _]) =>
              m.asInstanceOf[Map[String, Any]]
            case _ => Map.empty[String, Any]
          }
          throw new BoltFailure(
            meta.getOrElse("code", "Neo.UnknownError").toString,
            meta.getOrElse("message", s"$what failed").toString)
        case other => throw new IllegalStateException(
          f"unexpected Bolt message 0x$other%02X during $what")
      }
    }
    throw new IllegalStateException("unreachable")
  }

  override def close(): Unit = {
    try {
      writeMessage(out, PackStream.Struct(MsgGoodbye, Seq.empty))
    } catch { case _: java.io.IOException => () } // peer already gone
    finally socket.close()
  }
}

/** Per-statement retry over reconnection. Correct ONLY because the
  * sink's statement family is idempotent (MERGE upserts behind
  * uniqueness constraints — re-running a batch converges to the same
  * store), which is exactly why the reference's projectors are safely
  * re-runnable. Retries on: connection-level IOExceptions and server
  * `Neo.TransientError.*` codes — each retry abandons the connection
  * and opens a fresh one, the Bolt-level equivalent of a driver
  * pool's retryable-unit-of-work. Auth/syntax/constraint failures
  * (`Neo.ClientError.*`) and protocol desyncs (unexpected message,
  * IGNORED) never retry — those are deterministic bugs, and
  * re-running them would only mask the cause.
  */
final class RetryingBoltSession(openConn: () => BoltSession,
                                maxRetries: Int, backoffMs: Long)
    extends BoltSession {
  // lazily (re)opened so that CONNECT failures are retried too — a
  // briefly unreachable server is the canonical transient fault
  private var cur: BoltSession = null

  private def retryable(e: Throwable): Boolean = e match {
    case _: java.io.IOException => true
    case f: BoltFailure => f.code.startsWith("Neo.TransientError")
    case _ => false
  }

  override def run(cypher: String, params: Map[String, Any]): Unit = {
    var attempt = 0
    var done = false
    while (!done) {
      try {
        if (cur == null) cur = openConn()
        cur.run(cypher, params)
        done = true
      } catch {
        case e: Throwable if attempt < maxRetries && retryable(e) =>
          attempt += 1
          if (cur != null) {
            try cur.close() catch { case _: Exception => () }
            cur = null
          }
          Thread.sleep(backoffMs * attempt)
      }
    }
  }

  override def close(): Unit = if (cur != null) cur.close()
}

/** Serializable factory — host/port cross the closure into
  * `foreachPartition`, each task opens its own connection (the
  * executor-side analogue of one pooled driver session).
  * `maxRetries > 0` wraps each session in [[RetryingBoltSession]]
  * (safe for this sink's idempotent MERGE statement family). */
final case class BoltSocketSessionFactory(
    host: String, port: Int,
    userAgent: String = "graft-cypher-sink/1.0",
    connectTimeoutMs: Int = 10000,
    maxRetries: Int = 0,
    retryBackoffMs: Long = 50L) extends BoltSessionFactory {
  override def open(): BoltSession = {
    val mk = () => new BoltSocketSession(host, port, userAgent,
      connectTimeoutMs): BoltSession
    if (maxRetries <= 0) mk() else new RetryingBoltSession(mk, maxRetries,
      retryBackoffMs)
  }
}
