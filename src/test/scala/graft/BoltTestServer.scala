package graft

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream, EOFException}
import java.net.{ServerSocket, Socket, SocketException}
import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicLong

import scala.jdk.CollectionConverters._

import graft.sinks.InMemoryBolt
import graft.sinks.bolt.{BoltSocket, PackStream}

/** In-process Bolt wire-protocol server: speaks the REAL protocol
  * (handshake, chunked PackStream framing, HELLO/RUN/PULL/GOODBYE)
  * over genuine TCP loopback sockets, records every decoded RUN, and
  * interprets the statements with the same [[InMemoryBolt]] MERGE
  * interpreter the in-memory factory uses — so a writeGraph run
  * through [[graft.sinks.bolt.BoltSocketSessionFactory]] can be
  * asserted equal, store-for-store, to the in-memory run. This is the
  * closest a zero-egress build can get to a live Neo4j: everything
  * except the remote endpoint is production-shaped.
  *
  * `failOn`: statements containing the marker trigger a Bolt FAILURE
  * response (for failure-propagation tests).
  */
final class BoltTestServer(storeToken: String, failOn: Option[String] = None) {
  private val server = new ServerSocket(0, 64,
    java.net.InetAddress.getLoopbackAddress)
  val port: Int = server.getLocalPort
  val host: String = server.getInetAddress.getHostAddress

  /** (statement, params) of every RUN, in arrival order across all
    * connections. */
  val recorded = new ConcurrentLinkedQueue[(String, Map[String, Any])]()
  val connections = new AtomicLong(0L)
  val negotiated = new ConcurrentLinkedQueue[Integer]()

  def recordedStatements: Seq[(String, Map[String, Any])] =
    recorded.iterator().asScala.toSeq

  @volatile private var running = true
  private val acceptor = new Thread(() => {
    while (running) {
      try {
        val s = server.accept()
        connections.incrementAndGet()
        val t = new Thread(() => serve(s), s"bolt-conn-${connections.get}")
        t.setDaemon(true)
        t.start()
      } catch {
        case _: SocketException => () // closed
      }
    }
  }, "bolt-acceptor")
  acceptor.setDaemon(true)
  acceptor.start()

  def close(): Unit = { running = false; server.close() }

  private def serve(sock: Socket): Unit = {
    val in = new DataInputStream(
      new BufferedInputStream(sock.getInputStream, 1 << 16))
    val out = new DataOutputStream(
      new BufferedOutputStream(sock.getOutputStream, 1 << 16))
    try {
      // handshake: magic + 4 proposed versions; pick the first we know
      val magic = new Array[Byte](4); in.readFully(magic)
      require(magic.sameElements(BoltSocket.Magic), "bad Bolt magic")
      val proposed = Seq.fill(4)(in.readInt())
      val chosen = proposed.find(v => v == 0x00000005 || v == 0x00000404)
        .getOrElse(0)
      out.writeInt(chosen); out.flush()
      if (chosen == 0) { sock.close(); return }
      negotiated.add(chosen)

      val session = new InMemoryBolt.Factory(storeToken).open()
      var open = true
      while (open) {
        val msg =
          try BoltSocket.readMessage(in)
          catch { case _: EOFException => open = false; null }
        if (open) msg.signature match {
          case BoltSocket.MsgHello =>
            success(out, Map("server" -> "Neo4j/5.0-loopback-fixture",
              "connection_id" -> s"bolt-${connections.get}"))
          case BoltSocket.MsgGoodbye =>
            open = false
          case BoltSocket.MsgRun =>
            val stmt = msg.fields.head.asInstanceOf[String]
            val params = msg.fields(1).asInstanceOf[Map[String, Any]]
            recorded.add((stmt, params))
            if (failOn.exists(stmt.contains)) {
              failure(out, "Neo.ClientError.Statement.SyntaxError",
                s"fixture-injected failure for: ${stmt.take(40)}")
            } else {
              session.run(stmt, params)
              success(out, Map("fields" -> Seq.empty[Any]))
            }
          case BoltSocket.MsgPull =>
            success(out, Map.empty[String, Any])
          case other =>
            failure(out, "Neo.ClientError.Request.Invalid",
              f"fixture does not handle message 0x$other%02X")
        }
      }
    } catch {
      case _: EOFException | _: SocketException => () // client went away
    } finally sock.close()
  }

  private def success(out: DataOutputStream, meta: Map[String, Any]): Unit =
    BoltSocket.writeMessage(out,
      PackStream.Struct(BoltSocket.MsgSuccess, Seq(meta)))

  private def failure(out: DataOutputStream, code: String, m: String): Unit =
    BoltSocket.writeMessage(out,
      PackStream.Struct(BoltSocket.MsgFailure,
        Seq(Map[String, Any]("code" -> code, "message" -> m))))
}
