package graft.sources.pgwire

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream, EOFException}
import java.net.{ServerSocket, Socket, SocketException}
import java.util.concurrent.atomic.AtomicLong

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

/** The engine as a pgwire-v3 SERVER: any psql-speaking client
  * connects over genuine TCP, sends ANSI SQL through the simple-query
  * protocol, and gets RowDescription + DataRow streams back — where
  * the statement executes as `spark.sql(...)` against the session's
  * registered views. The relational twin of
  * [[graft.cypher.BoltQueryServer]]: round 10's pgwire SOURCE proved
  * the engine can READ through the public relational wire; this
  * proves it can ANSWER on it, closing both directions on both
  * protocols (Bolt write r9 / Bolt read r10 / pgwire read r10 /
  * pgwire serve r10).
  *
  * Protocol: startup → AuthenticationOk (trust — credentials belong
  * to the SCRAM layer the loopback source fixture already proves) →
  * ParameterStatus → ReadyForQuery; then per 'Q': RowDescription
  * (OIDs mapped from the Spark schema), text-format DataRows,
  * CommandComplete("SELECT n"), ReadyForQuery. Errors become
  * ErrorResponse + ReadyForQuery (the connection survives, per
  * protocol). 'X' terminates.
  *
  * Same serving-boundary note as the Bolt query server: the result
  * set materializes server-side before streaming — the wire front
  * door is for interactive consumers and aggregates; bulk egress
  * belongs on the DataFrame API or the COPY sink.
  *
  * The server is READ-ONLY unless `allowWrites` is set: each statement
  * is parsed first and rejected (SQLSTATE 25006 read_only_sql_
  * transaction) when the plan is a command (DDL, SET, CACHE, …) or an
  * INSERT — an authenticated query client must not be able to mutate
  * session state through a front door documented as a query surface.
  *
  * When a [[graft.cypher.PropertyGraph]] is registered, a statement
  * opening with the `CYPHER` keyword (Neo4j's own query prologue)
  * routes the remainder through [[graft.cypher.CypherCompiler]] — a
  * psql-speaking client can query the GRAPH without speaking Bolt,
  * so the same Cypher answer is provable through both wire front
  * doors. When a writable [[graft.cypher.GraphStore]] is registered
  * instead (`store`), CYPHER WRITE statements (MERGE/CREATE/SET/
  * DELETE) also execute — CommandComplete reports `MERGE <n>` with
  * the write's node+relationship delta — closing the matrix: every
  * statement shape the reference sends works through BOTH public
  * wire protocols.
  */
final class SparkSqlPgServer(spark: SparkSession,
                             users: Map[String, Scram.Verifier] = Map.empty,
                             graph: Option[graft.cypher.PropertyGraph] = None,
                             allowWrites: Boolean = false,
                             store: Option[graft.cypher.GraphStore] = None) {
  private val server = new ServerSocket(0, 64,
    java.net.InetAddress.getLoopbackAddress)
  val port: Int = server.getLocalPort
  val host: String = server.getInetAddress.getHostAddress
  val connections = new AtomicLong(0L)

  private val accepted =
    java.util.concurrent.ConcurrentHashMap.newKeySet[Socket]()

  private val acceptor = new Thread(() => {
    try {
      while (!server.isClosed) {
        val s = server.accept()
        accepted.add(s)
        connections.incrementAndGet()
        val t = new Thread(() => serve(s), s"pg-sql-${connections.get}")
        t.setDaemon(true)
        t.start()
      }
    } catch { case _: SocketException => () }
  }, "pg-sql-acceptor")
  acceptor.setDaemon(true)
  acceptor.start()

  def close(): Unit = {
    server.close()
    accepted.iterator().asScala.foreach { s =>
      try s.close() catch { case _: java.io.IOException => () }
    }
    accepted.clear()
  }

  /** Postgres type OID for a Spark type (text wire format). */
  private def oidOf(dt: DataType): Int = dt match {
    case BooleanType => 16
    case ShortType => 21
    case IntegerType => 23
    case LongType => 20
    case FloatType => 700
    case DoubleType => 701
    case _: DecimalType => 1700
    case DateType => 1082
    case TimestampType | TimestampNTZType => 1114
    case _ => 25 // text
  }

  /** Text-format cell, matching Postgres text conventions for the
    * types the OID map covers; null → NULL marker at the frame layer. */
  private def cellText(v: Any): String = v match {
    case null => null
    case b: Boolean => if (b) "t" else "f"
    case d: java.math.BigDecimal => d.toPlainString
    case t: java.sql.Timestamp =>
      t.toInstant.toString.stripSuffix("Z").replace("T", " ")
    case other => other.toString
  }

  private sealed trait StmtResult
  private final case class QueryResult(df: org.apache.spark.sql.DataFrame)
    extends StmtResult
  private final case class WriteResult(tag: String) extends StmtResult

  /** Statement dispatch: `CYPHER <text>` routes to the registered
    * graph/store (reads compile, writes execute against the store
    * when one is registered); anything else parses as SQL and (unless
    * `allowWrites`) must be a pure query — commands and INSERTs are
    * rejected BEFORE execution, SQLSTATE 25006. */
  private def compile(sql: String): StmtResult = {
    val trimmed = sql.trim.stripSuffix(";")
    val isCypher = trimmed.length >= 6 &&
      trimmed.substring(0, 6).equalsIgnoreCase("cypher") &&
      (trimmed.length == 6 || trimmed.charAt(6).isWhitespace)
    if (isCypher) {
      val text = trimmed.substring(6).trim
      graft.cypher.CypherParser.parseAny(text) match {
        case Left(_) =>
          val st = store.getOrElse(throw new ReadOnlyViolation(
            "CYPHER write statement but no writable graph store is " +
            "registered on this server"))
          val (stats, rows) = st.executeReturning(text)
          // a write with a RETURN/WITH continuation answers with a
          // row set (like SELECT); plain writes keep the command tag
          rows match {
            case Some(df) => QueryResult(df)
            case None =>
              WriteResult("MERGE " + (stats.nodesCreated +
                stats.nodesMatched + stats.relsCreated +
                stats.relsMatched + stats.nodesDeleted +
                stats.relsDeleted))
          }
        case Right(q) =>
          val g = store.map(_.graph).orElse(graph).getOrElse(
            throw new IllegalArgumentException(
              "CYPHER statement but no property graph is registered " +
              "on this server"))
          QueryResult(graft.cypher.CypherCompiler.run(g, q))
      }
    } else {
      if (!allowWrites) {
        import org.apache.spark.sql.catalyst.plans.logical.{Command, InsertIntoStatement}
        val plan = spark.sessionState.sqlParser.parsePlan(trimmed)
        val write = plan.collectFirst {
          case c: Command => c.nodeName
          case i: InsertIntoStatement => i.nodeName
        }
        write.foreach(n => throw new ReadOnlyViolation(
          s"$n rejected: this server is a read-only query front door " +
          "(SELECT/WITH/VALUES only)"))
      }
      QueryResult(spark.sql(trimmed))
    }
  }

  private def serve(sock: Socket): Unit = {
    sock.setTcpNoDelay(true)
    val in = new DataInputStream(
      new BufferedInputStream(sock.getInputStream, 1 << 16))
    val out = new DataOutputStream(
      new BufferedOutputStream(sock.getOutputStream, 1 << 16))
    try {
      val startup = PgWire.readStartupNegotiating(in, out)
      if (users.nonEmpty) {
        // SCRAM-SHA-256 keyed on the startup 'user', same shared
        // exchange as the loopback fixture (mutual auth, verifiers
        // only — no plaintext server-side)
        if (!Scram.serverExchange(startup.getOrElse("user", ""),
            users, in, out)) {
          out.flush(); return
        }
      } else PgWire.writeAuthOk(out)
      PgWire.writeParameterStatus(out, "server_version", "16.0-graft-sql")
      PgWire.writeReadyForQuery(out)
      out.flush()
      var open = true
      while (open) {
        val msg =
          try PgWire.readMsg(in)
          catch { case _: EOFException => open = false; null }
        if (open) msg.tag.toChar match {
          case 'Q' =>
            // body: NUL-terminated SQL text
            val sql = new String(msg.body.takeWhile(_ != 0), "UTF-8")
            try {
              compile(sql) match {
                case WriteResult(tag) =>
                  // row-less command: CommandComplete only, per protocol
                  PgWire.writeCommandComplete(out, tag)
                case QueryResult(df) =>
                  val schema = df.schema
                  val fields = schema.fields.toSeq.map(f =>
                    PgWire.Field(f.name, oidOf(f.dataType)))
                  PgWire.writeRowDescription(out, fields)
                  var n = 0L
                  df.collect().foreach { r =>
                    PgWire.writeDataRow(out,
                      Seq.tabulate(r.length)(i => cellText(r.get(i))))
                    n += 1
                  }
                  PgWire.writeCommandComplete(out, s"SELECT $n")
              }
            } catch {
              case e: ReadOnlyViolation =>
                PgWire.writeError(out, "25006", // read_only_sql_transaction
                  String.valueOf(e.getMessage).take(300))
              case scala.util.control.NonFatal(e) =>
                // 42601 syntax_error is close enough for the fixture;
                // the message carries the real analyzer text
                PgWire.writeError(out, "42601",
                  s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(300)}")
            }
            PgWire.writeReadyForQuery(out)
            out.flush()
          case 'X' => open = false
          case other =>
            PgWire.writeError(out, "0A000",
              s"sql server does not handle message '$other'")
            PgWire.writeReadyForQuery(out)
            out.flush()
        }
      }
    } catch {
      case _: EOFException | _: SocketException => ()
    } finally { sock.close(); accepted.remove(sock) }
  }
}

/** A statement rejected by the read-only gate (SQLSTATE 25006). */
private[pgwire] final class ReadOnlyViolation(m: String)
  extends IllegalArgumentException(m)

object SparkSqlPgServer {

  /** Minimal simple-query CLIENT (what psql does for a plain
    * statement): startup (+ SCRAM when `password` is given, mutual
    * verification included — rides [[PgWireClient]]'s auth machinery)
    * → 'Q' sql → collect (RowDescription, text DataRows). A server
    * ErrorResponse throws with the wire message; the helper exists so
    * specs and entries exercise the server exactly the way a foreign
    * client would, through bytes only. */
  def simpleQuery(host: String, port: Int, sql: String,
                  user: String = "graft",
                  password: Option[String] = None)
      : (Seq[PgWire.Field], Seq[Array[String]]) = {
    val c = new PgWireClient(host, port, user, password)
    try {
      c.send(sql)
      var fields: Seq[PgWire.Field] = Seq.empty
      val rows = scala.collection.mutable.ArrayBuffer.empty[Array[String]]
      var err: Option[String] = None
      var m = c.read()
      while (m.tag.toChar != 'Z') {
        m.tag.toChar match {
          case 'T' => fields = PgWire.parseRowDescription(m.body)
          case 'D' => rows += PgWire.parseDataRow(m.body)
          case 'C' | 'N' => () // CommandComplete / NoticeResponse
          case 'E' => err = Some(new String(m.body, "UTF-8"))
          case other => throw new IllegalStateException(
            s"unexpected message '$other' in simple-query response")
        }
        m = c.read()
      }
      err.foreach(e => throw new IllegalStateException(s"server error: $e"))
      (fields, rows.toSeq)
    } finally c.close()
  }
}
