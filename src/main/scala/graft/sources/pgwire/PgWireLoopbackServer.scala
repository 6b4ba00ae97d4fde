package graft.sources.pgwire

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream, EOFException}
import java.net.{ServerSocket, Socket, SocketException}
import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicLong

import scala.jdk.CollectionConverters._

/** In-process pgwire-v3 server — the loopback stand-in for the
  * reference's network Postgres (main_graph_topraq.py:94-95) in this
  * zero-egress build, mirroring [[graft.sinks.bolt.BoltLoopbackServer]]
  * on the source side. Speaks the REAL protocol over genuine TCP
  * (startup, AuthenticationOk, simple Query, text DataRows) and
  * answers from an in-memory table registry with a small evaluator for
  * exactly the SQL shapes the Spark source generates:
  *
  *   `SELECT cols FROM table [WHERE p1 AND p2 ...] [LIMIT n]`
  *
  * where each predicate is `col op literal` (op ∈ =, <>, <, <=, >,
  * >=), `col IS [NOT] NULL`, and literals are numbers or
  * single-quoted strings ('' escape). Applying the WHERE server-side
  * is the point: the Spark source marks pushed filters as fully
  * handled, so rows the server failed to filter would surface as
  * wrong results — the oracle proves pushdown WORKS, not just that
  * the SQL mentions it.
  *
  * Every received statement is recorded (arrival order across
  * connections), so specs assert what actually crossed the wire —
  * pushed-down predicates, pruned column lists, per-partition range
  * clauses.
  *
  * Cell values are Long / Double / String / null (wire types int8,
  * float8, text).
  */
final class PgWireLoopbackServer(
    seed: Map[String, PgWireLoopbackServer.Table]) {

  /** Mutable per-table store: seeded tables plus COPY-writable ones.
    * Rows land in a concurrent queue so concurrent per-partition COPY
    * connections append without coordination (matching real Postgres,
    * where concurrent COPY to one table is the standard bulk-load
    * fan-in). */
  private final class Store(val columns: Seq[(String, Int)]) {
    val rows = new ConcurrentLinkedQueue[Array[Any]]()
    def snapshot: Seq[Array[Any]] = rows.iterator().asScala.toSeq
  }
  private val stores = scala.collection.concurrent.TrieMap.empty[String, Store]
  seed.foreach { case (n, t) =>
    val st = new Store(t.columns)
    t.rows.foreach(st.rows.add)
    stores.put(n.toLowerCase, st)
  }

  /** Register an empty COPY-target table. */
  def defineTable(name: String, columns: Seq[(String, Int)]): Unit =
    stores.put(name.toLowerCase, new Store(columns))

  // ---- SCRAM-SHA-256 credentials (off by default: the no-auth trust
  // path stays for fixtures that don't exercise auth) ----

  /** Per-user DERIVED verifier only (StoredKey/ServerKey/salt/i) —
    * the password is discarded after derivation, like pg_authid. */
  private val users =
    scala.collection.concurrent.TrieMap.empty[String, Scram.Verifier]

  /** Demand SCRAM-SHA-256 for every new connection and register a
    * user. Existing connections are unaffected. */
  def requireAuth(user: String, password: String): Unit = {
    val salt = new Array[Byte](16)
    new java.security.SecureRandom().nextBytes(salt)
    users.put(user, Scram.deriveVerifier(password, salt, 4096))
  }

  /** Authentication outcomes, arrival order: (user, success). */
  val authAttempts = new ConcurrentLinkedQueue[(String, Boolean)]()

  def rowCount(name: String): Long =
    stores.get(name.toLowerCase).map(_.rows.size.toLong).getOrElse(0L)

  private val server = new ServerSocket(0, 128,
    java.net.InetAddress.getLoopbackAddress)
  val port: Int = server.getLocalPort
  val host: String = server.getInetAddress.getHostAddress

  /** SQL text of every Query AND Parse message, arrival order — for
    * extended-protocol traffic this is the PARAMETERIZED text (`$n`
    * placeholders), proving values never rode inside SQL. */
  val statements = new ConcurrentLinkedQueue[String]()
  /** Every Bind: (statement SQL, decoded param values, requested
    * result format codes) — what actually crossed the wire. */
  val binds = new ConcurrentLinkedQueue[(String, Seq[Any], Seq[Int])]()
  val connections = new AtomicLong(0L)
  def recordedStatements: Seq[String] = statements.iterator().asScala.toSeq
  def recordedBinds: Seq[(String, Seq[Any], Seq[Int])] =
    binds.iterator().asScala.toSeq

  private val accepted =
    java.util.concurrent.ConcurrentHashMap.newKeySet[Socket]()

  @volatile private var running = true
  private val acceptor = new Thread(() => {
    while (running) {
      try {
        val s = server.accept()
        accepted.add(s)
        connections.incrementAndGet()
        val t = new Thread(() => serve(s), s"pgwire-conn-${connections.get}")
        t.setDaemon(true)
        t.start()
      } catch { case _: SocketException => () /* closed */ }
    }
  }, s"pgwire-acceptor-$port")
  acceptor.setDaemon(true)
  acceptor.start()

  def close(): Unit = {
    running = false
    server.close()
    accepted.iterator().asScala.foreach { s =>
      try s.close() catch { case _: java.io.IOException => () }
    }
    accepted.clear()
  }

  private def serve(sock: Socket): Unit = {
    sock.setTcpNoDelay(true) // same Nagle lesson as the Bolt loopback
    val in = new DataInputStream(
      new BufferedInputStream(sock.getInputStream, 1 << 16))
    val out = new DataOutputStream(
      new BufferedOutputStream(sock.getOutputStream, 1 << 16))
    try {
      val startup = PgWire.readStartup(in)
      if (users.nonEmpty) {
        // SCRAM-SHA-256 demanded: real PG keys the exchange on the
        // startup 'user' parameter (the SCRAM n= field is ignored)
        if (!scramExchange(startup.getOrElse("user", ""), in, out)) {
          out.flush(); return
        }
      } else PgWire.writeAuthOk(out) // trust: no credentials registered
      PgWire.writeParameterStatus(out, "server_version", "16.0-loopback-fixture")
      PgWire.writeReadyForQuery(out)
      // ---- per-connection extended-protocol state ----
      // prepared statements: name -> (sql, declared param OIDs)
      val prepared = scala.collection.mutable.Map.empty[String, (String, Seq[Int])]
      // portals: name -> (fields incl. result formats, remaining rows)
      val portals = scala.collection.mutable.Map
        .empty[String, (Seq[PgWire.Field], Iterator[Seq[Any]])]
      // after an extended-phase error, skip messages until Sync
      var errorState = false
      def extErr(sqlState: String, msg: String): Unit = {
        PgWire.writeError(out, sqlState, msg)
        errorState = true
      }
      var open = true
      while (open) {
        val msg =
          try PgWire.readMsg(in)
          catch { case _: EOFException => open = false; null }
        if (open) msg.tag.toChar match {
          case 'X' => open = false
          case 'Q' =>
            val sql = new String(msg.body, java.nio.charset.StandardCharsets.UTF_8)
              .takeWhile(_ != '\u0000') // body is sql + trailing NUL
            statements.add(sql)
            if (CopyRe.findFirstIn(sql).isDefined) {
              copyIn(sql, in, out)
              PgWire.writeReadyForQuery(out)
            } else try {
              val (fields, rows) = execute(sql)
              PgWire.writeRowDescription(out, fields)
              rows.foreach { r =>
                PgWire.writeDataRow(out, r.map {
                  case null => null
                  case l: java.lang.Long => l.toString
                  case d: java.lang.Double => d.toString
                  case s: String => s
                  case other => other.toString
                })
              }
              PgWire.writeCommandComplete(out, s"SELECT ${rows.length}")
            } catch {
              case scala.util.control.NonFatal(e) =>
                PgWire.writeError(out, "42601",
                  s"${e.getClass.getSimpleName}: ${e.getMessage}")
            }
            PgWire.writeReadyForQuery(out)

          // ---- extended-query protocol ----
          // No ReadyForQuery until Sync; an error poisons the phase
          // and every further message before Sync is skipped (public
          // docs: "Extended Query", error handling).
          case 'S' => // Sync: end of pipeline
            errorState = false
            PgWire.writeReadyForQuery(out)
          case 'P' if !errorState =>
            val (name, sql, oids) = PgWire.parseParse(msg.body)
            statements.add(sql)
            prepared.put(name, (sql, oids))
            PgWire.writeParseComplete(out)
          case 'B' if !errorState =>
            val (portal, stmt, pFormats, pCells, rFormats) =
              PgWire.parseBind(msg.body)
            prepared.get(stmt) match {
              case None => extErr("26000", s"unknown prepared statement '$stmt'")
              case Some((sql, oids)) =>
                try {
                  val params = pCells.zipWithIndex.map { case (cell, i) =>
                    val fmt =
                      if (pFormats.isEmpty) 0
                      else if (pFormats.length == 1) pFormats.head
                      else pFormats(i)
                    val oid = if (i < oids.length) oids(i) else 0
                    if (cell == null) null
                    else if (oid != 0) PgWire.decodeCell(cell, oid, fmt)
                    else {
                      require(fmt == 0,
                        s"binary parameter $$${i + 1} needs a declared type OID")
                      inferText(new String(cell,
                        java.nio.charset.StandardCharsets.UTF_8))
                    }
                  }
                  binds.add((sql, params, rFormats))
                  val (fields, rows) = execute(sql, params.toIndexedSeq)
                  val withFormats = fields.zipWithIndex.map { case (f, i) =>
                    val fmt =
                      if (rFormats.isEmpty) 0
                      else if (rFormats.length == 1) rFormats.head
                      else rFormats(i)
                    f.copy(format = fmt)
                  }
                  portals.put(portal, (withFormats, rows.iterator))
                  PgWire.writeBindComplete(out)
                } catch {
                  case scala.util.control.NonFatal(e) =>
                    extErr("42601",
                      s"${e.getClass.getSimpleName}: ${e.getMessage}")
                }
            }
          case 'D' if !errorState =>
            val (kind, name) = PgWire.parseDescribe(msg.body)
            kind match {
              case 'P' => portals.get(name) match {
                case Some((fields, _)) =>
                  PgWire.writeRowDescription(out, fields)
                case None => extErr("34000", s"unknown portal '$name'")
              }
              case 'S' => prepared.get(name) match {
                case Some((sql, oids)) =>
                  PgWire.writeParameterDescription(out, oids)
                  // statement-level shape: evaluate against all-NULL
                  // params (field list is param-independent)
                  try {
                    val (fields, _) = execute(sql,
                      IndexedSeq.fill[Any](oids.length)(null))
                    PgWire.writeRowDescription(out, fields)
                  } catch {
                    case scala.util.control.NonFatal(_) =>
                      PgWire.writeNoData(out)
                  }
                case None =>
                  extErr("26000", s"unknown prepared statement '$name'")
              }
              case other => extErr("08P01", s"bad Describe kind '$other'")
            }
          case 'E' if !errorState =>
            val (name, maxRows) = PgWire.parseExecute(msg.body)
            portals.get(name) match {
              case None => extErr("34000", s"unknown portal '$name'")
              case Some((fields, it)) =>
                var sent = 0
                while (it.hasNext && (maxRows <= 0 || sent < maxRows)) {
                  val r = it.next()
                  PgWire.writeDataRowRaw(out, r.zip(fields).map {
                    case (v, f) => PgWire.encodeCell(v, f.oid, f.format)
                  })
                  sent += 1
                }
                if (it.hasNext) PgWire.writePortalSuspended(out)
                else PgWire.writeCommandComplete(out, s"SELECT $sent")
            }
          case 'C' if !errorState =>
            val (kind, name) = PgWire.parseDescribe(msg.body) // same wire shape
            kind match {
              case 'S' => prepared.remove(name)
              case 'P' => portals.remove(name)
              case _ => ()
            }
            PgWire.writeCloseComplete(out)
          case 'P' | 'B' | 'D' | 'E' | 'C' => () // poisoned: wait for Sync

          case other =>
            PgWire.writeError(out, "08P01",
              s"fixture does not handle message '$other'")
            PgWire.writeReadyForQuery(out)
        }
      }
    } catch {
      case _: EOFException | _: SocketException => () // client went away
    } finally { sock.close(); accepted.remove(sock) }
  }

  /** One SCRAM-SHA-256 exchange (server side). Returns true and has
    * written AuthenticationSASLFinal + AuthenticationOk on success;
    * returns false after an ErrorResponse on any failure (unknown
    * user, bad proof, protocol deviation). The AuthMessage is
    * reconstructed from the EXACT bytes that crossed the wire (the
    * received client-final minus its `,p=` suffix), so any tampering
    * with nonce or channel-binding breaks the proof. */
  private def scramExchange(user: String, in: DataInputStream,
                            out: DataOutputStream): Boolean = {
    // shared exchange (Scram.serverExchange — also behind
    // SparkSqlPgServer); this fixture additionally records attempts
    val ok = Scram.serverExchange(user, users.toMap, in, out)
    authAttempts.add((user, ok))
    ok
  }

  // ---- COPY FROM STDIN (the bulk-ingest write path) ----

  private val CopyRe =
    """(?is)^\s*COPY\s+(\w+)\s*\(([\w\s,]+)\)\s+FROM\s+STDIN\s*;?\s*$""".r

  /** Serve one COPY-in: CopyInResponse, then accumulate CopyData
    * frames until CopyDone (frame boundaries carry no meaning — rows
    * and UTF-8 sequences may span frames, so bytes concatenate BEFORE
    * decoding), parse the text-format rows against the declared column
    * types, append to the store, CommandComplete("COPY n"). Errors
    * (unknown table/column, bad cell) answer ErrorResponse after
    * draining the stream so the connection stays usable. */
  private def copyIn(sql: String, in: DataInputStream,
                     out: DataOutputStream): Unit = {
    val CopyRe(tableName, colsRaw) = sql: @unchecked
    // validate the target BEFORE CopyInResponse (the client sends no
    // data until it sees 'G'): an invalid COPY answers ErrorResponse
    // immediately, like a real backend
    val validated: Either[String, (Store, Seq[Int])] =
      try {
        val table = stores.getOrElse(tableName.toLowerCase,
          throw new IllegalArgumentException(s"unknown COPY table $tableName"))
        val colIdx = table.columns.map(_._1).zipWithIndex.toMap
        val targets = colsRaw.split(",").map(_.trim).toSeq
        val perm = targets.map(c => colIdx.getOrElse(c,
          throw new IllegalArgumentException(s"unknown COPY column $c")))
        require(perm.distinct.size == table.columns.size,
          s"COPY must list every column of $tableName exactly once")
        Right((table, perm))
      } catch {
        case scala.util.control.NonFatal(e) =>
          Left(s"${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    validated match {
      case Left(msg) =>
        PgWire.writeError(out, "42P01", msg)
        return
      case Right(_) =>
        PgWire.writeCopyInResponse(out, colsRaw.split(",").length)
    }
    val Right((table, perm)) = validated: @unchecked
    val buf = new java.io.ByteArrayOutputStream(1 << 16)
    var done = false
    var failed: String = null
    while (!done) {
      val m = PgWire.readMsg(in)
      m.tag.toChar match {
        case 'd' => if (failed == null) buf.write(m.body)
        case 'c' => done = true
        case 'f' => // body is a bare NUL-terminated message string
          failed = "client CopyFail: " + new String(m.body,
            java.nio.charset.StandardCharsets.UTF_8).takeWhile(_ != 0)
          done = true
        case other =>
          failed = s"unexpected message '$other' during COPY"; done = true
      }
      require(buf.size <= (1 << 28), "COPY payload exceeds fixture cap")
    }
    val result: Either[String, Int] =
      if (failed != null) Left(failed)
      else try {
        val text = new String(buf.toByteArray,
          java.nio.charset.StandardCharsets.UTF_8)
        // split on UNESCAPED newlines only: copyEncodeRow escapes \n in
        // data, so a raw '\n' byte is always a row boundary
        val lines = text.split("\n", -1).toSeq.filter(_.nonEmpty)
        // parse EVERYTHING before appending anything: a malformed row
        // rejects the whole COPY (all-or-nothing per statement, like a
        // real server's transactional COPY)
        val parsed = lines.map { line =>
          val cells = PgWire.copyDecodeLine(line)
          require(cells.length == perm.length,
            s"COPY row has ${cells.length} cells, expected ${perm.length}")
          val row = new Array[Any](table.columns.length)
          cells.zip(perm).foreach { case (cell, i) =>
            row(i) =
              if (cell == null) null
              else table.columns(i)._2 match {
                case PgWire.OidInt8 => java.lang.Long.valueOf(cell)
                case PgWire.OidFloat8 => java.lang.Double.valueOf(cell)
                case _ => cell
              }
          }
          row
        }
        parsed.foreach(table.rows.add)
        Right(parsed.size)
      } catch {
        case scala.util.control.NonFatal(e) =>
          Left(s"${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    result match {
      case Right(n) => PgWire.writeCommandComplete(out, s"COPY $n")
      case Left(msg) => PgWire.writeError(out, "22P04", msg)
    }
  }

  // ---- the SELECT evaluator ----

  private val SelectRe =
    """(?is)^\s*SELECT\s+(.*?)\s+FROM\s+(\w+)(?:\s+WHERE\s+(.*?))?(?:\s+GROUP\s+BY\s+(.*?))?(?:\s+LIMIT\s+(\d+))?\s*;?\s*$""".r
  private val AggItemRe =
    """(?is)^(COUNT|SUM|MIN|MAX)\s*\(\s*(\*|\w+)\s*\)(?:\s+AS\s+(\w+))?$""".r
  private val ColItemRe = """(?is)^(\w+)(?:\s+AS\s+(\w+))?$""".r

  private def execute(sql: String,
                      params: IndexedSeq[Any] = IndexedSeq.empty)
      : (Seq[PgWire.Field], Seq[Seq[Any]]) = sql match {
    case SelectRe(colsRaw, tableName, whereRaw, groupRaw, limitRaw) =>
      val table = stores.getOrElse(tableName.toLowerCase,
        throw new IllegalArgumentException(s"unknown table $tableName"))
      val colIdx = table.columns.map(_._1).zipWithIndex.toMap
      val preds = Option(whereRaw).toSeq
        .flatMap(_.split("(?i)\\s+AND\\s+").toSeq)
        .map(p => parsePredicate(p.trim, colIdx, params))
      val limit = Option(limitRaw).map(_.toInt).getOrElse(Int.MaxValue)
      def filtered = table.snapshot.iterator.filter(r => preds.forall(_(r)))
      val items =
        if (colsRaw.trim == "*") table.columns.map(c => (c._1, None: Option[String]))
        else colsRaw.split(",").map(_.trim).toSeq.map {
          case AggItemRe(f, a, al) => (s"${f.toUpperCase}($a)", Option(al))
          case ColItemRe(c, al) => (c, Option(al))
          case other => throw new IllegalArgumentException(
            s"unsupported select item: $other")
        }
      val isAgg = groupRaw != null || items.exists(_._1.endsWith(")"))

      if (!isAgg) {
        val projected = items.map { case (c, _) =>
          colIdx.getOrElse(c, throw new IllegalArgumentException(
            s"unknown column $c in $tableName"))
        }
        val fields = items.zip(projected).map { case ((_, alias), i) =>
          val (name, oid) = table.columns(i)
          PgWire.Field(alias.getOrElse(name), oid)
        }
        (fields, filtered.take(limit).map(r => projected.map(r(_))).toSeq)
      } else {
        // GROUP BY / aggregate path — the shapes Spark's aggregate
        // pushdown renders: group columns + COUNT/SUM/MIN/MAX items
        val gNames = Option(groupRaw).toSeq
          .flatMap(_.split(",").map(_.trim).toSeq)
        val gIdx = gNames.map(c => colIdx.getOrElse(c,
          throw new IllegalArgumentException(s"unknown GROUP BY column $c")))
        def oidOf(c: String): Int = table.columns(colIdx(c))._2
        // (field, per-group evaluator)
        val evals: Seq[(PgWire.Field, Seq[Array[Any]] => Any)] =
          items.map {
            case (item @ AggItemRe(f, arg, _), alias) =>
              val name = alias.getOrElse(item.toLowerCase)
              f.toUpperCase match {
                case "COUNT" if arg == "*" =>
                  (PgWire.Field(name, PgWire.OidInt8),
                    (rs: Seq[Array[Any]]) => java.lang.Long.valueOf(rs.size.toLong))
                case "COUNT" =>
                  val i = colIdx(arg)
                  (PgWire.Field(name, PgWire.OidInt8),
                    (rs: Seq[Array[Any]]) =>
                      java.lang.Long.valueOf(rs.count(_(i) != null).toLong))
                case "SUM" =>
                  val i = colIdx(arg)
                  val oid = oidOf(arg)
                  require(oid != PgWire.OidText, s"SUM over text column $arg")
                  (PgWire.Field(name, oid), (rs: Seq[Array[Any]]) => {
                    val vs = rs.map(_(i)).filter(_ != null)
                    if (vs.isEmpty) null
                    else if (oid == PgWire.OidInt8)
                      java.lang.Long.valueOf(vs.map(_.asInstanceOf[Long]).sum)
                    else java.lang.Double.valueOf(vs.map(_.asInstanceOf[Double]).sum)
                  })
                case mm @ ("MIN" | "MAX") =>
                  val i = colIdx(arg)
                  (PgWire.Field(name, oidOf(arg)), (rs: Seq[Array[Any]]) => {
                    val vs = rs.map(_(i)).filter(_ != null)
                    if (vs.isEmpty) null
                    else {
                      val ord = new Ordering[Any] {
                        def compare(a: Any, b: Any): Int =
                          PgWireLoopbackServer.this.compare(a, b)
                      }
                      if (mm == "MIN") vs.min(ord) else vs.max(ord)
                    }
                  })
              }
            case (c, alias) =>
              val pos = gNames.indexOf(c)
              require(pos >= 0, s"non-aggregated select item $c not in GROUP BY")
              val i = colIdx(c)
              (PgWire.Field(alias.getOrElse(c), oidOf(c)),
                (rs: Seq[Array[Any]]) => rs.head(i))
          }
        val groups: Seq[Seq[Array[Any]]] =
          if (gIdx.isEmpty) Seq(filtered.toSeq) // global aggregate: 1 row even when empty
          else filtered.toSeq.groupBy(r => gIdx.map(r(_)).toVector).values.toSeq
        val rows = groups.iterator
          .filter(g => gIdx.isEmpty || g.nonEmpty)
          .take(limit)
          .map(g => evals.map(_._2(g)))
          .toSeq
        (evals.map(_._1), rows)
      }
    case _ =>
      throw new IllegalArgumentException(
        s"fixture supports only simple SELECT, got: ${sql.take(80)}")
  }

  private val CmpRe = """(?s)^(\w+)\s*(=|<>|!=|<=|>=|<|>)\s*(.+)$""".r
  private val IsNullRe = """(?is)^(\w+)\s+IS\s+NULL$""".r
  private val IsNotNullRe = """(?is)^(\w+)\s+IS\s+NOT\s+NULL$""".r

  private def parsePredicate(p: String, colIdx: Map[String, Int],
                             params: IndexedSeq[Any])
      : Array[Any] => Boolean = {
    def idx(c: String): Int = colIdx.getOrElse(c,
      throw new IllegalArgumentException(s"unknown column $c in WHERE"))
    p match {
      case IsNotNullRe(c) =>
        val i = idx(c); r => r(i) != null
      case IsNullRe(c) =>
        val i = idx(c); r => r(i) == null
      case CmpRe(c, op, litRaw) =>
        val i = idx(c)
        val lit = parseLiteral(litRaw.trim, params)
        r => {
          val v = r(i)
          // SQL three-valued logic: NULL compares to nothing
          if (v == null || lit == null) false
          else {
            val cmp = compare(v, lit)
            op match {
              case "=" => cmp == 0
              case "<>" | "!=" => cmp != 0
              case "<" => cmp < 0
              case "<=" => cmp <= 0
              case ">" => cmp > 0
              case ">=" => cmp >= 0
            }
          }
        }
      case other =>
        throw new IllegalArgumentException(s"unsupported predicate: $other")
    }
  }

  private def parseLiteral(s: String, params: IndexedSeq[Any]): Any =
    if (s.equalsIgnoreCase("NULL")) null
    else if (s.matches("\\$\\d+")) { // extended-protocol placeholder
      val n = s.drop(1).toInt
      require(n >= 1 && n <= params.length,
        s"parameter $s out of range (${params.length} bound)")
      params(n - 1)
    }
    else if (s.startsWith("'") && s.endsWith("'") && s.length >= 2)
      s.substring(1, s.length - 1).replace("''", "'")
    else if (s.matches("[+-]?\\d+")) java.lang.Long.valueOf(s)
    else java.lang.Double.valueOf(s) // throws on garbage → ErrorResponse

  /** Text-format parameter with no declared OID: narrowest of
    * long / double / string. */
  private def inferText(s: String): Any =
    if (s.matches("[+-]?\\d+")) java.lang.Long.valueOf(s)
    else try java.lang.Double.valueOf(s)
    catch { case _: NumberFormatException => s }

  private def compare(a: Any, b: Any): Int = (a, b) match {
    case (x: String, y: String) => x.compareTo(y)
    case (x: java.lang.Long, y: java.lang.Long) => x.compareTo(y)
    case (x: Number, y: Number) =>
      java.lang.Double.compare(x.doubleValue(), y.doubleValue())
    case _ => throw new IllegalArgumentException(
      s"cannot compare ${a.getClass.getSimpleName} to ${b.getClass.getSimpleName}")
  }
}

object PgWireLoopbackServer {

  /** An in-memory table: (name, type OID) per column + row values
    * (Long / Double / String / null, matching the OID). */
  final case class Table(columns: Seq[(String, Int)], rows: Seq[Array[Any]])
}
