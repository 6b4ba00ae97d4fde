package graft.sources.pgwire

import java.io.{DataInputStream, DataOutputStream, EOFException}
import java.nio.charset.StandardCharsets.UTF_8

/** PostgreSQL frontend/backend wire protocol v3 — the format the
  * reference's pooled Postgres source speaks on the wire
  * (main_graph_topraq.py:94-95 reads through a psycopg pool; the
  * protocol itself is public PostgreSQL documentation, "Frontend/
  * Backend Protocol, Message Formats"). Implements the simple-query
  * subset a read-only Spark source needs, both directions:
  *
  *   - frontend: StartupMessage (196608 + key/value params),
  *     Query ('Q'), Terminate ('X')
  *   - backend: AuthenticationOk ('R'/0), ParameterStatus ('S'),
  *     ReadyForQuery ('Z'), RowDescription ('T'), DataRow ('D'),
  *     CommandComplete ('C'), ErrorResponse ('E')
  *
  * All simple-query result cells travel in TEXT format (format code
  * 0): int8 and float8 as their canonical string forms (Long.toString
  * / Double.toString round-trip losslessly), text verbatim, NULL as
  * the -1 length sentinel. Pure bytes, no driver classes — the
  * Postgres analog of [[graft.sinks.bolt.PackStream]].
  *
  * Extended-query protocol (public docs "Extended Query"): Parse
  * ('P') / Bind ('B') / Describe ('D') / Execute ('E') / Close ('C')
  * / Sync ('S') frontend messages and their backend acks
  * (ParseComplete '1', BindComplete '2', CloseComplete '3',
  * ParameterDescription 't', NoData 'n', PortalSuspended 's') — the
  * path every real driver takes: statements carry `$n` placeholders,
  * values ride as BOUND PARAMETERS (never spliced into SQL text), and
  * per-column result format codes let int8/float8 cells return in
  * BINARY format (8-byte big-endian two's-complement / IEEE-754 bits
  * — public docs pg_type send functions int8send/float8send): fewer
  * wire bytes and zero text-parse cost on the hot decode path.
  */
object PgWire {

  /** Public pg_catalog type OIDs for the three wire types this source
    * carries. */
  final val OidInt8 = 20
  final val OidFloat8 = 701
  final val OidText = 25

  final val ProtocolV3 = 196608 // 3 << 16

  /** `format`: 0 = text, 1 = binary (per-column result format code,
    * negotiated by Bind's result-format list). */
  final case class Field(name: String, oid: Int, format: Int = 0)

  /** One backend message: tag byte + payload (length stripped). */
  final case class Msg(tag: Byte, body: Array[Byte])

  // ---- frontend encode ----

  def writeStartup(out: DataOutputStream, params: Map[String, String]): Unit = {
    val body = new java.io.ByteArrayOutputStream()
    val b = new DataOutputStream(body)
    b.writeInt(ProtocolV3)
    params.foreach { case (k, v) =>
      b.write(k.getBytes(UTF_8)); b.writeByte(0)
      b.write(v.getBytes(UTF_8)); b.writeByte(0)
    }
    b.writeByte(0)
    out.writeInt(4 + body.size())
    body.writeTo(out)
    out.flush()
  }

  def writeQuery(out: DataOutputStream, sql: String): Unit =
    writeMsg(out, 'Q', sql.getBytes(UTF_8) :+ 0.toByte)

  def writeTerminate(out: DataOutputStream): Unit =
    writeMsg(out, 'X', Array.emptyByteArray)

  // ---- extended-query frontend encode ----

  /** Parse ('P'): named (or unnamed, "") prepared statement from SQL
    * with `$n` placeholders + declared parameter type OIDs. */
  def writeParse(out: DataOutputStream, stmt: String, sql: String,
                 paramOids: Seq[Int]): Unit = {
    val body = new java.io.ByteArrayOutputStream()
    val b = new DataOutputStream(body)
    b.write(stmt.getBytes(UTF_8)); b.writeByte(0)
    b.write(sql.getBytes(UTF_8)); b.writeByte(0)
    b.writeShort(paramOids.length)
    paramOids.foreach(b.writeInt)
    writeMsg(out, 'P', body.toByteArray)
  }

  /** Bind ('B'): create a portal from a prepared statement.
    * `params` are pre-encoded cell bytes (null = SQL NULL) with their
    * per-parameter format codes; `resultFormats` is the per-column
    * result format list (empty = all text). */
  def writeBind(out: DataOutputStream, portal: String, stmt: String,
                paramFormats: Seq[Int], params: Seq[Array[Byte]],
                resultFormats: Seq[Int]): Unit = {
    val body = new java.io.ByteArrayOutputStream()
    val b = new DataOutputStream(body)
    b.write(portal.getBytes(UTF_8)); b.writeByte(0)
    b.write(stmt.getBytes(UTF_8)); b.writeByte(0)
    b.writeShort(paramFormats.length)
    paramFormats.foreach(b.writeShort)
    b.writeShort(params.length)
    params.foreach {
      case null => b.writeInt(-1)
      case bytes => b.writeInt(bytes.length); b.write(bytes)
    }
    b.writeShort(resultFormats.length)
    resultFormats.foreach(b.writeShort)
    writeMsg(out, 'B', body.toByteArray)
  }

  /** Describe ('D'): kind 'S' = prepared statement, 'P' = portal. */
  def writeDescribe(out: DataOutputStream, kind: Char, name: String): Unit =
    writeMsg(out, 'D', kind.toByte +: (name.getBytes(UTF_8) :+ 0.toByte))

  /** Execute ('E'): run a portal; maxRows 0 = no limit, >0 = suspend
    * after that many rows (PortalSuspended) — the fetch-size cursor
    * JDBC's setFetchSize rides on. */
  def writeExecute(out: DataOutputStream, portal: String, maxRows: Int): Unit = {
    val body = new java.io.ByteArrayOutputStream()
    val b = new DataOutputStream(body)
    b.write(portal.getBytes(UTF_8)); b.writeByte(0)
    b.writeInt(maxRows)
    writeMsg(out, 'E', body.toByteArray)
  }

  /** Close ('C' frontend): kind 'S' = statement, 'P' = portal. */
  def writeCloseStmt(out: DataOutputStream, kind: Char, name: String): Unit =
    writeMsg(out, 'C', kind.toByte +: (name.getBytes(UTF_8) :+ 0.toByte))

  def writeSync(out: DataOutputStream): Unit =
    writeMsg(out, 'S', Array.emptyByteArray)

  // ---- extended-query backend encode ----

  def writeParseComplete(out: DataOutputStream): Unit =
    writeMsg(out, '1', Array.emptyByteArray)
  def writeBindComplete(out: DataOutputStream): Unit =
    writeMsg(out, '2', Array.emptyByteArray)
  def writeCloseComplete(out: DataOutputStream): Unit =
    writeMsg(out, '3', Array.emptyByteArray)
  def writeNoData(out: DataOutputStream): Unit =
    writeMsg(out, 'n', Array.emptyByteArray)
  def writePortalSuspended(out: DataOutputStream): Unit =
    writeMsg(out, 's', Array.emptyByteArray)

  def writeParameterDescription(out: DataOutputStream, oids: Seq[Int]): Unit = {
    val body = new java.io.ByteArrayOutputStream()
    val b = new DataOutputStream(body)
    b.writeShort(oids.length)
    oids.foreach(b.writeInt)
    writeMsg(out, 't', body.toByteArray)
  }

  // ---- extended-query server-side decode ----

  def parseParse(body: Array[Byte]): (String, String, Seq[Int]) = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(body))
    val stmt = readCString(in)
    val sql = readCString(in)
    val n = in.readShort()
    (stmt, sql, (0 until n).map(_ => in.readInt()))
  }

  /** → (portal, stmt, paramFormats, params (null = SQL NULL),
    * resultFormats). */
  def parseBind(body: Array[Byte])
      : (String, String, Seq[Int], Seq[Array[Byte]], Seq[Int]) = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(body))
    val portal = readCString(in)
    val stmt = readCString(in)
    val nf = in.readShort()
    val formats = (0 until nf).map(_ => in.readShort().toInt)
    val np = in.readShort()
    val params = (0 until np).map { _ =>
      val len = in.readInt()
      if (len < 0) null
      else { val b = new Array[Byte](len); in.readFully(b); b }
    }
    val nr = in.readShort()
    val results = (0 until nr).map(_ => in.readShort().toInt)
    (portal, stmt, formats, params, results)
  }

  def parseDescribe(body: Array[Byte]): (Char, String) = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(body))
    (in.readByte().toChar, readCString(in))
  }

  def parseExecute(body: Array[Byte]): (String, Int) = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(body))
    (readCString(in), in.readInt())
  }

  def parseParameterDescription(body: Array[Byte]): Seq[Int] = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(body))
    val n = in.readShort()
    (0 until n).map(_ => in.readInt())
  }

  // ---- binary cell format (format code 1) ----

  /** int8send: 8-byte big-endian two's-complement. */
  def binInt8(v: Long): Array[Byte] =
    java.nio.ByteBuffer.allocate(8).putLong(v).array()

  /** float8send: IEEE-754 bit pattern, big-endian. */
  def binFloat8(v: Double): Array[Byte] =
    java.nio.ByteBuffer.allocate(8).putDouble(v).array()

  def binToInt8(b: Array[Byte]): Long = {
    require(b.length == 8, s"binary int8 cell has ${b.length} bytes")
    java.nio.ByteBuffer.wrap(b).getLong
  }

  def binToFloat8(b: Array[Byte]): Double = {
    require(b.length == 8, s"binary float8 cell has ${b.length} bytes")
    java.nio.ByteBuffer.wrap(b).getDouble
  }

  /** Encode one cell for the wire: `format` 0 = canonical text bytes,
    * 1 = the type's binary send format (text columns are UTF-8 either
    * way). null → null (the writer emits the -1 sentinel). */
  def encodeCell(v: Any, oid: Int, format: Int): Array[Byte] = v match {
    case null => null
    case l: java.lang.Long if format == 1 && oid == OidInt8 => binInt8(l)
    case d: java.lang.Double if format == 1 && oid == OidFloat8 => binFloat8(d)
    case other =>
      require(format == 0 || oid == OidText,
        s"no binary codec for OID $oid value ${other.getClass.getSimpleName}")
      other.toString.getBytes(UTF_8)
  }

  /** Decode one wire cell to Long / Double / String per OID+format. */
  def decodeCell(b: Array[Byte], oid: Int, format: Int): Any =
    if (b == null) null
    else if (format == 1) oid match {
      case OidInt8 => java.lang.Long.valueOf(binToInt8(b))
      case OidFloat8 => java.lang.Double.valueOf(binToFloat8(b))
      case OidText => new String(b, UTF_8)
      case other =>
        throw new IllegalArgumentException(s"no binary codec for OID $other")
    } else {
      val s = new String(b, UTF_8)
      oid match {
        case OidInt8 => java.lang.Long.valueOf(s)
        case OidFloat8 => java.lang.Double.valueOf(s)
        case _ => s
      }
    }

  /** DataRow from pre-encoded cell bytes (null = NULL sentinel) —
    * the extended-protocol row writer (text and binary cells mix
    * freely per the negotiated result formats). */
  def writeDataRowRaw(out: DataOutputStream, cells: Seq[Array[Byte]]): Unit = {
    val body = new java.io.ByteArrayOutputStream()
    val b = new DataOutputStream(body)
    b.writeShort(cells.length)
    cells.foreach {
      case null => b.writeInt(-1)
      case bytes => b.writeInt(bytes.length); b.write(bytes)
    }
    writeMsg(out, 'D', body.toByteArray)
  }

  // ---- backend encode ----

  def writeAuthOk(out: DataOutputStream): Unit = {
    val b = new java.io.ByteArrayOutputStream(4)
    new DataOutputStream(b).writeInt(0)
    writeMsg(out, 'R', b.toByteArray)
  }

  // ---- SASL authentication (public docs "SASL Authentication";
  // AuthenticationSASL family rides the 'R' tag with a code) ----

  /** AuthenticationSASL (code 10): advertise mechanism names. */
  def writeAuthSasl(out: DataOutputStream, mechanisms: Seq[String]): Unit = {
    val body = new java.io.ByteArrayOutputStream()
    val b = new DataOutputStream(body)
    b.writeInt(10)
    mechanisms.foreach { m => b.write(m.getBytes(UTF_8)); b.writeByte(0) }
    b.writeByte(0)
    writeMsg(out, 'R', body.toByteArray)
  }

  /** AuthenticationSASLContinue (code 11): server-first-message. */
  def writeAuthSaslContinue(out: DataOutputStream, data: String): Unit = {
    val body = new java.io.ByteArrayOutputStream()
    val b = new DataOutputStream(body)
    b.writeInt(11)
    b.write(data.getBytes(UTF_8))
    writeMsg(out, 'R', body.toByteArray)
  }

  /** AuthenticationSASLFinal (code 12): server-final-message. */
  def writeAuthSaslFinal(out: DataOutputStream, data: String): Unit = {
    val body = new java.io.ByteArrayOutputStream()
    val b = new DataOutputStream(body)
    b.writeInt(12)
    b.write(data.getBytes(UTF_8))
    writeMsg(out, 'R', body.toByteArray)
  }

  /** Frontend SASLInitialResponse ('p'): chosen mechanism +
    * length-prefixed initial client response. */
  def writeSaslInitialResponse(out: DataOutputStream, mechanism: String,
                               data: String): Unit = {
    val body = new java.io.ByteArrayOutputStream()
    val b = new DataOutputStream(body)
    b.write(mechanism.getBytes(UTF_8)); b.writeByte(0)
    val bytes = data.getBytes(UTF_8)
    b.writeInt(bytes.length)
    b.write(bytes)
    writeMsg(out, 'p', body.toByteArray)
  }

  /** Frontend SASLResponse ('p'): continuation data, no framing. */
  def writeSaslResponse(out: DataOutputStream, data: String): Unit =
    writeMsg(out, 'p', data.getBytes(UTF_8))

  /** 'R' body → auth code (0 ok, 10/11/12 SASL states). */
  def authCode(body: Array[Byte]): Int =
    new DataInputStream(new java.io.ByteArrayInputStream(body)).readInt()

  /** 'R' body after the code, as UTF-8 (SASL challenge payloads). */
  def authData(body: Array[Byte]): String =
    new String(body, 4, body.length - 4, UTF_8)

  /** AuthenticationSASL body → advertised mechanisms. */
  def parseSaslMechanisms(body: Array[Byte]): Seq[String] =
    new String(body, 4, body.length - 4, UTF_8)
      .split("\u0000").toSeq.filter(_.nonEmpty)

  /** Server side: SASLInitialResponse body → (mechanism, initial
    * client response). */
  def parseSaslInitialResponse(body: Array[Byte]): (String, String) = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(body))
    val mech = readCString(in)
    val len = in.readInt()
    val data = new Array[Byte](len)
    if (len > 0) in.readFully(data)
    (mech, new String(data, UTF_8))
  }

  def writeParameterStatus(out: DataOutputStream, k: String, v: String): Unit =
    writeMsg(out, 'S',
      (k.getBytes(UTF_8) :+ 0.toByte) ++ (v.getBytes(UTF_8) :+ 0.toByte))

  def writeReadyForQuery(out: DataOutputStream): Unit =
    writeMsg(out, 'Z', Array('I'.toByte))

  def writeRowDescription(out: DataOutputStream, fields: Seq[Field]): Unit = {
    val body = new java.io.ByteArrayOutputStream()
    val b = new DataOutputStream(body)
    b.writeShort(fields.length)
    fields.foreach { f =>
      b.write(f.name.getBytes(UTF_8)); b.writeByte(0)
      b.writeInt(0)        // table OID (none)
      b.writeShort(0)      // attribute number (none)
      b.writeInt(f.oid)
      b.writeShort(if (f.oid == OidText) -1 else 8) // typlen
      b.writeInt(-1)       // typmod
      b.writeShort(f.format) // 0 = text, 1 = binary
    }
    writeMsg(out, 'T', body.toByteArray)
  }

  /** `cells` as text-format column values; null → NULL sentinel. */
  def writeDataRow(out: DataOutputStream, cells: Seq[String]): Unit = {
    val body = new java.io.ByteArrayOutputStream()
    val b = new DataOutputStream(body)
    b.writeShort(cells.length)
    cells.foreach {
      case null => b.writeInt(-1)
      case s =>
        val bytes = s.getBytes(UTF_8)
        b.writeInt(bytes.length); b.write(bytes)
    }
    writeMsg(out, 'D', body.toByteArray)
  }

  def writeCommandComplete(out: DataOutputStream, tag: String): Unit =
    writeMsg(out, 'C', tag.getBytes(UTF_8) :+ 0.toByte)

  // ---- COPY sub-protocol (bulk ingest; public docs "COPY" + message
  // formats CopyInResponse/CopyData/CopyDone/CopyFail) ----

  /** Backend: CopyInResponse ('G') — overall text format (0) + one
    * format code 0 per column. */
  def writeCopyInResponse(out: DataOutputStream, nCols: Int): Unit = {
    val body = new java.io.ByteArrayOutputStream()
    val b = new DataOutputStream(body)
    b.writeByte(0) // overall format: text
    b.writeShort(nCols)
    (0 until nCols).foreach(_ => b.writeShort(0))
    writeMsg(out, 'G', body.toByteArray)
  }

  /** Frontend: one CopyData ('d') frame. Frame boundaries carry no
    * meaning — rows (and even UTF-8 sequences) may span frames. */
  def writeCopyData(out: DataOutputStream, payload: Array[Byte]): Unit =
    writeMsg(out, 'd', payload)

  def writeCopyDone(out: DataOutputStream): Unit =
    writeMsg(out, 'c', Array.emptyByteArray)

  def writeCopyFail(out: DataOutputStream, message: String): Unit =
    writeMsg(out, 'f', message.getBytes(UTF_8) :+ 0.toByte)

  // ---- COPY text format (tab-separated, newline rows, \N null,
  // backslash escapes — public docs "COPY ... TEXT Format") ----

  /** One row as COPY text: cells tab-joined + trailing newline; null →
    * `\N`; backslash/tab/newline/CR in data escaped. */
  def copyEncodeRow(cells: Seq[String]): String = {
    val sb = new java.lang.StringBuilder(64)
    var first = true
    cells.foreach { c =>
      if (!first) sb.append('\t')
      first = false
      if (c == null) sb.append("\\N")
      else {
        var i = 0
        while (i < c.length) {
          c.charAt(i) match {
            case '\\' => sb.append("\\\\")
            case '\t' => sb.append("\\t")
            case '\n' => sb.append("\\n")
            case '\r' => sb.append("\\r")
            case ch => sb.append(ch)
          }
          i += 1
        }
      }
    }
    sb.append('\n').toString
  }

  /** One COPY text line (no trailing newline) → cells; `\N` → null. */
  def copyDecodeLine(line: String): Array[String] = {
    val cells = scala.collection.mutable.ArrayBuffer.empty[String]
    val sb = new java.lang.StringBuilder(64)
    var escaped = false
    var isNull = false
    var sawEscape = false
    def flush(): Unit = {
      // bare \N (the whole cell, un-escaped) is the null sentinel
      cells += (if (isNull && sb.length == 1 && sb.charAt(0) == 'N') null
                else sb.toString)
      sb.setLength(0); isNull = false; sawEscape = false
    }
    var i = 0
    while (i < line.length) {
      val ch = line.charAt(i)
      if (escaped) {
        ch match {
          case '\\' => sb.append('\\')
          case 't' => sb.append('\t')
          case 'n' => sb.append('\n')
          case 'r' => sb.append('\r')
          case 'N' if sb.length == 0 && !sawEscape => sb.append('N'); isNull = true
          case other => sb.append(other) // unknown escape: literal char
        }
        sawEscape = true
        escaped = false
      } else ch match {
        case '\\' => escaped = true
        case '\t' => flush()
        case other => sb.append(other); isNull = false
      }
      i += 1
    }
    require(!escaped, s"COPY line ends mid-escape: $line")
    flush()
    cells.toArray
  }

  def writeError(out: DataOutputStream, sqlState: String, message: String): Unit = {
    val body = new java.io.ByteArrayOutputStream()
    def fld(code: Char, v: String): Unit = {
      body.write(code)
      body.write(v.getBytes(UTF_8)); body.write(0)
    }
    fld('S', "ERROR"); fld('C', sqlState); fld('M', message)
    body.write(0)
    writeMsg(out, 'E', body.toByteArray)
  }

  // ---- shared framing ----

  def writeMsg(out: DataOutputStream, tag: Char, body: Array[Byte]): Unit = {
    out.writeByte(tag)
    out.writeInt(4 + body.length)
    out.write(body)
    out.flush()
  }

  /** Read one tagged message (anything after the startup message). */
  def readMsg(in: DataInputStream): Msg = {
    val tag = in.readByte()
    val len = in.readInt()
    require(len >= 4 && len <= (1 << 26), s"pgwire message length $len")
    val body = new Array[Byte](len - 4)
    in.readFully(body)
    Msg(tag, body)
  }

  /** Server side: read the startup message's parameter map (the
    * length-prefixed, untagged first message of a connection). */
  /** Startup read that answers SSLRequest (80877103) / GSSENCRequest
    * (80877104) with the single 'N' (not supported) byte, the way a
    * real TLS-less server does — an unmodified psql/libpq client
    * sends SSLRequest BEFORE the startup message, and a server that
    * chokes on it never sees a real client at all. Loops until the
    * genuine v3 startup arrives. */
  def readStartupNegotiating(in: DataInputStream,
                             out: DataOutputStream): Map[String, String] = {
    while (true) {
      val len = in.readInt()
      require(len >= 8 && len <= (1 << 20), s"pgwire startup length $len")
      val proto = in.readInt()
      if (proto == 80877103 || proto == 80877104) {
        out.write('N'.toInt); out.flush() // no TLS / no GSS here
      } else {
        require(proto == ProtocolV3,
          f"unsupported pgwire protocol 0x$proto%08X (only 3.0)")
        val body = new Array[Byte](len - 8)
        in.readFully(body)
        val parts = new String(body, UTF_8).split("\u0000").filter(_.nonEmpty)
        return parts.grouped(2).collect { case Array(k, v) => k -> v }.toMap
      }
    }
    throw new IllegalStateException("unreachable")
  }

  def readStartup(in: DataInputStream): Map[String, String] = {
    val len = in.readInt()
    require(len >= 8 && len <= (1 << 20), s"pgwire startup length $len")
    val proto = in.readInt()
    require(proto == ProtocolV3,
      f"unsupported pgwire protocol 0x$proto%08X (only 3.0)")
    val body = new Array[Byte](len - 8)
    in.readFully(body)
    val parts = new String(body, UTF_8).split("\u0000").filter(_.nonEmpty)
    parts.grouped(2).collect { case Array(k, v) => k -> v }.toMap
  }

  // ---- body decode helpers (client side) ----

  def parseRowDescription(body: Array[Byte]): Seq[Field] = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(body))
    val n = in.readShort()
    (0 until n).map { _ =>
      val name = readCString(in)
      in.readInt(); in.readShort()
      val oid = in.readInt()
      in.readShort(); in.readInt()
      val format = in.readShort()
      Field(name, oid, format)
    }
  }

  /** Raw cell bytes (null cell → null) — the extended-protocol row
    * parser; decode per the RowDescription's per-column formats. */
  def parseDataRowRaw(body: Array[Byte]): Array[Array[Byte]] = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(body))
    val n = in.readShort()
    Array.tabulate(n) { _ =>
      val len = in.readInt()
      if (len < 0) null
      else { val b = new Array[Byte](len); in.readFully(b); b }
    }
  }

  /** Text-format cells; null cell → null. */
  def parseDataRow(body: Array[Byte]): Array[String] = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(body))
    val n = in.readShort()
    Array.tabulate(n) { _ =>
      val len = in.readInt()
      if (len < 0) null
      else {
        val b = new Array[Byte](len); in.readFully(b); new String(b, UTF_8)
      }
    }
  }

  def parseError(body: Array[Byte]): String = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(body))
    val fields = scala.collection.mutable.Map.empty[Char, String]
    var code = in.read()
    while (code > 0) {
      fields += code.toChar -> readCString(in)
      code = in.read()
    }
    s"${fields.getOrElse('C', "?????")}: ${fields.getOrElse('M', "unknown")}"
  }

  private def readCString(in: DataInputStream): String = {
    val b = new java.io.ByteArrayOutputStream()
    var c = in.readByte()
    while (c != 0) { b.write(c); c = in.readByte() }
    new String(b.toByteArray, UTF_8)
  }

  /** Client-side EOF guard for readMsg. */
  def readMsgOpt(in: DataInputStream): Option[Msg] =
    try Some(readMsg(in)) catch { case _: EOFException => None }
}
