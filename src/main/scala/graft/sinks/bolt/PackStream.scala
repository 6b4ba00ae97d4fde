package graft.sinks.bolt

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.nio.charset.StandardCharsets.UTF_8

import scala.collection.immutable.ListMap
import scala.collection.mutable

/** PackStream — the serialization format of the Bolt protocol (the
  * wire format the reference's Neo4j driver pool speaks,
  * app/neo4j_pool.py:6-19; format spec is public Neo4j
  * documentation). Implements the subset the [[graft.sinks.CypherSink]]
  * write path needs, both directions:
  *
  *   - Null, Boolean, Integer (TINY_INT through INT_64), Float64
  *   - String, List, Map (tiny / 8 / 16 / 32 sizes)
  *   - Bytes (8 / 16 / 32 sizes) — Array[Byte] round-trips byte-equal
  *   - Structure (tiny size + signature byte) — Bolt messages
  *
  * Values map Scala-side as: null, Boolean, Byte/Short/Int/Long
  * (always decoded back as Long), Double, String, Seq[Any],
  * Map[String, Any], [[PackStream.Struct]]. Maps DECODE as ListMap in
  * wire order so recorded traffic is deterministic to assert on;
  * encode order is the map's iteration order.
  *
  * Everything here is driver-agnostic pure bytes — no Neo4j classes —
  * so it compiles in this zero-dependency build and is testable
  * against a loopback socket.
  */
object PackStream {

  /** A PackStream structure: `signature` tags the message/record type
    * (e.g. 0x01 HELLO, 0x10 RUN, 0x70 SUCCESS). */
  final case class Struct(signature: Byte, fields: Seq[Any])

  // marker bytes (public PackStream spec v1/v2)
  private final val NULL = 0xC0
  private final val FLOAT64 = 0xC1
  private final val FALSE = 0xC2
  private final val TRUE = 0xC3
  private final val INT8 = 0xC8
  private final val INT16 = 0xC9
  private final val INT32 = 0xCA
  private final val INT64 = 0xCB
  private final val BYTES8 = 0xCC
  private final val BYTES16 = 0xCD
  private final val BYTES32 = 0xCE
  private final val STRING8 = 0xD0
  private final val STRING16 = 0xD1
  private final val STRING32 = 0xD2
  private final val LIST8 = 0xD4
  private final val LIST16 = 0xD5
  private final val LIST32 = 0xD6
  private final val MAP8 = 0xD8
  private final val MAP16 = 0xD9
  private final val MAP32 = 0xDA

  def pack(v: Any): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    write(out, v)
    out.flush()
    bos.toByteArray
  }

  private def write(out: DataOutputStream, v: Any): Unit = v match {
    case null => out.writeByte(NULL)
    case None => out.writeByte(NULL)
    case b: Boolean => out.writeByte(if (b) TRUE else FALSE)
    case b: Byte => writeLong(out, b.toLong)
    case s: Short => writeLong(out, s.toLong)
    case i: Int => writeLong(out, i.toLong)
    case l: Long => writeLong(out, l)
    case f: Float => out.writeByte(FLOAT64); out.writeDouble(f.toDouble)
    case d: Double => out.writeByte(FLOAT64); out.writeDouble(d)
    case s: String => writeString(out, s)
    case Struct(sig, fields) =>
      require(fields.length <= 15, s"structure arity ${fields.length} > 15")
      out.writeByte(0xB0 | fields.length)
      out.writeByte(sig.toInt)
      fields.foreach(write(out, _))
    case m: collection.Map[_, _] =>
      writeSize(out, m.size, 0xA0, MAP8, MAP16, MAP32)
      m.foreach { case (k, mv) =>
        writeString(out, k.asInstanceOf[String]); write(out, mv)
      }
    case s: collection.Seq[_] =>
      writeSize(out, s.size, 0x90, LIST8, LIST16, LIST32)
      s.foreach(write(out, _))
    // Array[Byte] (Spark BinaryType props, e.g. multimodal payloads)
    // MUST take the spec's BYTES markers, not fall through to the
    // generic Array→List case — a real Neo4j would otherwise store a
    // LIST<INTEGER> and the round-trip would no longer be byte-equal.
    // BYTES has no tiny form: 8/16/32 sizes only.
    case a: Array[Byte] =>
      if (a.length <= 255) { out.writeByte(BYTES8); out.writeByte(a.length) }
      else if (a.length <= 65535) { out.writeByte(BYTES16); out.writeShort(a.length) }
      else { out.writeByte(BYTES32); out.writeInt(a.length) }
      out.write(a)
    case a: Array[_] =>
      writeSize(out, a.length, 0x90, LIST8, LIST16, LIST32)
      a.foreach(write(out, _))
    case other => throw new IllegalArgumentException(
      s"PackStream cannot encode ${other.getClass.getName}")
  }

  private def writeLong(out: DataOutputStream, l: Long): Unit =
    if (l >= -16 && l <= 127) out.writeByte(l.toInt)            // TINY_INT
    else if (l >= Byte.MinValue && l <= Byte.MaxValue) {
      out.writeByte(INT8); out.writeByte(l.toInt)
    } else if (l >= Short.MinValue && l <= Short.MaxValue) {
      out.writeByte(INT16); out.writeShort(l.toInt)
    } else if (l >= Int.MinValue && l <= Int.MaxValue) {
      out.writeByte(INT32); out.writeInt(l.toInt)
    } else { out.writeByte(INT64); out.writeLong(l) }

  private def writeString(out: DataOutputStream, s: String): Unit = {
    val b = s.getBytes(UTF_8)
    writeSize(out, b.length, 0x80, STRING8, STRING16, STRING32)
    out.write(b)
  }

  private def writeSize(out: DataOutputStream, n: Int, tiny: Int,
                        m8: Int, m16: Int, m32: Int): Unit =
    if (n <= 15) out.writeByte(tiny | n)
    else if (n <= 255) { out.writeByte(m8); out.writeByte(n) }
    else if (n <= 65535) { out.writeByte(m16); out.writeShort(n) }
    else { out.writeByte(m32); out.writeInt(n) }

  def unpack(bytes: Array[Byte]): Any =
    read(new DataInputStream(new java.io.ByteArrayInputStream(bytes)))

  def read(in: DataInputStream): Any = {
    val marker = in.readUnsignedByte()
    marker match {
      case NULL => null
      case TRUE => true
      case FALSE => false
      case FLOAT64 => in.readDouble()
      case INT8 => in.readByte().toLong
      case INT16 => in.readShort().toLong
      case INT32 => in.readInt().toLong
      case INT64 => in.readLong()
      case BYTES8 => readBytes(in, in.readUnsignedByte())
      case BYTES16 => readBytes(in, in.readUnsignedShort())
      case BYTES32 => readBytes(in, in.readInt())
      case STRING8 => readString(in, in.readUnsignedByte())
      case STRING16 => readString(in, in.readUnsignedShort())
      case STRING32 => readString(in, in.readInt())
      case LIST8 => readList(in, in.readUnsignedByte())
      case LIST16 => readList(in, in.readUnsignedShort())
      case LIST32 => readList(in, in.readInt())
      case MAP8 => readMap(in, in.readUnsignedByte())
      case MAP16 => readMap(in, in.readUnsignedShort())
      case MAP32 => readMap(in, in.readInt())
      case m if m <= 0x7F => m.toLong                     // positive TINY_INT
      case m if m >= 0xF0 => (m - 0x100).toLong           // negative TINY_INT
      case m if (m & 0xF0) == 0x80 => readString(in, m & 0x0F)
      case m if (m & 0xF0) == 0x90 => readList(in, m & 0x0F)
      case m if (m & 0xF0) == 0xA0 => readMap(in, m & 0x0F)
      case m if (m & 0xF0) == 0xB0 =>
        val sig = in.readByte()
        Struct(sig, Vector.fill(m & 0x0F)(read(in)))
      case m => throw new IllegalArgumentException(
        f"PackStream marker 0x$m%02X not supported")
    }
  }

  private def readString(in: DataInputStream, n: Int): String = {
    val b = new Array[Byte](n); in.readFully(b); new String(b, UTF_8)
  }

  /** BYTES decode to Array[Byte] — callers comparing decoded values
    * must use sameElements (JVM array equality is by reference). */
  private def readBytes(in: DataInputStream, n: Int): Array[Byte] = {
    val b = new Array[Byte](n); in.readFully(b); b
  }

  private def readList(in: DataInputStream, n: Int): Seq[Any] =
    Vector.fill(n)(read(in))

  private def readMap(in: DataInputStream, n: Int): Map[String, Any] = {
    val b = mutable.ListBuffer.empty[(String, Any)]
    var i = 0
    while (i < n) {
      val k = read(in) match {
        case s: String => s
        case other => throw new IllegalArgumentException(
          s"PackStream map key must be a string, got $other")
      }
      b += k -> read(in)
      i += 1
    }
    ListMap(b.toSeq: _*)
  }
}
