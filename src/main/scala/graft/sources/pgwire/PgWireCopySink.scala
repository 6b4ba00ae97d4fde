package graft.sources.pgwire

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Distributed bulk write over pgwire-v3 `COPY FROM STDIN` — the WRITE
  * half of the relational wire story (the source half is
  * [[PgWireTableProvider]]). The reference's terminal write is a Neo4j
  * MERGE sink; a warehouse deployment of the same pipelines also lands
  * relational outputs back in Postgres, and COPY is that server's bulk
  * path — one streamed statement per partition instead of row
  * INSERTs (public PostgreSQL docs, "COPY"; the protocol messages are
  * CopyInResponse/CopyData/CopyDone).
  *
  * Scale shape: `df.foreachPartition` — every partition task opens its
  * OWN socket and streams its rows through a bounded encode buffer, so
  * N executors drive N concurrent COPY statements (concurrent COPY to
  * one table is the standard Postgres bulk fan-in) and no row ever
  * materializes on the driver. The per-partition delivery guard
  * compares the server's `COPY n` acknowledgement against the rows
  * sent; a task failure before CopyDone aborts that statement wholesale
  * (the loopback applies it all-or-nothing, as a transactional server
  * would), so Spark's task retry re-sends a complete partition rather
  * than splicing half a stream.
  *
  * Wire types: integral columns ship as int8, DoubleType as float8,
  * StringType as text (escaping per COPY text format — tab/newline/
  * backslash/CR escaped, `\N` null). Other types must be cast by the
  * caller first: rejecting them HERE, on the driver at plan time,
  * beats a mid-stream task failure.
  */
object PgWireCopySink {

  def copyTo(df: DataFrame, host: String, port: Int, table: String,
             bufferBytes: Int = 1 << 16): Unit = {
    val schema = df.schema
    schema.fields.foreach { f =>
      f.dataType match {
        case LongType | IntegerType | ShortType | ByteType |
             DoubleType | StringType => ()
        case other => throw new IllegalArgumentException(
          s"pgwire COPY cannot ship column '${f.name}' of type " +
            s"${other.simpleString}: cast to long/double/string first")
      }
    }
    require(table.matches("\\w+") && schema.fieldNames.forall(_.matches("\\w+")),
      s"pgwire COPY requires simple identifiers, got $table " +
        s"(${schema.fieldNames.mkString(", ")})")
    val sql = s"COPY $table (${schema.fieldNames.mkString(", ")}) FROM STDIN"
    val types: Array[DataType] = schema.fields.map(_.dataType)
    df.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.hasNext) { // empty partition: no socket, no statement
        val client = new PgWireClient(host, port)
        try {
          client.copyIn(sql, rows.map(encode(types, _)), bufferBytes)
          ()
        } finally client.close()
      }
    }
  }

  /** One Row → text cells (null-safe; Long/Double canonical forms
    * round-trip losslessly through the text format). */
  private def encode(types: Array[DataType], r: Row): Seq[String] =
    Seq.tabulate(types.length) { i =>
      if (r.isNullAt(i)) null
      else types(i) match {
        case LongType => r.getLong(i).toString
        case IntegerType => r.getInt(i).toString
        case ShortType => r.getShort(i).toString
        case ByteType => r.getByte(i).toString
        case DoubleType => r.getDouble(i).toString
        case _ => r.getString(i)
      }
    }
}
