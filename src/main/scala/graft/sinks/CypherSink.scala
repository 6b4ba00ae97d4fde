package graft.sinks

import java.sql.Timestamp
import java.time.ZoneOffset

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._


/** Cypher `MERGE` sink — the network twin of [[graft.operators.GraphExport]]'s
  * parquet layout, mirroring the reference engine's terminal
  * artifact: every reference projector ends in an idempotent
  * batched `UNWIND $rows MERGE ...` into Neo4j behind uniqueness
  * constraints (app/graph_app_nutrient_content.py:137-166 for the
  * UNWIND batching, BATCH_SIZE=1000 at :34; app/graph_constraints.py:
  * 2-133 for the DDL; app/utils.py:45-70 for the `datetime($p)`
  * component-map temporal encoding — SURVEY §2.6 F12).
  *
  * Architecture: statement RENDERING and row ENCODING are pure
  * functions (testable, engine-independent); TRANSPORT is a
  * pluggable factory so the write path is identical whether the
  * session is a real Bolt driver (not available in this zero-egress
  * build — see [[BoltSessionFactory]]) or the in-memory MERGE
  * interpreter the round-trip spec drives.
  *
  * Scale shape: constraints run ONCE on the driver; rows stream out
  * via `foreachPartition` with one UNWIND statement per `batchSize`
  * rows — the executor-parallel form of the reference's async pool
  * writes. No collect, no per-row statements; a 1000-executor run
  * holds `executors × batchSize` rows in flight. Edges are written
  * AFTER vertices (the reference's MATCH-then-MERGE discipline:
  * an edge whose endpoint is missing is a gate failure, not a
  * silently created half-node).
  */
object CypherSink {

  /** Neo4j `datetime($p)` component map for an epoch-micros instant
    * (UTC), optionally carrying an explicit `timezone` offset string
    * — the reference's `to_neo_datetime_params` (app/utils.py:45-57).
    * Seconds stay integral: the reference encodes to whole seconds.
    */
  def datetimeParams(epochMicros: Long, tzOffset: Option[String] = None)
      : Map[String, Any] = {
    val odt = java.time.Instant.EPOCH.plus(epochMicros,
      java.time.temporal.ChronoUnit.MICROS).atOffset(ZoneOffset.UTC)
    val base = Map[String, Any](
      "year" -> odt.getYear, "month" -> odt.getMonthValue,
      "day" -> odt.getDayOfMonth, "hour" -> odt.getHour,
      "minute" -> odt.getMinute, "second" -> odt.getSecond)
    tzOffset.fold(base)(off => base + ("timezone" -> off))
  }

  /** Uniqueness-constraint DDL for a label's key columns — the
    * reference's per-label `CREATE CONSTRAINT ... IS UNIQUE`
    * (app/graph_constraints.py). */
  def constraintDdl(label: String, keys: Seq[String]): String = {
    require(keys.nonEmpty, "a uniqueness constraint needs key columns")
    val ident = sanitizeIdent(label)
    val reqs = keys.map(k => s"n.`${sanitizeIdent(k)}`").mkString(", ")
    val req = if (keys.length == 1) s"$reqs IS UNIQUE"
              else s"($reqs) IS UNIQUE"
    s"""CREATE CONSTRAINT ${ident.toLowerCase}_unique IF NOT EXISTS
       |FOR (n:`$ident`) REQUIRE $req""".stripMargin
  }

  /** One batched vertex upsert: MERGE on the key columns, SET the
    * rest — the UNWIND form every reference projector batches
    * through. */
  def mergeVerticesCypher(label: String, keys: Seq[String],
                          props: Seq[String]): String = {
    val keyPat = keys.map(k =>
      s"`${sanitizeIdent(k)}`: r.`${sanitizeIdent(k)}`").mkString(", ")
    val sets = props.filterNot(keys.contains).map(p =>
      s"n.`${sanitizeIdent(p)}` = r.`${sanitizeIdent(p)}`")
    val setClause = if (sets.isEmpty) "" else sets.mkString("SET ", ", ", "")
    s"""UNWIND $$rows AS r
       |MERGE (n:`${sanitizeIdent(label)}` { $keyPat })
       |$setClause""".stripMargin.trim
  }

  /** One batched edge upsert: MATCH both endpoints by key, MERGE the
    * relationship — never creates half-present endpoints. */
  def mergeEdgesCypher(rel: String, srcLabel: String, srcKey: String,
                       dstLabel: String, dstKey: String): String =
    s"""UNWIND $$rows AS r
       |MATCH (s:`${sanitizeIdent(srcLabel)}` { `${sanitizeIdent(srcKey)}`: r.src })
       |MATCH (d:`${sanitizeIdent(dstLabel)}` { `${sanitizeIdent(dstKey)}`: r.dst })
       |MERGE (s)-[:`${sanitizeIdent(rel)}`]->(d)""".stripMargin

  /** Labels/relationship types/property names are interpolated into
    * statement text (parameters cannot carry identifiers in Cypher),
    * so they must never smuggle backticks or control characters. */
  def sanitizeIdent(s: String): String = {
    require(s != null && s.nonEmpty, "empty Cypher identifier")
    require(!s.exists(c => c == '`' || c.isControl),
      s"Cypher identifier contains backtick/control char: $s")
    s
  }

  /** A Spark cell → Cypher parameter value. Timestamps become the
    * reference's datetime component map; everything else Bolt-native. */
  def toParam(v: Any): Any = v match {
    case t: Timestamp =>
      datetimeParams(t.toInstant.getEpochSecond * 1000000L +
        t.toInstant.getNano / 1000L)
    case d: java.sql.Date => Map[String, Any](
      "year" -> d.toLocalDate.getYear, "month" -> d.toLocalDate.getMonthValue,
      "day" -> d.toLocalDate.getDayOfMonth)
    case bd: java.math.BigDecimal => bd.toPlainString
    case other => other
  }

  /** Write the property graph through `factory`, gated exactly like
    * the parquet export: duplicate vertex ids or dangling edge
    * endpoints abort BEFORE the first network write. `vertices` must
    * carry (id, label, props…); `edges` (src, dst, rel).
    *
    * Returns (vertexRows, edgeRows) written.
    */
  def writeGraph(vertices: DataFrame, edges: DataFrame,
                 factory: BoltSessionFactory,
                 batchSize: Int = 1000): (Long, Long) = {
    require(batchSize > 0, "batchSize must be positive")
    // Gate 1: duplicate vertex ids (probe, not full count — one hit
    // aborts). Checked FIRST because the fused dangling check below is
    // only sound on a unique-id vertex set.
    val dups = vertices.groupBy(col("id")).count()
      .filter(col("count") > 1).limit(1).count()
    require(dups == 0L, s"duplicate vertex ids — refusing to MERGE")

    // constraints + per-label statements once, on the driver, from the
    // SCHEMA (labels are few; distinct() over the label column only)
    val vCols = vertices.columns.toSeq
    require(Seq("id", "label").forall(vCols.contains),
      "vertices must carry (id, label, props…)")
    val labels = vertices.select(col("label")).distinct()
      .collect().map(_.getString(0)).sorted
    // Endpoint labels: edges carry only (src, dst, rel), so each
    // endpoint's label is derived by joining the vertex (id → label)
    // map. Every edge batch then goes through the INDEX-BACKED
    // mergeEdgesCypher form: a label-less `MATCH (s { id: ... })`
    // cannot use per-label uniqueness indexes in real Neo4j and
    // degrades to an AllNodesScan per edge row.
    val vLab = vertices.select(col("id"), col("label"))
    // persisted: read once for the gate count + combos collect and
    // again by the edge writer — without it the edges⋈vertices
    // double-join runs twice, and a nondeterministic input recomputed
    // differently between the two reads could surface a combo key the
    // statement map has never seen
    val eLab = edges.join(
        vLab.withColumnRenamed("id", "src")
          .withColumnRenamed("label", "src_label"), Seq("src"))
      .join(
        vLab.withColumnRenamed("id", "dst")
          .withColumnRenamed("label", "dst_label"), Seq("dst"))
      .persist()
    // Gate 2, FUSED into the label-derivation joins (one edges⋈vertices
    // pass instead of the r9 hardening's two): with unique vertex ids
    // (gate 1), an edge survives both inner joins iff BOTH endpoints
    // exist — so any dangling endpoint (null src/dst included) shows
    // up as edges.count != eLab.count. The eLab count also materializes
    // the persist before the first network write, preserving the
    // abort-before-write property.
    val dangling = edges.count() - eLab.count()
    require(dangling == 0L, s"dangling edge endpoints — refusing to MERGE")
    val combos = eLab
      .select(col("rel"), col("src_label"), col("dst_label")).distinct()
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
      .sorted
    val ddl = factory.open()
    try {
      labels.foreach(l => ddl.run(constraintDdl(l, Seq("id")), Map.empty))
    } finally ddl.close()

    val propCols = vCols.filterNot(Seq("label").contains)
    val vStmt = labels.map(l =>
      l -> mergeVerticesCypher(l, Seq("id"), propCols)).toMap
    val eStmt = combos.map { case k @ (rel, srcLab, dstLab) =>
      k -> mergeEdgesCypher(rel, srcLab, "id", dstLab, "id")
    }.toMap

    val nV = vertices.sparkSession.sparkContext.longAccumulator("cypher_v")
    val nE = vertices.sparkSession.sparkContext.longAccumulator("cypher_e")
    vertices.foreachPartition { (it: Iterator[Row]) =>
      val sess = factory.open()
      try {
        it.grouped(batchSize).foreach { batch =>
          batch.groupBy(_.getAs[String]("label")).foreach {
            case (label, rows) =>
              val params = rows.map(r => propCols.map(c =>
                c -> toParam(r.getAs[Any](c))).toMap)
              sess.run(vStmt(label), Map("rows" -> params))
              nV.add(rows.size)
          }
        }
      } finally sess.close()
    }
    try {
      eLab.foreachPartition { (it: Iterator[Row]) =>
        val sess = factory.open()
        try {
          it.grouped(batchSize).foreach { batch =>
            batch.groupBy(r => (r.getAs[String]("rel"),
              r.getAs[String]("src_label"), r.getAs[String]("dst_label")))
            .foreach {
              case (key, rows) =>
                val params = rows.map(r => Map[String, Any](
                  "src" -> r.getAs[Any]("src"), "dst" -> r.getAs[Any]("dst")))
                sess.run(eStmt(key), Map("rows" -> params))
                nE.add(rows.size)
            }
          }
        } finally sess.close()
      }
    } finally { eLab.unpersist(); () }
    (nV.value, nE.value)
  }
}

/** One logical Bolt session: run a statement with parameters. A real
  * implementation would wrap the Neo4j Java driver's
  * `session.run(query, params)` — that driver is not on this build's
  * classpath (zero-egress sandbox), so the only shipped
  * implementation is the in-memory MERGE interpreter
  * ([[InMemoryBolt]]) the round-trip spec drives. The factory is
  * Serializable because it ships to executors inside
  * `foreachPartition`.
  */
trait BoltSession {
  def run(cypher: String, params: Map[String, Any]): Unit
  def close(): Unit
}

trait BoltSessionFactory extends Serializable {
  def open(): BoltSession
}

/** In-memory MERGE interpreter for exactly the statement shapes
  * [[CypherSink]] emits (NOT a general Cypher engine): constraint DDL
  * is recorded; vertex UNWIND-MERGE upserts by (label, key map); edge
  * UNWIND-MATCH-MERGE inserts the (src, rel, dst) triple iff both
  * endpoints exist, once. Thread-safe — local[n] executors share the
  * JVM, so partitions write concurrently like a real Bolt pool.
  */
object InMemoryBolt {
  final case class Store(
      constraints: mutable.Set[String] = mutable.Set.empty,
      nodes: mutable.Map[(String, Any), Map[String, Any]] = mutable.Map.empty,
      edges: mutable.Set[(Any, String, Any)] = mutable.Set.empty,
      var statements: Long = 0L)

  private val stores = new java.util.concurrent.ConcurrentHashMap[String, Store]()

  def store(token: String): Store =
    stores.computeIfAbsent(token, _ => Store())

  def drop(token: String): Unit = { stores.remove(token); () }

  /** A factory bound to a named store (the token crosses the
    * closure; the store lives in this JVM's registry — the local-mode
    * stand-in for a connection pool's URI). */
  final case class Factory(token: String) extends BoltSessionFactory {
    def open(): BoltSession = new Session(store(token))
  }

  private val MergeV =
    """(?s)UNWIND \$rows AS r\s*MERGE \(n:`([^`]+)` \{ `id`: r\.`id` \}\)(.*)""".r
  private val MergeE =
    """(?s)UNWIND \$rows AS r\s*MATCH \(s:`([^`]+)` \{ `[^`]+`: r\.src \}\)\s*MATCH \(d:`([^`]+)` \{ `[^`]+`: r\.dst \}\)\s*MERGE \(s\)-\[:`([^`]+)`\]->\(d\)""".r

  final class Session(s: Store) extends BoltSession {
    def run(cypher: String, params: Map[String, Any]): Unit = s.synchronized {
      s.statements += 1
      cypher.trim match {
        case c if c.startsWith("CREATE CONSTRAINT") =>
          s.constraints += c.linesIterator.next().trim; ()
        case MergeV(label, _) =>
          rows(params).foreach { r =>
            val key = (label, r("id"))
            s.nodes(key) = s.nodes.getOrElse(key, Map.empty) ++ r; ()
          }
        case MergeE(srcLab, dstLab, rel) =>
          rows(params).foreach { r =>
            val (src, dst) = (r("src"), r("dst"))
            // labeled MATCH: the endpoint must exist UNDER THAT LABEL
            // (the index a real Neo4j would consult), not merely as
            // some node with the id
            require(s.nodes.contains((srcLab, src)) &&
              s.nodes.contains((dstLab, dst)),
              s"edge endpoint missing: ($srcLab)$src -> ($dstLab)$dst")
            s.edges += ((src, rel, dst)); ()
          }
        case other =>
          throw new IllegalArgumentException(
            s"InMemoryBolt does not interpret: ${other.take(80)}")
      }
    }
    def close(): Unit = ()
    private def rows(params: Map[String, Any]): Seq[Map[String, Any]] =
      params("rows").asInstanceOf[Seq[Map[String, Any]]]
  }
}
