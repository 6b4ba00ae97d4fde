package graft

import org.apache.spark.sql.functions._

import graft.sources.Tables
import Queries.Q

/** Batch 59 (round 15): the last two reference projector statement
  * families without a VERBATIM wire proof, plus the Cypher list
  * builtins.
  *
  * - `cy_ref_fertilizer`: the product-master KEEP-EXISTING upsert
  *   (graph_fertilizer_product.py:211-230) — `SET fp.nutrients = CASE
  *   WHEN $nutrients IS NULL THEN fp.nutrients ELSE $nutrients END`
  *   plus `COALESCE($ph, fp.pH)` — and its USES_PRODUCT link.
  * - `cy_ref_soil_layer`: the per-depth projector
  *   (graph_soil_layer.py:219-261) — SoilLayerReading keyed
  *   (station_serial, date, depth_cm), `SET sl.depth_label =
  *   coalesce(sl.depth_label, $depth_label)` (SET-IF-ABSENT), the
  *   backquoted per-metric SET, and the SoilDay HAS_LAYER_READING
  *   edge.
  * - `cy_list_fns`: split()/head()/last()/range() through the read
  *   compiler.
  *
  * Both wire fixtures follow the bounded-statement discipline
  * (cy_ref_nutrient, SCALE.md round-14): ≤ ~12 wire statements at ANY
  * SF — per-statement cost is seconds of plan/codegen; throughput at
  * scale is the soak's job, these entries prove the statement
  * families land the reference's exact graph.
  */
object Queries59 {

  /** The reference's product-master upsert, QUOTED verbatim
    * (graph_fertilizer_product.py:213-219 — replay data, the point of
    * the entry). */
  private val refFertilizerStmt =
    """
        MERGE (fp:FertilizerProduct { name: $name, brand: $brand })
        SET fp.nutrients = CASE WHEN $nutrients IS NULL THEN fp.nutrients ELSE $nutrients END,
            fp.pH        = COALESCE($ph, fp.pH),
            fp.EC        = COALESCE($ec, fp.EC)
        """

  /** The link statement, verbatim
    * (graph_fertilizer_product.py:224-229). */
  private val refUsesProductStmt =
    """
        MATCH (pa:ProductApplication { application_event_id: $app_ev_id, idx: $idx })
        MATCH (fp:FertilizerProduct { name: $name, brand: $brand })
        MERGE (pa)-[:USES_PRODUCT]->(fp)
        """

  /** Verbatim wire replay of the fertilizer product master: three
    * products from `part`, each written TWICE — first with nutrients
    * + pH (EC null), then with EC only (nutrients/pH null) — so the
    * final node proves CASE-keeps-existing AND COALESCE-keeps-existing
    * through the reference's exact statement text; then the
    * USES_PRODUCT links, then a fixpoint replay (zero creations). */
  val cy_ref_fertilizer = Q(
    (s, dir) => {
      import graft.cypher.{GraphStore, PropertyGraph}
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      // one representative per (name, brand): a key collision between
      // partkeys would make the SECOND write the survivor of the
      // non-null fields — dedup both here and in the oracle
      val slice = Tables.read(s, dir, "part")
        .filter(col("p_partkey") <= 3)
        .select(col("p_partkey").cast("long").as("pk"),
          col("p_name").as("name"), col("p_brand").as("brand"),
          col("p_type").as("ptype"), col("p_size").cast("long").as("psize"))
        .withColumn("rn", row_number().over(Window
          .partitionBy(col("name"), col("brand")).orderBy(col("pk"))))
        .filter(col("rn") === 1).drop("rn")
        .orderBy(col("pk"))
        .collect()
      val empty = PropertyGraph(
        Seq.empty[(String, String, Map[String, String])]
          .toDF("id", "label", "props"),
        Seq.empty[(String, String, String, Map[String, String])]
          .toDF("src", "dst", "rel", "props"))
      val store = new GraphStore(empty, Map(
        "ProductApplication" -> Seq("application_event_id", "idx"),
        "FertilizerProduct" -> Seq("name", "brand")))
      val srv = new graft.cypher.BoltQueryServer(store)
      try {
        val sess = new graft.sinks.bolt.BoltSocketSession(
          srv.host, srv.port, "graft-entry", 30000)
        try {
          // upstream projector seeds the ProductApplication parents
          val pas: Seq[Map[String, Any]] = slice.toSeq.map(r =>
            Map("app_ev_id" -> r.getLong(0), "idx" -> 1L))
          sess.run(
            """UNWIND $rows AS row
               MERGE (pa:ProductApplication {application_event_id: row.app_ev_id, idx: row.idx})""",
            Map("rows" -> pas))
          // pass 1: nutrients + pH land, EC absent
          slice.foreach(r => sess.run(refFertilizerStmt, Map(
            "name" -> r.getString(1), "brand" -> r.getString(2),
            "nutrients" -> r.getString(3), "ph" -> r.getLong(4),
            "ec" -> null)))
          // pass 2: EC lands; null nutrients/pH KEEP the pass-1 values
          slice.foreach(r => sess.run(refFertilizerStmt, Map(
            "name" -> r.getString(1), "brand" -> r.getString(2),
            "nutrients" -> null, "ph" -> null, "ec" -> r.getLong(0))))
          // links
          slice.foreach(r => sess.run(refUsesProductStmt, Map(
            "app_ev_id" -> r.getLong(0), "idx" -> 1L,
            "name" -> r.getString(1), "brand" -> r.getString(2))))
          // fixpoint: replaying the upsert + link creates nothing
          val before = (store.graph.vertices.count(),
            store.graph.edges.count())
          val r0 = slice.head
          sess.run(refFertilizerStmt, Map(
            "name" -> r0.getString(1), "brand" -> r0.getString(2),
            "nutrients" -> null, "ph" -> null, "ec" -> r0.getLong(0)))
          sess.run(refUsesProductStmt, Map(
            "app_ev_id" -> r0.getLong(0), "idx" -> 1L,
            "name" -> r0.getString(1), "brand" -> r0.getString(2)))
          val after = (store.graph.vertices.count(),
            store.graph.edges.count())
          require(before == after,
            s"fertilizer replay changed the graph: $before -> $after")
          store.cypher(
            """MATCH (pa:ProductApplication)-[:USES_PRODUCT]->(fp:FertilizerProduct)
               RETURN id(pa) AS app, fp.name AS name, fp.brand AS brand,
                      fp.nutrients AS nutrients, toInteger(fp.pH) AS ph,
                      toInteger(fp.EC) AS ec
               ORDER BY app""")
        } finally sess.close()
      } finally srv.close()
    },
    Some("""WITH slice AS (
        SELECT CAST(p_partkey AS BIGINT) AS pk, p_name AS name,
               p_brand AS brand, p_type AS ptype,
               CAST(p_size AS BIGINT) AS psize
        FROM part WHERE p_partkey <= 3
        QUALIFY ROW_NUMBER() OVER (PARTITION BY p_name, p_brand
          ORDER BY CAST(p_partkey AS BIGINT)) = 1
      )
      SELECT 'ProductApplication:' || CAST(pk AS VARCHAR) || ':1' AS app,
             name, brand, ptype AS nutrients, psize AS ph, pk AS ec
      FROM slice ORDER BY app"""),
    // wire fixture (socket + per-statement store transitions)
    bench = false)

  /** The reference's per-depth upsert, QUOTED verbatim
    * (graph_soil_layer.py:219-227). */
  private val refSoilLayerStmt =
    """
        MERGE (sl:SoilLayerReading {
            station_serial: $serial,
            date: datetime($dt),
            depth_cm: $depth
        })
        SET sl.depth_label = coalesce(sl.depth_label, $depth_label)
        """

  /** The per-metric backquoted SET, verbatim with base=`moisture`
    * (graph_soil_layer.py:232-243 — the reference interpolates the
    * metric base into the statement text the same way). */
  private val refSoilMetricStmt =
    """
        MATCH (sl:SoilLayerReading {
            station_serial: $serial,
            date: datetime($dt),
            depth_cm: $depth
        })
        SET sl.`moisture`     = $val,
            sl.`moisture_min` = $min,
            sl.`moisture_max` = $max,
            sl.`moisture_avg` = $avg,
            sl.`moisture_sum` = $sum
        """

  /** The SoilDay link, verbatim (graph_soil_layer.py:253-258). */
  private val refLayerLinkStmt =
    """
        MATCH (sd:SoilDay { station_serial: $serial, date: datetime($dt) })
        MATCH (sl:SoilLayerReading { station_serial: $serial, date: datetime($dt), depth_cm: $depth })
        MERGE (sd)-[:HAS_LAYER_READING]->(sl)
        """

  /** Verbatim wire replay of the soil-layer projector: station S1,
    * ONE day (2024-01-01), depths bucketed from event ids (≤3 depth
    * groups at any SF → ≤11 wire statements). The depth_label
    * statement runs TWICE for the first depth with a different label —
    * the coalesce(sl.x, $p) SET-IF-ABSENT must keep the first. */
  val cy_ref_soil_layer = Q(
    (s, dir) => {
      import graft.cypher.{GraphStore, PropertyGraph}
      import s.implicits._
      // the station: the smallest user_id with any event on day 1 —
      // fixture-independent (the 10x amplified fixture has no user 1
      // on day 1), mirrored exactly by the oracle's scalar subquery
      val day1 = Tables.read(s, dir, "events")
        .filter(col("ts") < lit("2024-01-02").cast("timestamp"))
      val uid = day1.agg(min(col("user_id"))).collect()(0).getLong(0)
      val groups = day1
        .filter(col("user_id") === uid)
        .groupBy(((col("event_id") % 3) * 10).cast("long").as("depth"))
        .agg(count(lit(1)).as("cnt"),
          min(col("value")).as("vmin"), max(col("value")).as("vmax"),
          (sum(col("value").cast("decimal(27,8)")).cast("double") /
            count(col("value"))).cast("double").as("vavg"),
          sum(col("value").cast("decimal(27,8)")).cast("double").as("vsum"))
        .orderBy(col("depth"))
        .collect()
      require(groups.nonEmpty, "fixture needs day-1 events")
      val empty = PropertyGraph(
        Seq.empty[(String, String, Map[String, String])]
          .toDF("id", "label", "props"),
        Seq.empty[(String, String, String, Map[String, String])]
          .toDF("src", "dst", "rel", "props"))
      val store = new GraphStore(empty, Map(
        "SoilDay" -> Seq("station_serial", "date"),
        "SoilLayerReading" -> Seq("station_serial", "date", "depth_cm")))
      val srv = new graft.cypher.BoltQueryServer(store)
      try {
        val sess = new graft.sinks.bolt.BoltSocketSession(
          srv.host, srv.port, "graft-entry", 30000)
        try {
          val dt = graft.sinks.CypherSink.datetimeParams(
            java.sql.Date.valueOf("2024-01-01").getTime * 1000L)
          // upstream projector seeds the SoilDay parent
          sess.run(
            "MERGE (sd:SoilDay { station_serial: $serial, date: datetime($dt) })",
            Map("serial" -> s"S$uid", "dt" -> dt))
          groups.foreach { r =>
            val depth = r.getLong(0)
            sess.run(refSoilLayerStmt, Map("serial" -> s"S$uid", "dt" -> dt,
              "depth" -> depth, "depth_label" -> s"d$depth"))
            sess.run(refSoilMetricStmt, Map("serial" -> s"S$uid", "dt" -> dt,
              "depth" -> depth, "val" -> r.getLong(1),
              "min" -> r.getDouble(2), "max" -> r.getDouble(3),
              "avg" -> r.getDouble(4), "sum" -> r.getDouble(5)))
            sess.run(refLayerLinkStmt, Map("serial" -> s"S$uid", "dt" -> dt,
              "depth" -> depth))
          }
          // set-if-absent: a replay with a DIFFERENT label keeps the
          // stored one (the reference's _pick_label contract)
          sess.run(refSoilLayerStmt, Map("serial" -> s"S$uid", "dt" -> dt,
            "depth" -> groups.head.getLong(0), "depth_label" -> "CHANGED"))
          store.cypher(
            """MATCH (sd:SoilDay)-[:HAS_LAYER_READING]->(sl:SoilLayerReading)
               RETURN id(sd) AS soil_day, sl.date AS date,
                      toInteger(sl.depth_cm) AS depth_cm,
                      sl.depth_label AS depth_label,
                      toInteger(sl.`moisture`) AS m_val,
                      toFloat(sl.`moisture_min`) AS m_min,
                      toFloat(sl.`moisture_max`) AS m_max,
                      toFloat(sl.`moisture_avg`) AS m_avg,
                      toFloat(sl.`moisture_sum`) AS m_sum
               ORDER BY depth_cm""")
        } finally sess.close()
      } finally srv.close()
    },
    Some("""WITH u AS (
        SELECT MIN(user_id) AS uid FROM events
        WHERE ts < TIMESTAMP '2024-01-02'
      ), g AS (
        SELECT (event_id % 3) * 10 AS depth_cm, COUNT(*) AS cnt,
               MIN(value) AS vmin, MAX(value) AS vmax,
               CAST(SUM(CAST(value AS DECIMAL(27,8))) AS DOUBLE) / COUNT(value) AS vavg,
               CAST(SUM(CAST(value AS DECIMAL(27,8))) AS DOUBLE) AS vsum
        FROM events, u
        WHERE user_id = u.uid AND ts < TIMESTAMP '2024-01-02'
        GROUP BY 1
      )
      SELECT 'SoilDay:S' || CAST(u.uid AS VARCHAR) || ':2024-01-01T00:00:00' AS soil_day,
             '2024-01-01T00:00:00' AS date,
             CAST(depth_cm AS BIGINT) AS depth_cm,
             'd' || CAST(depth_cm AS VARCHAR) AS depth_label,
             CAST(cnt AS BIGINT) AS m_val,
             vmin AS m_min, vmax AS m_max, vavg AS m_avg, vsum AS m_sum
      FROM g, u ORDER BY depth_cm"""),
    bench = false)

  /** Cypher list builtins through the read compiler: split (LITERAL
    * delimiter, not regex), head/last (null-safe get), end-INCLUSIVE
    * range with and without step — each compiled to the codegen'd
    * Spark builtin (split/get/sequence), no UDFs. */
  val cy_list_fns = Q(
    (s, dir) => Queries54.stagedDemo(s, dir).cypher(
      """MATCH (n:Nation)
         RETURN n.name AS name,
                head(split(n.name, '_')) AS first_word,
                last(split(id(n), ':')) AS key_str,
                size(split(n.name, 'A')) AS n_a_parts,
                size(range(0, toInteger(last(split(id(n), ':'))))) AS k_plus_1,
                last(range(0, toInteger(last(split(id(n), ':'))), 7)) AS last_step
         ORDER BY name"""),
    Some("""SELECT n_name AS name,
        string_split(n_name, '_')[1] AS first_word,
        CAST(n_nationkey AS VARCHAR) AS key_str,
        CAST(len(string_split(n_name, 'A')) AS BIGINT) AS n_a_parts,
        CAST(n_nationkey + 1 AS BIGINT) AS k_plus_1,
        CAST((n_nationkey // 7) * 7 AS BIGINT) AS last_step
      FROM nation ORDER BY name"""))

  val all: Map[String, Q] = Map(
    "cy_ref_fertilizer" -> cy_ref_fertilizer,
    "cy_ref_soil_layer" -> cy_ref_soil_layer,
    "cy_list_fns" -> cy_list_fns,
  )
}
