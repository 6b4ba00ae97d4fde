package graft

import org.apache.spark.sql.functions._

import graft.sources.Tables
import Queries.Q

/** Batch 60 (round 15, session 2): VERBATIM wire replays closing the
  * remaining statement shapes of the reference's projector corpus —
  * after this batch, every structurally distinct Cypher statement in
  * /root/reference/app/graph_*.py has a wire proof:
  *
  * - `cy_ref_constraints`: ALL 23 `CREATE CONSTRAINT … IS UNIQUE`
  *   bootstrap statements (graph_constraints.py:2-139) run through
  *   the wire FIRST — exactly the reference's startup order — then
  *   the graph_fields.py projector statements (Field MERGE+SET, Crop
  *   MERGE, the comma multi-path `MATCH (f:…), (c:…) MERGE` link)
  *   prove the registered keys drive MERGE identity minting.
  * - `cy_ref_station`: graph_stations.py:24-67 — Station MERGE+SET,
  *   Field→Station link, and the DUAL-KEYED DepthPoint (with and
  *   without the sensor_index dimension — the reference has NO
  *   DepthPoint constraint, so each MERGE pattern's own props are
  *   the identity; the two shapes coexist under one label).
  * - `cy_ref_irrigation`: graph_irrigation_event.py:295-345 — the
  *   IrrigationEvent upsert with a datetime() MERGE key, the
  *   `WITH ie, $end AS endp WHERE endp IS NOT NULL SET …`
  *   CONDITIONAL end-date statement (the inline WITH tail), and the
  *   Station link; an open event (null end) stays open, a later sync
  *   closes it.
  * - `cy_ref_optimum`: graph_optimum_sap_range.py:65-82 +
  *   graph_optimum_element_range.py:122-165 — the range header, the
  *   `MERGE … WITH c MATCH … MERGE` link spelling, the element
  *   file's 3-MERGE combined spelling of the SAME header (both files
  *   write it — cross-file idempotence), and the per-nutrient
  *   OptimumElementRange with one-sided ranges (null min/max).
  * - `cy_ref_forecast`: graph_weather_forecast.py:55-71 — `SET wf +=
  *   $props` bulk property merge under a datetime() MERGE key, two
  *   refresh passes proving += keeps prior keys, and the
  *   HAS_FORECAST link.
  *
  * All fixtures follow the bounded-statement discipline
  * (cy_ref_nutrient, SCALE.md round-14): ≤ ~16 wire write statements
  * at ANY SF (DDL statements are registration-only — no write apply).
  * Param-type note: `root_zone_list` rides as its JSON-string form —
  * the engine's prop model is map<string,string> and the reference's
  * sibling params (`wetting_depths_json` …) are JSON strings already.
  */
object Queries60 {

  // ---- shared verbatim statement texts -----------------------------

  /** graph_constraints.py:2-139 — all 23 statements, QUOTED VERBATIM
    * (whitespace, line breaks, trailing semicolons as in the file). */
  private val refConstraintStmts: Seq[String] = Seq(
    """
        CREATE CONSTRAINT field_id_unique IF NOT EXISTS
        FOR (f:Field) REQUIRE f.field_id IS UNIQUE;
    """,
    """
        CREATE CONSTRAINT crop_name_unique IF NOT EXISTS
        FOR (c:Crop) REQUIRE c.name IS UNIQUE;
    """,
    """
        CREATE CONSTRAINT station_serial_unique IF NOT EXISTS
        FOR (s:Station) REQUIRE s.serial_number IS UNIQUE;
    """,
    """
        CREATE CONSTRAINT weather_forecast_unique IF NOT EXISTS
        FOR (wf:WeatherForecast)
        REQUIRE (wf.station_serial, wf.date) IS UNIQUE;
    """,
    """
        CREATE CONSTRAINT weather_day_unique IF NOT EXISTS
        FOR (wd:WeatherDay)
        REQUIRE (wd.station_serial, wd.date) IS UNIQUE;
    """,
    """
        CREATE CONSTRAINT soil_day_unique IF NOT EXISTS
        FOR (sd:SoilDay)
        REQUIRE (sd.station_serial, sd.date) IS UNIQUE;
    """,
    """
        CREATE CONSTRAINT soil_layer_unique IF NOT EXISTS
        FOR (sl:SoilLayerReading)
        REQUIRE (sl.station_serial, sl.date, sl.depth_cm) IS UNIQUE;
    """,
    """
        CREATE CONSTRAINT irrigation_event_unique IF NOT EXISTS
        FOR (ie:IrrigationEvent)
        REQUIRE (ie.station_serial, ie.start_datetime) IS UNIQUE
    """,
    """
        CREATE CONSTRAINT et0day_unique IF NOT EXISTS
        FOR (n:ET0Day) REQUIRE (n.station_serial, n.date) IS UNIQUE
    """,
    """
        CREATE CONSTRAINT sap_analysis_unique IF NOT EXISTS
        FOR (sa:SAPAnalysis)
        REQUIRE (sa.field_id, sa.date, sa.crop_name, sa.leaf_type, sa.sample_id) IS UNIQUE
    """,
    """
        CREATE CONSTRAINT sap_element_result_unique IF NOT EXISTS
        FOR (ser:SAPElementResult)
        REQUIRE (ser.sap_analysis_id, ser.nutrient) IS UNIQUE;
    """,
    """
        CREATE CONSTRAINT optimum_sap_range_unique IF NOT EXISTS
        FOR (n:OptimumSAPRange)
        REQUIRE (n.crop_name, n.date) IS UNIQUE;
    """,
    """
        CREATE CONSTRAINT optimum_element_range_unique IF NOT EXISTS
        FOR (n:OptimumElementRange)
        REQUIRE (n.opt_range_id, n.nutrient) IS UNIQUE;
    """,
    """
        CREATE CONSTRAINT haney_analysis_unique IF NOT EXISTS
        FOR (n:HaneyAnalysis)
        REQUIRE (n.field_id, n.date, n.lab_no) IS UNIQUE;""",
    """
        CREATE CONSTRAINT tnd_analysis_unique IF NOT EXISTS
        FOR (n:TNDAnalysis) REQUIRE (n.field_id, n.date, n.lab_no) IS UNIQUE
    """,
    """
        CREATE CONSTRAINT soil_analysis_unique IF NOT EXISTS
        FOR (n:SoilAnalysis) REQUIRE (n.field_id, n.date, n.lab_id) IS UNIQUE
    """,
    """
        CREATE CONSTRAINT soil_param_result_unique IF NOT EXISTS
        FOR (n:SoilParamResult)
        REQUIRE (n.soil_analysis_id, n.parameter_english) IS UNIQUE
    """,
    """
        CREATE CONSTRAINT water_analysis_unique IF NOT EXISTS
        FOR (n:WaterAnalysis)
        REQUIRE (n.field_id, n.date, n.sample_source) IS UNIQUE
    """,
    """
        CREATE CONSTRAINT water_param_result_unique IF NOT EXISTS
        FOR (n:WaterParamResult)
        REQUIRE (n.water_analysis_id, n.parameter) IS UNIQUE
    """,
    """
        CREATE CONSTRAINT application_event_unique IF NOT EXISTS
        FOR (n:ApplicationEvent)
        REQUIRE (n.field_id, n.date, n.crop_name, n.app_type, n.idx) IS UNIQUE
    """,
    """
        CREATE CONSTRAINT product_application_unique IF NOT EXISTS
        FOR (n:ProductApplication)
        REQUIRE (n.application_event_id, n.idx) IS UNIQUE
    """,
    """
        CREATE CONSTRAINT fertilizer_product_unique IF NOT EXISTS
        FOR (n:FertilizerProduct)
        REQUIRE (n.name, n.brand) IS UNIQUE
    """,
    """
        CREATE CONSTRAINT app_nutrient_content_unique IF NOT EXISTS
        FOR (n:AppNutrientContent)
        REQUIRE (n.product_application_id, n.nutrient) IS UNIQUE
    """)

  /** graph_fields.py:15-26 — the Field upsert, verbatim. */
  private val refFieldStmt =
    """
            MERGE (f:Field {field_id: $id})
            SET f.name        = $name,
                f.customer_id = $cust,
                f.tz          = $tz,
                f.country     = $country,
                f.province    = $province,
                f.district    = $district,
                f.lat         = $lat,
                f.lon         = $lon
            """

  /** graph_fields.py:38 — the Crop upsert, verbatim. */
  private val refCropStmt =
    "MERGE (c:Crop {name: $cname}) SET c.crop_id = $cid"

  /** graph_fields.py:42-45 — the comma multi-path MATCH link,
    * verbatim. */
  private val refPlantedWithStmt =
    """
                MATCH (f:Field {field_id: $fid}), (c:Crop {name: $cname})
                MERGE (f)-[:PLANTED_WITH]->(c)
                """

  /** graph_stations.py:25-28 — the Station upsert, verbatim. */
  private val refStationStmt =
    """
                MERGE (s:Station {serial_number: $serial})
                SET s.label = $label, s.type = $type_id, s.lat = $lat, s.lon = $lon
                """

  private def emptyStore(s: org.apache.spark.sql.SparkSession,
                         keys: Map[String, Seq[String]] = Map.empty)
      : graft.cypher.GraphStore = {
    import s.implicits._
    val v = Seq.empty[(String, String, Map[String, String])]
      .toDF("id", "label", "props")
    val e = Seq.empty[(String, String, String, Map[String, String])]
      .toDF("src", "dst", "rel", "props")
    new graft.cypher.GraphStore(
      graft.cypher.PropertyGraph(v, e), keys)
  }

  private def withWire[T](store: graft.cypher.GraphStore)(
      f: graft.sinks.bolt.BoltSocketSession => T): T = {
    val srv = new graft.cypher.BoltQueryServer(store)
    try {
      val sess = new graft.sinks.bolt.BoltSocketSession(
        srv.host, srv.port, "graft-entry", 30000)
      try f(sess) finally sess.close()
    } finally srv.close()
  }

  /** Verbatim replay of the reference's BOOTSTRAP: all 23 CREATE
    * CONSTRAINT statements (graph_constraints.py), run FIRST against
    * a store with NO declared keys, then the graph_fields.py
    * projector — the registered constraints must drive MERGE identity
    * minting (`Field:<id>`, `Crop:<name>`). The full constraint set
    * replays a second time (Neo4j's IF NOT EXISTS semantics: silent
    * no-op), and the field statements replay to a fixpoint. */
  val cy_ref_constraints = Q(
    (s, dir) => {
      val rows = Tables.read(s, dir, "nation")
        .filter(col("n_nationkey") <= 1)
        .select(col("n_nationkey").cast("long").as("id"),
          col("n_name").as("name"), col("n_regionkey").cast("long").as("rk"))
        .orderBy(col("id"))
        .collect()
      val store = emptyStore(s) // NO keys: they must come from the DDL
      withWire(store) { sess =>
        refConstraintStmts.foreach(sess.run(_, Map.empty))
        require(store.labelKeys.size == 23,
          s"expected 23 registered constraints, got ${store.labelKeys.size}")
        require(store.labelKeys("SAPAnalysis") ==
          Seq("field_id", "date", "crop_name", "leaf_type", "sample_id"))
        def fields(): Unit = rows.foreach { r =>
          val (id, name, rk) = (r.getLong(0), r.getString(1), r.getLong(2))
          sess.run(refFieldStmt, Map("id" -> id, "name" -> name,
            "cust" -> rk, "tz" -> "UTC+3", "country" -> name,
            "province" -> null, "district" -> null,
            "lat" -> (id * 2L), "lon" -> (rk * 3L)))
          sess.run(refCropStmt, Map("cname" -> name, "cid" -> id))
          sess.run(refPlantedWithStmt, Map("fid" -> id, "cname" -> name))
        }
        fields()
        // the reference's startup is idempotent: constraints re-run
        // (no-op) and the projectors replay to a fixpoint
        refConstraintStmts.foreach(sess.run(_, Map.empty))
        val before = (store.graph.vertices.count(), store.graph.edges.count())
        fields()
        val after = (store.graph.vertices.count(), store.graph.edges.count())
        require(before == after,
          s"bootstrap replay changed the graph: $before -> $after")
        store.cypher(
          """MATCH (f:Field)-[:PLANTED_WITH]->(c:Crop)
             RETURN id(f) AS fid, f.name AS name,
                    toInteger(f.customer_id) AS cust, f.tz AS tz,
                    f.province AS province, toInteger(f.lat) AS lat,
                    id(c) AS cid, toInteger(c.crop_id) AS crop_id
             ORDER BY fid""")
      }
    },
    Some("""SELECT 'Field:' || CAST(n_nationkey AS VARCHAR) AS fid,
             n_name AS name, CAST(n_regionkey AS BIGINT) AS cust,
             'UTC+3' AS tz, CAST(NULL AS VARCHAR) AS province,
             CAST(n_nationkey * 2 AS BIGINT) AS lat,
             'Crop:' || n_name AS cid,
             CAST(n_nationkey AS BIGINT) AS crop_id
      FROM nation WHERE n_nationkey <= 1 ORDER BY fid"""),
    bench = false)

  /** Verbatim replay of graph_stations.py: two stations under one
    * field — ST1 with the sensor_index DepthPoint shape (two sensors
    * at one depth: sensor_index IS part of the identity), ST2 with
    * the plain shape (no DepthPoint constraint exists in the
    * reference, so each MERGE pattern's own props are the identity;
    * both shapes coexist under the one label). */
  val cy_ref_station = Q(
    (s, dir) => {
      val rows = Tables.read(s, dir, "nation")
        .filter(col("n_nationkey").between(1, 2))
        .select(col("n_nationkey").cast("long").as("k"),
          col("n_name").as("name"), col("n_regionkey").cast("long").as("rk"))
        .orderBy(col("k"))
        .collect()
      require(rows.length == 2, "fixture needs nation keys 1 and 2")
      val store = emptyStore(s)
      withWire(store) { sess =>
        // bootstrap: just the two constraints this projector relies on
        sess.run(refConstraintStmts(0), Map.empty) // Field
        sess.run(refConstraintStmts(2), Map.empty) // Station
        // the field parent (graph_fields.py upsert)
        sess.run(refFieldStmt, Map("id" -> 7L, "name" -> "home",
          "cust" -> 1L, "tz" -> "UTC+3", "country" -> null,
          "province" -> null, "district" -> null, "lat" -> null,
          "lon" -> null))
        rows.foreach { r =>
          val (k, name, rk) = (r.getLong(0), r.getString(1), r.getLong(2))
          val serial = s"ST$k"
          sess.run(refStationStmt, Map("serial" -> serial,
            "label" -> name, "type_id" -> rk, "lat" -> k, "lon" -> rk))
          // graph_stations.py:34-37, verbatim
          sess.run(
            """
                MATCH (f:Field {field_id: $fid}), (s:Station {serial_number: $serial})
                MERGE (f)-[:HAS_STATION]->(s)
                """,
            Map("fid" -> 7L, "serial" -> serial))
          if (k == 1L) {
            // with sensor_index (graph_stations.py:46-55): two
            // sensors at ONE depth — x is part of the identity
            Seq(0L, 1L).foreach { x =>
              val params = Map[String, Any]("serial" -> serial,
                "d" -> 10L, "y" -> (10L + x), "x" -> x)
              sess.run(
                """
                      MERGE (dp:DepthPoint {station_serial: $serial, depth: $d, sensor_index: $x})
                      SET dp.y = $y
                    """, params)
              sess.run(
                """
                      MATCH (s:Station {serial_number: $serial})
                      MATCH (dp:DepthPoint {station_serial: $serial, depth: $d, sensor_index: $x})
                      MERGE (s)-[:AT_DEPTH]->(dp)
                    """, params)
            }
          } else {
            // without sensor_index (graph_stations.py:57-65)
            val params = Map[String, Any]("serial" -> serial,
              "d" -> 30L, "y" -> 33L)
            sess.run(
              """
                      MERGE (dp:DepthPoint {station_serial: $serial, depth: $d})
                      SET dp.y = $y
                    """, params)
            sess.run(
              """
                      MATCH (s:Station {serial_number: $serial})
                      MATCH (dp:DepthPoint {station_serial: $serial, depth: $d})
                      MERGE (s)-[:AT_DEPTH]->(dp)
                    """, params)
          }
        }
        // fixpoint: replaying a dp MERGE + link creates nothing
        val before = (store.graph.vertices.count(), store.graph.edges.count())
        sess.run(
          """
                      MERGE (dp:DepthPoint {station_serial: $serial, depth: $d})
                      SET dp.y = $y
                    """,
          Map("serial" -> "ST2", "d" -> 30L, "y" -> 33L))
        sess.run(
          """
                      MATCH (s:Station {serial_number: $serial})
                      MATCH (dp:DepthPoint {station_serial: $serial, depth: $d})
                      MERGE (s)-[:AT_DEPTH]->(dp)
                    """,
          Map("serial" -> "ST2", "d" -> 30L, "y" -> 33L))
        val after = (store.graph.vertices.count(), store.graph.edges.count())
        require(before == after,
          s"station replay changed the graph: $before -> $after")
        store.cypher(
          """MATCH (f:Field)-[:HAS_STATION]->(s:Station)-[:AT_DEPTH]->(dp:DepthPoint)
             RETURN id(f) AS field, id(s) AS station, s.label AS label,
                    toInteger(s.type) AS type_id,
                    toInteger(dp.depth) AS depth,
                    toInteger(dp.sensor_index) AS sensor_index,
                    toInteger(dp.y) AS y
             ORDER BY station, depth, sensor_index""")
      }
    },
    Some("""WITH st AS (
        SELECT CAST(n_nationkey AS BIGINT) AS k, n_name AS name,
               CAST(n_regionkey AS BIGINT) AS rk
        FROM nation WHERE n_nationkey BETWEEN 1 AND 2
      ), dp AS (
        SELECT k, name, rk, 10 AS depth, x.x AS sensor_index,
               10 + x.x AS y
        FROM st, (SELECT 0 AS x UNION ALL SELECT 1) x WHERE k = 1
        UNION ALL
        SELECT k, name, rk, 30 AS depth, NULL AS sensor_index, 33 AS y
        FROM st WHERE k = 2
      )
      SELECT 'Field:7' AS field,
             'Station:ST' || CAST(k AS VARCHAR) AS station,
             name AS label, rk AS type_id,
             CAST(depth AS BIGINT) AS depth,
             CAST(sensor_index AS BIGINT) AS sensor_index,
             CAST(y AS BIGINT) AS y
      FROM dp ORDER BY station, depth, sensor_index"""),
    bench = false)

  /** graph_irrigation_event.py:296-310 — the event upsert, verbatim. */
  private val refIrrigationStmt =
    """
                    MERGE (ie:IrrigationEvent {
                        station_serial: $serial,
                        start_datetime: datetime($start)
                    })
                    SET ie.duration_min = $duration_min,
                        ie.avg_flow = $avg_flow,
                        ie.volume_per_emitter = $vol_per_emitter,
                        ie.wetting_depths_json = $wetting_depths_json,
                        ie.sensor_wetting_times_json = $sensor_wetting_times_json,
                        ie.vwc_before_after_json = $vwc_before_after_json,
                        ie.root_zone_list = $root_zone_list
                    """

  /** graph_irrigation_event.py:323-328 — the CONDITIONAL end-date
    * statement, verbatim: the inline `WITH … WHERE … SET` tail. */
  private val refIrrigationEndStmt =
    """
                    MATCH (ie:IrrigationEvent { station_serial: $serial, start_datetime: datetime($start) })
                    WITH ie, $end AS endp
                    WHERE endp IS NOT NULL
                    SET ie.end_datetime = datetime(endp)
                    """

  /** graph_irrigation_event.py:337-341 — the Station link, verbatim. */
  private val refIrrigationLinkStmt =
    """
                    MATCH (s:Station { serial_number: $serial })
                    MATCH (ie:IrrigationEvent { station_serial: $serial, start_datetime: datetime($start) })
                    MERGE (s)-[:HAS_IRRIGATION_EVENT]->(ie)
                    """

  /** Verbatim wire replay of the irrigation-event projector: three
    * events (the min-user's first three day-1 event timestamps).
    * Events 1-2 carry an end timestamp — the conditional statement's
    * WHERE passes and `datetime(endp)` lands; event 3 is OPEN (null
    * end): the same statement is a zero-stat no-op, and a LATER sync
    * closes it — the reference's incremental behavior. avg_flow is
    * null for event 2 (the reference's except-branch): `SET x = $p`
    * with a null param removes/omits the key, so the read returns
    * null. */
  val cy_ref_irrigation = Q(
    (s, dir) => {
      val day1 = Tables.read(s, dir, "events")
        .filter(col("ts") < lit("2024-01-02").cast("timestamp"))
      val uid = day1.agg(min(col("user_id"))).collect()(0).getLong(0)
      val evs = day1.filter(col("user_id") === uid)
        .select(col("event_id").cast("long").as("eid"), col("ts"),
          col("value").cast("double").as("v"))
        .orderBy(col("eid"))
        .limit(3)
        .collect()
      require(evs.nonEmpty, "fixture needs day-1 events")
      val serial = s"ST$uid"
      val store = emptyStore(s)
      withWire(store) { sess =>
        sess.run(refConstraintStmts(2), Map.empty) // Station
        sess.run(refConstraintStmts(7), Map.empty) // IrrigationEvent
        sess.run(refStationStmt, Map("serial" -> serial,
          "label" -> s"station $uid", "type_id" -> 1L,
          "lat" -> null, "lon" -> null))
        val micros = evs.map(r =>
          r.getTimestamp(1).getTime * 1000L +
            (r.getTimestamp(1).getNanos / 1000L) % 1000L)
        evs.zipWithIndex.foreach { case (r, i) =>
          val startP = graft.sinks.CypherSink.datetimeParams(micros(i))
          sess.run(refIrrigationStmt, Map(
            "serial" -> serial, "start" -> startP,
            "duration_min" -> r.getDouble(2),
            "avg_flow" -> (if (i == 1) null else r.getDouble(2) / 2.0),
            "vol_per_emitter" -> null,
            "wetting_depths_json" -> s"""[{"d":${10 * (i + 1)}}]""",
            "sensor_wetting_times_json" -> "[]",
            "vwc_before_after_json" -> "{}",
            "root_zone_list" -> "[10,30]"))
          // events 0-1 have ended; event 2 is still open (null end)
          val endP =
            if (i < 2)
              graft.sinks.CypherSink.datetimeParams(micros(i) + 2700L * 1000000L)
            else null
          sess.run(refIrrigationEndStmt, Map(
            "serial" -> serial, "start" -> startP, "end" -> endP))
          sess.run(refIrrigationLinkStmt, Map(
            "serial" -> serial, "start" -> startP))
        }
        // the open event stays open through an idempotent re-sync …
        val start2 = graft.sinks.CypherSink.datetimeParams(
          micros(math.min(2, evs.length - 1)))
        sess.run(refIrrigationEndStmt, Map(
          "serial" -> serial, "start" -> start2, "end" -> null))
        // … until a later sync delivers the end timestamp
        if (evs.length > 2)
          sess.run(refIrrigationEndStmt, Map(
            "serial" -> serial, "start" -> start2,
            "end" -> graft.sinks.CypherSink.datetimeParams(
              micros(2) + 5400L * 1000000L)))
        store.cypher(
          """MATCH (s:Station)-[:HAS_IRRIGATION_EVENT]->(ie:IrrigationEvent)
             RETURN id(s) AS station, ie.start_datetime AS start_dt,
                    ie.end_datetime AS end_dt,
                    toFloat(ie.duration_min) AS duration_min,
                    toFloat(ie.avg_flow) AS avg_flow,
                    ie.wetting_depths_json AS wetting_json,
                    ie.root_zone_list AS root_zones
             ORDER BY start_dt""")
      }
    },
    Some("""WITH u AS (
        SELECT MIN(user_id) AS uid FROM events
        WHERE ts < TIMESTAMP '2024-01-02'
      ), e AS (
        SELECT event_id, ts, value,
               ROW_NUMBER() OVER (ORDER BY event_id) AS rn
        FROM events, u
        WHERE user_id = u.uid AND ts < TIMESTAMP '2024-01-02'
        QUALIFY rn <= 3
      )
      SELECT 'Station:ST' || CAST(u.uid AS VARCHAR) AS station,
             strftime(ts, '%Y-%m-%dT%H:%M:%S') AS start_dt,
             CASE WHEN rn <= 2
                  THEN strftime(ts + INTERVAL 45 MINUTE, '%Y-%m-%dT%H:%M:%S')
                  ELSE strftime(ts + INTERVAL 90 MINUTE, '%Y-%m-%dT%H:%M:%S')
             END AS end_dt,
             CAST(value AS DOUBLE) AS duration_min,
             CASE WHEN rn = 2 THEN NULL
                  ELSE CAST(value AS DOUBLE) / 2.0 END AS avg_flow,
             '[{"d":' || CAST(10 * rn AS VARCHAR) || '}]' AS wetting_json,
             '[10,30]' AS root_zones
      FROM e, u ORDER BY start_dt"""),
    bench = false)

  /** Verbatim wire replay of the optimum-range projectors: per crop
    * (two part names), the OptimumSAPRange header
    * (graph_optimum_sap_range.py:67), the `MERGE (c:Crop) WITH c
    * MATCH (osr:…) MERGE (c)-[:HAS_OPTIMUM_RANGE]->(osr)` link
    * spelling (:76-80 — the write→WITH→MATCH→write inline tail), the
    * element file's 3-MERGE combined spelling of the SAME header
    * (graph_optimum_element_range.py:124-126 — both files write it;
    * replaying it over the other file's graph must create NOTHING),
    * then two OptimumElementRange nutrients with a two-sided and a
    * one-sided range (null max → key absent → null). opt_range_id is
    * the reference's own derivation `f"{crop_name}|{date_iso}"`
    * (graph_optimum_element_range.py:118). */
  val cy_ref_optimum = Q(
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val crops = Tables.read(s, dir, "part")
        .filter(col("p_partkey") <= 2)
        .select(col("p_partkey").cast("long").as("pk"),
          col("p_name").as("name"), col("p_size").cast("long").as("sz"))
        .withColumn("rn", row_number().over(Window
          .partitionBy(col("name")).orderBy(col("pk"))))
        .filter(col("rn") === 1).drop("rn")
        .orderBy(col("pk"))
        .collect()
      val dateIso = "2024-03-01"
      val store = emptyStore(s)
      withWire(store) { sess =>
        Seq(1, 11, 12).foreach(i => sess.run(refConstraintStmts(i), Map.empty))
        crops.foreach { r =>
          val (name, sz) = (r.getString(1), r.getLong(2))
          val optRangeId = s"$name|$dateIso" // :118, verbatim derivation
          sess.run(
            """
                MERGE (osr:OptimumSAPRange { crop_name: $crop_name, date: $date })
                """,
            Map("crop_name" -> name, "date" -> dateIso))
          sess.run(
            """
                MERGE (c:Crop { name: $crop_name })
                WITH c
                MATCH (osr:OptimumSAPRange { crop_name: $crop_name, date: $date })
                MERGE (c)-[:HAS_OPTIMUM_RANGE]->(osr)
                """,
            Map("crop_name" -> name, "date" -> dateIso))
          // the element file's combined spelling of the same header —
          // all three MERGEs must MATCH what the other file wrote
          val before = (store.graph.vertices.count(),
            store.graph.edges.count())
          sess.run(
            """
                    MERGE (osr:OptimumSAPRange { crop_name: $crop_name, date: $date })
                    MERGE (c:Crop { name: $crop_name })
                    MERGE (c)-[:HAS_OPTIMUM_RANGE]->(osr)
                    """,
            Map("crop_name" -> name, "date" -> dateIso))
          require((store.graph.vertices.count(),
            store.graph.edges.count()) == before,
            "combined header spelling must be a fixpoint over the " +
            "range file's graph")
          // two nutrients: "1-4"-style two-sided and ">= x.5"
          // one-sided ranges (the reference's _parse_optimum forms)
          Seq(("N", sz.toDouble, sz.toDouble + 3.0),
              ("P", sz.toDouble + 0.5, null)).foreach { case (nut, mn, mx) =>
            sess.run(
              """
                    MERGE (oer:OptimumElementRange { opt_range_id: $opt_range_id, nutrient: $nutrient })
                    SET oer.min = $min, oer.max = $max
                    """,
              Map("opt_range_id" -> optRangeId, "nutrient" -> nut,
                "min" -> mn, "max" -> mx))
            sess.run(
              """
                    MATCH (osr:OptimumSAPRange { crop_name: $crop_name, date: $date })
                    MATCH (oer:OptimumElementRange { opt_range_id: $opt_range_id, nutrient: $nutrient })
                    MERGE (osr)-[:HAS_OPTIMUM_ELEMENT]->(oer)
                    """,
              Map("crop_name" -> name, "date" -> dateIso,
                "opt_range_id" -> optRangeId, "nutrient" -> nut))
          }
        }
        store.cypher(
          """MATCH (c:Crop)-[:HAS_OPTIMUM_RANGE]->(osr:OptimumSAPRange)-[:HAS_OPTIMUM_ELEMENT]->(oer:OptimumElementRange)
             RETURN id(c) AS crop, id(osr) AS range_id,
                    oer.nutrient AS nutrient, toFloat(oer.min) AS vmin,
                    toFloat(oer.max) AS vmax
             ORDER BY crop, nutrient""")
      }
    },
    Some("""WITH crops AS (
        SELECT p_name AS name, CAST(p_size AS BIGINT) AS sz
        FROM part WHERE p_partkey <= 2
        QUALIFY ROW_NUMBER() OVER (PARTITION BY p_name
          ORDER BY CAST(p_partkey AS BIGINT)) = 1
      ), nut AS (
        SELECT name, sz, 'N' AS nutrient,
               CAST(sz AS DOUBLE) AS vmin, CAST(sz + 3 AS DOUBLE) AS vmax
        FROM crops
        UNION ALL
        SELECT name, sz, 'P', CAST(sz AS DOUBLE) + 0.5, NULL FROM crops
      )
      SELECT 'Crop:' || name AS crop,
             'OptimumSAPRange:' || name || ':2024-03-01' AS range_id,
             nutrient, vmin, vmax
      FROM nut ORDER BY crop, nutrient"""),
    bench = false)

  /** Verbatim wire replay of the weather-forecast projector: `SET wf
    * += $props` bulk merge under a datetime() MERGE key
    * (graph_weather_forecast.py:55-60). Two forecast hours; each is
    * REFRESHED in two passes with disjoint measurement keys — the
    * second `+=` must keep the first pass's keys (map-merge, not
    * replace). Props follow the reference's flattening
    * `{name}_{min|max|avg|total}` over the events day-1 slice. */
  val cy_ref_forecast = Q(
    (s, dir) => {
      val day1 = Tables.read(s, dir, "events")
        .filter(col("ts") < lit("2024-01-02").cast("timestamp"))
      val uid = day1.agg(min(col("user_id"))).collect()(0).getLong(0)
      val buckets = day1.filter(col("user_id") === uid)
        .groupBy((col("event_id") % 2).cast("long").as("b"))
        .agg(min(col("value")).cast("double").as("vmin"),
          max(col("value")).cast("double").as("vmax"),
          (sum(col("value").cast("decimal(27,8)")).cast("double") /
            count(col("value"))).cast("double").as("vavg"),
          sum(col("value").cast("decimal(27,8)")).cast("double").as("vtot"))
        .orderBy(col("b"))
        .collect()
      require(buckets.nonEmpty, "fixture needs day-1 events")
      val serial = s"ST$uid"
      val store = emptyStore(s)
      withWire(store) { sess =>
        sess.run(refConstraintStmts(2), Map.empty) // Station
        sess.run(refConstraintStmts(3), Map.empty) // WeatherForecast
        sess.run(refStationStmt, Map("serial" -> serial,
          "label" -> s"station $uid", "type_id" -> 2L,
          "lat" -> null, "lon" -> null))
        val upsert =
          """
                    MERGE (wf:WeatherForecast { station_serial: $serial, date: datetime($dt) })
                    SET wf += $props
                    """
        val link =
          """
                    MATCH (s:Station {serial_number: $serial})
                    MATCH (wf:WeatherForecast {station_serial: $serial, date: datetime($dt)})
                    MERGE (s)-[:HAS_FORECAST]->(wf)
                    """
        buckets.foreach { r =>
          val hour = 6L + 6L * r.getLong(0)
          val dt = graft.sinks.CypherSink.datetimeParams(
            (java.sql.Date.valueOf("2024-01-01").getTime +
              hour * 3600000L) * 1000L)
          // refresh pass 1: min/max only
          sess.run(upsert, Map("serial" -> serial, "dt" -> dt,
            "props" -> Map("value_min" -> r.getDouble(1),
              "value_max" -> r.getDouble(2))))
          // refresh pass 2: avg/total — += must KEEP pass 1's keys
          sess.run(upsert, Map("serial" -> serial, "dt" -> dt,
            "props" -> Map("value_avg" -> r.getDouble(3),
              "value_total" -> r.getDouble(4))))
          sess.run(link, Map("serial" -> serial, "dt" -> dt))
        }
        // fixpoint: the link replays clean
        val dt0 = graft.sinks.CypherSink.datetimeParams(
          (java.sql.Date.valueOf("2024-01-01").getTime +
            6L * 3600000L) * 1000L)
        val before = store.graph.edges.count()
        sess.run(link, Map("serial" -> serial, "dt" -> dt0))
        require(store.graph.edges.count() == before,
          "forecast link replay created an edge")
        store.cypher(
          """MATCH (s:Station)-[:HAS_FORECAST]->(wf:WeatherForecast)
             RETURN id(s) AS station, wf.date AS date,
                    toFloat(wf.value_min) AS value_min,
                    toFloat(wf.value_max) AS value_max,
                    toFloat(wf.value_avg) AS value_avg,
                    toFloat(wf.value_total) AS value_total
             ORDER BY date""")
      }
    },
    Some("""WITH u AS (
        SELECT MIN(user_id) AS uid FROM events
        WHERE ts < TIMESTAMP '2024-01-02'
      ), b AS (
        SELECT (event_id % 2) AS b, MIN(value) AS vmin, MAX(value) AS vmax,
               CAST(SUM(CAST(value AS DECIMAL(27,8))) AS DOUBLE) / COUNT(value) AS vavg,
               CAST(SUM(CAST(value AS DECIMAL(27,8))) AS DOUBLE) AS vtot
        FROM events, u
        WHERE user_id = u.uid AND ts < TIMESTAMP '2024-01-02'
        GROUP BY 1
      )
      SELECT 'Station:ST' || CAST(u.uid AS VARCHAR) AS station,
             '2024-01-01T' || LPAD(CAST(6 + 6 * b AS VARCHAR), 2, '0')
               || ':00:00' AS date,
             CAST(vmin AS DOUBLE) AS value_min,
             CAST(vmax AS DOUBLE) AS value_max,
             CAST(vavg AS DOUBLE) AS value_avg,
             CAST(vtot AS DOUBLE) AS value_total
      FROM b, u ORDER BY date"""),
    bench = false)

  val all: Map[String, Q] = Map(
    "cy_ref_constraints" -> cy_ref_constraints,
    "cy_ref_station" -> cy_ref_station,
    "cy_ref_irrigation" -> cy_ref_irrigation,
    "cy_ref_optimum" -> cy_ref_optimum,
    "cy_ref_forecast" -> cy_ref_forecast,
  )
}
