package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.domain._
import graft.functions.{Functions => F}

/** End-to-end domain-pipeline tests over FIXTURES.md-shaped synthetic
  * inputs — the reference's actual flows (SURVEY §3.2/§3.3) run
  * through the engine.
  */
class DomainSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // FIXTURES.md §3 — long telemetry
  private def telem(rows: (String, String, String, String, Double)*) =
    rows.map { case (serial, at, fw, label, v) =>
      (1L, serial, ts(at), fw, label, "u", v, v - 1, v + 1, v, v)
    }.toDF("device_id", "serial_number", "data_at", "fw_key", "label",
      "unit", "data", "min", "max", "avg", "sum")

  test("weather day pipeline: daily kept, hourly rolled up for missing days, pivoted wide") {
    val daily = telem(("S1", "2025-06-01 00:00:00", "6", "Air Temp", 20.0))
    val hourly = telem(
      ("S1", "2025-06-01 03:00:00", "6", "Air Temp", 99.0),  // ignored: daily exists
      ("S1", "2025-06-02 01:00:00", "6", "Air Temp", 10.0),
      ("S1", "2025-06-02 02:00:00", "6", "Air Temp", 30.0),
      ("S1", "2025-06-02 02:00:00", "8", "Humidity", 55.0))
    val nodes = DayMetricPipeline.nodeTable(daily, hourly, DayMetricPipeline.weather)
      .orderBy("date").collect()
    assert(nodes.length == 2)
    val d1 = nodes(0); val d2 = nodes(1)
    assert(d1.getAs[Double]("air_temp") == 20.0)           // daily value kept
    assert(d2.getAs[Double]("air_temp") == 20.0)           // mean(10, 30)
    assert(d2.getAs[Double]("air_temp_min") == 9.0)        // min of (v-1)
    assert(d2.getAs[Double]("air_temp_max") == 31.0)
    assert(d2.getAs[Double]("humidity") == 55.0)
    val edges = DayMetricPipeline.edgeTable(
      DayMetricPipeline.nodeTable(daily, hourly, DayMetricPipeline.weather),
      DayMetricPipeline.weather).collect()
    assert(edges.length == 2 && edges.forall(_.getAs[String]("rel") == "HAS_WEATHER_DAY"))
  }

  test("sentinel flavor zero-sum quirk is configurable") {
    val hourly = telem(("S1", "2025-06-01 01:00:00", "88", "Flow 1", 0.0))
      .withColumn("sum", lit(0.0))
    val quirk = DayMetricPipeline.nodeTable(hourly.limit(0), hourly,
      DayMetricPipeline.irrigation)
    assert(quirk.collect()(0).get(quirk.columns.indexOf("flow_1_sum")) == null)
    val normalized = DayMetricPipeline.nodeTable(hourly.limit(0), hourly,
      DayMetricPipeline.irrigation.copy(zeroSumToNull = false))
    assert(normalized.collect()(0).get(normalized.columns.indexOf("flow_1_sum")) == 0.0)
  }

  // FIXTURES.md §8 — SAP analyses
  private val sapRaw = Seq(
    (10L, "tomato", ts("2025-06-05 00:00:00"), "Y-1", "O-1",
      Seq(("Nitrogen", "1.234", "≈2", "1-4"), ("Kalium", "<0,5", "0,7", ">=2.5")),
      Seq(("pH", "6,1", "6,3", ""), ("Brix", "4", "5", ""))),
    (10L, "tomato", ts("2025-06-05 00:00:00"), "Y-2", null,
      Seq(("Nitrogen", "9", "", "1-4")), Seq.empty[(String, String, String, String)])
  ).toDF("field_id", "crop_name", "sample_date", "young_sample", "old_sample",
      "elements_raw", "others_raw")
    .withColumn("elements", expr(
      "transform(elements_raw, e -> named_struct('mineral', e._1, 'young', e._2, 'old', e._3, 'optimum', e._4))"))
    .withColumn("others", expr(
      "transform(others_raw, e -> named_struct('mineral', e._1, 'young', e._2, 'old', e._3, 'optimum', e._4))"))
    .drop("elements_raw", "others_raw")

  test("SAP pipeline: young/old fan-out, scalar extraction, element parsing, optimum ranges") {
    val analyses = LabAnalysisPipeline.sapAnalyses(sapRaw)
    val rows = analyses.orderBy("sample_id").collect()
    assert(rows.length == 3) // Y-1, O-1, Y-2 (null old skipped)
    val y1 = rows.find(_.getAs[String]("sample_id") == "Y-1").get
    assert(y1.getAs[String]("ph") == "6,1")      // strings, §1.6.5
    assert(y1.getAs[String]("sugars") == "4")
    val o1 = rows.find(_.getAs[String]("sample_id") == "O-1").get
    assert(o1.getAs[String]("ph") == "6,3")

    val els = LabAnalysisPipeline.sapElementResults(analyses)
      .orderBy("sap_analysis_id", "nutrient").collect()
    val y1n = els.filter(r => r.getAs[String]("sap_analysis_id").contains("Y-1"))
    assert(y1n.map(r => (r.getAs[String]("nutrient"), r.get(r.fieldIndex("value_ppm")))).toSeq
      == Seq(("kalium", 0.5), ("nitrogen", 1.234)))

    val (headers, ranges) = LabAnalysisPipeline.optimumRanges(sapRaw)
    assert(headers.count() == 1) // A7: one (crop, date) header
    val rng = ranges.orderBy("nutrient").collect()
      .map(r => (r.getAs[String]("nutrient"), r.get(r.fieldIndex("min")), r.get(r.fieldIndex("max"))))
    assert(rng.toSeq == Seq(("kalium", 2.5, null), ("nitrogen", 1.0, 4.0)))
  }

  test("TND totals: first occurrence wins, inequality-tolerant, cn aliases") {
    val raw = Seq(
      (5L, ts("2025-06-01 00:00:00"), "L-1",
        Seq(("Total C", "12.5"), ("total c", "99"), ("C/N Ratio", "<= 8"), ("Total N", "abc")))
    ).toDF("field_id", "sample_date", "lab_no", "els")
      .withColumn("elements", expr(
        "transform(els, e -> named_struct('element', e._1, 'value', e._2, 'unit', 'ppm'))"))
    val out = LabAnalysisPipeline.tndTotals(raw,
      Map("total c" -> "total_c", "total n" -> "total_n")).collect()(0)
    assert(out.getAs[Double]("total_c") == 12.5)  // first occurrence, not 99
    assert(out.getAs[Double]("cn_ratio") == 8.0)  // "<= 8" parsed
    assert(out.get(out.fieldIndex("total_n")) == null)
  }

  // FIXTURES.md §11 — activities
  private val nutrientsMap = map(lit("N"), lit("12%"), lit("P"), lit("5,5"))
  private val activities = Seq(
    (1L, ts("2025-06-01 00:00:00"), "tomato", "spray", ts("2025-06-01 08:00:00"), "first"),
    (1L, ts("2025-06-01 00:00:00"), "tomato", "spray", ts("2025-06-01 14:00:00"), "second"),
    (2L, ts("2025-06-01 00:00:00"), null, null, null, null)
  ).toDF("field_id", "created_at", "crop_name", "type_code", "start_at", "notes")
    .withColumn("type_name", lit(null).cast("string"))
    .withColumn("sub_type_code", lit(null).cast("string"))
    .withColumn("category_code", lit(null).cast("string"))
    .withColumn("ph", lit(6.5)).withColumn("ec", lit(1.2))
    .withColumn("inventories", array(
      struct(lit(1500.0).as("amount"), lit("ml").as("amount_unit_abbr"),
        lit(2.0).as("dose_amount"), lit("L").as("dose_amount_unit_abbr"),
        lit("da").as("dose_per_unit"),
        lit("SuperGrow").as("inventory_name"), lit("AgriCo").as("inventory_brand"),
        lit("SuperGrow").as("fertilizer_name"), lit("AgriCo").as("fertilizer_brand"),
        nutrientsMap.as("nutrients"), lit(7.0).as("ph"), lit(0.9).as("ec")),
      struct(lit(2.0).as("amount"), lit("L").as("amount_unit_abbr"),
        lit(1.0).as("dose_amount"), lit("L").as("dose_amount_unit_abbr"),
        lit("ha").as("dose_per_unit"),
        lit("SuperGrow").as("inventory_name"), lit("AgriCo").as("inventory_brand"),
        lit(null).cast("string").as("fertilizer_name"), lit(null).cast("string").as("fertilizer_brand"),
        map().cast("map<string,string>").as("nutrients"),
        lit(null).cast("double").as("ph"), lit(null).cast("double").as("ec"))))

  test("application chain: idx windows, explode, keep-existing master, enrichment") {
    val events = ApplicationChain.applicationEvents(activities)
    val evRows = events.orderBy("field_id", "idx").collect()
    assert(evRows.length == 3)
    assert(evRows(0).getAs[Int]("idx") == 1 && evRows(0).getAs[String]("comment") == "first")
    assert(evRows(1).getAs[Int]("idx") == 2)
    assert(evRows(2).getAs[String]("app_type") == "unknown") // F15 default
    // A12: 1500ml/1da = 1.5 + 2L/1ha(=10da) = 0.2 → 1.7
    assert(math.abs(evRows(0).getAs[Double]("water_volume_l") - 1.7) < 1e-9)

    val products = ApplicationChain.productApplications(events)
    assert(products.count() == 6) // 3 events × 2 inventories
    val master = ApplicationChain.fertilizerProducts(products)
    assert(master.count() == 1)   // one (name, brand)
    val m = master.collect()(0)
    assert(m.getAs[Map[String, String]]("nutrients").nonEmpty) // non-null row won

    val contents = ApplicationChain.appNutrientContents(products, master)
    val c = contents.orderBy("product_application_id", "nutrient").collect()
    // every product application resolves nutrients (own or enriched)
    assert(c.length == 12) // 6 applications × 2 nutrients
    val n = c.find(r => r.getAs[String]("nutrient") == "n").get
    assert(n.getAs[Double]("pct_or_g_l") == 12.0)  // "12%" → 12.0 (F7)
    val p = c.find(r => r.getAs[String]("nutrient") == "p").get
    assert(p.getAs[Double]("pct_or_g_l") == 5.5)   // "5,5" → 5.5
  }

  test("graph assembly: vertices + edges + no dangling endpoints, idempotent rebuild") {
    val events = ApplicationChain.applicationEvents(activities)
    val products = ApplicationChain.productApplications(events)
    val v = GraphAssembly.vertices(events, "ApplicationEvent", Seq("application_event_id"))
      .unionByName(GraphAssembly.vertices(products, "ProductApplication",
        Seq("product_application_id")))
    val e = GraphAssembly.edges(products, "HAS_PRODUCT_APP",
      "ApplicationEvent", Seq("application_event_id"),
      "ProductApplication", Seq("product_application_id"))
    assert(GraphAssembly.danglingEdges(v, e).count() == 0)
    assert(v.count() == 9 && e.count() == 6)
    // idempotence: rebuilding yields identical vertex/edge sets
    val v2 = GraphAssembly.vertices(events, "ApplicationEvent", Seq("application_event_id"))
      .unionByName(GraphAssembly.vertices(products, "ProductApplication",
        Seq("product_application_id")))
    assert(v.orderBy("id").collect().toSeq == v2.orderBy("id").collect().toSeq)
  }
}
