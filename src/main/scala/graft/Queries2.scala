package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.sources.Tables
import graft.operators.Reshape
import graft.functions.{Functions => F}
import Queries.Q

/** Batch 2 of the query catalog: pivot/unpivot/explode reshaping
  * (SURVEY §2.5) and the scalar-function families (§2.6), exercised
  * over the harness tables with DuckDB oracles.
  */
object Queries2 {

  private def T_(s: org.apache.spark.sql.SparkSession, dir: String, n: String) =
    Tables.read(s, dir, n)

  // ===========================================================
  // R — pivot / unpivot / reshaping
  // ===========================================================

  /** R1 — long→wide stat pivot with a bounded metric universe
    * (graph_weather_day.py:235-248): daily per-type event stats become
    * `{type}_n` / `{type}_sum` columns keyed by day. The pivot value
    * list is declared up front, so this is a single hash aggregate (no
    * distinct-collection pass — at 100 TB that second pass is a full
    * scan).
    */
  val r1_stat_pivot = Q(
    (s, dir) => {
      val types = Seq("click", "view", "purchase", "signup", "error")
      val wide = T_(s, dir, "events")
        .groupBy(to_date(col("ts")).as("date"))
        .pivot("event_type", types)
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(27,8)")).cast("double").as("sum"))
      // a (date, type) combination absent from the data pivots to null;
      // the SQL FILTER form counts 0 — align on 0
      wide.select(wide.columns.map { c =>
        if (c.endsWith("_n")) coalesce(col(c), lit(0L)).as(c) else col(c)
      }.toIndexedSeq: _*)
    },
    Some("""SELECT CAST(ts AS DATE) AS date,
       count(*) FILTER (event_type = 'click') AS click_n,
       CAST(SUM(CAST(value AS DECIMAL(27,8))) FILTER (event_type = 'click') AS DOUBLE) AS click_sum,
       count(*) FILTER (event_type = 'view') AS view_n,
       CAST(SUM(CAST(value AS DECIMAL(27,8))) FILTER (event_type = 'view') AS DOUBLE) AS view_sum,
       count(*) FILTER (event_type = 'purchase') AS purchase_n,
       CAST(SUM(CAST(value AS DECIMAL(27,8))) FILTER (event_type = 'purchase') AS DOUBLE) AS purchase_sum,
       count(*) FILTER (event_type = 'signup') AS signup_n,
       CAST(SUM(CAST(value AS DECIMAL(27,8))) FILTER (event_type = 'signup') AS DOUBLE) AS signup_sum,
       count(*) FILTER (event_type = 'error') AS error_n,
       CAST(SUM(CAST(value AS DECIMAL(27,8))) FILTER (event_type = 'error') AS DOUBLE) AS error_sum
      FROM events GROUP BY CAST(ts AS DATE)"""))

  /** R2 — array/map positions → wide columns (forecast map→wide,
    * graph_weather_forecast.py:44-61): first 4 embedding dims as
    * named columns. Pure projection, no shuffle.
    */
  val r2_array_to_wide = Q(
    (s, dir) => T_(s, dir, "embeddings")
      .select(col("vec_id"),
        element_at(col("embedding"), 1).cast("double").as("e0"),
        element_at(col("embedding"), 2).cast("double").as("e1"),
        element_at(col("embedding"), 3).cast("double").as("e2"),
        element_at(col("embedding"), 4).cast("double").as("e3")),
    Some("""SELECT vec_id,
       CAST(embedding[1] AS DOUBLE) AS e0, CAST(embedding[2] AS DOUBLE) AS e1,
       CAST(embedding[3] AS DOUBLE) AS e2, CAST(embedding[4] AS DOUBLE) AS e3
      FROM embeddings"""))

  /** R4 — unpivot fixed column groups to rows (young/old leaf → rows,
    * graph_sap_analysis.py:144-177) via the generator form of stack.
    */
  val r4_unpivot = Q(
    (s, dir) => Reshape.unpivotGroups(
      T_(s, dir, "part"), "attr", Seq("val"),
      Seq(
        "retailprice" -> Seq(col("p_retailprice")),
        "size" -> Seq(col("p_size").cast("double"))),
      keep = Seq("p_partkey"))
      .filter(col("val").isNotNull),
    Some("""SELECT p_partkey, 'retailprice' AS attr, p_retailprice AS val FROM part
      UNION ALL
      SELECT p_partkey, 'size', CAST(p_size AS DOUBLE) FROM part"""))

  /** R5 — positional explode of an array column into child rows
    * (elements[] → per-parameter rows, graph_sap_element_result.py:111-132).
    * Bounded to the first 8 dims to keep the fan-out proportional at
    * every scale factor.
    */
  val r5_posexplode = Q(
    (s, dir) => T_(s, dir, "embeddings")
      .filter(col("vec_id") % 50 === 0)
      .select(col("vec_id"), posexplode(slice(col("embedding"), 1, 8)))
      .select(col("vec_id"), (col("pos") + 1).as("pos"),
        col("col").cast("double").as("e")),
    Some("""SELECT vec_id, CAST(generate_subscripts(embedding[1:8], 1) AS INTEGER) AS pos,
             CAST(unnest(embedding[1:8]) AS DOUBLE) AS e
      FROM embeddings WHERE vec_id % 50 = 0"""))

  /** R7 — JSON packing at the sink boundary (structures → JSON-string
    * props, graph_irrigation_event.py:39-41): keep data structured,
    * `to_json` only in the final projection.
    */
  val r7_json_pack = Q(
    (s, dir) => T_(s, dir, "part")
      .filter(col("p_size") >= 48)
      .select(col("p_partkey"),
        to_json(struct(col("p_partkey"), col("p_brand"), col("p_size"))).as("props_json")),
    Some("""SELECT p_partkey,
       to_json(struct_pack(p_partkey := p_partkey, p_brand := p_brand,
                           p_size := p_size)) AS props_json
      FROM part WHERE p_size >= 48"""))

  // ===========================================================
  // F — scalar function suite (§2.6) over real text columns
  // ===========================================================

  /** F2/F4/F14/F15 — sanitize, first-number parse, norm-empty-to-null,
    * coalesce-chain defaults, applied to part descriptors.
    */
  val f_parse_suite = Q(
    (s, dir) => T_(s, dir, "part")
      .select(col("p_partkey"),
        F.sanitizeName(col("p_type")).as("type_key"),
        F.parseNumber(col("p_name")).as("first_num"),
        F.normStr(col("p_brand")).as("brand_norm"),
        F.pickFirst("unknown", col("p_type"), col("p_brand")).as("kind")),
    Some("""SELECT p_partkey,
       regexp_replace(lower(p_type), '[^a-z0-9_]', '_', 'g') AS type_key,
       CASE WHEN regexp_extract(p_name, '([-+]?\d+(?:[.,]\d+)?)', 1) <> ''
            THEN CAST(replace(regexp_extract(p_name, '([-+]?\d+(?:[.,]\d+)?)', 1), ',', '.') AS DOUBLE)
       END AS first_num,
       CASE WHEN trim(p_brand) = '' THEN NULL ELSE trim(p_brand) END AS brand_norm,
       coalesce(
         CASE WHEN trim(p_type) = '' THEN NULL ELSE trim(p_type) END,
         CASE WHEN trim(p_brand) = '' THEN NULL ELSE trim(p_brand) END,
         'unknown') AS kind
      FROM part"""))

  /** F5 — optimum-range text → (min, max)
    * (graph_optimum_element_range.py:16-61). Range strings are
    * synthesized deterministically from part attributes so every
    * branch of the parser is exercised: "a-b", bare number, ">=x",
    * "<=x".
    */
  val f5_range_parse = Q(
    (s, dir) => {
      val rangeText = when(col("p_partkey") % 4 === 0,
        concat(col("p_size").cast("string"), lit("-"),
          (col("p_size") + 3).cast("string")))
        .when(col("p_partkey") % 4 === 1, concat(lit(">="), col("p_size").cast("string")))
        .when(col("p_partkey") % 4 === 2, concat(lit("<="), col("p_size").cast("string")))
        .otherwise(col("p_size").cast("string"))
      T_(s, dir, "part")
        .select(col("p_partkey"), rangeText.as("range_text"),
          F.parseRange(rangeText).as("r"))
        .select(col("p_partkey"), col("range_text"),
          col("r.range_min").as("range_min"), col("r.range_max").as("range_max"))
    },
    Some("""WITH t AS (SELECT p_partkey,
        CASE WHEN p_partkey % 4 = 0 THEN CAST(p_size AS VARCHAR) || '-' || CAST(p_size + 3 AS VARCHAR)
             WHEN p_partkey % 4 = 1 THEN '>=' || CAST(p_size AS VARCHAR)
             WHEN p_partkey % 4 = 2 THEN '<=' || CAST(p_size AS VARCHAR)
             ELSE CAST(p_size AS VARCHAR) END AS range_text
      FROM part)
      SELECT p_partkey, range_text,
        CASE WHEN range_text LIKE '%-%' THEN CAST(string_split(range_text,'-')[1] AS DOUBLE)
             WHEN range_text LIKE '>=%' THEN CAST(substr(range_text,3) AS DOUBLE)
             WHEN range_text LIKE '<=%' THEN NULL
             ELSE CAST(range_text AS DOUBLE) END AS range_min,
        CASE WHEN range_text LIKE '%-%' THEN CAST(string_split(range_text,'-')[2] AS DOUBLE)
             WHEN range_text LIKE '>=%' THEN NULL
             WHEN range_text LIKE '<=%' THEN CAST(substr(range_text,3) AS DOUBLE)
             ELSE CAST(range_text AS DOUBLE) END AS range_max
      FROM t"""))

  /** F6/F7 — inequality-tolerant and percent-tolerant numeric parses
    * over synthesized messy numerics (graph_tnd_analysis.py:24-37,
    * graph_app_nutrient_content.py:91-106).
    */
  val f6_messy_numeric = Q(
    (s, dir) => {
      val messy = when(col("p_partkey") % 3 === 0,
        concat(lit("<= "), col("p_size").cast("string")))
        .when(col("p_partkey") % 3 === 1, concat(col("p_size").cast("string"), lit("%")))
        .otherwise(concat(col("p_size").cast("string"), lit(",5")))
      T_(s, dir, "part").select(col("p_partkey"), messy.as("raw"),
        F.toFloatOrNull(messy).as("ineq_val"),
        F.toNumberPctTolerant(messy).as("pct_val"))
    },
    Some("""WITH t AS (SELECT p_partkey,
        CASE WHEN p_partkey % 3 = 0 THEN '<= ' || CAST(p_size AS VARCHAR)
             WHEN p_partkey % 3 = 1 THEN CAST(p_size AS VARCHAR) || '%'
             ELSE CAST(p_size AS VARCHAR) || ',5' END AS raw
      FROM part)
      SELECT p_partkey, raw,
        coalesce(TRY_CAST(raw AS DOUBLE),
                 TRY_CAST(trim(regexp_replace(raw, '^\s*[<>=]+\s*', '')) AS DOUBLE)) AS ineq_val,
        CASE WHEN regexp_extract(replace(raw,'%',''), '([-+]?\d+(?:[.,]\d+)?)', 1) <> ''
             THEN CAST(replace(regexp_extract(replace(raw,'%',''), '([-+]?\d+(?:[.,]\d+)?)', 1), ',', '.') AS DOUBLE)
        END AS pct_val
      FROM t"""))

  /** F8/F9/A12 — unit conversions + unit-normalized sum
    * (graph_application_event.py:38-85): synthesized units, liters
    * conversion, per-decare normalization, then a group sum.
    */
  val f8_unit_normalized_sum = Q(
    (s, dir) => {
      val unit = when(col("l_linenumber") % 3 === 0, lit("ml"))
        .when(col("l_linenumber") % 3 === 1, lit("L"))
        .otherwise(lit("kg"))
      val area = when(col("l_linenumber") % 2 === 0, lit("da")).otherwise(lit("ha"))
      // IEEE double division is engine-independent; the sum goes
      // through a decimal cast for order-independence
      val perDa = F.toLiters(col("l_quantity"), unit) / F.areaUnitToDaFactor(area)
      T_(s, dir, "lineitem")
        .select(col("l_orderkey"), perDa.as("liters_per_da"))
        .groupBy(col("l_orderkey"))
        .agg(sum(col("liters_per_da").cast("decimal(27,8)")).cast("double")
          .as("total_liters_per_da"),
          count(col("liters_per_da")).as("n_convertible"))
    },
    Some("""WITH t AS (SELECT l_orderkey,
        CASE WHEN l_linenumber % 3 = 0 THEN l_quantity / CAST(1000.0 AS DOUBLE)
             WHEN l_linenumber % 3 = 1 THEN l_quantity
        END /
        CASE WHEN l_linenumber % 2 = 0 THEN CAST(1.0 AS DOUBLE) ELSE CAST(10.0 AS DOUBLE) END
          AS liters_per_da
      FROM lineitem)
      SELECT l_orderkey,
        CAST(SUM(CAST(liters_per_da AS DECIMAL(27,8))) AS DOUBLE) AS total_liters_per_da,
        COUNT(liters_per_da) AS n_convertible
      FROM t GROUP BY l_orderkey"""))

  /** F10/F13 — permissive timestamp coercion round-trip
    * (app/utils.py:19-32): format timestamps three ways, coerce back.
    *
    * Oracle form (r17): TRY_CAST instead of try_strptime. DuckDB 1.0.0
    * deterministically SEGFAULTS (rc=139) executing the bulk
    * try_strptime chain on a long-lived connection right after the
    * ~116-query a_*..eval_* sweep prefix — exactly where the driver's
    * round-16 oracle died; a fresh connection runs the same SQL fine.
    * The cast form parses the same three formats ('YYYY-MM-DD
    * HH:MM:SS' | ':00'-completed 'YYYY-MM-DD HH:MM' | 'YYYY-MM-DD')
    * and was verified cell-identical at sf0.01 (EXCEPT both
    * directions = 0 rows, identical Arrow types).
    */
  val f10_coerce_ts = Q(
    (s, dir) => {
      val fmt = when(col("event_id") % 3 === 0, date_format(col("ts"), "yyyy-MM-dd HH:mm:ss"))
        .when(col("event_id") % 3 === 1, date_format(col("ts"), "yyyy-MM-dd HH:mm"))
        .otherwise(date_format(col("ts"), "yyyy-MM-dd"))
      T_(s, dir, "events")
        .select(col("event_id"), fmt.as("raw"),
          F.coerceToTimestamp(fmt).as("coerced"),
          F.isoDay(col("ts")).as("day"))
    },
    Some("""WITH t AS (SELECT event_id, ts,
        CASE WHEN event_id % 3 = 0 THEN strftime(ts, '%Y-%m-%d %H:%M:%S')
             WHEN event_id % 3 = 1 THEN strftime(ts, '%Y-%m-%d %H:%M')
             ELSE strftime(ts, '%Y-%m-%d') END AS raw
      FROM events)
      SELECT event_id, raw,
        coalesce(TRY_CAST(raw AS TIMESTAMP),
                 TRY_CAST(CASE WHEN length(raw) = 16 THEN raw || ':00' END
                   AS TIMESTAMP),
                 TRY_CAST(substr(raw, 1, 10) AS TIMESTAMP)) AS coerced,
        strftime(ts, '%Y-%m-%d') AS day
      FROM t"""))

  /** F1/F3/F11/F16 — alias-map property-base resolution
    * (graph_weather_day.py:53-67), depth-from-label with the −1
    * sentinel (graph_soil_layer.py:28-42), tz-name → fixed offset
    * (app/utils.py:34-43), and length-preferring label pick
    * (graph_soil_layer.py:45-51). Inputs are synthesized from part
    * attributes so every branch of each decision tree fires: alias
    * hit, non-empty label, sanitized-key fallback, "m" default;
    * comma-decimal depth (exercising half-up rounding), plain depth,
    * no-number → −1; both known offsets and an unknown zone → null;
    * empty-current, longer-candidate, and keep-current label picks.
    */
  val f_alias_suite = Q(
    (s, dir) => {
      val k = col("p_partkey")
      val fwKey = when(k % 4 === 0, lit("temp_air"))
        .when(k % 4 === 1, lit("Par Key 1"))
        .when(k % 4 === 2, lit("Hum Key!"))
        .otherwise(lit(""))
      val label = when(k % 4 === 3, lit("  "))
        .when(k % 2 === 0, lit(""))
        .otherwise(col("p_type"))
      val depthLbl = when(k % 3 === 0,
        concat(lit("depth "), col("p_size").cast("string"), lit(",5 cm")))
        .when(k % 3 === 1, concat(col("p_size").cast("string"), lit(" cm")))
        .otherwise(lit("no depth"))
      val tz = when(k % 5 === 0, lit("UTC"))
        .when(k % 5 === 1, lit("Europe/Istanbul"))
        .when(k % 5 === 2, lit("TRT"))
        .when(k % 5 === 3, lit("GMT"))
        .otherwise(lit("Mars/Olympus"))
      val cur = when(k % 3 === 0, lit("")).otherwise(col("p_brand"))
      // 7-char candidate is shorter than the 8-char brand, so the
      // keep-current branch fires on the k % 3 == 2 stratum
      val cand = when(k % 3 === 1, lit("Brand Extended Name"))
        .otherwise(substring(col("p_type"), 1, 7))
      T_(s, dir, "part").select(k.as("p_partkey"),
        F.resolvePropertyBase(fwKey, label,
          Map("temp_air" -> "temperature", "hum" -> "humidity")).as("prop_base"),
        coalesce(F.depthFromLabel(depthLbl), lit(-1)).as("depth_cm"),
        F.tzToOffset(tz).as("tz_offset"),
        F.pickLabel(cur, cand).as("best_label"))
    },
    Some("""WITH t AS (SELECT p_partkey,
        CASE WHEN p_partkey % 4 = 0 THEN 'temp_air'
             WHEN p_partkey % 4 = 1 THEN 'Par Key 1'
             WHEN p_partkey % 4 = 2 THEN 'Hum Key!'
             ELSE '' END AS fw,
        CASE WHEN p_partkey % 4 = 3 THEN '  '
             WHEN p_partkey % 2 = 0 THEN ''
             ELSE p_type END AS lbl,
        CASE WHEN p_partkey % 3 = 0 THEN 'depth ' || CAST(p_size AS VARCHAR) || ',5 cm'
             WHEN p_partkey % 3 = 1 THEN CAST(p_size AS VARCHAR) || ' cm'
             ELSE 'no depth' END AS dlbl,
        CASE WHEN p_partkey % 5 = 0 THEN 'UTC'
             WHEN p_partkey % 5 = 1 THEN 'Europe/Istanbul'
             WHEN p_partkey % 5 = 2 THEN 'TRT'
             WHEN p_partkey % 5 = 3 THEN 'GMT'
             ELSE 'Mars/Olympus' END AS tz,
        CASE WHEN p_partkey % 3 = 0 THEN '' ELSE p_brand END AS cur,
        CASE WHEN p_partkey % 3 = 1 THEN 'Brand Extended Name' ELSE substr(p_type, 1, 7) END AS cand
      FROM part)
      SELECT p_partkey,
        coalesce(
          CASE WHEN fw = 'temp_air' THEN 'temperature'
               WHEN fw = 'hum' THEN 'humidity' END,
          CASE WHEN length(trim(lbl)) > 0
               THEN regexp_replace(lower(lbl), '[^a-z0-9_]', '_', 'g') END,
          CASE WHEN length(trim(fw)) > 0
               THEN regexp_replace(lower(fw), '[^a-z0-9_]', '_', 'g') END,
          'm') AS prop_base,
        CASE WHEN regexp_extract(dlbl, '(\d+(?:[.,]\d+)?)', 1) <> ''
             THEN CAST(round(CAST(replace(regexp_extract(dlbl, '(\d+(?:[.,]\d+)?)', 1), ',', '.') AS DOUBLE)) AS INTEGER)
             ELSE -1 END AS depth_cm,
        CASE WHEN trim(tz) IN ('UTC', 'GMT') THEN '+00:00'
             WHEN trim(tz) IN ('Europe/Istanbul', 'Turkey', 'TRT', 'TR') THEN '+03:00' END AS tz_offset,
        CASE WHEN nullif(trim(cur), '') IS NULL THEN nullif(trim(cand), '')
             WHEN nullif(trim(cand), '') IS NULL THEN nullif(trim(cur), '')
             WHEN length(nullif(trim(cand), '')) > length(nullif(trim(cur), '')) THEN nullif(trim(cand), '')
             ELSE nullif(trim(cur), '') END AS best_label
      FROM t"""))

  /** F17 — surrogate-id builder with null defaults
    * (graph_sap_element_result.py:65-67).
    */
  val f17_surrogate_id = Q(
    (s, dir) => T_(s, dir, "orders")
      .select(col("o_orderkey"),
        F.surrogateId(col("o_orderkey"), col("o_custkey"),
          coalesce(col("o_orderpriority"), lit("unknown")),
          F.isoDay(col("o_orderdate"))).as("sid")),
    Some("""SELECT o_orderkey,
       concat_ws(':', o_orderkey, o_custkey, coalesce(o_orderpriority, 'unknown'),
                 strftime(o_orderdate, '%Y-%m-%d')) AS sid
      FROM orders"""))

  /** F22/P2 — point-text parse + geo flatten (app/patches.py:17-27):
    * synthesized "(x,y)" strings round-tripped to coordinates.
    */
  val f22_point_parse = Q(
    (s, dir) => {
      val pt = concat(lit("("), col("s_acctbal").cast("string"), lit(","),
        col("s_suppkey").cast("string"), lit(")"))
      T_(s, dir, "supplier")
        .select(col("s_suppkey"), F.parsePoint(pt).as("p"))
        .select(col("s_suppkey"), col("p.x").as("lat"), col("p.y").as("lon"))
    },
    // shortest-repr double→string→double round-trips to the identical
    // double in both engines, so the oracle is the identity
    Some("""SELECT s_suppkey, s_acctbal AS lat,
             CAST(s_suppkey AS DOUBLE) AS lon
      FROM supplier"""))

  val all: Map[String, Q] = Map(
    "r1_stat_pivot" -> r1_stat_pivot,
    "r2_array_to_wide" -> r2_array_to_wide,
    "r4_unpivot" -> r4_unpivot,
    "r5_posexplode" -> r5_posexplode,
    "r7_json_pack" -> r7_json_pack,
    "f_parse_suite" -> f_parse_suite,
    "f5_range_parse" -> f5_range_parse,
    "f6_messy_numeric" -> f6_messy_numeric,
    "f8_unit_normalized_sum" -> f8_unit_normalized_sum,
    "f10_coerce_ts" -> f10_coerce_ts,
    "f_alias_suite" -> f_alias_suite,
    "f17_surrogate_id" -> f17_surrogate_id,
    "f22_point_parse" -> f22_point_parse,
  )
}
