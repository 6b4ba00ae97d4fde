package graft.domain

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.{Functions => F}
import graft.operators.{AsOfJoin, Upsert}

/** M6 — the application chain (SURVEY §3.3), the reference's most
  * complex dataflow: ApplicationEvent → ProductApplication →
  * FertilizerProduct → AppNutrientContent. The reference runs it as
  * four tasks that re-fetch the same activities and query the graph
  * sink mid-ETL (S5 read-backs); here it is one lineage DAG — stage
  * outputs are DataFrames reused downstream.
  *
  * Input contract (FIXTURES.md §11): `activities(field_id, created_at,
  * crop_name, type_code, type_name, sub_type_code, category_code,
  * start_at, ph, ec, notes, inventories: array<struct<amount,
  * amount_unit_abbr, dose_amount, dose_amount_unit_abbr, dose_per_unit,
  * inventory_name, inventory_brand, fertilizer_name, fertilizer_brand,
  * nutrients: map<string,string>, ph, ec>>)`.
  */
object ApplicationChain {

  /** Stage 1 — ApplicationEvent nodes: per-group arrival idx (A10 —
    * deterministic order (start_at, then notes hash) replaces the
    * reference's nondeterministic arrival counter, SURVEY §7.4.1),
    * per-decare water volume (A12/F8/F9), app_type coalesce (F15).
    */
  def applicationEvents(activities: DataFrame): DataFrame = {
    val appType = F.pickFirst("unknown", col("type_code"), col("type_name"),
      col("sub_type_code"), col("category_code"))
    val withKeys = activities
      .withColumn("date", F.isoDay(col("created_at")))
      .withColumn("app_type", appType)
    val w = Window
      .partitionBy(col("field_id"), col("date"), col("crop_name"), col("app_type"))
      .orderBy(col("start_at").asc_nulls_last, col("notes").asc_nulls_last)
    val liters = expr("""
      aggregate(inventories, cast(0.0 as double), (acc, inv) ->
        acc + coalesce(
          CASE WHEN lower(trim(inv.amount_unit_abbr)) IN ('l','lt','ltr') THEN inv.amount
               WHEN lower(trim(inv.amount_unit_abbr)) = 'ml' THEN inv.amount / 1000.0
          END /
          CASE WHEN lower(trim(inv.dose_per_unit)) IN ('da','decare','dekar') THEN 1.0
               WHEN lower(trim(inv.dose_per_unit)) = 'ha' THEN 10.0
               WHEN lower(trim(inv.dose_per_unit)) = 'm2' THEN 0.01
          END, 0.0))""")
    withKeys
      .withColumn("idx", row_number().over(w))
      .withColumn("water_volume_l", liters)
      .select(col("field_id"), col("date"), col("crop_name"), col("app_type"),
        col("idx"), col("start_at"), col("ph"), col("ec"),
        F.normStr(col("notes")).as("comment"),
        col("water_volume_l"), col("inventories"))
      .withColumn("application_event_id",
        F.surrogateId(col("field_id"), col("date"),
          coalesce(col("crop_name"), lit("none")), col("app_type"), col("idx")))
  }

  /** Stage 2 — ProductApplication rows: nearest-start_at AE anchor for
    * re-fetched activities (J5 — here the AE DataFrame is simply
    * reused, S5), inventories exploded with positional idx (A11/R5).
    */
  def productApplications(events: DataFrame): DataFrame =
    events
      .select(col("application_event_id"),
        posexplode(col("inventories")).as(Seq("pos", "inv")))
      .select(
        col("application_event_id"), (col("pos") + 1).as("idx"),
        F.normStr(coalesce(col("inv.fertilizer_name"), col("inv.inventory_name")))
          .as("product_name"),
        F.normStr(coalesce(col("inv.fertilizer_brand"), col("inv.inventory_brand")))
          .as("product_brand"),
        col("inv.dose_amount").as("dose_amount"),
        F.normStr(col("inv.dose_amount_unit_abbr")).as("dose_unit"),
        F.toLiters(col("inv.amount"), col("inv.amount_unit_abbr")).as("water_volume_l"),
        col("inv.nutrients").as("nutrients"),
        col("inv.ph").as("ph"), col("inv.ec").as("ec"))
      .withColumn("product_application_id",
        F.surrogateId(col("application_event_id"), col("idx")))

  /** Stage 3 — FertilizerProduct master keyed (name, brand) with
    * keep-existing-non-null merge semantics
    * (graph_fertilizer_product.py:211-219): latest non-null nutrients/
    * pH/EC win, nulls never clobber.
    */
  def fertilizerProducts(products: DataFrame,
                         existing: Option[DataFrame] = None): DataFrame = {
    val incoming = products
      .filter(col("product_name").isNotNull)
      .select(col("product_name").as("name"),
        coalesce(col("product_brand"), lit("unknown")).as("brand"),
        // empty nutrient payloads are "absent" (the reference's
        // CASE WHEN $nutrients IS NULL keep-existing semantics)
        when(size(map_keys(col("nutrients"))) > 0, col("nutrients")).as("nutrients"),
        col("ph"), col("ec"),
        col("product_application_id"))
    // newest wins, but any payload-bearing row outranks payload-less
    val dedup = Upsert.dedupByKey(incoming, Seq("name", "brand"),
      Seq(col("nutrients").isNotNull.cast("int"), col("product_application_id")))
      .drop("product_application_id")
    existing match {
      case Some(e) => Upsert.merge(e, dedup, Seq("name", "brand"))
      case None => dedup
    }
  }

  /** Stage 4 — AppNutrientContent rows: normalize the nutrient map
    * (R6/F7), enrich missing payloads from the product master by
    * (name, brand) (J7), conditional product edge only when name+brand
    * resolve (J8). Key = (product_application_id, nutrient).
    */
  def appNutrientContents(products: DataFrame, master: DataFrame): DataFrame = {
    val own = products
      .filter(col("nutrients").isNotNull && size(map_keys(col("nutrients"))) > 0)
      .select(col("product_application_id"), col("product_name"),
        col("product_brand"), col("nutrients"))
    val missing = products
      .filter(col("nutrients").isNull || size(map_keys(col("nutrients"))) === 0)
      .filter(col("product_name").isNotNull)
      .drop("nutrients")
      .join(master.select(col("name").as("product_name"),
        col("brand").as("product_brand"), col("nutrients")),
        Seq("product_name", "product_brand"), "inner")   // J7 enrichment
      .select(col("product_application_id"), col("product_name"),
        col("product_brand"), col("nutrients"))
    own.unionByName(missing)
      .select(col("product_application_id"), col("product_name"),
        col("product_brand"), explode(col("nutrients")).as(Seq("nutrient", "raw")))
      .select(col("product_application_id"),
        F.normKey(col("nutrient")).as("nutrient"),
        F.toNumberPctTolerant(col("raw")).as("pct_or_g_l"),
        // J8 — CONTAINS_NUTRIENT edge only with a resolvable product
        (col("product_name").isNotNull && col("product_brand").isNotNull)
          .as("has_product_edge"))
      .filter(col("nutrient").isNotNull)
  }
}
