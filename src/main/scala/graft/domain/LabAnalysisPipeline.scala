package graft.domain

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{Functions => F}
import graft.operators.{Reshape, Upsert}

/** M5 — the lab-analysis family (SURVEY §2 R4/R5/A7/A8/F4/F5).
  *
  * SAP leaf analyses: one lab row fans out to up to two SAPAnalysis
  * nodes (young/old leaf, graph_sap_analysis.py:144-177), whose
  * element lists explode to per-nutrient SAPElementResult rows with
  * free-text numeric parsing (graph_sap_element_result.py:16-29,
  * 111-132); optimum ranges dedup to per-(crop, date) headers with
  * per-element min/max parsed from range text
  * (graph_optimum_sap_range.py:29-62,
  * graph_optimum_element_range.py:16-61).
  *
  * Input contract (FIXTURES.md §8): `sap_analyses(field_id, crop_name,
  * sample_date, young_sample, old_sample,
  * elements: array<struct<mineral, young, old, optimum>>,
  * others: array<struct<mineral, young, old, optimum>>)`.
  */
object LabAnalysisPipeline {

  private val phAliases = Seq("ph")
  private val ecAliases = Seq("ec", "conductivity")
  private val sugarAliases = Seq("brix", "sugars", "sugar")

  /** SAPAnalysis nodes: unpivot young/old to rows (R4), extract
    * pH/EC/sugars as the first matching "others" entry (A8), key =
    * (field_id, date, crop_name, leaf_type, sample_id) (§1.2).
    */
  def sapAnalyses(raw: DataFrame): DataFrame = {
    val byLeaf = Reshape.unpivotGroups(raw,
      tagName = "leaf_type", valueNames = Seq("sample_id", "value_col"),
      groups = Seq(
        "young" -> Seq(col("young_sample"), lit("young")),
        "old" -> Seq(col("old_sample"), lit("old"))),
      keep = Seq("field_id", "crop_name", "sample_date", "elements", "others"))
      .filter(col("sample_id").isNotNull)   // missing leaf sample → no node
    // A8 — first "others" entry whose mineral is in the alias set, by
    // list position (the reference keeps scalars as STRINGS, §1.6.5)
    def firstMatch(aliases: Seq[String], leaf: String) = {
      val hits = filter(col("others"),
        o => lower(trim(o.getField("mineral"))).isInCollection(aliases))
      when(size(hits) > 0, element_at(hits, 1).getField(leaf))
    }
    def scalar(aliases: Seq[String]) =
      when(col("leaf_type") === "young", firstMatch(aliases, "young"))
        .otherwise(firstMatch(aliases, "old"))
    byLeaf.select(
      col("field_id"),
      F.isoDay(col("sample_date")).as("date"),
      col("crop_name"), col("leaf_type"), col("sample_id"),
      scalar(phAliases).as("ph"),
      scalar(ecAliases).as("ec"),
      scalar(sugarAliases).as("sugars"),
      to_json(col("elements")).as("elements_json"),
      col("elements"))
  }

  /** SAPElementResult child rows: explode elements (R5), parse the
    * leaf's free-text value (F4), key = (sap_analysis_id, nutrient).
    */
  def sapElementResults(analyses: DataFrame): DataFrame =
    analyses
      .withColumn("sap_analysis_id",
        F.surrogateId(col("field_id"), col("date"), col("crop_name"),
          col("leaf_type"), col("sample_id")))
      .select(col("sap_analysis_id"), col("leaf_type"),
        explode(col("elements")).as("el"))
      .select(col("sap_analysis_id"),
        lower(trim(col("el.mineral"))).as("nutrient"),
        F.parseNumber(when(col("leaf_type") === "young", col("el.young"))
          .otherwise(col("el.old"))).as("value_ppm"))
      .filter(col("nutrient").isNotNull)

  /** OptimumSAPRange headers (A7 seen-set dedup → distinct) +
    * OptimumElementRange children with parsed (min, max) (F5).
    */
  def optimumRanges(raw: DataFrame): (DataFrame, DataFrame) = {
    val headers = raw
      .select(col("crop_name"), F.isoDay(col("sample_date")).as("date"))
      .distinct()
    val elements = raw
      .select(col("crop_name"), F.isoDay(col("sample_date")).as("date"),
        explode(col("elements")).as("el"))
      .select(col("crop_name"), col("date"),
        lower(trim(col("el.mineral"))).as("nutrient"),
        F.parseRange(col("el.optimum")).as("r"))
      .select(col("crop_name"), col("date"), col("nutrient"),
        col("r.range_min").as("min"), col("r.range_max").as("max"))
      .filter(col("min").isNotNull || col("max").isNotNull)
    (headers, Upsert.dedupByKey(elements,
      Seq("crop_name", "date", "nutrient"), Seq(col("nutrient"))))
  }

  /** Haney/TND totals derivation (A9/F6): scan the element list for
    * "total x" names and C/N-ratio variants, first occurrence wins,
    * inequality-tolerant parse (graph_tnd_analysis.py:24-114).
    */
  def tndTotals(raw: DataFrame, totalNames: Map[String, String]): DataFrame = {
    val exploded = raw
      .select(col("field_id"), F.isoDay(col("sample_date")).as("date"),
        col("lab_no"), posexplode(col("elements")).as(Seq("pos", "el")))
      .withColumn("name", lower(trim(col("el.element"))))
      .withColumn("alias",
        when(col("name").isin("c/n", "c:n", "c:n ratio", "c/n ratio"), "cn_ratio")
          .otherwise(coalesce(
            totalNames.foldLeft(lit(null).cast("string")) { case (acc, (n, a)) =>
              coalesce(acc, when(col("name") === n, a))
            })))
      .filter(col("alias").isNotNull)
      .withColumn("value", F.toFloatOrNull(col("el.value")))
    // first occurrence in list order wins (A9): argmin over pos inside
    // the pivot aggregate — one shuffle on the analysis key, instead of
    // a rank-1 window (sort-shuffle of every element row on a second
    // key) followed by the pivot shuffle
    val names = (totalNames.values.toSeq :+ "cn_ratio").distinct
    val pivoted = exploded
      .groupBy(col("field_id"), col("date"), col("lab_no"))
      .pivot("alias", names)
      .agg(min(struct(col("pos"), col("value"))))
    pivoted.select(
      (Seq(col("field_id"), col("date"), col("lab_no")) ++
        names.map(n => col(n).getField("value").as(n))): _*)
  }
}
