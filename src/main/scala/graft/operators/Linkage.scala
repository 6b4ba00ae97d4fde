package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fellegi–Sunter-style record linkage: score blocked candidate
  * pairs by summing per-field agreement/disagreement weights, then
  * classify by threshold. The weights are INTEGERS (scaled log-odds)
  * so the score is exactly reproducible in any engine — floating
  * log-likelihoods would diverge in the last ulp between engines.
  *
  * Reference capability: graph_db matches incoming rows to existing
  * nodes by exact key only (MERGE on the id, e.g.
  * app/graph_fields.py:14-30); probabilistic linkage is the standard
  * upgrade when sources disagree on identifiers.
  *
  * Scale design: candidates come from an equi-join on `blockKeys` —
  * never all-pairs; cost is sum of per-block squares, so blocking
  * keys must bound block size (add a second key — name prefix,
  * soundex, length band — when one block is hot; the same
  * [[Dedup.bandPairs]]-style cap applies). Scoring is a pure
  * per-row expression on the joined frame — no shuffle beyond the
  * block join, codegen throughout.
  */
object Linkage {

  /** One comparison field: boolean agreement predicate over the
    * joined pair row, weight when it agrees, weight when it doesn't.
    */
  final case class Field(agree: Column, wAgree: Int, wDisagree: Int)

  /** Sum of field weights for a pair row. */
  def score(fields: Seq[Field]): Column =
    fields.map(f => when(f.agree, lit(f.wAgree)).otherwise(lit(f.wDisagree)))
      .reduce(_ + _).cast("long")

  /** Block, score, threshold: equi-join `left` × `right` on the
    * block-key pairs, keep pairs scoring >= `threshold`. Caller
    * projects/aliases columns so the two sides don't collide.
    */
  def linkScored(left: DataFrame, right: DataFrame,
                 blockKeys: Seq[(String, String)], fields: Seq[Field],
                 threshold: Int): DataFrame = {
    val cond = blockKeys.map { case (l, r) => col(l) === col(r) }
      .reduce(_ && _)
    left.join(right, cond)
      .withColumn("link_score", score(fields))
      .filter(col("link_score") >= threshold)
  }

  /** Multi-blocking union: candidates are the UNION of several block
    * joins (each a conjunction of key pairs), deduplicated on the id
    * pair before scoring. This is the pigeonhole upgrade over a
    * single hot block: with a name split into q parts and blocks on
    * every (q-1)-subset, any pair within edit distance 1 (equal
    * length ⇒ one substitution) agrees on at least one full subset
    * and meets in that block — candidate recall is exact while each
    * block key carries far more entropy than any single field.
    * Cost: Σ_blocks Σ_keys |block|², vs one coarse key's N²/k.
    *
    * `idCols` names the unique row ids (left, right) used to dedupe
    * a pair that meets in several blocks; dedup keys the shuffle, so
    * the union never re-scores or double-emits.
    */
  def linkScoredMulti(left: DataFrame, right: DataFrame,
                      idCols: (String, String),
                      blockKeySets: Seq[Seq[(String, String)]],
                      fields: Seq[Field], threshold: Int): DataFrame = {
    val cands = blockKeySets.map { keys =>
      val cond = keys.map { case (l, r) => col(l) === col(r) }
        .reduce(_ && _)
      left.join(right, cond)
    }.reduce(_ unionByName _)
      .dropDuplicates(idCols._1, idCols._2)
    cands.withColumn("link_score", score(fields))
      .filter(col("link_score") >= threshold)
  }
}
