package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Key-salted join for skewed keys — when one join key holds a large
  * share of the rows (event_type with 5 values over billions of
  * events), a plain shuffle join sends every hot-key row to one
  * partition and the stage runs at the speed of that straggler.
  *
  * Salting splits each hot key into `numSalts` synthetic sub-keys: the
  * skewed side gets a deterministic salt derived from a high-cardinality
  * column, the other side is replicated once per salt, and the join key
  * becomes (keys, salt). Row multiplicity is unchanged — every original
  * pair matches on exactly the one salt the skewed row carries — so
  * results are identical to the unsalted join.
  *
  * This complements (not replaces) AQE skew-join splitting: AQE splits
  * oversized *partitions* post-shuffle but cannot split a single key's
  * hash bucket across reducers when one key dominates; salting can.
  * Cost: the replicated side grows ×numSalts — use only when that side
  * is small relative to the skew being removed.
  */
object SkewJoin {

  /** Inner-join `skewed` to `other` on `keys`, spreading each key over
    * `numSalts` shuffle partitions. `saltBy` is any well-distributed
    * column on the skewed side (a row id); the salt must be
    * deterministic per row so retried tasks land rows identically.
    */
  def salted(skewed: DataFrame, other: DataFrame, keys: Seq[String],
             numSalts: Int, saltBy: String): DataFrame = {
    require(numSalts > 0, "numSalts must be positive")
    val l = skewed.withColumn("__salt",
      pmod(xxhash64(col(saltBy)), lit(numSalts.toLong)).cast("int"))
    val r = other.withColumn("__salt",
      explode(typedLit((0 until numSalts).toArray)))
    l.join(r, keys :+ "__salt").drop("__salt")
  }
}
