package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.{TextFunctions => T, VectorFunctions => V}

/** Deduplication operators for training-data pipelines: exact,
  * MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine near-dup.
  *
  * Scale design: every variant is banded/bucketed so candidate-pair
  * generation is a self-join on a bucket key — never an all-pairs
  * cross join. At 100 TB the bucket join shuffles each side once on
  * the bucket hash; skewed buckets (boilerplate-heavy corpora) are
  * split by AQE skew-join handling.
  */
object Dedup {

  /** Exact dedup by content hash: keep the first document (lowest id)
    * per normalized-text hash. One shuffle on the hash.
    */
  def exact(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val norm = regexp_replace(lower(trim(col(textCol))), "\\s+", " ")
    val w = Window.partitionBy(sha2(norm, 256)).orderBy(col(idCol).asc)
    docs.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** MinHash signature: k independent permutation-approximations of
    * the shingle set, each `min(hash(seed_i, shingle))`. */
  def minhashSig(shingles: Column, k: Int): Column = {
    val hashes = (0 until k).map { i =>
      array_min(transform(shingles, s => hash(lit(i), s)))
    }
    array(hashes: _*)
  }

  /** MinHash + LSH near-dup candidate pairs: signatures are cut into
    * `bands` bands of `rowsPerBand` hashes; documents sharing any band
    * value are candidates. Returns (id_a, id_b, estimated jaccard)
    * with id_a < id_b, deduplicated across bands.
    */
  def minhashLsh(docs: DataFrame, textCol: String, idCol: String,
                 shingleLen: Int = 5, bands: Int = 8,
                 rowsPerBand: Int = 4): DataFrame = {
    val k = bands * rowsPerBand
    val withSig = docs
      .select(col(idCol).as("id"),
        T.charShingles(col(textCol), shingleLen).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("sig", minhashSig(col("sh"), k))
    val banded = withSig.select(
      col("id"), col("sig"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => struct(b.as("band"),
          slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)).as("vals")))))
      .select(col("id"), col("sig"), col("col.band"), hash(col("col.vals")).as("bucket"))
    val a = banded.select(col("band"), col("bucket"),
      col("id").as("id_a"), col("sig").as("sig_a"))
    val b = banded.select(col("band"), col("bucket"),
      col("id").as("id_b"), col("sig").as("sig_b"))
    a.join(b, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y),
          c => c)).cast("double") / k).as("est_jaccard"))
      .groupBy("id_a", "id_b")
      .agg(first("est_jaccard").as("est_jaccard"))
  }

  /** SimHash over word shingles: per-bit weighted majority of shingle
    * hashes, 64-bit fingerprint. Near-dups = fingerprints within a
    * small Hamming distance (joinable by banding the bits).
    */
  def simhash(text: Column, shingleLen: Int = 2): Column = {
    val sh = T.wordShingles(text, shingleLen)
    val bits = (0 until 64).map { i =>
      val votes = aggregate(sh, lit(0),
        (acc, s) => acc + when(shiftright(hash(s).cast("long"), i % 32)
          .bitwiseAND(1L) === 1L, 1).otherwise(-1))
      when(votes > 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** N-gram Jaccard similarity for candidate pairs sharing at least
    * one *rare* shingle: inverted-index join on shingle, document-
    * frequency pruning (`maxDf`) so ubiquitous grams never explode the
    * self-join — the standard guard for boilerplate-heavy corpora,
    * where one common gram would otherwise produce df² candidate
    * pairs. Returns pairs with similarity >= threshold, where
    * similarity is |rare-gram intersection| / |union| (a lower bound
    * on true Jaccard; exact when maxDf admits all grams).
    */
  def ngramJaccard(docs: DataFrame, textCol: String, idCol: String,
                   shingles: Column => Column,
                   threshold: Double = 0.5,
                   maxDf: Option[Int] = Some(10),
                   maxDocLen: Int = 10000): DataFrame = {
    val sh = docs.select(col(idCol).as("id"),
      shingles(substring(col(textCol), 1, maxDocLen)).as("sh"))
      .filter(size(col("sh")) > 0)
    val inv0 = sh.select(col("id"), size(col("sh")).as("n"),
      explode(col("sh")).as("gram"))
    val inv = maxDf match {
      case Some(df) =>
        val rare = inv0.groupBy("gram").agg(count(lit(1)).as("df"))
          .filter(col("df") <= df).select("gram")
        inv0.join(rare, "gram")
      case None => inv0
    }
    val a = inv.select(col("gram"), col("id").as("id_a"), col("n").as("n_a"))
    val b = inv.select(col("gram"), col("id").as("id_b"), col("n").as("n_b"))
    a.join(b, Seq("gram"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b", "n_a", "n_b")
      .agg(count(lit(1)).as("inter"))
      .withColumn("sim",
        col("inter").cast("double") /
          (col("n_a") + col("n_b") - col("inter")).cast("double"))
      .filter(col("sim") >= threshold)
      .select("id_a", "id_b", "sim")
  }

  /** Embedding-cosine near-duplicate pairs, LSH-bucketed: vectors
    * sharing a hyperplane-signature bucket are compared exactly;
    * pairs with cosine >= threshold survive.
    */
  def embeddingNearDup(emb: DataFrame, vecCol: String, idCol: String,
                       planes: Int = 12, threshold: Double = 0.95): DataFrame = {
    val sig = emb.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("bucket", V.hyperplaneSig(col("v"), planes))
    val a = sig.select(col("bucket"), col("id").as("id_a"), col("v").as("v_a"))
    val b = sig.select(col("bucket"), col("id").as("id_b"), col("v").as("v_b"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", V.cosine(col("v_a"), col("v_b")))
      .filter(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
      .groupBy("id_a", "id_b")
      .agg(first("cos").as("cos"))
  }
}
