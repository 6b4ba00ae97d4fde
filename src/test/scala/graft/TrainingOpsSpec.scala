package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, GraphOps, Multimodal, Similarity}
import graft.functions.{TextFunctions => T, VectorFunctions => V}

class TrainingOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"),   // exact dup of 1
    (3L, "the quick brown fox jumps over a lazy dog"),     // near-dup
    (4L, "completely different content about spark engines and shuffles")
  ).toDF("doc_id", "text")

  test("dedup exact keeps lowest id per normalized text") {
    val kept = Dedup.exact(docs, "text", "doc_id").select("doc_id")
      .collect().map(_.getLong(0)).sorted
    assert(kept.toSeq == Seq(1L, 3L, 4L))
  }

  test("ngram jaccard finds the near-dup pair, not the unrelated doc") {
    val pairs = Dedup.ngramJaccard(docs, "text", "doc_id",
      tokenize = t => split(T.normText(t), " "),
      gramLen = 2, threshold = 0.4, maxDf = None)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.contains((1L, 2L)))   // identical → sim 1.0
    assert(pairs.contains((1L, 3L)) && pairs.contains((2L, 3L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("minhash LSH: identical docs collide with est_jaccard 1.0") {
    val out = Dedup.minhashLsh(docs, "text", "doc_id").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(out((1L, 2L)) == 1.0)
  }

  test("simhash: identical docs get identical fingerprints, near-dups close") {
    val fp = docs.select($"doc_id", Dedup.simhash($"text", 2).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(1L) == fp(2L))
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(fp(1L), fp(3L)) < hamming(fp(1L), fp(4L)))
  }

  test("simhashBulk is bit-identical to the HOF simhash form") {
    val withEmpty = docs.union(Seq((5L, "")).toDF("doc_id", "text"))
    val hof = withEmpty.select($"doc_id", Dedup.simhash($"text", 2).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bulk = Dedup.simhashBulk(
      withEmpty.select($"doc_id",
        T.wordShinglesFrom(split(T.normText($"text"), " "), 2).as("sh")),
      "doc_id", "sh")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(bulk == hof)
  }

  test("embeddingNearDup buckets match the HOF hyperplane signature") {
    val emb = Seq(
      (1L, Array(1.0f, 0.0f, 0.2f)),
      (2L, Array(0.99f, 0.01f, 0.21f)),  // near-dup of 1
      (3L, Array(-1.0f, 0.5f, -0.3f))
    ).toDF("vec_id", "embedding")
    // pair stage finds the near-dup and not the far pair
    val pairs = Dedup.embeddingNearDup(emb, "embedding", "vec_id",
      planes = 6, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq == Seq((1L, 2L)))
    // and the explode-aggregate signature equals the HOF one
    val hofSig = emb.select($"vec_id",
      V.hyperplaneSig($"embedding", 6).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val seed = 42
    val projSums = (0 until 6).map { p =>
      sum($"x" * (pmod(hash(lit(seed), lit(p), $"i"), lit(1000000))
        .cast("double") / 1000000.0 - 0.5)).as(s"__p$p")
    }
    val bucketExpr = (0 until 6).map { p =>
      when(col(s"__p$p") >= 0.0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }.reduce(_ + _)
    val bulkSig = emb.select($"vec_id", posexplode($"embedding"))
      .select($"vec_id", $"pos".as("i"), $"col".cast("double").as("x"))
      .groupBy("vec_id").agg(projSums.head, projSums.tail: _*)
      .select($"vec_id", bucketExpr.as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(bulkSig == hofSig)
  }

  test("dedupClusters: pair graph resolves to one canonical doc per cluster") {
    val pairs = Dedup.ngramJaccard(docs, "text", "doc_id",
      tokenize = t => split(T.normText(t), " "),
      gramLen = 2, threshold = 0.4, maxDf = None)
    val clusters = Dedup.dedupClusters(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // docs 1,2,3 are one near-dup cluster; 4 is untouched (not emitted)
    assert(clusters.toSeq == Seq((1L, 1L, 3L)))
  }

  test("dedupClusters converged: a >3-hop dup chain resolves to ONE cluster") {
    // 10-doc path graph 1-2-3-…-10: min-label needs 9 propagation
    // rounds to reach the tail, so the fixed-depth-3 replay form MUST
    // split it (under-dedup) while the converged production path must
    // not.
    val chain = (1L to 9L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val fixed = Dedup.dedupClusters(chain, iterations = 3)
      .collect()
    assert(fixed.length > 1) // the documented fixed-depth limitation
    val converged = Dedup.dedupClusters(chain, converge = true)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(converged.toSeq == Seq((1L, 10L))) // one cluster, canonical 1
  }

  test("simhashNearDup: banded Hamming join finds exactly the close pairs") {
    // hand-built fingerprints: 1↔2 differ in 2 bits, 1↔3 in 1 bit,
    // 4 is far from everything (> 3 bits, spread across bands)
    val base = 0x0123456789ABCDEFL
    val fp = Seq(
      (1L, base),
      (2L, base ^ (1L << 3) ^ (1L << 40)),
      (3L, base ^ (1L << 63)),
      (4L, base ^ (1L << 0) ^ (1L << 17) ^ (1L << 33) ^ (1L << 49))
    ).toDF("doc_id", "simhash")
    val pairs = Dedup.simhashNearDup(fp, "doc_id", "simhash", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(pairs.keySet == Set((1L, 2L), (1L, 3L), (2L, 3L)))
    assert(pairs((1L, 2L)) == 2 && pairs((1L, 3L)) == 1 && pairs((2L, 3L)) == 3)
  }

  test("maxBucket star-collapse: same clusters as uncapped, linear pairs") {
    // 40 near-identical docs (boilerplate + tiny tail) + 2 unrelated:
    // the boilerplate cluster lands whole in shared LSH buckets, so
    // uncapped emits ~C(40,2) clique pairs; capped (maxBucket=8)
    // must emit O(40) star pairs yet resolve to the SAME clusters.
    // NOTE this equivalence is at the CANDIDATE-graph level (clustering
    // raw pairs, no est_jaccard threshold); once a consumer thresholds
    // on exact distance the cap is a bounded recall loss — see the
    // bandPairs Scaladoc.
    val boiler = (0 until 60).map(i => s"w${i % 7}").mkString(" ")
    val many = (1L to 40L).map(i => (i, s"$boiler tail$i")) ++
      Seq((100L, "completely different content about spark engines and shuffles"),
        (101L, "another unrelated document concerning benchmarks and parquet"))
    val corpus = many.toDF("doc_id", "text")
    val uncapped = Dedup.minhashLsh(corpus, "text", "doc_id")
    val capped = Dedup.minhashLsh(corpus, "text", "doc_id", maxBucket = Some(8))
    val nUn = uncapped.count()
    val nCap = capped.count()
    assert(nUn >= 39L * 40 / 2 * 9 / 10, s"clique pairs expected, got $nUn")
    assert(nCap < 120, s"star pairs must be linear in the bucket, got $nCap")
    def clusters(pairs: org.apache.spark.sql.DataFrame) =
      Dedup.dedupClusters(pairs, converge = true)
        .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(clusters(capped) == clusters(uncapped))
  }

  test("simhash maxBucket: identical fingerprints star-collapse, hamming intact") {
    // 30 identical fingerprints (a degenerate bucket) + one 2-bit
    // neighbor + one far outlier
    val base = 0x0123456789ABCDEFL
    val fp = ((1L to 30L).map(i => (i, base)) ++ Seq(
      (31L, base ^ (1L << 5) ^ (1L << 44)),
      (99L, ~base)
    )).toDF("doc_id", "simhash")
    val capped = Dedup.simhashNearDup(fp, "doc_id", "simhash",
      maxHamming = 3, maxBucket = Some(8))
    val rows = capped.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    // star around hub 1: every identical member pairs with 1 at distance 0
    assert((2L to 30L).forall(i => rows.get((1L, i)).contains(0)))
    // the 2-bit neighbor still matches through its band agreement
    assert(rows.exists { case ((a, b), h) => b == 31L && h == 2 })
    assert(!rows.keySet.exists { case (a, b) => a == 99L || b == 99L })
    // linear, not quadratic: C(30,2)=435 clique pairs would be wrong
    assert(rows.size < 120, s"expected star pairs, got ${rows.size}")
    // cluster resolution equals the uncapped form's
    val uncapped = Dedup.simhashNearDup(fp, "doc_id", "simhash", maxHamming = 3)
    def clusters(p: org.apache.spark.sql.DataFrame) =
      Dedup.dedupClusters(p, converge = true)
        .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(clusters(capped) == clusters(uncapped))
  }

  test("minhashLshDelta == full LSH restricted to delta-touching pairs") {
    // near-dup cluster straddling the base/delta split + exact dups
    val boiler = (0 until 60).map(i => s"w${i % 7}").mkString(" ")
    val corpus = ((1L to 30L).map(i => (i, s"$boiler tail$i")) ++ Seq(
      (31L, "completely different content about spark engines and shuffles"),
      (40L, s"$boiler tail40"), // delta member of the cluster
      (41L, "completely different content about spark engines and shuffles"),
      (42L, "a fresh unrelated delta document about benchmarks")
    )).toDF("doc_id", "text")
    val base = corpus.filter($"doc_id" < 32)
    val delta = corpus.filter($"doc_id" >= 32)
    def pairsOf(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    for (cap <- Seq(None, Some(8)): Seq[Option[Int]]) {
      val full = pairsOf(Dedup.minhashLsh(corpus, "text", "doc_id",
        maxBucket = cap))
      val inc = pairsOf(Dedup.minhashLshDelta(
        Dedup.minhashSignatures(base, "text", "doc_id"), delta,
        "text", "doc_id", maxBucket = cap))
      assert(inc == full.filter { case (a, b) => a >= 32 || b >= 32 },
        s"cap=$cap")
      // the exact-dup pair across the split is found incrementally
      assert(inc.contains((31L, 41L)), s"cap=$cap")
    }
  }

  test("simhashNearDupDelta == full near-dup restricted to delta-touching pairs") {
    val base = 0x0123456789ABCDEFL
    val fp = Seq(
      (1L, base), (2L, base ^ (1L << 3)), (3L, ~base),
      (40L, base ^ (1L << 40)),           // delta, near 1 and 2
      (41L, ~base ^ (1L << 7)),           // delta, near 3
      (42L, 0x5555555555555555L)          // delta, near nothing
    ).toDF("doc_id", "simhash")
    def pairsOf(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = pairsOf(Dedup.simhashNearDup(fp, "doc_id", "simhash", maxHamming = 3))
    val inc = pairsOf(Dedup.simhashNearDupDelta(
      fp.filter($"doc_id" < 10), fp.filter($"doc_id" >= 10),
      "doc_id", "simhash", maxHamming = 3))
    assert(inc == full.filter { case (a, b) => a >= 10 || b >= 10 })
    assert(inc.contains((1L, 40L)) && inc.contains((3L, 41L)))
    assert(!inc.contains((1L, 2L))) // base-base already resolved
  }

  test("vector functions: cosine of identical/orthogonal vectors") {
    val df = Seq(
      (Array(1.0f, 0.0f), Array(1.0f, 0.0f)),
      (Array(1.0f, 0.0f), Array(0.0f, 1.0f)),
      (Array(0.0f, 0.0f), Array(1.0f, 0.0f))
    ).toDF("a", "b")
    val out = df.select(V.cosine($"a", $"b").as("c")).collect().map(_.get(0))
    assert(out(0) == 1.0)
    assert(out(1) == 0.0)
    assert(out(2) == null) // zero norm → null
  }

  test("brute-force top-k: self is rank 1 with cosine 1") {
    val emb = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f)),
      (3L, Array(0.0f, 0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val top = Similarity.bruteForceTopK(emb, emb.filter($"vec_id" === 0),
      "embedding", "vec_id", "vec_id", k = 2).orderBy("rank").collect()
    assert(top(0).getAs[Long]("id") == 0L && top(0).getAs[Double]("cos") == 1.0)
    assert(top(1).getAs[Long]("id") == 1L)
  }

  test("IVF ANN matches brute force when probing enough cells") {
    val emb = TestSpark.spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .limit(200).cache()
    val q = emb.filter($"vec_id" < 2)
    val bf = Similarity.bruteForceTopK(emb, q, "embedding", "vec_id", "vec_id", 5)
      .select("qid", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val (idx, cents) = Similarity.ivfAssign(emb, "embedding", "vec_id", nCells = 4)
    val ann = Similarity.ivfTopK(idx, cents, q, "embedding", "vec_id", 5, nProbe = 4)
      .select("qid", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ann == bf) // nProbe == nCells ⇒ exhaustive ⇒ exact
  }

  test("IVF k-means beats the lowest-id quantizer on id-skewed data") {
    // 4 tight clusters along near-orthogonal axes, but ids 0..15 ALL
    // in cluster 0 (insertion order follows content) — the lowest-id
    // quantizer's 4 centroids are then redundant copies of cluster 0,
    // scattering every other cluster's neighbors across cells, while
    // the seeded-sample + Lloyd path spreads its centroids.
    // jitter keyed on (id, dim) so within-cluster neighbor order and
    // redundant-centroid cell choice are decorrelated — otherwise the
    // bad quantizer accidentally co-locates neighbors
    def vec(cluster: Int, id: Int): Array[Float] = {
      val v = Array.tabulate(4)(d => 0.3f * (((id * 131 + d * 53) % 17) / 17.0f))
      v(cluster) = 10f
      v
    }
    val rows = (0 until 128).map { id =>
      val cluster = id / 32
      (id.toLong, vec(cluster, id))
    }
    val emb = rows.toDF("vec_id", "embedding")
    val queries = emb.filter($"vec_id" % 32 === 1) // one per cluster
    val truth = Similarity.bruteForceTopK(emb, queries,
      "embedding", "vec_id", "vec_id", k = 5)
      .select("qid", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(index: (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame)): Double = {
      val (idx, cents) = index
      val got = Similarity.ivfTopK(idx, cents, queries,
        "embedding", "vec_id", k = 5, nProbe = 1)
        .select("qid", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      got.intersect(truth).size.toDouble / truth.size
    }
    val rLowest = recall(Similarity.ivfAssign(emb, "embedding", "vec_id", nCells = 4))
    val rKMeans = recall(Similarity.ivfKMeans(emb, "embedding", "vec_id", nCells = 4))
    assert(rKMeans > rLowest,
      s"kmeans recall $rKMeans should beat lowest-id recall $rLowest")
    assert(rKMeans >= 0.95) // Lloyd recovers the true clusters here
  }

  test("graph ops on a known toy graph") {
    val edges = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("src", "dst")
    val comps = GraphOps.connectedComponents(edges, 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comps(1L) == 1L && comps(2L) == 1L && comps(3L) == 1L)
    assert(comps(4L) == 4L && comps(5L) == 4L)

    val deg = GraphOps.degrees(edges).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(deg(2L) == (1L, 1L))
    assert(deg(5L) == (0L, 1L))

    // chain 1→2→3, 1 iteration by hand:
    // r(2) = 0.15 + 0.85*(1.0/1) = 1.0 ; r(3) same; r(1)=0.15, r(4)=0.15, r(5)=1.0
    val pr1 = GraphOps.pageRank(edges, 1).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(pr1(1L) == 0.15)
    assert(pr1(2L) == 1.0)
    assert(math.abs(pr1(3L) - 1.0) < 1e-12)
  }

  test("multimodal decode is deterministic and null-safe") {
    val media = docs.select($"doc_id".as("media_id"),
      encode($"text", "UTF-8").as("payload"))
      .unionByName(Seq((99L, null.asInstanceOf[Array[Byte]])).toDF("media_id", "payload"))
    val out1 = Multimodal.decodeFeatures(media).orderBy("media_id").collect()
    val out2 = Multimodal.decodeFeatures(media).orderBy("media_id").collect()
    assert(out1.toSeq == out2.toSeq)
    val nullRow = out1.last
    assert(nullRow.getAs[Long]("media_id") == 99L)
    assert(nullRow.getAs[Int]("width") == 0)
    // identical payloads → identical features
    assert(out1(0).toSeq.drop(1) == out1(1).toSeq.drop(1))
  }

  test("multimodal frame sampling: n_frames = bytes % 16, offsets in range, null-safe") {
    val payload = Array.tabulate[Byte](35)(i => (i * 7).toByte) // 35 % 16 = 3 frames
    val media = Seq((1L, payload), (2L, Array.empty[Byte]),
      (3L, null.asInstanceOf[Array[Byte]])).toDF("media_id", "payload")
    val frames = Multimodal.sampleFrames(media).orderBy("media_id", "frame_idx").collect()
    assert(frames.map(_.getLong(0)).toSeq == Seq(1L, 1L, 1L)) // empty/null emit nothing
    val step = 35 / 3
    frames.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[Int]("frame_idx") == i)
      assert(r.getAs[Int]("offset") == i * step)
      assert(r.getAs[Int]("fingerprint") == (payload(i * step) & 0xff))
    }
  }

  test("multimodal resize truncates payload and keeps metadata consistent") {
    val media = Seq((1L, Array.tabulate[Byte](100)(_.toByte)),
      (2L, Array.tabulate[Byte](5)(_.toByte)),
      (3L, null.asInstanceOf[Array[Byte]])).toDF("media_id", "payload")
    val out = Multimodal.resizePayloads(media, 10).orderBy("media_id").collect()
    assert(out.map(r => (r.getLong(0), r.getInt(2), r.getInt(3))).toSeq ==
      Seq((1L, 100, 10), (2L, 5, 5), (3L, 0, 0)))
    assert(out(0).getAs[Array[Byte]]("payload").toSeq ==
      Array.tabulate[Byte](10)(_.toByte).toSeq)
    assert(out(2).getAs[Array[Byte]]("payload") == null)
  }

  test("text functions: tokens, fingerprint stability, shingles") {
    val d = Seq("The quick  brown fox").toDF("text")
    val r = d.select(
      T.wsTokenCount($"text").as("ws"),
      T.fingerprint($"text").as("fp"),
      size(T.charShingles($"text", 5)).as("n5"),
      T.langId($"text").as("lang")).collect()(0)
    assert(r.getAs[Long]("ws") == 4L)
    assert(r.getAs[Long]("fp") == Seq("the quick brown fox").toDF("t")
      .select(T.fingerprint($"t")).collect()(0).getLong(0)) // normalization collapses ws + case
    assert(r.getAs[Int]("n5") == 15)
    assert(r.getAs[String]("lang") == "en")
  }

  test("chunkPayloads: full cover, fixed offsets, short tail, null/empty yield none") {
    import graft.operators.Multimodal
    val media = Seq(
      (1L, Array.fill[Byte](250)(7)),
      (2L, Array.empty[Byte]),
      (3L, null.asInstanceOf[Array[Byte]])
    ).toDF("media_id", "payload")
    val out = Multimodal.chunkPayloads(media, chunkBytes = 100)
      .orderBy($"media_id", $"chunk_idx").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 1L, 1L))
    assert(out.map(_.getInt(2)).toSeq == Seq(0, 100, 200))
    assert(out.map(_.getInt(3)).toSeq == Seq(100, 100, 50))
    // slices reassemble to the original payload
    assert(out.flatMap(_.getAs[Array[Byte]](4)).length == 250)
  }
}
