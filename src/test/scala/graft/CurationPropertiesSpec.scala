package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.operators.Sampling
import graft.functions.{VectorFunctions => V}

/** Property tests for the curation operators: invariants that must
  * hold on ARBITRARY inputs, not just the harness tables. Generators
  * use a fixed seed (same rationale as ParserPropertiesSpec — no
  * scalatest-scalacheck bridge in the offline cache).
  */
class CurationPropertiesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def vecs(n: Int, seed: Long): List[List[Float]] = {
    val g = Gen.chooseNum(1, 24).flatMap(d =>
      Gen.listOfN(d, Gen.chooseNum(-1e6f, 1e6f)))
    Gen.listOfN(n, g)(Gen.Parameters.default, Seed(seed)).getOrElse(Nil)
  }

  test("property: capped LSH resolves the SAME clusters as uncapped on random corpora") {
    // random corpora of near-dup families: a few templates, each
    // instantiated with small random tails — arbitrary bucket sizes,
    // caps cutting through them. Clique vs star must be invisible at
    // cluster level (identical connected components).
    import graft.operators.Dedup
    for (seed <- Seq(3L, 17L, 29L)) {
      val words = "alpha beta gamma delta eps zeta eta theta".split(" ")
      val docs = Gen.listOfN(60, for {
        tpl <- Gen.chooseNum(0, 3)
        tail <- Gen.listOfN(3, Gen.oneOf(words.toIndexedSeq))
      } yield {
        val body = (0 until 40).map(i => words((i * (tpl + 2)) % 8)).mkString(" ")
        s"$body ${tail.mkString(" ")}"
      })(Gen.Parameters.default, Seed(seed)).get
        .zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      def clusters(cap: Option[Int]) =
        Dedup.dedupClusters(
          Dedup.minhashLsh(docs, "text", "doc_id", maxBucket = cap),
          converge = true)
          .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
      assert(clusters(Some(4)) == clusters(None), s"seed $seed")
    }
  }

  test("property: overwritePartitions sequence == one-shot merge of the same deltas") {
    // arbitrary upsert sequences over a partitioned table must land on
    // the same final state as merging all deltas at once (associativity
    // of last-write-wins MERGE restricted to touched partitions)
    import graft.operators.Upsert
    for (seed <- Seq(5L, 23L)) {
      val gen = Gen.listOfN(40, for {
        k <- Gen.chooseNum(1L, 8L)
        d <- Gen.chooseNum(1, 4)
        v <- Gen.chooseNum(0.0, 100.0)
      } yield (k, s"2024-02-0$d", math.rint(v)))
      val rows = gen(Gen.Parameters.default, Seed(seed)).get
      val batches = rows.grouped(10).toList
      val tmp = java.nio.file.Files.createTempDirectory("graft_owp_prop").toString
      val target = s"$tmp/t"
      def df(rs: Seq[(Long, String, Double)]) =
        rs.toDF("k", "d", "v").select($"k", to_date($"d").as("d"), $"v")
      // within a batch, last write wins per key — pre-collapse like
      // the operator contract requires (incoming must be key-unique)
      def collapse(rs: Seq[(Long, String, Double)]) =
        rs.zipWithIndex.groupBy(r => (r._1._1, r._1._2))
          .map { case (_, vs) => vs.maxBy(_._2)._1 }.toSeq
      batches.foreach(b =>
        Upsert.overwritePartitions(df(collapse(b)), Seq("k", "d"), "d", target))
      val got = spark.read.parquet(target)
        .select($"k", $"d".cast("string"), $"v")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
      // one-shot expectation: last write per (k, d) across the flat list
      val expected = rows.zipWithIndex
        .groupBy(r => (r._1._1, r._1._2))
        .map { case (_, vs) => vs.maxBy(_._2)._1 }
        .toSet
      assert(got == expected, s"seed $seed")
    }
  }

  test("property: zValue is a bijection on the bit range and orders by interleave") {
    import graft.sources.Layout
    val pairs = Gen.listOfN(500,
      Gen.zip(Gen.chooseNum(0L, 1023L), Gen.chooseNum(0L, 1023L)))(
      Gen.Parameters.default, Seed(41L)).get.distinct
    val got = pairs.toDF("a", "b")
      .select($"a", $"b", Layout.zValue($"a", $"b", 10).as("z"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
    def morton(a: Long, b: Long): Long =
      (0 until 10).foldLeft(0L)((acc, i) =>
        acc | (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1)))
    got.foreach { case ((a, b), z) => assert(z == morton(a, b), s"($a,$b)") }
    // bijectivity on the domain: distinct inputs -> distinct codes
    assert(got.map(_._2).distinct.length == got.length)
  }

  test("property: quantize→dequantize error is within half a step for arbitrary vectors") {
    val df = vecs(300, 7L).zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "v")
    val z = V.quantizeInt8($"v")
    val bad = df.select($"id", $"v", z.as("z"))
      .select($"id", $"z.mn".as("mn"), $"z.mx".as("mx"),
        array_max(zip_with(transform($"v", _.cast("double")),
          V.dequantizeInt8($"z.mn", $"z.mx", $"z.q"),
          (x, y) => abs(x - y))).as("err"))
      .filter($"err" > ($"mx" - $"mn") / 510.0 * 1.000001)
      .count()
    assert(bad == 0)
  }

  test("property: quantized codes are always within int8 range") {
    val df = vecs(300, 11L).zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "v")
    val outOfRange = df.select(explode(V.quantizeInt8($"v").getField("q")).as("c"))
      .filter($"c" < -128 || $"c" > 127).count()
    assert(outOfRange == 0)
  }

  test("property: detHash lands in [0, 2^31) for arbitrary non-negative ids") {
    val ids = Gen.listOfN(2000, Gen.chooseNum(0L, Long.MaxValue / 2))(
      Gen.Parameters.default, Seed(13L)).getOrElse(Nil)
    val bad = ids.toDF("id")
      .select(Sampling.detHash($"id").as("h"))
      .filter($"h" < 0L || $"h" >= 2147483647L).count()
    assert(bad == 0)
  }

  test("property: stratifiedBp keep-set is a subset, stable, and rate-monotone") {
    val df = (0L until 3000L).map(i => (i, s"s${i % 7}")).toDF("id", "s")
    val lo = Sampling.stratifiedBp(df, $"s", $"id", Map.empty, defaultBp = 2000)
      .select("id").collect().map(_.getLong(0)).toSet
    val hi = Sampling.stratifiedBp(df, $"s", $"id", Map.empty, defaultBp = 6000)
      .select("id").collect().map(_.getLong(0)).toSet
    // a higher rate admits a SUPERSET (the gate is hash < threshold)
    assert(lo.subsetOf(hi))
    assert(lo.size < hi.size && hi.size < 3000)
  }

  test("property: capPerGroup output per group is min(cap, group size)") {
    val df = (0L until 1000L).map(i => (i, s"g${i % 13}")).toDF("id", "g")
    val sizes = Sampling.capPerGroup(df, $"g", $"id", cap = 40)
      .groupBy("g").count().collect().map(_.getLong(1))
    assert(sizes.forall(n => n == math.min(40L, 1000L / 13 + 1)
      || n == math.min(40L, 1000L / 13)))
    val total = Sampling.capPerGroup(df, $"g", $"id", cap = 2000).count()
    assert(total == 1000L) // cap above group size is the identity
  }

  test("property: sessionize partitions each key's events; boundaries respect the gap") {
    val tss = Gen.listOfN(400, Gen.chooseNum(0L, 500000L))(
      Gen.Parameters.default, Seed(17L)).getOrElse(Nil)
    val df = tss.zipWithIndex.map { case (sec, i) =>
      (i.toLong % 5, i.toLong, new java.sql.Timestamp(sec * 1000)) }
      .toDF("k", "eid", "ts")
    val out = graft.operators.TimeSeries.sessionize(df, $"k", $"ts",
        gapSeconds = 600, ord = Seq($"ts".asc, $"eid".asc))
      .select("k", "eid", "ts", "session_idx").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2).getTime, r.getLong(3)))
    assert(out.length == 400) // row-preserving
    for ((_, rows) <- out.groupBy(_._1)) {
      val sorted = rows.sortBy(r => (r._3, r._2))
      sorted.zip(sorted.drop(1)).foreach { case ((_, _, t1, s1), (_, _, t2, s2)) =>
        val gap = t2 - t1
        if (s2 == s1) assert(gap <= 600000L, "within-session gap exceeds threshold")
        else { assert(s2 == s1 + 1, "session indices must be dense")
               assert(gap > 600000L, "session split without a real gap") }
      }
      assert(sorted.head._4 == 1L)
    }
  }

  test("property: packSequential windows tile the stream exactly") {
    val toks = Gen.listOfN(300, Gen.chooseNum(1L, 900L))(
      Gen.Parameters.default, Seed(19L)).getOrElse(Nil)
    val df = toks.zipWithIndex.map { case (t, i) => (i.toLong, s"s${i % 3}", t) }
      .toDF("id", "strat", "toks")
    val rows = graft.operators.Packing.packSequential(df, $"strat", $"toks",
        Seq($"id".asc), ctxLen = 512L)
      .select("strat", "id", "toks", "stream_off", "pack_first", "pack_last", "n_windows")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    for ((_, g) <- rows.groupBy(_._1)) {
      val sorted = g.sortBy(_._2)
      var off = 0L
      sorted.foreach { case (_, _, t, streamOff, pf, pl, nw) =>
        assert(streamOff == off, "offsets must tile the stream with no gaps")
        assert(pf == streamOff / 512 && pl == (streamOff + t - 1) / 512)
        assert(nw == pl - pf + 1 && nw >= 1)
        off += t
      }
    }
  }

  test("property: quantilesDisc equals the sorted-list nearest-rank on arbitrary data") {
    val vals = Gen.listOfN(600, Gen.chooseNum(-500, 500))(
      Gen.Parameters.default, Seed(23L)).getOrElse(Nil)
    val df = vals.zipWithIndex.map { case (v, i) => (s"g${i % 4}", v.toDouble) }
      .toDF("g0", "v0")
    val pcts = Seq(100, 2500, 5000, 7500, 9999, 10000)
    val got = graft.operators.Percentiles.quantilesDisc(df, $"g0", $"v0", pcts)
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val byG = vals.zipWithIndex.map { case (v, i) => (s"g${i % 4}", v.toDouble) }
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    for ((g, vs) <- byG; bp <- pcts) {
      val rank = ((bp.toLong * vs.length + 9999) / 10000).toInt
      assert(got((g, bp)) == vs(rank - 1), s"$g p$bp")
    }
  }
}
