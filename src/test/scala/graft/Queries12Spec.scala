package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sketches

/** Functional specs for the batch-12 operators: overlap chunking and
  * the count-min frequency sketch.
  */
class Queries12Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("overlap chunks tile every document: stride starts, full cover, short tail") {
    val out = SparkEntry.queries("txt_chunk_overlap")(
        spark, "/root/testdata/sf0.001")
      .select($"doc_id", $"chunk_idx", $"start", $"chunk_len")
      .as[(Long, Long, Long, Int)].collect()
      .groupBy(_._1)
    val lens = graft.sources.Tables.read(spark, "/root/testdata/sf0.001", "documents")
      .select($"doc_id", length($"text").cast("long")).as[(Long, Long)]
      .collect().toMap
    out.foreach { case (doc, chunks) =>
      val len = lens(doc)
      val sorted = chunks.sortBy(_._2)
      // starts are exactly 0, 80, 160, ... and the count matches
      assert(sorted.map(_._3).toSeq == sorted.indices.map(_ * 80L))
      assert(sorted.length == ((len - 1) / 80 + 1))
      // every chunk is in-bounds; the last one reaches exactly the end
      sorted.foreach { case (_, _, st, cl) =>
        assert(cl > 0 && st + cl <= len && cl <= 120)
      }
      assert(sorted.map(c => c._3 + c._4).max == len)
      // consecutive chunks overlap unless the document ended first
      sorted.sliding(2).foreach {
        case Array((_, _, s1, l1), (_, _, s2, _)) => assert(s2 < s1 + l1)
        case _ =>
      }
    }
    assert(out.nonEmpty)
  }

  test("CMS never underestimates and collides to overestimates at tiny width") {
    val rnd = new scala.util.Random(11)
    val rows = (1 to 3000).map(_ => rnd.nextInt(60).toLong + 1).toDF("id")
    val d = 3; val w = 8 // 60 keys into 8 buckets: collisions guaranteed
    val counters = Sketches.cmsCounters(rows, $"id", d, w)
    assert(counters.count() <= d.toLong * w)
    val exact = rows.groupBy($"id").agg(count(lit(1)).as("n"))
    val est = Sketches.cmsLookup(counters, exact, $"id", d, w)
      .select($"id", $"n", $"cms_est").as[(Long, Long, Long)].collect()
    assert(est.length == 60)
    est.foreach { case (_, n, e) => assert(e >= n, s"underestimate: $e < $n") }
    assert(est.exists { case (_, n, e) => e > n }, "tiny width must collide")
  }

  test("chunk boundaries at exact stride/window multiples") {
    // stride 80, window 120: lengths at and around the boundaries
    val docs = Seq(
      (1L, "a" * 80),   // exactly one stride -> 1 chunk, len 80
      (2L, "b" * 81),   // one past -> 2 chunks, second has len 1
      (3L, "c" * 160),  // two strides -> 2 chunks, len 120 + 80
      (4L, "d" * 120),  // exactly one window -> 2 chunks (start 80 covers tail)
      (5L, "e"))        // single char -> 1 chunk, len 1
      .toDF("doc_id", "text")
    val rows = Queries12.chunked(docs)
      .select($"doc_id", $"chunk_idx", $"chunk_len")
      .as[(Long, Long, Int)].collect().groupBy(_._1)
      .map { case (d, cs) => d -> cs.sortBy(_._2).map(_._3).toSeq }
    assert(rows(1L) == Seq(80))
    assert(rows(2L) == Seq(81, 1))
    assert(rows(3L) == Seq(120, 80))
    assert(rows(4L) == Seq(120, 40))
    assert(rows(5L) == Seq(1))
  }

  test("RAG prep manifest is consistent with the chunk table") {
    val dir = "/root/testdata/sf0.001"
    val manifest = SparkEntry.queries("pipeline_rag_prep")(spark, dir)
      .select($"shard", $"n_chunks", $"n_docs", $"chars")
      .as[(Long, Long, Long, Long)].collect()
    assert(manifest.nonEmpty)
    assert(manifest.forall { case (s, nc, nd, ch) =>
      s >= 0 && s < 16 && nc > 0 && nd > 0 && nd <= nc && ch > 0 })
    // survivors are a subset of all chunks (quality gate + dedup)
    val allChunks = SparkEntry.queries("txt_chunk_overlap")(spark, dir).count()
    val kept = manifest.map(_._2).sum
    assert(kept > 0 && kept <= allChunks)
  }

  test("CMS counters merge by cell-wise addition") {
    val rows = (1L to 2000L).map(i => i % 97).toDF("id")
    val d = 4; val w = 64
    val whole = Sketches.cmsCounters(rows, $"id", d, w)
      .as[(Int, Long, Long)].collect().toSet
    val a = Sketches.cmsCounters(rows.filter($"id" % 2 === 0), $"id", d, w)
    val b = Sketches.cmsCounters(rows.filter($"id" % 2 =!= 0), $"id", d, w)
    val merged = a.unionByName(b)
      .groupBy($"j", $"b").agg(sum($"c").as("c"))
      .as[(Int, Long, Long)].collect().toSet
    assert(merged == whole)
  }
}
