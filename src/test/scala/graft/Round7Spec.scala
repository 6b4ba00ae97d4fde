package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{GraphExport, GraphOps, Linkage}
import graft.domain.GraphAssembly

/** Round-7 operator semantics: bounded k-hop path expand, the gated
  * graph export, and union multi-blocking for record linkage.
  */
class Round7Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // ---- kHopPaths ----

  test("kHopPaths expands every simple path up to k and stops at cycles") {
    // 1 → 2 → 3 → 1 (cycle) and 2 → 4 (branch)
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (2L, 4L)).toDF("src", "dst")
    val src = Seq(1L).toDF("id")
    val got = GraphOps.kHopPaths(e, src, maxHops = 4)
      .select($"start", $"end", $"hops", $"path")
      .as[(Long, Long, Int, Seq[Long])].collect().toSet
    val want = Set(
      (1L, 2L, 1, Seq(1L, 2L)),
      (1L, 3L, 2, Seq(1L, 2L, 3L)),
      (1L, 4L, 2, Seq(1L, 2L, 4L)))
    // hop 3 would revisit 1 via 3→1 — the simple-path guard drops it,
    // so the expansion terminates even though maxHops = 4 and the
    // graph is cyclic
    assert(got == want)
  }

  test("kHopPaths with multiple sources keeps per-source path identity") {
    val e = Seq((1L, 3L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val src = Seq(1L, 2L).toDF("id")
    val got = GraphOps.kHopPaths(e, src, maxHops = 2)
      .select($"start", $"end", $"hops")
      .as[(Long, Long, Int)].collect().toSet
    assert(got == Set(
      (1L, 3L, 1), (2L, 3L, 1), (1L, 4L, 2), (2L, 4L, 2)))
  }

  test("kCheapestPaths picks the k cheapest per pair with (cost, path) tiebreak") {
    // diamond: 1→2 (w=1), 1→3 (w=5), 2→4 (w=10), 3→4 (w=1), plus a
    // direct 1→4 (w=20): three 1→4 paths with costs 11, 6, 20
    val e = Seq((1L, 2L, 1L), (1L, 3L, 5L), (2L, 4L, 10L), (3L, 4L, 1L),
      (1L, 4L, 20L)).toDF("src", "dst", "w")
    val got = GraphOps.kCheapestPaths(e, Seq(1L).toDF("id"), maxHops = 2, k = 2)
      .filter($"end" === 4L)
      .select($"cost", $"path", $"rank")
      .as[(Long, Seq[Long], Int)].collect().toSet
    assert(got == Set(
      (6L, Seq(1L, 3L, 4L), 1),   // cheapest: via 3
      (11L, Seq(1L, 2L, 4L), 2))) // second: via 2; direct w=20 cut
  }

  test("kCheapestPaths breaks exact cost ties by path lexicographic order") {
    // two 1→4 paths with IDENTICAL cost 2: via 2 and via 3
    val e = Seq((1L, 2L, 1L), (1L, 3L, 1L), (2L, 4L, 1L), (3L, 4L, 1L))
      .toDF("src", "dst", "w")
    val got = GraphOps.kCheapestPaths(e, Seq(1L).toDF("id"), maxHops = 2, k = 1)
      .filter($"end" === 4L)
      .select($"path", $"rank").as[(Seq[Long], Int)].collect().toSet
    assert(got == Set((Seq(1L, 2L, 4L), 1))) // [1,2,4] < [1,3,4]
  }

  // ---- GraphExport ----

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft_r7_spec").toString

  test("exportGraph round-trips vertices and edges losslessly") {
    val verts = Seq(("A:1", "A", "{}"), ("A:2", "A", "{\"x\":1}"),
      ("B:9", "B", "{}")).toDF("id", "label", "props")
    val edges = Seq(("A:1", "B:9", "REL"), ("A:2", "B:9", "REL"))
      .toDF("src", "dst", "rel")
    val (vB, eB) = GraphExport.exportGraph(spark, verts, edges, tmpDir())
    val vBack = vB.select("id", "label", "props")
    val eBack = eB.select("src", "dst", "rel")
    assert(verts.exceptAll(vBack).isEmpty && vBack.exceptAll(verts).isEmpty)
    assert(edges.exceptAll(eBack).isEmpty && eBack.exceptAll(edges).isEmpty)
  }

  test("exported layout partition-prunes label point-reads") {
    val verts = Seq(("A:1", "A", "{}"), ("A:2", "A", "{}"), ("B:9", "B", "{}"))
      .toDF("id", "label", "props")
    val edges = Seq(("A:1", "B:9", "REL")).toDF("src", "dst", "rel")
    val (vB, _) = GraphExport.exportGraph(spark, verts, edges, tmpDir())
    val q = vB.filter($"label" === "A")
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    // the label predicate must prune at the DIRECTORY level (the
    // whole point of the label-partitioned layout: a one-label read
    // never opens the other labels' files)
    assert(plan.contains("PartitionFilters") && plan.contains("label"),
      "label filter did not reach partition pruning:\n" + plan)
  }

  test("exportVerticesDelta rewrites ONLY the touched label's files") {
    val verts = Seq(("A:1", "A", "{}"), ("A:2", "A", "{}"), ("B:9", "B", "{}"))
      .toDF("id", "label", "props")
    val root = tmpDir()
    GraphExport.exportVertices(spark, verts, root)
    def files(label: String): Map[String, (Long, Long)] = {
      val d = new java.io.File(s"$root/vertices/label=$label")
      d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> (f.length(), f.lastModified())).toMap
    }
    val aBefore = files("A")
    Thread.sleep(1100) // mtime resolution guard
    val delta = Seq(("B:9", "B", "{\"upd\":1}"), ("B:10", "B", "{\"upd\":1}"))
      .toDF("id", "label", "props")
    val back = GraphExport.exportVerticesDelta(spark, delta, root)
    // A's files: same names, sizes, AND mtimes — not rewritten
    assert(files("A") == aBefore,
      "untouched label's files were rewritten by the delta export")
    // B replaced wholesale by the delta's content
    val b = back.filter($"label" === "B").select("id", "props")
      .as[(String, String)].collect().toSet
    assert(b == Set("B:9" -> "{\"upd\":1}", "B:10" -> "{\"upd\":1}"))
    assert(back.filter($"label" === "A").count() == 2)
  }

  test("exportGraph refuses duplicate vertex ids before writing bytes") {
    val verts = Seq(("A:1", "A", "{}"), ("A:1", "A", "{}"))
      .toDF("id", "label", "props")
    val edges = Seq.empty[(String, String, String)].toDF("src", "dst", "rel")
    val root = tmpDir()
    val ex = intercept[IllegalArgumentException] {
      GraphExport.exportGraph(spark, verts, edges, root)
    }
    assert(ex.getMessage.contains("duplicate vertex ids"))
    assert(!new java.io.File(s"$root/vertices").exists())
  }

  test("exportGraph refuses dangling edge endpoints") {
    val verts = Seq(("A:1", "A", "{}")).toDF("id", "label", "props")
    val edges = Seq(("A:1", "GHOST:7", "REL")).toDF("src", "dst", "rel")
    val ex = intercept[IllegalArgumentException] {
      GraphExport.exportGraph(spark, verts, edges, tmpDir())
    }
    assert(ex.getMessage.contains("dangling"))
  }

  test("danglingEdges flags both missing-src and missing-dst") {
    val verts = Seq(("A:1", "A", "{}")).toDF("id", "label", "props")
    val edges = Seq(("A:1", "X:1", "R"), ("Y:2", "A:1", "R"))
      .toDF("src", "dst", "rel")
    assert(GraphAssembly.danglingEdges(verts, edges).count() == 2)
  }

  // ---- linkScoredMulti ----

  test("linkScoredMulti candidates are a superset of any single block and dedup pairs") {
    // names: single-char substitution pairs that a coarse single
    // block (first char) would MISS when the substitution hits the
    // blocked position — the 2-of-3 part union must still catch them
    val left = Seq((1L, "abc"), (2L, "xbc"), (3L, "axc"), (4L, "abx"))
      .toDF("lid", "lname")
      .withColumn("p1", substring($"lname", 1, 1))
      .withColumn("p2", substring($"lname", 2, 1))
      .withColumn("p3", substring($"lname", 3, 1))
    val right = Seq((10L, "abc")).toDF("rid", "rname")
      .withColumn("q1", substring($"rname", 1, 1))
      .withColumn("q2", substring($"rname", 2, 1))
      .withColumn("q3", substring($"rname", 3, 1))
    val fields = Seq(Linkage.Field(levenshtein($"lname", $"rname") <= 1, 10, -10))
    val got = Linkage.linkScoredMulti(left, right, "lid" -> "rid",
      Seq(Seq("p1" -> "q1", "p2" -> "q2"),
        Seq("p1" -> "q1", "p3" -> "q3"),
        Seq("p2" -> "q2", "p3" -> "q3")),
      fields, threshold = 10)
      .select($"lid", $"rid").as[(Long, Long)].collect().toSet
    // every lev<=1 neighbor of "abc" is found, including id 2 whose
    // substitution is in position 1 (invisible to a first-char block),
    // and the exact match (id 1, which meets in all 3 blocks) emits ONCE
    assert(got == Set((1L, 10L), (2L, 10L), (3L, 10L), (4L, 10L)))
  }

  // ---- fuzzyJoinBlockedMulti ----

  test("fuzzyJoinBlockedMulti is a candidate superset: catches first-char edits the single family misses") {
    val clean = Seq((1L, "widget alpha"), (2L, "widget bravo"),
      (3L, "gizmo charlie")).toDF("p_key", "p_name")
    // the edit hits the FIRST character — the single family's block
    // key (first char, last char, band) can never match these pairs
    val dirty = clean.select($"p_key".+(10L).as("d_key"),
      concat(lit("z"), substring($"p_name", 2, 100)).as("d_name"))
    val single = graft.operators.Dedup
      .fuzzyJoinBlocked(dirty, "d_name", clean, "p_name", maxDist = 2)
      .select($"d_key", $"p_key").as[(Long, Long)].collect().toSet
    val multi = graft.operators.Dedup
      .fuzzyJoinBlockedMulti(dirty, "d_name", "d_key",
        clean, "p_name", "p_key", maxDist = 2)
      .select($"d_key", $"p_key").as[(Long, Long)].collect().toSet
    assert(single.subsetOf(multi), "multi must never lose a single-family pair")
    // every true pair (lev = 1, first-char substitution) is recovered
    // by the rarest-q-gram family
    assert(multi == Set((11L, 1L), (12L, 2L), (13L, 3L)))
    assert(single.isEmpty)
  }

  test("fuzzyJoinBlockedMulti equals the single family when edits avoid the edges") {
    val clean = Seq((1L, "widget alpha"), (2L, "gizmo charlie"))
      .toDF("p_key", "p_name")
    val dirty = clean.select($"p_key".+(10L).as("d_key"),
      concat(substring($"p_name", 1, 3), lit("X"),
        substring($"p_name", 5, 100)).as("d_name"))
    val single = graft.operators.Dedup
      .fuzzyJoinBlocked(dirty, "d_name", clean, "p_name", maxDist = 2)
      .select($"d_key", $"p_key", $"dist").as[(Long, Long, Int)].collect().toSet
    val multi = graft.operators.Dedup
      .fuzzyJoinBlockedMulti(dirty, "d_name", "d_key",
        clean, "p_name", "p_key", maxDist = 2)
      .select($"d_key", $"p_key", $"dist").as[(Long, Long, Int)].collect().toSet
    assert(single == multi)
    assert(multi == Set((11L, 1L, 1), (12L, 2L, 1)))
  }

  test("fuzzyJoinBlockedMulti maxDf disables family B gracefully on common grams") {
    // the dirty name's grams are either corpus-common (df > maxDf)
    // or typo-created (unseen), so it gets NO family-B key — family
    // B contributes nothing rather than joining a mega-block, and
    // family A still catches the middle edit (edge chars intact)
    val clean = Seq((1L, "aaaa"), (2L, "aaab"), (3L, "aaac"))
      .toDF("p_key", "p_name")
    val dirty = Seq((11L, "aaza")).toDF("d_key", "d_name")
    val multi = graft.operators.Dedup
      .fuzzyJoinBlockedMulti(dirty, "d_name", "d_key",
        clean, "p_name", "p_key", maxDist = 2, q = 2, maxDf = Some(1))
      .select($"d_key", $"p_key").as[(Long, Long)].collect().toSet
    val single = graft.operators.Dedup
      .fuzzyJoinBlocked(dirty, "d_name", clean, "p_name", maxDist = 2)
      .select($"d_key", $"p_key").as[(Long, Long)].collect().toSet
    assert(multi == single)
    // only the (aaza, aaaa) pair keeps both edge chars — the lev-2
    // pairs whose edit touches the last char stay out of BOTH
    // families here (that's the documented family-A trade, and with
    // maxDf pruning family B declines to pick up the slack)
    assert(multi == Set((11L, 1L)))
  }

  test("linkScoredMulti equals linkScored when the multi blocking is lossless") {
    val left = Seq((1L, "k1", "aa"), (2L, "k1", "ab"), (3L, "k2", "aa"))
      .toDF("lid", "lk", "lv")
    val right = Seq((7L, "k1", "aa"), (8L, "k2", "ba")).toDF("rid", "rk", "rv")
    val fields = Seq(Linkage.Field(levenshtein($"lv", $"rv") <= 1, 10, -10))
    val single = Linkage.linkScored(left, right, Seq("lk" -> "rk"),
      fields, threshold = 10)
      .select($"lid", $"rid", $"link_score")
    val multi = Linkage.linkScoredMulti(left, right, "lid" -> "rid",
      Seq(Seq("lk" -> "rk")), fields, threshold = 10)
      .select($"lid", $"rid", $"link_score")
    assert(single.exceptAll(multi).isEmpty && multi.exceptAll(single).isEmpty)
  }
}
