package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.Orchestrator.{Stage, enabled}

class OrchestratorSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("gating: env default-on, ENABLE_*=0 disables, only is allowlist, skip wins") {
    assert(enabled("a", Set.empty, Set.empty, Map.empty))
    assert(!enabled("a", Set.empty, Set.empty, Map("ENABLE_A" -> "0")))
    assert(enabled("a", Set.empty, Set.empty, Map("ENABLE_A" -> "1")))
    assert(enabled("a", Set("a"), Set.empty, Map.empty))
    assert(!enabled("b", Set("a"), Set.empty, Map.empty))
    assert(!enabled("a", Set("a"), Set("a"), Map.empty)) // skip beats only
  }

  test("run executes enabled stages in order, times them, skips the rest") {
    val seen = scala.collection.mutable.ArrayBuffer[String]()
    val stages = Seq(
      Stage("one", "first", (_, _) => seen += "one"),
      Stage("two", "second", (_, _) => seen += "two"),
      Stage("three", "third", (_, _) => seen += "three"))
    val times = Orchestrator.run(spark, "unused", stages, skip = Set("two"))
    assert(seen.toList == List("one", "three"))
    assert(times.map(_._1) == Seq("one", "three"))
    assert(times.forall(_._2 >= 0.0))
  }

  test("standard stage registry covers every batch query in the catalog") {
    val prefixes = Orchestrator.stageRegistry.flatMap(_._3)
    val uncovered = SparkEntry.benchQueries.keys
      .filterNot(k => prefixes.exists(k.startsWith))
    assert(uncovered.isEmpty, s"queries missing from standardStages: $uncovered")
  }

  test("standard stage registry routes every query to exactly ONE stage") {
    // a query matched by two stages' prefixes runs (and is timed) twice
    // per orchestrator pass — double work, wrong attribution
    val dup = SparkEntry.queries.keys.toSeq.map { k =>
      k -> Orchestrator.stageRegistry.count(_._3.exists(k.startsWith))
    }.filter(_._2 > 1)
    assert(dup.isEmpty, s"queries matched by multiple stages: $dup")
  }

  test("--only pulls declared transitive upstream stages (app_chain runs joins first)") {
    val seen = scala.collection.mutable.ArrayBuffer[String]()
    val stages = Orchestrator.stageRegistry.map { case (key, label, _) =>
      Stage(key, label, (_, _) => seen += key)
    }
    Orchestrator.run(spark, "unused", stages, only = Set("app_chain"))
    // app_chain → joins → ingest → constraints, in registry order
    assert(seen.toList == List("constraints", "ingest", "joins", "app_chain"))
  }

  test("explicit --skip still beats a pulled prerequisite") {
    val seen = scala.collection.mutable.ArrayBuffer[String]()
    val stages = Orchestrator.stageRegistry.map { case (key, label, _) =>
      Stage(key, label, (_, _) => seen += key)
    }
    Orchestrator.run(spark, "unused", stages,
      only = Set("app_chain"), skip = Set("constraints"))
    assert(seen.toList == List("ingest", "joins", "app_chain"))
  }

  test("upstream keys all exist and registry order is topological") {
    val keys = Orchestrator.stageRegistry.map(_._1)
    val idx = keys.zipWithIndex.toMap
    Orchestrator.upstream.foreach { case (k, ups) =>
      assert(idx.contains(k), s"unknown stage in upstream: $k")
      ups.foreach { u =>
        assert(idx.contains(u), s"unknown prerequisite: $u")
        assert(idx(u) < idx(k),
          s"registry order violates dependency $u -> $k")
      }
    }
  }

  test("withUpstream is a closure: empty stays empty, roots stay themselves") {
    assert(Orchestrator.withUpstream(Set.empty) == Set.empty)
    assert(Orchestrator.withUpstream(Set("constraints")) == Set("constraints"))
    assert(Orchestrator.withUpstream(Set("sampling")) ==
      Set("sampling", "dedup", "text", "ingest", "constraints"))
  }
}
