package graft

import org.apache.spark.sql.SparkSession

/** M8 — stage orchestrator mirroring the reference's only external API
  * (the CLI batch run, /root/reference/main_graph_topraq.py:84-340):
  * an ordered task registry, per-task gating by `ENABLE_<KEY>` env +
  * `--only`/`--skip` sets, and `[TIMER]` instrumentation per stage and
  * total (main_graph_topraq.py:48-62, 327-334).
  *
  * Where the reference needs "deterministic ordering" via a single
  * serialized Neo4j session (main_graph_topraq.py:113-115), stages
  * here are pure DataFrame programs — ordering only matters for
  * timing attribution, and stage outputs are reusable DataFrames, not
  * sink state.
  */
object Orchestrator {

  final case class Stage(key: String, label: String,
                         run: (SparkSession, String) => Unit)

  /** ENABLE_<KEY> env gate + --only/--skip sets, reference semantics:
    * `only` non-empty → allowlist; `skip` always wins; env default on.
    */
  def enabled(key: String, only: Set[String], skip: Set[String],
              env: Map[String, String] = sys.env): Boolean = {
    val envOn = env.getOrElse(s"ENABLE_${key.toUpperCase}", "1") != "0"
    val onlyOk = only.isEmpty || only.contains(key)
    envOn && onlyOk && !skip.contains(key)
  }

  /** The stage DAG, DECLARED rather than implied by list order. The
    * reference encodes its dependencies only through the serialized
    * call sequence (constraints before every projector, AE → PA →
    * FP → ANC at main_graph_topraq.py:117-324), so `--only pa` there
    * silently runs without its upstream; here `--only X` pulls X's
    * transitive prerequisites so a stage never runs on a surface its
    * upstream was supposed to populate/validate. Keys not listed
    * have no prerequisites. The registry order must stay a
    * topological order of this map (spec-asserted).
    */
  val upstream: Map[String, Seq[String]] = Map(
    "ingest" -> Seq("constraints"),
    "joins" -> Seq("ingest"),
    "day_metrics" -> Seq("ingest"),
    "app_chain" -> Seq("joins"),
    "text" -> Seq("ingest"),
    "dedup" -> Seq("text"),
    "sampling" -> Seq("dedup"),
    "timeseries" -> Seq("ingest"),
    "lake_ops" -> Seq("ingest"),
    "vectors" -> Seq("ingest"),
    "graph" -> Seq("joins"),
    "cypher" -> Seq("graph"),
    "multimodal" -> Seq("ingest"))

  /** Expand an `--only` set with its transitive upstream closure.
    * An explicit `skip` still wins over a pulled prerequisite (the
    * operator said so), matching the reference's skip-beats-enable.
    */
  def withUpstream(only: Set[String]): Set[String] = {
    @annotation.tailrec
    def go(acc: Set[String]): Set[String] = {
      val next = acc ++ acc.flatMap(k => upstream.getOrElse(k, Nil))
      if (next == acc) acc else go(next)
    }
    if (only.isEmpty) only else go(only)
  }

  /** Run the gated stages in order (registry order is topological for
    * [[upstream]]); `--only` is expanded with its prerequisite
    * closure first. Returns per-stage seconds.
    */
  def run(spark: SparkSession, sfDir: String, stages: Seq[Stage],
          only: Set[String] = Set.empty,
          skip: Set[String] = Set.empty): Seq[(String, Double)] = {
    val t0 = System.nanoTime()
    val onlyFull = withUpstream(only)
    val times = stages.flatMap { st =>
      if (!enabled(st.key, onlyFull, skip)) {
        println(s"[SKIP] ${st.label}")
        None
      } else {
        val s0 = System.nanoTime()
        st.run(spark, sfDir)
        val dt = (System.nanoTime() - s0) / 1e9
        println(f"[TIMER] ${st.label}: $dt%.2fs")
        Some(st.key -> dt)
      }
    }
    println(f"[TIMER] TOTAL: ${(System.nanoTime() - t0) / 1e9}%.2fs")
    times
  }

  /** Stage key → (label, query-name prefixes). Declared as data so the
    * catalog-coverage invariant is testable against the real registry.
    */
  val stageRegistry: Seq[(String, String, Seq[String])] = Seq(
    ("constraints", "uniqueness + referential integrity + expectations",
      Seq("s6_", "dq_")),
    ("ingest", "scans, projections, upserts, layout, bad records",
      Seq("s2_", "s3_", "s7_", "s8_", "s11_", "s13_", "s14_", "s15_",
        "p1_", "p3_")),
    ("joins", "dim/as-of/semi joins", Seq("j")),
    ("day_metrics", "daily roll-ups + pivots + funnels",
      // the reshape family is enumerated (r1_..r8_), not the bare "r"
      // catch-all: "r" also swallowed rag_* (a text/retrieval query)
      // into this stage's timing and attribution
      Seq("a", "r1_", "r2_", "r3_", "r4_", "r5_", "r6_", "r7_", "r8_",
        "pipeline_day", "funnel_")),
    ("functions", "scalar parse/convert suites",
      Seq("f_", "f1", "f2", "f5", "f6", "f8", "o", "w_running", "set_", "sql_")),
    ("app_chain", "application chain", Seq("pipeline_app")),
    ("text", "text analysis + corpus prep",
      Seq("txt_", "rag_", "pipeline_corpus", "pipeline_rag",
        "pipeline_curation")),
    ("dedup", "deduplication family + preference-pair mining",
      Seq("dd_", "pipeline_dpo")),
    ("sampling", "deterministic corpus sampling + packing + loader prep",
      Seq("samp_", "pack_", "pipeline_loader")),
    ("timeseries", "sessionization + gap fill + rolling windows + streaks + cohorts",
      Seq("ts_", "w_sessionize", "w_rolling", "w_gaps", "w_cum",
        "w_cohort", "w_transition", "w_dau", "w_pareto", "w_streak")),
    ("lake_ops", "snapshot diff, checksums, incremental refresh, profiling, SCD2, CDC",
      Seq("s9_", "s10_", "s12_", "s16_", "s17_", "s18_", "s19_", "s20_",
        "lake_")),
    ("vectors", "similarity search + retrieval eval", Seq("vec_", "eval_")),
    ("graph", "graph view + analytics + embedding prep", Seq("g_", "pipeline_graph")),
    ("cypher", "Cypher read queries over the property graph", Seq("cy_")),
    ("multimodal", "media decode plumbing + multimodal corpus prep",
      Seq("mm_", "pipeline_multimodal")))

  /** The engine's standard stage registry: one stage per query-catalog
    * family, each evaluating its queries to completion (noop sink).
    */
  def standardStages: Seq[Stage] = {
    def evalAll(prefixes: Seq[String]): (SparkSession, String) => Unit =
      (spark, sfDir) =>
        SparkEntry.queries.toSeq.sortBy(_._1)
          .filter { case (k, _) => prefixes.exists(k.startsWith) }
          .foreach { case (_, fn) =>
            fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          }
    stageRegistry.map { case (key, label, prefixes) =>
      Stage(key, label, evalAll(prefixes))
    }
  }

  /** CLI: `runMain graft.Orchestrator --sf-dir D [--only a,b] [--skip c]`. */
  def main(args: Array[String]): Unit = {
    def opt(name: String): Option[String] =
      args.sliding(2).collectFirst { case Array(`name`, v) => v }
    val sfDir = opt("--sf-dir").getOrElse("/root/testdata/sf0.001")
    val only = opt("--only").map(_.split(",").toSet).getOrElse(Set.empty)
    val skip = opt("--skip").map(_.split(",").toSet).getOrElse(Set.empty)
    val spark = GraftSession.getOrCreate()
    run(spark, sfDir, standardStages, only, skip)
    spark.stop()
  }
}
