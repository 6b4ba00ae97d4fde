package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The real catalog lives in [[Queries]]; this object is the stable
  * facade the harness calls.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Uses the broadcast-dim-join aggregate — the engine's spine
    * (scan → broadcast join chain → hash aggregate).
    */
  def entry(spark: SparkSession): DataFrame =
    Queries.j1_broadcast_agg.fn(spark, "/root/testdata/sf0.001")

  private def catalog: Map[String, Queries.Q] =
    Queries.all ++ Queries2.all ++ Queries3.all ++ Queries4.all ++
      Queries5.all ++ Queries6.all ++ Queries7.all ++ Queries8.all ++
      Queries9.all ++ Queries10.all ++ Queries11.all ++ Queries12.all ++
      Queries13.all ++ Queries14.all ++ Queries15.all ++ Queries16.all ++
      Queries17.all ++ Queries18.all ++ Queries19.all ++ Queries20.all ++
      Queries21.all ++ Queries22.all ++ Queries23.all ++ Queries24.all ++
      Queries25.all ++ Queries26.all ++ Queries27.all ++ Queries28.all ++
      Queries29.all ++ Queries30.all ++ Queries31.all ++ Queries32.all ++
      Queries33.all ++ Queries34.all ++ Queries35.all ++ Queries36.all ++ Queries37.all ++
      Queries38.all ++ Queries39.all ++ Queries40.all ++ Queries41.all ++
      Queries42.all ++ Queries43.all ++ Queries44.all ++ Queries45.all ++
      Queries46.all ++ Queries47.all ++ Queries48.all ++ Queries49.all ++
      Queries50.all ++ Queries51.all ++ Queries52.all ++ Queries53.all ++
      Queries54.all ++ Queries55.all ++ Queries56.all ++ Queries57.all ++
      Queries58.all ++ Queries59.all ++ Queries60.all ++ Queries61.all ++
      Queries62.all

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    catalog.map { case (k, q) => k -> q.fn }

  /** The BENCH headline subset (excludes entries whose cost model is
    * not a plain batch plan, e.g. the streaming roll-up). */
  def benchQueries: Map[String, (SparkSession, String) => DataFrame] =
    catalog.collect { case (k, q) if q.bench => k -> q.fn }

  /** The streaming runners (micro-batch drains over rate/file sources).
    * Excluded from [[benchQueries]] since round 3 because their cost is
    * a drain loop, not one batch plan — but r16 verdict item 8 wants a
    * NUMBER per streaming path in the bench JSON so streaming
    * regressions are visible; [[Bench]] times these with the same
    * noop-sink methodology (the fn drains its stream and returns the
    * terminal state frame) and reports them as additional `queries`
    * entries (additions-only; the batch set above is unchanged).
    */
  def streamQueries: Map[String, (SparkSession, String) => DataFrame] =
    catalog.collect {
      case (k, q) if !q.bench && k.startsWith("stream_") => k -> q.fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    catalog.collect { case (k, q) if q.oracle.isDefined => k -> q.oracle.get }
}
