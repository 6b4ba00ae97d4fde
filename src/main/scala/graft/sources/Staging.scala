package graft.sources

/** Staging locations for queries that write-then-read-back (bucketed
  * tables, interchange round-trips, partitioned day-state).
  *
  * Isolation contract:
  *   - per-DATASET: the input dir is folded into every path and table
  *     name, so runs against different scale factors inside one JVM
  *     never clobber each other or silently read another dataset's
  *     staged write;
  *   - per-JVM: the process id is folded into every path, so two
  *     concurrent harness JVMs over the SAME dir cannot race on
  *     `mode("overwrite")`. (Catalog table names don't need the pid —
  *     the catalog is per-SparkSession, which is per-JVM here.)
  *
  * A `dir.hashCode` collision across datasets is disarmed by the same
  * two facts: within one JVM the write happens immediately before the
  * read-back, and across JVMs the pid splits the path.
  */
object Staging {

  /** Stable per-dataset key. */
  def dirKey(dir: String): String =
    java.lang.Integer.toHexString(dir.hashCode)

  /** Per-dataset, per-JVM staging path for `name`. */
  def path(dir: String, name: String): String =
    s"/tmp/graft_stage_${dirKey(dir)}_${ProcessHandle.current().pid()}/$name"

  /** Per-dataset catalog table name (saveAsTable entries). */
  def tableName(base: String, dir: String): String =
    s"${base}_${dirKey(dir)}"
}
