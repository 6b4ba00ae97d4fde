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

  private def deleteRecursively(f: java.io.File): Unit = {
    val children = f.listFiles()
    if (children != null) children.foreach(deleteRecursively)
    f.delete(): Unit
  }

  // The pid-scoped roots this JVM created; swept on exit so repeated
  // harness/bench runs don't accumulate unbounded /tmp usage.
  private val createdRoots =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  sys.addShutdownHook {
    createdRoots.forEach(r => deleteRecursively(new java.io.File(r)))
  }

  /** Per-dataset, per-JVM staging path for `name`. The per-pid root is
    * registered for deletion at JVM exit (shutdown hook) — staged
    * copies are scratch, not durable output.
    */
  def path(dir: String, name: String): String = {
    val root = s"/tmp/graft_stage_${dirKey(dir)}_${ProcessHandle.current().pid()}"
    createdRoots.add(root): Unit
    s"$root/$name"
  }

  /** Per-dataset catalog table name (saveAsTable entries). */
  def tableName(base: String, dir: String): String =
    s"${base}_${dirKey(dir)}"
}
