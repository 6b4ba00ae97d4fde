package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{AsOfJoin, Dedup, Upsert}

/** The argmin/argmax aggregate rewrites (as-of join, upsert dedup,
  * merge, exact dedup) must be row-equivalent to the rank-1 window
  * forms they replaced — checked on seeded random corpora with
  * duplicate keys and nulls in both payload and ordering columns.
  */
class ArgminEquivalenceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def rnd(seed: Long): Iterator[Long] =
    Iterator.iterate(seed)(x => x * 6364136223846793005L + 1442695040888963407L).drop(1)

  private def assertSameRows(got: DataFrame, want: DataFrame, label: String): Unit =
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      s"$label diverged:\ngot:\n${got.collect().take(20).mkString("\n")}\n" +
        s"want:\n${want.collect().take(20).mkString("\n")}")

  test("dedupByKey == rank-1 window on random data with dup keys and null order values") {
    val r = rnd(42)
    // ~40 distinct keys over 500 rows; version column nullable
    val df = (1 to 500).map { i =>
      val k = math.floorMod(r.next(), 40L)
      val ver = if (math.floorMod(r.next(), 7L) == 0) null
                else java.lang.Long.valueOf(math.floorMod(r.next(), 50L))
      (k, ver, s"payload_$i", i.toLong)
    }.toDF("k", "ver", "payload", "uid")
    // unique total order (ver desc nulls last, uid desc) so both forms
    // pick the same single row deterministically
    val got = Upsert.dedupByKey(df, Seq("k"), Seq(col("ver"), col("uid")))
    val w = Window.partitionBy(col("k"))
      .orderBy(col("ver").desc, col("uid").desc)
    val want = df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    assertSameRows(got, want, "dedupByKey")
    assert(got.count() == df.select("k").distinct().count())
  }

  test("merge == window form for both keep-existing and last-write-wins, nulls everywhere") {
    val r = rnd(7)
    def corpus(n: Int, tag: String) = (1 to n).map { i =>
      val k = math.floorMod(r.next(), 25L)
      val a = if (math.floorMod(r.next(), 3L) == 0) null else s"${tag}_a$i"
      val b = if (math.floorMod(r.next(), 4L) == 0) null
              else java.lang.Double.valueOf(math.floorMod(r.next(), 100L) * 1.0)
      (k, a, b)
    }.toDF("k", "a", "b")
    // one row per key per side — the contract MERGE operates under
    // (uniqueness constraints on both existing table and incoming batch)
    val existing = Upsert.dedupByKey(corpus(60, "old"), Seq("k"), Seq(col("a")))
    val incoming = Upsert.dedupByKey(corpus(40, "new"), Seq("k"), Seq(col("a")))
    def windowForm(keep: Boolean): DataFrame = {
      val tagged = existing.withColumn("__src", lit(0))
        .unionByName(incoming.withColumn("__src", lit(1)), allowMissingColumns = true)
      val w = Window.partitionBy(col("k")).orderBy(col("__src").asc)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val aggs = Seq("a", "b").map(c => last(col(c), ignoreNulls = keep).over(w).as(c))
      tagged.select((Seq(col("k")) ++ aggs :+ col("__src")): _*)
        .withColumn("__rn", row_number().over(
          Window.partitionBy(col("k")).orderBy(col("__src").desc)))
        .filter(col("__rn") === 1).drop("__rn", "__src")
    }
    assertSameRows(Upsert.merge(existing, incoming, Seq("k"), keepExistingNonNull = true),
      windowForm(true), "merge keep-existing")
    assertSameRows(Upsert.merge(existing, incoming, Seq("k"), keepExistingNonNull = false),
      windowForm(false), "merge last-write-wins")
  }

  test("as-of nearest == rank-1 window on random data, all directions") {
    val r = rnd(1001)
    val base = java.sql.Timestamp.valueOf("2025-06-01 00:00:00").getTime
    def t(off: Long) = new java.sql.Timestamp(base + math.floorMod(off, 86400L) * 1000)
    val left = (1 to 150).map(i =>
      (math.floorMod(r.next(), 8L), i.toLong, t(r.next()))).toDF("k", "lid", "lts")
    val right = (1 to 300).map(i =>
      (math.floorMod(r.next(), 10L), i.toLong, t(r.next()), i * 1.5))
      .toDF("k", "rid", "rts", "payload")
    for (dir <- Seq("nearest", "backward", "forward")) {
      val got = AsOfJoin.nearest(left, right, Seq("k"), "lts", "rts",
        direction = dir, tiebreak = Seq("rid"))
        .select("lid", "rid", "payload")
      // reference: plain join + rank-1 window per left row
      val diff = abs(unix_timestamp(col("rts")) - unix_timestamp(col("lts")))
      val dirF = dir match {
        case "backward" => unix_timestamp(col("rts")) <= unix_timestamp(col("lts"))
        case "forward"  => unix_timestamp(col("rts")) >= unix_timestamp(col("lts"))
        case _          => lit(true)
      }
      val joined = left.join(right, Seq("k"), "left")
        .withColumn("__d", when(dirF, diff))
      val w = Window.partitionBy(col("lid"))
        .orderBy(col("__d").asc_nulls_last, col("rid").asc)
      val want = joined.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .select(col("lid"),
          when(col("__d").isNotNull, col("rid")).as("rid"),
          when(col("__d").isNotNull, col("payload")).as("payload"))
      assertSameRows(got, want, s"as-of $dir")
      assert(got.count() == 150) // every left row exactly once
    }
  }

  test("exact dedup == rank-1 window over the content hash") {
    val r = rnd(5)
    val docs = (1 to 200).map { i =>
      // ~30 distinct texts so hash collisions (= duplicate docs) abound;
      // vary whitespace/case to exercise the normalization
      val base = s"document text ${math.floorMod(r.next(), 30L)}"
      val text = if (math.floorMod(r.next(), 2L) == 0) base.toUpperCase + "  " else base
      (i.toLong, text)
    }.toDF("doc_id", "body")
    val got = Dedup.exact(docs, "body", "doc_id")
    val norm = regexp_replace(lower(trim(col("body"))), "\\s+", " ")
    val w = Window.partitionBy(sha2(norm, 256)).orderBy(col("doc_id").asc)
    val want = docs.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    assertSameRows(got, want, "exact dedup")
  }
}
