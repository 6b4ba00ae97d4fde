package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Scd

/** The sort-based PIT join (hot-key-safe union+window form) must be
  * row-equivalent to the equi-join+residual form on seeded random
  * Type-2 histories — boundaries, pre-history facts, unknown keys,
  * and open current versions included.
  */
class PitJoinEquivalenceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("pitJoinSorted == pitJoin on random histories with boundary hits") {
    val r = new scala.util.Random(17)
    // 30 keys, bursty change feeds; values from a tiny alphabet so
    // consecutive-dup collapse actually fires
    val changes = (1 to 1500).map { i =>
      (r.nextInt(30).toLong, s"v${r.nextInt(4)}",
        r.nextInt(500).toLong * 10, i.toLong)
    }.toDF("k", "v", "t", "uid")
    val dim = Scd.type2(changes, col("k"), col("v"), col("t"),
      Seq(col("t"), col("uid")))
    // facts: random times INCLUDING exact boundary hits (multiples of
    // 10 collide with change times), pre-history times, unknown keys
    val facts = (1 to 2000).map { i =>
      val k = r.nextInt(34).toLong // keys 30..33 never appear in dim
      val t = if (r.nextBoolean()) r.nextInt(520).toLong * 10
              else r.nextInt(5200).toLong
      (i.toLong, k, t)
    }.toDF("fid", "k", "t")
    val a = Scd.pitJoin(facts, col("k"), col("t"), dim)
      .select("fid", "pit_value", "pit_from")
    val b = Scd.pitJoinSorted(facts, col("k"), col("t"), dim)
      .select("fid", "pit_value", "pit_from")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      s"forms diverged:\nonly-join: ${a.exceptAll(b).collect().take(5).mkString}\n" +
        s"only-sorted: ${b.exceptAll(a).collect().take(5).mkString}")
    assert(a.count() == 2000 && b.count() == 2000,
      "both forms must keep every fact row exactly once")
  }
}
