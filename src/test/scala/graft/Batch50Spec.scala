package graft

import org.scalatest.funsuite.AnyFunSuite

/** Batch 50: runs-test identities. */
class Batch50Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("runs test: run count within bounds, expectation formula exact") {
    val r = SparkEntry.queries("ts_runs_test")(spark, dir).head()
    val (na, nb, runs, e) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(na > 0 && nb > 0)
    assert(runs >= 2 && runs <= na + nb, s"runs out of range: $r")
    assert(e === 1000L + (2 * na * nb * 1000) / (na + nb))
    // balanced median split: the two sides differ by at most 1
    assert(math.abs(na - nb) <= 1, s"median split unbalanced: $r")
  }
}
