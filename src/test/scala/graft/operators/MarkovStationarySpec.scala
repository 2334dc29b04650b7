package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Regime gate for [[Relational.markovStationaryCore]] (r16
  * optimization): the driver-finish power iteration under
  * q_markov_stationary must be bit-identical to the distributed join
  * loop it replaced at dimension scale — the
  * kCoreCore/connectedComponents both-regimes contract.
  */
class MarkovStationarySpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def run(data: Seq[(String, String, Long)],
      driverBound: Long): Seq[(String, Long)] = {
    import spark.implicits._
    val got = Relational
      .markovStationaryCore(data.toDF("prev", "cur", "n"),
        driverEdgeBound = driverBound)
      .collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    graft.GraftCaches.release(spark)
    got
  }

  test("driver finish ≡ distributed loop: skewed 4-state chain") {
    val m = Seq(
      ("a", "b", 7L), ("a", "c", 3L), ("b", "a", 1L), ("b", "c", 9L),
      ("c", "a", 5L), ("c", "d", 5L), ("d", "d", 10L))
    val driver = run(m, driverBound = 1000000L)
    val dist = run(m, driverBound = 0L)
    assert(driver === dist)
    assert(driver.nonEmpty)
  }

  test("driver finish ≡ distributed loop: absorbing state and a " +
      "target-only state (mass leaves non-prev states after round 1)") {
    val m = Seq(
      ("x", "sink", 2L), ("x", "x", 2L), ("sink", "sink", 4L),
      ("y", "x", 1L)) // "z" never appears as prev; "y" is source-only
    val driver = run(m, driverBound = 1000000L)
    val dist = run(m, driverBound = 0L)
    assert(driver === dist)
  }
}
