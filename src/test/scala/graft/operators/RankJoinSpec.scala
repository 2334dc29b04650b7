package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Threshold-algorithm rank-join gate (q_rank_join's core): the oracle
  * grades the RESULT against the brute-force join, but only this spec
  * can grade the ITERATION — that the loop terminates on the bound
  * (early, without touching the full inputs) when the score skew allows
  * it, deepens when the top pair hides behind a low-ranked partner, and
  * never lets a boundary tie displace the exact top-k.
  */
class RankJoinSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def rel(rows: Seq[(Long, String)], key: String, v: String)
      : DataFrame = {
    import spark.implicits._
    rows.toDF(key, "raw")
      .select(col(key), col("raw").cast("decimal(18,2)").as(v))
  }

  private def brute(cr: DataFrame, sr: DataFrame, bridge: DataFrame,
      k: Int): Seq[(Long, Long, Double)] =
    bridge.join(cr, Seq("custkey")).join(sr, Seq("suppkey"))
      .select(col("custkey"), col("suppkey"),
        (col("crev") + col("srev")).as("score"))
      .orderBy(col("score").desc, col("custkey"), col("suppkey"))
      .limit(k)
      .select(col("custkey"), col("suppkey"),
        col("score").cast("double").as("pair_score"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq

  private def got(df: DataFrame): Seq[(Long, Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq

  test("steep skew: terminates in ONE round on the bound, exactly") {
    import spark.implicits._
    // 1000 customers/suppliers; revenue falls steeply with the id, the
    // bridge contains every (i, i±1) pair plus the dense top corner —
    // the top-5 pairs live entirely inside the first 64 of both sides
    // and the 64th values are far below them, so round 1 must bind
    val cr = rel((0L until 1000L).map(i => (i, s"${100000 - i * 90}.00")),
      "custkey", "crev")
    val sr = rel((0L until 1000L).map(i => (i, s"${90000 - i * 80}.00")),
      "suppkey", "srev")
    val bridge = ((0L until 999L).flatMap(i => Seq((i, i), (i, i + 1))) ++
      (for (i <- 0L until 10L; j <- 0L until 10L) yield (i, j)))
      .distinct.toDF("custkey", "suppkey")
    val (res, rounds) = Relational.rankJoinCore(cr, sr, bridge, 5)
    assert(rounds === 1, s"steep skew should bind in round 1, took $rounds")
    assert(got(res) === brute(cr, sr, bridge, 5))
  }

  test("adversarial: the best pair hides behind rank-200 partners — " +
      "the loop DEEPENS and still lands the exact top-k") {
    import spark.implicits._
    // flat revenue everywhere except two mid-pack ids that only pair
    // with EACH OTHER: their pair outranks every top-slice pair, but
    // neither survives a 64-slice — round 1 cannot prove the bound
    val cr = rel((0L until 1000L).map(i =>
      (i, if (i == 200L) "99999.00" else s"${50000 - i}.00")),
      "custkey", "crev")
    val sr = rel((0L until 1000L).map(i =>
      (i, if (i == 300L) "99999.00" else s"${40000 - i}.00")),
      "suppkey", "srev")
    // bridge: identity pairs for everyone EXCEPT the two stars, who
    // trade only with each other
    val bridge = ((0L until 1000L).filter(i => i != 200L && i != 300L)
      .map(i => (i, i)) :+ (200L, 300L))
      .toDF("custkey", "suppkey")
    val (res, rounds) = Relational.rankJoinCore(cr, sr, bridge, 3)
    assert(rounds > 1, "the hidden star pair must force deepening")
    val r = got(res)
    assert(r === brute(cr, sr, bridge, 3))
    assert(r.head._1 === 200L && r.head._2 === 300L)
  }

  test("boundary ties: equal scores at the k-th place resolve by the " +
      "(custkey, suppkey) total order, never dropped by the bound") {
    import spark.implicits._
    // every pair scores identically — kth can never strictly beat the
    // bound, so the loop must run to full coverage and the tie-break
    // alone decides the top-k
    val cr = rel((0L until 300L).map(i => (i, "1000.00")), "custkey", "crev")
    val sr = rel((0L until 300L).map(i => (i, "2000.00")), "suppkey", "srev")
    val bridge = (0L until 300L).map(i => (i, (i + 7) % 300L))
      .toDF("custkey", "suppkey")
    val (res, rounds) = Relational.rankJoinCore(cr, sr, bridge, 10)
    assert(got(res) === brute(cr, sr, bridge, 10))
    assert(got(res).map(_._1) === (0L until 10L))
    assert(rounds >= 2, "an all-tied grid cannot bind before full coverage")
  }

  test("input contract: a ranked input past the dimension-size ceiling " +
      "THROWS loudly instead of shipping a driver-adjacent merge") {
    import spark.implicits._
    // the per-round orderBy().limit(c) slice — and the full-coverage
    // exit — are single-partition TakeOrdered merges bounded by the
    // ranked input; a fact-sized input must be rejected up front, never
    // silently planned (the fixpoint-cap contract: caps THROW)
    val cr = rel((0L until 50L).map(i => (i, "10.00")), "custkey", "crev")
    val sr = rel((0L until 50L).map(i => (i, "20.00")), "suppkey", "srev")
    val bridge = (0L until 50L).map(i => (i, i)).toDF("custkey", "suppkey")
    val e = intercept[IllegalArgumentException] {
      Relational.rankJoinCore(cr, sr, bridge, 5, maxRanked = 49L)
    }
    assert(e.getMessage.contains("dimension-sized"), e.getMessage)
    // and at the default ceiling the same inputs run to the exact top-k
    assert(got(Relational.rankJoinCore(cr, sr, bridge, 5)._1) ===
      brute(cr, sr, bridge, 5))
  }
}
