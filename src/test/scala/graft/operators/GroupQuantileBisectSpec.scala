package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Semantic gate for [[Relational.groupQuantileBisectCore]] — the
  * grouped driver-coordinated bracket search under
  * q_group_quantile_bisect (which the DuckDB oracle grades end to end
  * on the shipped corpus). This spec drives the group shapes the corpus
  * never produces: a driver-side sorted reference over many groups with
  * colliding and negative values, single-value and single-row groups
  * (brackets closed at bootstrap), and the loud 64-group cap.
  */
class GroupQuantileBisectSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def ceilDiv(a: Long, b: Long) = (a + b - 1) / b

  /** kth-smallest per group by plain driver-side sort — the reference. */
  private def ref(data: Seq[(String, Long)]): Map[(String, String), Long] =
    data.groupBy(_._1).flatMap { case (g, rows) =>
      val sorted = rows.map(_._2).sorted
      val n = sorted.length.toLong
      Seq("p50" -> ceilDiv(n, 2), "p90" -> ceilDiv(9 * n, 10),
        "p99" -> ceilDiv(99 * n, 100)).map { case (p, k) =>
        (g, p) -> sorted((k - 1).toInt)
      }
    }

  private def run(data: Seq[(String, Long)])
      : Map[(String, String), (Long, Long, Long)] = {
    import spark.implicits._
    val got = Relational
      .groupQuantileBisectCore(data.toDF("grp", "v"))
      .collect()
      .map(r => (r.getString(1), r.getString(0)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    graft.GraftCaches.release(spark)
    got
  }

  test("matches the driver-side sorted reference across group shapes: " +
      "skewed sizes, duplicate values, negatives, a single-row group " +
      "and a single-VALUE group") {
    val rnd = new scala.util.Random(7)
    val data =
      (1 to 997).map(_ => ("big", (rnd.nextLong() % 100000L))) ++
        (1 to 40).map(_ => ("dups", (rnd.nextInt(5) + 1).toLong)) ++
        (1 to 13).map(i => ("small", (i * 7 - 40).toLong)) ++
        Seq(("onerow", 42L)) ++
        (1 to 9).map(_ => ("oneval", -3L))
    val expected = ref(data)
    val got = run(data)
    assert(got.keySet === expected.keySet)
    for (((g, p), (k, n, cents)) <- got) {
      assert(cents === expected((g, p)), s"group $g $p: kth-smallest")
      val sorted = data.filter(_._1 == g).map(_._2).sorted
      assert(n === sorted.length.toLong, s"group $g $p: n_rows")
      // the invariant the search maintains: count(≤hi) ≥ k > count(<hi)
      assert(sorted.count(_ <= cents) >= k && sorted.count(_ < cents) < k,
        s"group $g $p: bracket invariant")
    }
  }

  test("the 64-group probe-literal cap throws loudly and names the " +
      "distributed alternative") {
    import spark.implicits._
    val data = (0 until 65).flatMap(g =>
      Seq((s"g$g", 1L), (s"g$g", 2L)))
    val e = intercept[IllegalArgumentException] {
      Relational.groupQuantileBisectCore(data.toDF("grp", "v")).collect()
    }
    assert(e.getMessage.contains("groupedRowNumber"), e.getMessage)
    graft.GraftCaches.release(spark)
  }

  test("empty input returns the empty six-column shape") {
    import spark.implicits._
    val got = Relational.groupQuantileBisectCore(
      Seq.empty[(String, Long)].toDF("grp", "v"))
    assert(got.columns.toSeq ===
      Seq("pct", "grp", "k", "n_rows", "value_cents", "value"))
    assert(got.count() === 0L)
    graft.GraftCaches.release(spark)
  }
}
