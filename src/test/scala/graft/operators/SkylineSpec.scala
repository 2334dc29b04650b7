package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The groupwise-skyline sweep (q_part_skyline's skylineCore) against
  * the O(n²) NOT-EXISTS dominance definition evaluated on the driver —
  * the sweep is an algorithmic rewrite, so the spec pins the semantics
  * the rewrite must preserve: strict dominance in at least one
  * dimension, equal (price, size) twins both surviving, and per-brand
  * scoping (a dominating part of ANOTHER brand never eliminates).
  */
class SkylineSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark


  /** Brute-force dominance: q beats p iff same brand, q.price ≤ p.price,
    * q.size ≥ p.size, strict in at least one.
    */
  // (brand, key, price, size) rows
  private type P = (String, Long, Double, Int)

  private def reference(parts: Seq[P]): Seq[P] =
    parts.filter { case (b, _, pr, sz) =>
      !parts.exists { case (qb, _, qpr, qsz) => qb == b &&
        ((qpr < pr && qsz >= sz) || (qpr <= pr && qsz > sz)) }
    }.sortBy(t => (t._1, t._3, t._2))

  private def run(parts: Seq[P]): Seq[P] = {
    import spark.implicits._
    val df = parts.toDF("p_brand", "p_partkey", "p_retailprice", "p_size")
    Relational.skylineCore(df).as[(String, Long, Double, Int)]
      .collect().toSeq
  }

  test("random catalog matches the NOT-EXISTS definition") {
    val rnd = new scala.util.Random(7)
    val parts = (1L to 400L).map(k =>
      (s"B${rnd.nextInt(5)}", k,
        900.0 + rnd.nextInt(200) / 10.0, 1 + rnd.nextInt(50)))
    assert(run(parts) === reference(parts))
  }

  test("equal (price, size) twins both survive; a strict improvement " +
      "eliminates") {
    val parts = Seq[P](
      ("B1", 1, 10.0, 30), ("B1", 2, 10.0, 30), // twins: both skyline
      ("B1", 3, 10.0, 29), // dominated by the twins (same price, smaller)
      ("B1", 4, 9.0, 28), // cheaper but smaller: skyline, dominates nothing
      ("B1", 5, 11.0, 31), // bigger but dearer: skyline
      ("B1", 6, 9.5, 30)) // strictly cheaper at the twins' size: kills them
    val got = run(parts)
    assert(got.map(_._2).toSet === Set(4L, 5L, 6L))
    assert(got === reference(parts))
    // without the strict improver the twins BOTH survive
    val withoutImprover = parts.filterNot(_._2 == 6L)
    val got2 = run(withoutImprover)
    assert(got2.map(_._2).toSet === Set(1L, 2L, 4L, 5L))
    assert(got2 === reference(withoutImprover))
  }

  test("dominance never crosses brands") {
    val parts = Seq[P](
      ("B1", 1, 1.0, 50), // would dominate everything if brands pooled
      ("B2", 2, 99.0, 1))
    assert(run(parts).map(_._2).toSet === Set(1L, 2L))
  }
}
