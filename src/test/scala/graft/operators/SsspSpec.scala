package graft.operators

import scala.collection.mutable

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Semantic gate for graph_weighted_sssp (SURVEY §2.2): the frontier
  * Bellman-Ford must reproduce a driver-side textbook relaxation with
  * the SAME bounded horizon (distances = exact minima over ≤ R-edge
  * paths) — including the case where a cheap many-hop path must
  * RE-IMPROVE a vertex already settled by an expensive direct edge,
  * and the case where the horizon binds (a shorter-cost path exists
  * only beyond R edges and must NOT be found). The oracle gate proves
  * cross-engine equality; this proves the formulation.
  */
class SsspSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  /** Textbook R-round Bellman-Ford from the `nSeeds` smallest even
    * vertices over a directed weighted edge list. */
  private def bellmanFord(edges: Seq[(Long, Long, Long)], nSeeds: Int,
      rounds: Int): Map[Long, Long] = {
    val seeds = edges.map(_._1).filter(_ % 2 == 0).distinct.sorted
      .take(nSeeds)
    var dist = mutable.Map[Long, Long](seeds.map(_ -> 0L): _*)
    for (_ <- 1 to rounds) {
      val next = dist.clone()
      for ((u, v, w) <- edges; du <- dist.get(u))
        if (!next.contains(v) || du + w < next(v)) next(v) = du + w
      dist = next
    }
    dist.toMap
  }

  private def check(undirected: Seq[(Long, Long, Long)],
      rounds: Int = Relational.SsspMaxRounds): Unit = {
    import spark.implicits._
    val sym = undirected.flatMap { case (a, b, w) =>
      Seq((a, b, w), (b, a, w)) }
    val expected = bellmanFord(sym, nSeeds = 3, rounds = rounds)
    val got = Relational
      .ssspCore(sym.toDF("src", "dst", "w"), nSeeds = 3,
        maxRounds = rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === expected)
    graft.GraftCaches.release(spark)
  }

  test("re-improvement: a cheap 3-hop chain beats the settled direct " +
      "edge and the frontier pass must propagate the correction") {
    // seed 0; direct 0→5 costs 100, but 0→1→2→5 costs 3
    check(Seq((0L, 5L, 100L), (0L, 1L, 1L), (1L, 2L, 1L), (2L, 5L, 1L),
      (5L, 7L, 1L)))
  }

  test("bounded horizon: a cheaper path that needs more than R edges " +
      "is NOT found — both the loop and the reference stop at R") {
    // long cheap chain 0→10→11→...→19→9 (11 edges of weight 1) vs the
    // direct edge 0→9 of weight 50: at R=8 the chain is out of reach
    // and dist(9) must stay 50; at R=12 it must drop to 11
    val chain = (0 until 10).map(i =>
      (if (i == 0) 0L else 9L + i, 10L + i, 1L)) :+ (19L, 9L, 1L)
    val g = chain ++ Seq((0L, 9L, 50L))
    check(g, rounds = 8)
    check(g, rounds = 12)
  }

  test("deterministic random weighted graph matches textbook " +
      "Bellman-Ford under the shared horizon") {
    var x = 98765L
    def nxt(): Long = { x = (x * 1103515245L + 12345L) % 2147483648L; x }
    val rnd = (1 to 150).map { _ => (nxt() % 30, nxt() % 30, nxt() % 20 + 1) }
      .filter { case (a, b, _) => a != b }
      .map { case (a, b, w) => (math.min(a, b), math.max(a, b), w) }
      .groupBy { case (a, b, _) => (a, b) }
      .map { case (_, es) => es.minBy(_._3) }.toSeq
    check(rnd)
  }
}
