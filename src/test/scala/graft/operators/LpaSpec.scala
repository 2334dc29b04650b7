package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** lpaCore on synthetic graphs — community convergence on disjoint
  * cliques, the self-vote's oscillation damping on a bipartite graph,
  * and the co-partitioned join branch — against a driver-side reference
  * of the same all-integer vote. The commerce-graph operator itself is
  * oracle-gated (graph_label_propagation); this spec guards behaviors
  * the single connected commerce graph cannot exercise.
  */
class LpaSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  /** The reference loop: plain Scala, same argmax (count desc, label
    * asc) over neighbor labels + self.
    */
  private def reference(edges: Seq[(Long, Long)], rounds: Int): Map[Long, Long] = {
    val vs = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    var lbl = vs.map(v => v -> v).toMap
    for (_ <- 1 to rounds) {
      lbl = vs.map { v =>
        val votes = edges.collect { case (u, d) if d == v => lbl(u) } :+ lbl(v)
        val best = votes.groupBy(identity).view.mapValues(_.length).toSeq
          .minBy { case (l, c) => (-c, l) }._1
        v -> best
      }.toMap
    }
    lbl
  }

  private def run(edges: Seq[(Long, Long)], rounds: Int,
      broadcastMax: Long): Map[Long, Long] = {
    import spark.implicits._
    Relational.lpaCore(edges.toDF("src", "dst"), rounds,
        broadcastMaxVertices = broadcastMax)
      .as[(Long, Long)].collect().toMap
  }

  private def sym(e: Seq[(Long, Long)]): Seq[(Long, Long)] =
    e ++ e.map(_.swap)

  test("two disjoint cliques converge to one community each (the min id)") {
    // cliques {0,1,2} and {10,11,12,13}, symmetric edges
    val k3 = for (a <- 0L to 2L; b <- 0L to 2L if a < b) yield (a, b)
    val k4 = for (a <- 10L to 13L; b <- 10L to 13L if a < b) yield (a, b)
    val edges = sym(k3 ++ k4)
    val got = run(edges, rounds = 4, broadcastMax = 2000000L)
    assert(got === reference(edges, 4))
    // each clique collapses onto its smallest member's label, and the
    // two communities never bleed into each other
    assert(got.view.filterKeys(_ <= 2L).values.toSet === Set(0L))
    assert(got.view.filterKeys(_ >= 10L).values.toSet === Set(10L))
  }

  test("bipartite graph: the self-vote damps the two-coloring oscillation") {
    // C4 cycle 0-1-2-3-0 (bipartite {0,2} vs {1,3}): pure-neighbor
    // synchronous LPA flips colors forever; with the self-vote the label
    // set must be stable across consecutive rounds once converged
    val edges = sym(Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L)))
    val r3 = run(edges, rounds = 3, broadcastMax = 2000000L)
    val r4 = run(edges, rounds = 4, broadcastMax = 2000000L)
    assert(r3 === reference(edges, 3))
    assert(r4 === reference(edges, 4))
    assert(r3 === r4, "labels still oscillating after convergence")
    assert(r4.values.toSet.size === 1, "C4 is one community")
  }

  test("co-partitioned branch (labels above broadcast cap) is bit-identical") {
    val edges = sym(Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L), (1L, 3L)))
    val expected = run(edges, rounds = 4, broadcastMax = 2000000L)
    // broadcastMax = 0 forces the repartition(v) regime
    assert(run(edges, rounds = 4, broadcastMax = 0L) === expected)
  }

  test("directed edge list: a src-only vertex keeps exactly its self-vote") {
    // 5 → {6, 7} with no return edges: 5 has no in-edges, so its vote
    // set is only itself; 6 and 7 each see {5, self} → tie → min label 5
    val edges = Seq((5L, 6L), (5L, 7L))
    val got = run(edges, rounds = 2, broadcastMax = 2000000L)
    assert(got === reference(edges, 2))
    assert(got(5L) === 5L)
    assert(got(6L) === 5L && got(7L) === 5L)
  }
}
