package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** pagerankCore on a GENERAL directed graph — sinks (dangling nodes),
  * sources, and the co-partitioned join branch — against a driver-side
  * reference implementation of the same exact integer arithmetic. The
  * commerce-graph operator itself is oracle-gated (graph_pagerank); this
  * spec guards the generality the symmetric graph cannot exercise.
  */
class PagerankSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  // directed graph with a SINK (4: in-edges only) and a SOURCE (0: no
  // in-edges): 0→1, 0→2, 1→2, 2→3, 3→4, 1→4
  private val edgeList = Seq((0L, 1L), (0L, 2L), (1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L))

  /** The reference loop: plain Scala, same millionths/floor-div terms. */
  private def reference(edges: Seq[(Long, Long)], rounds: Int): Map[Long, Long] = {
    val vs = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = vs.length
    val outdeg = edges.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    var s = vs.map(_ -> 1000000L).toMap
    for (_ <- 1 to rounds) {
      val dm = vs.filterNot(outdeg.contains).map(s).sum
      val recv = edges.groupBy(_._2).view.mapValues(_.map { case (src, _) =>
        (85L * s(src)) / (100L * outdeg(src))
      }.sum).toMap
      s = vs.map(v => v ->
        (150000L + recv.getOrElse(v, 0L) + (85L * dm) / (100L * n))).toMap
    }
    s
  }

  private def run(broadcastMax: Long): Map[Long, Long] = {
    import spark.implicits._
    val edges0 = edgeList.toDF("src", "dst")
    Relational.pagerankCore(edges0, rounds = 10,
        broadcastMaxVertices = broadcastMax)
      .as[(Long, Long)].collect().toMap
  }

  test("directed graph with sink + source matches the reference arithmetic") {
    val expected = reference(edgeList, 10)
    val got = run(broadcastMax = Relational.PagerankBroadcastMaxVertices)
    assert(got === expected)
    // the source keeps receiving teleport + dangling share (it must not
    // vanish after round 1), and the sink's mass visibly redistributes
    assert(got.contains(0L) && got.contains(4L))
    assert(got(0L) > 150000L) // teleport + nonzero dangling share
  }

  test("co-partitioned branch (scores above broadcast cap) is bit-identical") {
    val expected = reference(edgeList, 10)
    // broadcastMax = 0 forces the repartition(v) regime
    assert(run(broadcastMax = 0L) === expected)
  }

  test("no-dangling graph keeps total mass exactly conserved per round") {
    import spark.implicits._
    // a 3-cycle: every node outdeg 1, no sinks — the dangling branch
    // compiles away and floor division loses nothing (outdeg = 1)
    val cyc = Seq((0L, 1L), (1L, 2L), (2L, 0L)).toDF("src", "dst")
    val got = Relational.pagerankCore(cyc, rounds = 10)
      .as[(Long, Long)].collect().toMap
    // symmetric start + symmetric structure → all equal, mass preserved:
    // 150000 + (85 * 1000000) div 100 = 1000000 each, a fixpoint
    assert(got === Map(0L -> 1000000L, 1L -> 1000000L, 2L -> 1000000L))
  }
}
