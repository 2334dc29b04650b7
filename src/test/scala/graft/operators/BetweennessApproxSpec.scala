package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Semantic gate for betweennessApproxCore — the pivot-sampled
  * approximate BC the BrandesMaxFoldWidth guard recommends (SURVEY
  * §2.2, r13 verdict #5). Sampling changes the graded definition, so
  * this operator is test-gated and must NEVER share
  * graph_betweenness's oracle; the gates here are the estimator's own
  * closed forms:
  *
  *  - k = |V| (every vertex a pivot, scale |V|/k = 1): the estimate IS
  *    exact all-sources Brandes BC — checked against the textbook
  *    driver-side algorithm on a path, a star, and a dense random
  *    graph with multiplicitous shortest paths.
  *  - k < |V|: the estimate equals (|V|/k) · (exact Brandes restricted
  *    to the pivot set the core deterministically selects by xxhash64
  *    order) — checking both the sampling rule and the scale factor.
  *  - The hub configuration where the EXACT core's fold-width guard
  *    throws runs to completion here (plain unordered δ sums — no
  *    degree-sized row exists to cap) and still lands the exact value
  *    at k = |V|.
  */
class BetweennessApproxSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  /** Textbook Brandes (2001) restricted to `roots` as sources. */
  private def brandes(edges: Seq[(Long, Long)], roots: Seq[Long])
      : Map[Long, Double] = {
    val adj = edges.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    val bc = mutable.Map[Long, Double]().withDefaultValue(0.0)
    for (s <- roots) {
      val dist = mutable.Map[Long, Int]()
      val sigma = mutable.Map[Long, Double]().withDefaultValue(0.0)
      val preds = mutable.Map[Long, mutable.Buffer[Long]]()
      val stack = mutable.Buffer[Long]()
      dist(s) = 0; sigma(s) = 1.0
      val q = mutable.Queue(s)
      while (q.nonEmpty) {
        val v = q.dequeue(); stack += v
        for (w <- adj.getOrElse(v, Nil)) {
          if (!dist.contains(w)) { dist(w) = dist(v) + 1; q.enqueue(w) }
          if (dist(w) == dist(v) + 1) {
            sigma(w) += sigma(v)
            preds.getOrElseUpdate(w, mutable.Buffer()) += v
          }
        }
      }
      val delta = mutable.Map[Long, Double]().withDefaultValue(0.0)
      for (w <- stack.reverse; v <- preds.getOrElse(w, Nil))
        delta(v) += sigma(v) / sigma(w) * (1.0 + delta(w))
      for (v <- stack if v != s) bc(v) += delta(v)
    }
    bc.toMap
  }

  private def run(sym: Seq[(Long, Long)], nPivots: Int)
      : Map[Long, Double] = {
    import spark.implicits._
    val got = Relational
      .betweennessApproxCore(spark, sym.toDF("src", "dst"), nPivots)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    graft.GraftCaches.release(spark)
    got
  }

  private def checkAllPivots(undirected: Seq[(Long, Long)]): Unit = {
    val sym = undirected.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val vs = sym.map(_._1).distinct.sorted
    val expected = brandes(sym, vs) // every vertex a source: exact BC
    val got = run(sym, nPivots = vs.size)
    assert(got.keySet === vs.toSet)
    for (v <- vs) {
      val e = expected.getOrElse(v, 0.0)
      assert(math.abs(got(v) - e) <= 2e-6,
        s"vertex $v: approx(k=|V|) ${got(v)} vs exact all-sources $e")
    }
  }

  test("k = |V|: estimate equals exact all-sources Brandes on a path") {
    checkAllPivots((0L until 9L).map(i => (i, i + 1)))
  }

  test("k = |V|: estimate equals exact all-sources Brandes on a dense " +
      "random graph with multiplicitous shortest paths") {
    var x = 12345L
    def nxt(): Long = { x = (x * 1103515245L + 12345L) % 2147483648L; x }
    val rnd = (1 to 120).map { _ => (nxt() % 40, nxt() % 40) }
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .distinct
    val chain = Seq((40L, 41L), (41L, 42L), (42L, 43L), (0L, 40L))
    checkAllPivots(rnd ++ chain)
  }

  test("k < |V|: estimate = (|V|/k) x exact Brandes restricted to the " +
      "deterministic xxhash64-order pivot set") {
    import spark.implicits._
    // diameter stays under BetweennessMaxLevel (the forward-pass horizon
    // both cores inherit): the restricted brute force explores fully, so
    // the graph must too for the closed-form equality to hold
    val sym = (0L until 11L).map(i => (i, i + 1))
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val vs = sym.map(_._1).distinct.sorted
    val k = 5
    // recompute the pivot rule with the engine's own hash — the spec
    // pins the sampling contract, not a reimplementation of the hash
    val pivots = vs.toDF("v")
      .select(col("v"), xxhash64(col("v")).as("h"))
      .orderBy(col("h"), col("v")).limit(k)
      .collect().map(_.getLong(0)).toSeq
    assert(pivots.size === k)
    val scale = vs.size.toDouble / k
    val expected = brandes(sym, pivots)
    val got = run(sym, nPivots = k)
    assert(got.keySet === vs.toSet)
    for (v <- vs) {
      val e = expected.getOrElse(v, 0.0) * scale
      assert(math.abs(got(v) - e) <= 2e-6,
        s"vertex $v: approx(k=$k) ${got(v)} vs scaled restricted $e")
    }
    // the sampling is deterministic: a second run is value-identical
    assert(run(sym, nPivots = k) === got)
  }

  test("pure-sink vertices are in the output domain with centrality 0 " +
      "(src ∪ dst vertex relation — r14 verdict #5)") {
    import spark.implicits._
    // DIRECTED path 0→1→2→3: vertex 3 has no out-edges, so a src-only
    // vertex relation would drop it — but the exact operator's domain
    // includes every endpoint, and a caller swapping exact → approx at
    // the fold cap must not see the relation narrow
    val dir = Seq((0L, 1L), (1L, 2L), (2L, 3L))
    val got = Relational
      .betweennessApproxCore(spark, dir.toDF("src", "dst"), nPivots = 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    graft.GraftCaches.release(spark)
    assert(got.keySet === Set(0L, 1L, 2L, 3L))
    // k = |V| = 4 (a sink pivot seeds an empty tree and still counts),
    // so the estimate IS exact: interior vertices broker 2 paths each
    val expected = brandes(dir, Seq(0L, 1L, 2L, 3L))
    for (v <- got.keySet)
      assert(math.abs(got(v) - expected.getOrElse(v, 0.0)) <= 2e-6,
        s"vertex $v: ${got(v)} vs ${expected.getOrElse(v, 0.0)}")
    assert(got(3L) === 0.0)
  }

  test("the hub the EXACT core refuses (fold-width guard) runs to " +
      "completion and lands the exact value at k = |V|") {
    import spark.implicits._
    // the BetweennessSpec guard graph: root -> hub -> 12 leaves; the
    // exact core with maxFold = 8 throws on the hub's 12-wide fold
    val sym = ((1L to 12L).map(i => (0L, i)) ++ Seq((13L, 0L)))
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }
    intercept[Exception] {
      Relational.betweennessCore(spark, sym.toDF("src", "dst"),
        maxFold = 8L).collect()
    }
    graft.GraftCaches.release(spark)
    checkAllPivots((1L to 12L).map(i => (0L, i)) ++ Seq((13L, 0L)))
  }
}
