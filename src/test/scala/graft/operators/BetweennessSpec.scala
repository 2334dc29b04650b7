package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Semantic gate for graph_betweenness (SURVEY §2.2): the distributed
  * forward/backward passes must reproduce a driver-side brute-force
  * Brandes (the textbook algorithm, literally transcribed) from the
  * same 8-smallest-vertex source set — on a path (where interior
  * vertices dominate), a star (where the hub takes everything), and a
  * deterministic random graph. The oracle gate proves cross-engine
  * equality of the SAME formulation; this proves the formulation.
  */
class BetweennessSpec extends AnyFunSuite {

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

  private def check(undirected: Seq[(Long, Long)]): Unit = {
    import spark.implicits._
    val sym = undirected.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val vs = sym.map(_._1).distinct.sorted
    val roots = vs.take(8)
    val expected = brandes(sym, roots)
    val got = Relational
      .betweennessCore(spark, sym.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.keySet === vs.toSet)
    for (v <- vs) {
      val e = expected.getOrElse(v, 0.0)
      assert(math.abs(got(v) - e) <= 2e-6,
        s"vertex $v: distributed ${got(v)} vs brute-force $e")
    }
    GraftCaches.release(spark)
  }
  private def GraftCaches = graft.GraftCaches

  test("path graph: interior brokerage matches brute-force Brandes") {
    check((0L until 9L).map(i => (i, i + 1)))
  }

  test("star graph: the hub takes all brokerage, spokes none") {
    check((1L to 12L).map(i => (0L, i)))
  }

  test("deterministic random graph with multiple shortest paths " +
      "(sigma > 1) matches brute-force Brandes") {
    // LCG-derived edge list over 40 vertices — dense enough that many
    // pairs have several equal-length paths, exercising the sigma
    // ratios, plus a pendant chain for depth
    var x = 12345L
    def nxt(): Long = { x = (x * 1103515245L + 12345L) % 2147483648L; x }
    val rnd = (1 to 120).map { _ => (nxt() % 40, nxt() % 40) }
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .distinct
    val chain = Seq((40L, 41L), (41L, 42L), (42L, 43L), (0L, 40L))
    check(rnd ++ chain)
  }

  test("fold-width guard: a hub past the δ-fold ceiling THROWS loudly " +
      "instead of building a degree-sized row") {
    import spark.implicits._
    // two-level star: root → hub → 12 leaves. From the leaf side of the
    // BFS the hub's backward δ fold folds all 12 successors in one row —
    // past a test ceiling of 8 the guard must fire (in production the
    // ceiling is BrandesMaxFoldWidth; same code path)
    val sym = ((1L to 12L).map(i => (0L, i)) ++ Seq((13L, 0L)))
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val e = intercept[Exception] {
      Relational.betweennessCore(spark, sym.toDF("src", "dst"),
        maxFold = 8L).collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(c =>
      Option(c.getMessage).exists(_.contains("fold width past 8"))),
      s"expected the δ fold-width guard, got: $e")
    GraftCaches.release(spark)
  }
}
