package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** pipeline_coreset (k-center greedy) against a driver-side replica of
  * the greedy loop using the identical cosine fold (GraftKernels'
  * accumulation order), on the real sf0.001 corpus — the oracle grades
  * the sf0.01/sf0.1 answer, this spec pins the algorithmic properties:
  * exact agreement with the sequential reference, the monotone cover
  * radius the greedy construction guarantees, and determinism.
  */
class CoresetSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  /** Same fold as GraftKernels.cosineF: double accumulators, index order. */
  private def cos(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Driver greedy k-center with pipelineCoreset's exact rule: seed at
    * min id; each step the (smax, id)-lexicographic minimum, smax
    * folded incrementally via max — the same doubles in the same order.
    */
  private def reference(vecs: Seq[(Long, Array[Float])],
      k: Int): Seq[(Long, Long, Option[Double])] = {
    val sorted = vecs.sortBy(_._1)
    val seed = sorted.head
    var smax = scala.collection.mutable.LinkedHashMap(
      sorted.tail.map { case (id, v) => id -> cos(v, seed._2) }: _*)
    val byId = vecs.toMap
    val out = scala.collection.mutable.ArrayBuffer[(Long, Long, Option[Double])](
      (1L, seed._1, None))
    for (step <- 2 to k) {
      val (bestId, bestS) = smax.toSeq.map { case (id, s) => (s, id) }
        .min match { case (s, id) => (id, s) }
      out += ((step.toLong, bestId, Some(bestS)))
      smax.remove(bestId)
      val bv = byId(bestId)
      smax = smax.map { case (id, s) => id -> math.max(s, cos(byId(id), bv)) }
    }
    out.toSeq
  }

  test("matches the sequential greedy reference on sf0.001") {
    import spark.implicits._
    val vecs = graft.Tables.embeddings(spark, dir)
      .select("vec_id", "embedding").as[(Long, Array[Float])]
      .collect().toSeq
    val want = reference(vecs, Similarity.CoresetK)
      .map { case (r, id, c) =>
        (r, id, c.map(x => BigDecimal(x).setScale(6,
          BigDecimal.RoundingMode.HALF_UP).toDouble))
      }
    val got = Similarity.pipelineCoreset(spark, dir)
      .as[(Long, Long, Option[Double])].collect().toSeq
    assert(got.map(t => (t._1, t._2)) === want.map(t => (t._1, t._2)))
    // cover values agree to the published 6dp rounding
    got.zip(want).foreach { case (g, w) =>
      assert(g._3.isDefined === w._3.isDefined)
      for (gv <- g._3; wv <- w._3) assert(math.abs(gv - wv) < 1e-6)
    }
  }

  test("cover radius is monotone non-decreasing (the greedy invariant)" +
      " and ids are distinct") {
    import spark.implicits._
    val got = Similarity.pipelineCoreset(spark, dir)
      .as[(Long, Long, Option[Double])].collect().toSeq
    assert(got.map(_._2).distinct.size === got.size)
    val covers = got.flatMap(_._3)
    assert(covers === covers.sorted)
    assert(got.head._3.isEmpty)
  }

  test("deterministic across runs") {
    import spark.implicits._
    val a = Similarity.pipelineCoreset(spark, dir)
      .as[(Long, Long, Option[Double])].collect().toSeq
    val b = Similarity.pipelineCoreset(spark, dir)
      .as[(Long, Long, Option[Double])].collect().toSeq
    assert(a === b)
  }
}
