package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** Sketch gate: approximate distinct counts (HLL++) land within the
  * configured error bound of the exact answer on the real events table —
  * the constant-memory path for cardinality at 100 TB, where an exact
  * distinct forces a full shuffle of every key.
  */
class SketchSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("approx_count_distinct within rsd bound of exact, per group and global") {
    val e = Tables.events(spark, TestSpark.sfDir)
    val merged = e.groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id"), rsd = 0.02).as("approx"),
        count_distinct(col("user_id")).as("exact"))
      .collect()
    assert(merged.nonEmpty)
    merged.foreach { r =>
      val approx = r.getAs[Long]("approx").toDouble
      val exact = r.getAs[Long]("exact").toDouble
      assert(math.abs(approx - exact) / exact <= 0.06,
        s"${r.getString(0)}: approx $approx vs exact $exact")
    }

    val global = e.agg(
      approx_count_distinct(col("event_id"), rsd = 0.02).as("approx"),
      count_distinct(col("event_id")).as("exact")).head()
    val (a, x) = (global.getLong(0).toDouble, global.getLong(1).toDouble)
    assert(math.abs(a - x) / x <= 0.06, s"global: $a vs $x")
  }

  test("approx_percentile within rank tolerance of exact quantiles") {
    // sketch_quantiles: the constant-memory quantile path — an exact
    // percentile sorts every group; approx_percentile keeps a bounded
    // summary with a RANK error guarantee (±1/accuracy of the position,
    // not of the value), so the assertion checks rank displacement.
    val e = Tables.events(spark, TestSpark.sfDir)
    val accuracy = 1000 // rank error <= n/accuracy
    val rows = e.groupBy(col("event_type"))
      .agg(
        expr(s"approx_percentile(value, array(0.5, 0.95), $accuracy)").as("ap"),
        count(lit(1)).as("n"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val et = r.getString(0)
      val Seq(p50a, p95a) = r.getSeq[Double](1).toSeq
      val n = r.getAs[Long]("n")
      // rank of the approximate answer in the exact sorted data
      def rankOf(v: Double): Long =
        e.filter(col("event_type") === et && col("value") <= v).count()
      val tol = math.max(2L * n / accuracy, 2L)
      assert(math.abs(rankOf(p50a) - (n * 0.50).toLong) <= tol,
        s"$et p50 rank off by more than $tol of $n")
      assert(math.abs(rankOf(p95a) - (n * 0.95).toLong) <= tol,
        s"$et p95 rank off by more than $tol of $n")
    }
  }

  test("misra_gries: lower-bound estimates within n/k of exact; every item " +
      "above n/k frequency surfaces; guarantee survives any partitioning") {
    import graft.functions.GraftFunctions
    // a genuinely heavy-tailed stream: document tokens (vocabulary far
    // larger than the k-1 counters, so decrements really happen)
    val toks = Tables.documents(spark, TestSpark.sfDir)
      .select(explode(split(col("text"), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
    val exact = toks.groupBy(col("tok")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    val k = 20
    for (parts <- Seq(3, 17)) {
      val mg = toks.repartition(parts)
        .agg(GraftFunctions.misraGries(col("tok"), k).as("hh"))
        .selectExpr("inline(hh)")
        .collect().map(r => r.getString(0) -> r.getLong(1))
      assert(mg.nonEmpty && mg.length <= k - 1)
      // guarantee 1: estimates are lower bounds, short by at most n/k
      mg.foreach { case (item, est) =>
        val t = exact(item)
        assert(est <= t, s"$item: est $est above true $t")
        assert(t - est <= n / k, s"$item: est $est short of $t by > n/$k")
      }
      // guarantee 2: anything with true frequency > n/k must be present
      val kept = mg.map(_._1).toSet
      exact.filter(_._2 > n / k).keys.foreach { hot =>
        assert(kept.contains(hot), s"heavy item $hot missing (parts=$parts)")
      }
    }
    // SQL surface reaches the same aggregate
    Tables.documents(spark, TestSpark.sfDir).createOrReplaceTempView("mg_docs")
    val viaSql = spark.sql(
      s"""SELECT inline(graft_misra_gries(tok, $k)) FROM (
            SELECT explode(split(text, ' ')) AS tok FROM mg_docs) t
          WHERE length(tok) > 0""").collect()
    assert(viaSql.nonEmpty && viaSql.length <= k - 1)
    viaSql.foreach { r =>
      val (item, est) = (r.getString(0), r.getLong(1))
      assert(est <= exact(item) && exact(item) - est <= n / k)
    }
  }

  test("count_min: estimates never below true counts, merged sketch is " +
      "bit-identical under any partitioning, SQL surface agrees") {
    import graft.functions.GraftFunctions
    import org.apache.spark.sql.graft.CMSketch
    val toks = Tables.documents(spark, TestSpark.sfDir)
      .select(explode(split(col("text"), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
    val exact = toks.groupBy(col("tok")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    val (depth, width) = (4, 64)

    def sketchOf(parts: Int): Vector[Vector[Long]] =
      toks.repartition(parts)
        .agg(GraftFunctions.countMin(col("tok"), depth, width).as("cm"))
        .head().getSeq[scala.collection.Seq[Long]](0)
        .map(_.toVector).toVector

    val base = sketchOf(1)
    assert(base.length == depth && base.forall(_.length == width))
    // total mass per row = n: every update lands exactly once per row
    base.foreach(row => assert(row.sum == n))
    exact.foreach { case (item, t) =>
      val est = CMSketch.estimate(base, item)
      // the CMS guarantee: overestimate only...
      assert(est >= t, s"$item: est $est BELOW true $t")
      // ...and the excess is bounded by the colliding mass of one row
      // (deterministic on this fixed corpus; e·n/width is the
      // probabilistic form)
      assert(est - t <= 3 * n / width,
        s"$item: est $est exceeds true $t by > 3n/width")
    }
    // elementwise-add merge: the sketch is a linear function of the
    // multiset, so ANY partitioning yields the same matrix bit-for-bit
    for (parts <- Seq(7, 32)) {
      assert(sketchOf(parts) == base, s"sketch diverged at parts=$parts")
    }
    // SQL surface reaches the same aggregate
    Tables.documents(spark, TestSpark.sfDir).createOrReplaceTempView("cm_docs")
    val viaSql = spark.sql(
      s"""SELECT graft_count_min(tok, $depth, $width) FROM (
            SELECT explode(split(text, ' ')) AS tok FROM cm_docs) t
          WHERE length(tok) > 0""").head()
      .getSeq[scala.collection.Seq[Long]](0).map(_.toVector).toVector
    assert(viaSql == base)
  }
}
