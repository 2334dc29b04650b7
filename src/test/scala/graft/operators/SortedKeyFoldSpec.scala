package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftFunctions

/** [[org.apache.spark.sql.graft.SortedKeyFold]] (r17): the primitive
  * sorted-fold aggregate must be BIT-identical to the expression chain
  * it replaced on the graph_betweenness hot path —
  * aggregate(sort_array(collect_list(struct(key, term))), 0.0,
  * (acc, x) -> acc + x.term) — because the backward δ accumulation's
  * float addition order decides bits the oracle hashes.
  */
class SortedKeyFoldSpec extends AnyFunSuite {
  private lazy val spark = graft.GraftSession.build(4)
  import spark.implicits._

  private def chain(df: org.apache.spark.sql.DataFrame) = df
    .select(col("g"), struct(col("k"), col("t")).as("st"))
    .groupBy(col("g"))
    .agg(sort_array(collect_list(col("st"))).as("lst"))
    .select(col("g"),
      aggregate(col("lst"), lit(0.0), (acc, x) => acc + x.getField("t"))
        .as("s"))

  private def kfold(df: org.apache.spark.sql.DataFrame) = df
    .groupBy(col("g"))
    .agg(GraftFunctions.sortedKeyFold(col("k"), col("t"), 1000000L, "spec")
      .as("s"))

  private def assertBitEqual(rows: Seq[(Long, Long, Double)]): Unit = {
    val df = rows.toDF("g", "k", "t").repartition(7)
    val a = chain(df).collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val b = kfold(df).collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(a.keySet === b.keySet)
    for ((g, v) <- a)
      assert(java.lang.Double.doubleToRawLongBits(v) ===
        java.lang.Double.doubleToRawLongBits(b(g)),
        s"group $g: chain=$v kfold=${b(g)}")
  }

  test("bit-identical to sort_array+HOF fold on adversarial floats " +
    "(catastrophic cancellation makes any reorder visible)") {
    val rnd = new scala.util.Random(42)
    val rows = (1 to 5000).map { i =>
      // mixed magnitudes so addition order matters: 1e16 + 1 - 1e16 ≠ 1
      val mag = math.pow(10, rnd.nextInt(16)).toLong
      (i % 17L, rnd.nextLong() % 1000000L,
        (rnd.nextDouble() - 0.5) * mag)
    }
    assertBitEqual(rows)
  }

  test("duplicate keys tie-break on the term like the struct sort") {
    val rows = Seq[(Long, Long, Double)](
      (1L, 5L, 3.25), (1L, 5L, -1.5), (1L, 5L, 3.25), (1L, 2L, 1e15),
      (1L, 2L, -1e15), (1L, 2L, 1.0), (2L, 0L, -0.0), (2L, 0L, 0.0),
      (2L, Long.MinValue, 2.5), (2L, Long.MaxValue, -2.5))
    assertBitEqual(rows)
  }

  test("single-element and empty-ish groups") {
    assertBitEqual(Seq((1L, 7L, 42.0), (2L, -3L, -7.5)))
  }

  test("width cap throws the caller's message during accumulation") {
    val df = (1 to 100).map(i => (1L, i.toLong, 1.0)).toDF("g", "k", "t")
    val e = intercept[Exception] {
      df.groupBy(col("g"))
        .agg(GraftFunctions.sortedKeyFold(col("k"), col("t"), 10L,
          "spec cap message").as("s"))
        .collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(m => m.contains("spec cap message") &&
      m.contains("past 10")))
  }
}
