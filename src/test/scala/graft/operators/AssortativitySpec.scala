package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Width-parity gate for graph_assortativity's size-conditional moment
  * path (SURVEY §2.2): the BIGINT and DECIMAL(38,0) accumulations must
  * produce the identical output rows wherever BIGINT is exact — the
  * switch may only ever change what a query COULD compute, never what
  * it does compute. The oracle gate grades each path cross-engine at
  * its own SF (sf0.01 → BIGINT, sf0.1 crosses
  * [[Relational.AssortativityBigintMaxEdges]] → DECIMAL); this spec
  * pins the two paths against each other on the commerce graph and on
  * a hub-skewed toy graph where the scatter terms are degree-heavy.
  */
class AssortativitySpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def both(edges: org.apache.spark.sql.DataFrame) = {
    val e = edges.persist()
    e.count()
    val a = Relational.assortativityFrom(e, useDecimal = false).collect()
    val b = Relational.assortativityFrom(e, useDecimal = true).collect()
    e.unpersist(blocking = true)
    (a.toSeq, b.toSeq)
  }

  test("BIGINT and DECIMAL moment paths agree bit-for-bit on the " +
      "commerce graph") {
    import spark.implicits._
    val cs = graft.Tables.orders(spark, TestSpark.sfDir)
      .select(col("o_orderkey"), col("o_custkey"))
      .join(graft.Tables.lineitem(spark, TestSpark.sfDir)
        .select(col("l_orderkey").as("o_orderkey"), col("l_suppkey")),
        Seq("o_orderkey"))
      .select((col("o_custkey") * 2).as("c"),
        (col("l_suppkey") * 2 + 1).as("s"))
      .distinct()
    val edges = cs.select(col("c").as("src"), col("s").as("dst"))
      .unionAll(cs.select(col("s").as("src"), col("c").as("dst")))
    val (a, b) = both(edges)
    assert(a === b)
    assert(a.head.getAs[Long]("n_edges") > 0)
  }

  test("BIGINT and DECIMAL moment paths agree on a hub-skewed star+ring " +
      "graph (degree-squared scatter dominates)") {
    import spark.implicits._
    // hub 0 touches every spoke; a ring among the spokes keeps the
    // degree distribution two-valued, the assortativity strongly
    // negative, and every moment exactly representable in both widths
    val n = 500L
    val star = (1L until n).flatMap(i => Seq((0L, i), (i, 0L)))
    val ring = (1L until n).flatMap { i =>
      val j = if (i == n - 1) 1L else i + 1; Seq((i, j), (j, i))
    }
    val edges = (star ++ ring).toDF("src", "dst")
    val (a, b) = both(edges)
    assert(a === b)
    assert(a.head.getAs[Double]("assortativity") < 0.0)
  }
}
