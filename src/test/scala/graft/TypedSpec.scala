package graft

import org.scalatest.funsuite.AnyFunSuite

/** Typed facade gate: schema binding is total (every column decodes into
  * the case class) and values round-trip the untyped path.
  */
class TypedSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("every typed accessor decodes the full table") {
    assert(Typed.lineitem(spark, TestSpark.sfDir).count() ===
      Tables.lineitem(spark, TestSpark.sfDir).count())
    assert(Typed.orders(spark, TestSpark.sfDir).count() > 0)
    assert(Typed.customer(spark, TestSpark.sfDir).count() > 0)
    assert(Typed.documents(spark, TestSpark.sfDir).count() > 0)
    assert(Typed.embeddings(spark, TestSpark.sfDir).count() > 0)
    assert(Typed.events(spark, TestSpark.sfDir).count() > 0)
  }

  test("typed values round-trip the untyped reader") {
    val li = Typed.lineitem(spark, TestSpark.sfDir)
      .filter(_.l_orderkey == 1L).collect().sortBy(_.l_linenumber)
    val raw = Tables.lineitem(spark, TestSpark.sfDir)
      .filter(org.apache.spark.sql.functions.col("l_orderkey") === 1L)
      .orderBy("l_linenumber").collect()
    assert(li.length === raw.length && li.nonEmpty)
    assert(li.head.l_extendedprice === raw.head.getAs[Double]("l_extendedprice"))
    val e = Typed.embeddings(spark, TestSpark.sfDir).head()
    assert(e.embedding.length === 64)
  }
}
