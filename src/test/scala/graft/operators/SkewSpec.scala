package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Salted-join gate: exact parity with the plain join on a deliberately
  * skewed key distribution, and the salt actually spreads the hot key.
  */
class SkewSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("salted join equals plain join on a skewed distribution") {
    import spark.implicits._
    // 90% of the big side hits one hot key, and half of those rows are
    // FULL duplicates (identical content) — the case content-only salting
    // would fail to spread
    val big = (0 until 20000)
      .map(i => (if (i % 10 < 9) 1L else (i % 100).toLong,
        if (i % 20 < 9) 777L else i.toLong))
      .toDF("k", "payload").repartition(8)
    val small = (0 until 100).map(i => (i.toLong, s"dim_$i")).toDF("k2", "name")

    val plain = big.join(small, big("k") === small("k2"))
      .select(col("payload"), col("name"))
    val salted = Skew.saltedJoin(big, small, "k", "k2", n = 8)
      .select(col("payload"), col("name"))

    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("salt spreads a hot key of FULLY IDENTICAL rows across all n salts") {
    import spark.implicits._
    // 8000 bit-identical rows — content hashing alone would yield 1 salt
    val big = (0 until 8000).map(_ => (1L, 777L)).toDF("k", "payload")
    val salts = big
      .withColumn("__salt", pmod(
        hash(col("k"), col("payload"), monotonically_increasing_id()), lit(8)))
      .select(col("__salt")).distinct().count()
    assert(salts === 8)
  }
}
