package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation (SURVEY §4): explicit key salting for joins whose hot
  * keys overwhelm a single reducer.
  *
  * AQE's skew-join split handles most cases at runtime; explicit salting
  * remains the tool when (a) AQE can't split (e.g. the skewed side feeds a
  * window/aggregation pinned to the key) or (b) the skew is known ahead of
  * time and the replication factor should be chosen deliberately.
  *
  * Shape: the big side gets a uniform random-ish salt in [0, n) derived
  * deterministically from row content (never `rand()` — retries/speculative
  * tasks must agree); the small side is replicated n× with a generated
  * salt column; the join key becomes (key, salt). Each hot key now spreads
  * over n reducers; result is EXACTLY the plain join's.
  */
object Skew {

  /** Per-row salt in [0, n): hash of the row's columns MIXED with the
    * row's position (monotonically_increasing_id), so fully duplicate rows
    * of a hot key still spread across all n salts — content-only hashing
    * would give every identical copy the same salt and defeat the
    * mitigation exactly in its target scenario (mass-duplicate hot keys).
    * Join correctness never depends on WHICH salt a row gets (the small
    * side is replicated across all of them), so positional mixing is safe;
    * within one execution each row reads one consistent salt.
    */
  private def rowSalt(df: DataFrame, n: Int): Column =
    pmod(hash((df.columns.map(col).toIndexedSeq :+ monotonically_increasing_id()): _*), lit(n))

  /** Equi-join `big ⋈ small` on big(key)=small(key), salted n ways. */
  def saltedJoin(big: DataFrame, small: DataFrame, bigKey: String,
      smallKey: String, n: Int): DataFrame = {
    val saltedBig = big.withColumn("__salt", rowSalt(big, n))
    val saltedSmall = small
      .withColumn("__salt", explode(sequence(lit(0), lit(n - 1))))
    saltedBig.join(saltedSmall,
        saltedBig(bigKey) === saltedSmall(smallKey) &&
          saltedBig("__salt") === saltedSmall("__salt"))
      .drop("__salt")
  }
}
