package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Coordinate-difference random-hyperplane blocking, shared by
  * dedup_embedding and sim_topk_lsh.
  *
  * Bit (l, b) of table l's bucket is sign(v[i] - v[j]) — a projection onto
  * the hyperplane (e_i - e_j)/√2. The (i, j) index pairs derive from a
  * splitmix64 stream at PLAN BUILD time, so the identical constants can be
  * baked into both the Spark plan and the DuckDB oracle SQL: both engines
  * block identically and the correctness gate stays hash-exact while the
  * plan remains a genuine sublinear candidate generator. Recall depends
  * only on (bits, tables, similarity): p = 1 - θ/π per bit, per-table
  * p^bits, union 1-(1-p^bits)^tables — measured by specs per operator.
  */
object RhpBlocking {

  private def mix(x: Long): Long = {
    var z = x + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** 1-based (i, j) coordinate pairs per table. */
  def indexPairs(tables: Int, bits: Int, dim: Int, seed: Long): Seq[Seq[(Int, Int)]] =
    (0 until tables).map { l =>
      (0 until bits).map { b =>
        val h = mix(seed * 0x632BE59BD9B4E019L + l * 64L + b)
        val i = ((h >>> 8) % dim).toInt.abs
        val j0 = ((h >>> 34) % (dim - 1)).toInt.abs
        val j = if (j0 >= i) j0 + 1 else j0
        (i + 1, j + 1)
      }
    }

  /** Spark bucket expression for one table's index pairs. */
  def bucketCol(vec: Column, tbl: Seq[(Int, Int)]): Column =
    tbl.zipWithIndex.map { case ((i, j), b) =>
      when(element_at(vec, i) > element_at(vec, j), lit(1 << b)).otherwise(lit(0))
    }.reduce(_ + _)

  /** The same buckets as DuckDB SQL over `alias.embedding`. */
  def bucketSqlExprs(alias: String, tables: Int, bits: Int, dim: Int,
      seed: Long): Seq[String] =
    indexPairs(tables, bits, dim, seed).map { tbl =>
      tbl.zipWithIndex.map { case ((i, j), b) =>
        s"(CASE WHEN $alias.embedding[$i] > $alias.embedding[$j] THEN ${1 << b} ELSE 0 END)"
      }.mkString(" + ")
    }
}
