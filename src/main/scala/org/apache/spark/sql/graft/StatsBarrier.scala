package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.classic.Dataset
import org.apache.spark.sql.execution.LogicalRDD

/** Origin-stats stripping for round barriers — internal-tree glue
  * (`Dataset.ofRows` and `LogicalRDD`'s session-curried constructor are
  * `private[sql]`).
  *
  * Why this exists: `Dataset.localCheckpoint` (Spark 3.4+) propagates
  * the ORIGIN plan's Catalyst statistics into the checkpointed
  * LogicalRDD. Inside an iterative loop whose per-round plan references
  * the previous round's barrier k ≥ 2 times (the connected-components
  * pointer-jump round joins its own intermediate relation twice), the
  * size-only stats visitor multiplies those inherited sizeInBytes
  * values — so the estimate compounds DOUBLY exponentially across
  * rounds: bits(round r) ≈ k^r · 63. By round ~12 of the r11
  * large-regime drill the driver was spending MINUTES per round inside
  * `BigInteger.multiplyToomCook3` computing a size estimate with ~10⁹
  * bits. The barrier's contract is an OPAQUE materialized relation;
  * stats have no business flowing through it (the repo's iterative
  * loops pick their join strategies explicitly — broadcast()/
  * repartition() hints — precisely so planner estimates never decide a
  * round's shape).
  *
  * [[strip]] rebuilds the checkpointed Dataset as a bare LogicalRDD
  * over the SAME internal-row RDD — same attributes, same partitioning
  * and ordering (so co-partitioned consumers keep avoiding shuffles) —
  * with `originStats = None` / `originConstraints = None`: downstream
  * estimates fall back to the session default leaf size, bounded
  * forever.
  */
object StatsBarrier {
  def strip(df: DataFrame): DataFrame = {
    val ds = df.asInstanceOf[Dataset[_]]
    val spark = ds.sparkSession
    ds.queryExecution.optimizedPlan match {
      case lr: LogicalRDD =>
        Dataset.ofRows(spark,
          LogicalRDD(lr.output, lr.rdd, lr.outputPartitioning,
            lr.outputOrdering, lr.isStreaming, lr.stream)(spark))
      case _ => df // not a checkpoint-backed plan: nothing to strip
    }
  }
}
