package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, JoinedRow, UnsafeProjection}
import org.apache.spark.sql.catalyst.types.DataTypeUtils
import org.apache.spark.sql.classic.Dataset
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Internal-row support for the two-pass distributed rank
  * (graft.Ranks) — internal-tree glue (`Dataset.ofRows`,
  * `SparkSession`-curried `LogicalRDD` are `private[sql]`).
  *
  * Why this exists: the public path to a global position column is
  * `df.rdd.zipWithIndex()` + `createDataFrame(rowRdd, schema)`, which
  * round-trips every row through external `Row` boxing TWICE
  * (Catalyst→Scala converters per field on the way out, the reverse on
  * the way in). This appends the position directly on the plan's
  * `InternalRow` iterator: one UnsafeProjection per partition, one
  * UnsafeRow copy per row, no per-field boxing anywhere. zipWithIndex's
  * partition-size job re-reads the sort's shuffle files (stage reuse),
  * not the upstream plan.
  */
object RankSupport {

  /** `df`'s rows plus `out` = the 1-based global position of the row in
    * `df`'s CURRENT order — the caller establishes the total order
    * (e.g. via `sort`) before calling.
    */
  def withPosition(df: DataFrame, out: String): DataFrame = {
    val ds = df.asInstanceOf[Dataset[_]]
    val spark = ds.sparkSession
    val schema = StructType(
      df.schema.fields :+ StructField(out, LongType, nullable = false))
    val rdd = ds.queryExecution.toRdd.zipWithIndex().mapPartitions { it =>
      val joined = new JoinedRow
      val idx = new GenericInternalRow(1)
      val proj = UnsafeProjection.create(schema)
      it.map { case (r, i) =>
        idx.update(0, i + 1L)
        // proj reuses its result buffer; the copy makes each row
        // independent for buffering consumers (cache, sort, exchange)
        proj(joined(r, idx)).copy().asInstanceOf[InternalRow]
      }
    }
    Dataset.ofRows(spark,
      LogicalRDD(DataTypeUtils.toAttributes(schema), rdd)(spark))
  }
}
