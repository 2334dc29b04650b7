package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.GraftFunctions

/** Approximate-nearest-neighbor search over the embeddings table
  * (SURVEY.md §2.3 sim_*).
  *
  * Scale shape: the query set is always the small side and is broadcast;
  * the corpus streams through map-side cosine + per-query top-k. The LSH
  * variant replaces the full scan with band-bucket candidate generation,
  * turning O(|Q|·|C|) into O(|Q|·bucket) — the 100 TB path.
  */
object Similarity {

  private val K = 10

  /** §2.3 sim_topk_bruteforce: exact top-k cosine neighbors for a fixed
    * query set (vec_id < 10). Queries are broadcast; cosine is computed
    * map-side over the corpus in one pass; the only shuffle is the
    * per-query top-k window (partition count = |Q|, trivially small).
    */
  def simTopkBruteforce(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("sim_raw").desc, col("c_id"))
    e.select(col("vec_id").as("c_id"), col("embedding").as("c_vec"))
      .crossJoin(broadcast(q))
      .filter(col("c_id") =!= col("q_id"))
      .select(col("q_id"), col("c_id"),
        GraftFunctions.cosine(col("q_vec"), col("c_vec")).as("sim_raw"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= K)
      .select(col("q_id"), col("rank").cast("bigint").as("rank"), col("c_id"),
        round(col("sim_raw"), 6).as("sim"))
      .orderBy(col("q_id"), col("rank"))
  }

  /** §2.3 sim_topk_lsh: approximate top-k via random-hyperplane LSH —
    * 8 tables × 8-bit signatures; a corpus vector is a candidate for a
    * query iff they share a bucket in any table; candidates are reranked
    * with exact cosine. No full Q×C product is ever formed.
    */
  def simTopkLsh(spark: SparkSession, dir: String): DataFrame = {
    val tables = 8
    val e = Tables.embeddings(spark, dir)

    // per-table signature rows: (id, vec, table, bucket)
    def explodeSigs(df: DataFrame, id: String, vec: String): DataFrame = {
      val sigCols = (0 until tables).map(t =>
        struct(lit(t).as("table"),
          GraftFunctions.rhpSignature(col(vec), 8, 42 + t).as("bucket")))
      df.select(col(id), col(vec), explode(array(sigCols: _*)).as("s"))
        .select(col(id), col(vec), col("s.table").as("table"),
          col("s.bucket").as("bucket"))
    }

    val q = explodeSigs(
      e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec")),
      "q_id", "q_vec")
    val c = explodeSigs(
      e.select(col("vec_id").as("c_id"), col("embedding").as("c_vec")),
      "c_id", "c_vec")

    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("sim_raw").desc, col("c_id"))
    c.join(broadcast(q), Seq("table", "bucket"))
      .filter(col("c_id") =!= col("q_id"))
      .select(col("q_id"), col("c_id"), col("q_vec"), col("c_vec"))
      .distinct()
      .select(col("q_id"), col("c_id"),
        GraftFunctions.cosine(col("q_vec"), col("c_vec")).as("sim_raw"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= K)
      .select(col("q_id"), col("rank").cast("bigint").as("rank"), col("c_id"),
        round(col("sim_raw"), 6).as("sim"))
      .orderBy(col("q_id"), col("rank"))
  }
}
