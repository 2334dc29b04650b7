package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity}
import graft.{Tables => T}

/** Dev tool: sf0.1 scale assurance for the approximate operators — the
  * driver's oracle gate runs at sf0.01, so this re-checks LSH/blocking
  * equivalence and recall at the bench SF where candidate statistics
  * differ. Not part of the driver contract.
  */
object ScaleCheck {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build(32)
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")

    // 1) minhash LSH == Spark exhaustive all-pairs
    val lsh = Dedup.dedupMinhashLsh(spark, dir).collect().map(_.toSeq).toSeq
    val toks = split(col("text"), " ")
    val sh3 = when(size(toks) >= 3,
      transform(sequence(lit(0), size(toks) - 3),
        i => concat_ws(" ", element_at(toks, i + 1), element_at(toks, i + 2),
          element_at(toks, i + 3)))).otherwise(array().cast("array<string>"))
    val s = T.documents(spark, dir)
      .repartition(col("doc_id"))
      .select(col("doc_id"), array_sort(array_distinct(sh3)).as("sh"))
      .filter(size(col("sh")) > 0).persist()
    val exact = s.alias("a").join(s.alias("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("i"), col("b.doc_id").as("j"),
        round(graft.functions.GraftFunctions.jaccardSorted(
          col("a.sh"), col("b.sh")), 6).as("jac"))
      .filter(col("jac") >= 0.5).orderBy(col("i"), col("j"))
      .collect().map(_.toSeq).toSeq
    println(s"SCALECHECK minhash lsh=${lsh.size} exact=${exact.size} equal=${lsh == exact}")

    // 2) approximate top-k recall vs bruteforce
    def keys(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val ex = keys(Similarity.simTopkBruteforce(spark, dir))
    val ap = keys(Similarity.simTopkLsh(spark, dir))
    println(f"SCALECHECK lsh_recall ${(ex & ap).size.toDouble / ex.size}%.3f")
    val iv = keys(Similarity.simTopkIvf(spark, dir))
    println(f"SCALECHECK ivf_recall ${(ex & iv).size.toDouble / ex.size}%.3f")

    // 3) embedding blocking recall vs all-pairs
    val blocked = Dedup.dedupEmbedding(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val e = T.embeddings(spark, dir)
    val allp = e.alias("a").join(e.alias("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("i"), col("b.vec_id").as("j"),
        round(graft.functions.GraftFunctions.cosine(
          col("a.embedding"), col("b.embedding")), 6).as("sim"))
      .filter(col("sim") >= 0.4).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val rec = if (allp.isEmpty) 1.0 else (blocked & allp).size.toDouble / allp.size
    println(f"SCALECHECK emb subset=${blocked.subsetOf(allp)} recall=$rec%.3f (${blocked.size}/${allp.size})")

    // 4) connected-components converged at this SF: the labeling must be a
    // FIXPOINT (canonical of canonical = canonical) — if the iteration cap
    // were ever hit before convergence, this is the check that catches it
    val cl = Dedup.dedupCluster(spark, dir)
    val c2 = cl.select(col("doc_id").as("d2"), col("canonical_id").as("cc"))
    val unconverged = cl.join(c2, col("canonical_id") === col("d2"))
      .filter(col("cc") =!= col("canonical_id")).count()
    println(s"SCALECHECK cluster n=${cl.count()} unconverged=$unconverged")
    spark.stop()
  }
}
