package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.GraftFunctions

/** LLM-pipeline deduplication suite (SURVEY.md §2.3).
  *
  * Every operator is linear or block-bounded — no O(n²) self-join ever
  * touches the full corpus:
  *  - exact dedup is one hash-groupBy (map-side combined);
  *  - jaccard near-dup self-joins only inside (lang, length-bucket) blocks;
  *  - MinHash/LSH and SimHash bound candidate pairs by band buckets;
  *  - embedding near-dup self-joins only inside label blocks.
  * At cluster scale the only skew risk is a hot band bucket; AQE skew-join
  * handles it, and the band count (16) is the knob that trades recall for
  * bucket size.
  */
object Dedup {

  /** Whitespace tokens of the document text (testdata is single-spaced). */
  private def toks: Column = split(col("text"), " ")

  /** Word 3-shingles of a token array column (empty when < 3 tokens). */
  private def shingles3(t: Column): Column =
    when(size(t) >= 3,
      transform(sequence(lit(0), size(t) - 3),
        i => concat_ws(" ", element_at(t, i + 1), element_at(t, i + 2),
          element_at(t, i + 3))))
      .otherwise(array().cast("array<string>"))

  private def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") / size(array_union(a, b))

  /** §2.3 dedup_exact: exact text dedup over a simulated re-crawl (the
    * corpus unioned with an id-shifted copy of itself — the testdata has
    * no verbatim dups of its own). One hash-groupBy on md5(text); keeps
    * the minimum doc_id as canonical (first-writer-wins).
    */
  def dedupExact(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val recrawl = d.select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
    d.unionAll(recrawl)
      .groupBy(md5(col("text")))
      .agg(min(col("doc_id")).as("canonical_id"), count(lit(1)).as("n_copies"))
      .select(col("canonical_id"), col("n_copies"))
      .orderBy(col("canonical_id"))
  }

  /** §2.3 dedup_ngram_jaccard: token-set Jaccard near-dup pairs, blocked by
    * (lang, 100-char length bucket) so the self-join is bounded per block.
    */
  def dedupNgramJaccard(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        (col("n_chars") / 100).cast("bigint").as("bkt"),
        array_distinct(toks).as("tset"))
    val a = t.alias("a")
    val b = t.alias("b")
    a.join(b,
        col("a.lang") === col("b.lang") && col("a.bkt") === col("b.bkt") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("i"), col("b.doc_id").as("j"),
        round(jaccard(col("a.tset"), col("b.tset")), 6).as("jac"))
      .filter(col("jac") >= 0.9)
      .orderBy(col("i"), col("j"))
  }

  /** §2.3 dedup_minhash_lsh: MinHash(128) + LSH banding (16 bands × 8 rows)
    * over word 3-shingles, then exact-Jaccard rerank of candidates only.
    * The full O(n²) space is never materialized: pairs exist only where a
    * band hash collides. Candidate generation joins a slim
    * (doc_id, band, hash) relation; shingle sets are re-joined afterwards,
    * so wide arrays never flow through the bucket shuffle.
    */
  def dedupMinhashLsh(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), array_distinct(shingles3(toks)).as("sh"))
    val sigs = docs.select(col("doc_id"),
      GraftFunctions.minhashSignature(col("sh"), 128, 42).as("sig"))
    val bands = sigs.select(col("doc_id"),
        posexplode(transform(sequence(lit(0), lit(15)),
          b => hash(slice(col("sig"), b * 8 + 1, lit(8))))))
      .toDF("doc_id", "band", "bhash")
    val cand = bands.alias("x").join(bands.alias("y"),
        col("x.band") === col("y.band") && col("x.bhash") === col("y.bhash") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("i"), col("y.doc_id").as("j"))
      .distinct()
    cand
      .join(docs.select(col("doc_id").as("i"), col("sh").as("sh_i")), Seq("i"))
      .join(docs.select(col("doc_id").as("j"), col("sh").as("sh_j")), Seq("j"))
      .select(col("i"), col("j"),
        round(jaccard(col("sh_i"), col("sh_j")), 6).as("jac"))
      .filter(col("jac") >= 0.5)
      .orderBy(col("i"), col("j"))
  }

  /** §2.3 dedup_simhash: 64-bit SimHash near-dup via banding — a pair with
    * hamming distance ≤ 3 must agree on at least one of 4 16-bit bands
    * (pigeonhole), so candidates come from 4 bucket joins, never O(n²).
    */
  def dedupSimhash(spark: SparkSession, dir: String): DataFrame = {
    val sigs = Tables.documents(spark, dir)
      .select(col("doc_id"), GraftFunctions.simhash64(toks).as("sig"))
    val bandVals = (0 until 4).map(b =>
      shiftrightunsigned(col("sig"), b * 16).bitwiseAND(lit(0xFFFFL)))
    val bands = sigs.select(col("doc_id"), col("sig"),
        posexplode(array(bandVals: _*)))
      .toDF("doc_id", "sig", "band", "bval")
    val cand = bands.alias("x").join(bands.alias("y"),
        col("x.band") === col("y.band") && col("x.bval") === col("y.bval") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("i"), col("y.doc_id").as("j"),
        col("x.sig").as("sig_i"), col("y.sig").as("sig_j"))
      .distinct()
    cand
      .select(col("i"), col("j"),
        bit_count(col("sig_i").bitwiseXOR(col("sig_j"))).as("hamming"))
      .filter(col("hamming") <= 3)
      .orderBy(col("i"), col("j"))
  }

  /** §2.3 dedup_embedding: embedding-cosine near-dup pairs, blocked by
    * label (cluster id) so the self-join is bounded per block. Cosine is a
    * codegen'd Catalyst expression (GraftKernels.cosineF) accumulating in
    * double — same combining formula as DuckDB's list_cosine_similarity.
    */
  def dedupEmbedding(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val a = e.alias("a")
    val b = e.alias("b")
    a.join(b,
        col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("i"), col("b.vec_id").as("j"),
        round(GraftFunctions.cosine(col("a.embedding"), col("b.embedding")), 6)
          .as("sim"))
      .filter(col("sim") >= 0.4)
      .orderBy(col("i"), col("j"))
  }
}
