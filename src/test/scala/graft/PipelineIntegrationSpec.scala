package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup
import graft.operators.TextAnalysis

/** Cross-operator consistency: the training-corpus pipeline stages
  * (quality filter → dedup clustering → packing) compose over the same
  * corpus without contradiction — the operators are not just individually
  * correct but mutually coherent, which is what a user chaining them
  * actually relies on.
  */
class PipelineIntegrationSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private def dir = TestSpark.sfDir

  test("dedup clustering is a fixpoint labeling that covers the corpus") {
    val clusters = Dedup.dedupCluster(spark, dir)
    val n = Tables.documents(spark, dir).count()
    assert(clusters.count() === n)
    // a canonical id never exceeds its member (min-label semantics)
    assert(clusters.filter(col("canonical_id") > col("doc_id")).count() === 0)
    // closure: the canonical of a canonical is itself
    val c2 = clusters.select(col("doc_id").as("d2"), col("canonical_id").as("cc"))
    val broken = clusters.join(c2, col("canonical_id") === col("d2"))
      .filter(col("cc") =!= col("canonical_id")).count()
    assert(broken === 0)
  }

  test("packing covers every doc exactly once with token-exact offsets") {
    val pack = TextAnalysis.pipelinePack(spark, dir)
    val tokens = TextAnalysis.textTokencount(spark, dir)
      .select(col("doc_id"), col("n_ws_tokens"))
    assert(pack.count() === Tables.documents(spark, dir).count())
    // the packed token count is the tokenizer's count — stages agree
    assert(pack.join(tokens, Seq("doc_id"))
      .filter(col("n_tokens") =!= col("n_ws_tokens")).count() === 0)
    // offset arithmetic is internally consistent
    assert(pack.filter(col("pack_offset") < 0 ||
      col("pack_offset") >= 256).count() === 0)
    assert(pack.filter(col("start_tok") =!=
      col("pack_id") * 256 + col("pack_offset")).count() === 0)
  }

  test("packing shard count DERIVES from corpus size (never a literal)") {
    // ceil(n_docs / 50) shards: the growth knob the 100 TB shape needs —
    // a bigger corpus gets more shards, not a fatter per-shard window
    for (sf <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val nDocs = Tables.documents(spark, sf).count()
      val expected = math.max(1L, math.ceil(nDocs / 50.0).toLong)
      val got = TextAnalysis.pipelinePack(spark, sf)
        .select(col("bucket")).distinct().count()
      // every shard is hit w.p. ~1 at ≥50 docs/shard; equality is the
      // strong form of "derived count > 1 and scaling"
      assert(got === expected, s"sf=$sf nDocs=$nDocs")
      assert(expected > 1)
    }
  }

  test("filter → keep-canonicals-only composes to a coherent training corpus") {
    val filt = TextAnalysis.pipelineCorpusFilter(spark, dir)
      .select(col("doc_id"))
    val clusters = Dedup.dedupCluster(spark, dir)
    val corpus = filt.join(clusters, Seq("doc_id"))
      .filter(col("doc_id") === col("canonical_id"))
    val nFilt = filt.count()
    val nCorpus = corpus.count()
    assert(nCorpus > 0 && nCorpus <= nFilt)
    // nothing in the final corpus is a non-canonical duplicate
    assert(corpus.filter(col("doc_id") =!= col("canonical_id")).count() === 0)
  }

  test("multimodal chain: CDC near-dup pairs agree with incremental drops; " +
      "scene map bounds per-shot sampling") {
    import graft.operators.Multimodal
    // (1) the pairwise operator and the incremental operator must tell
    // one story: a feed doc dropped by mm_cdc_incremental (J ≥ 0.5 vs
    // some warehouse doc) must appear in an mm_cdc_neardup-style pair
    // with a warehouse doc under the SAME threshold, and vice versa
    val base = Tables.documents(spark, dir)
      .filter(length(col("text")) > 0)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
    val sigs = Multimodal.cdcSigs(base).localCheckpoint()
    val wh = sigs.filter(col("doc_id") < 250)
    val feed = sigs.filter(col("doc_id") >= 250)
    val dropped = feed.select(col("doc_id"))
      .join(Multimodal.mmCdcIncremental(spark, dir), Seq("doc_id"),
        "left_anti")
      .collect().map(_.getLong(0)).toSet
    val crossPairs = wh.select(col("doc_id").as("w"), col("digs").as("dw"))
      .crossJoin(feed.select(col("doc_id").as("f"), col("digs").as("df")))
      .select(col("f"),
        size(array_intersect(col("dw"), col("df"))).as("i"),
        (size(col("dw")) + size(col("df"))).as("t"))
      .filter(col("i") * 2 >= col("t") - col("i"))
      .select(col("f")).distinct()
      .collect().map(_.getLong(0)).toSet
    assert(dropped === crossPairs,
      s"incremental drops disagree with pairwise: ${dropped.diff(crossPairs)} / ${crossPairs.diff(dropped)}")

    // (2) the scene map is a valid sampling contract: cut indices lie
    // inside the frame range, and n_cuts ≤ n_frames - 1 (a cut needs a
    // predecessor); a per-shot sampler taking frame 0 + each first_cut
    // reads only existing frames
    val scenes = Multimodal.mmSceneCut(spark, dir)
    assert(scenes.filter(col("n_cuts") > col("n_frames") - 1).count() === 0)
    assert(scenes.filter(col("first_cut").isNotNull &&
      (col("first_cut") < 1 || col("first_cut") >= col("n_frames")))
      .count() === 0)
    // frame counts agree with the frame-feature explosion — same framing
    val ff = Multimodal.mmFrameFeatures(spark, dir)
      .groupBy(col("doc_id")).agg(count(lit(1)).as("nf"))
    assert(scenes.join(ff, Seq("doc_id"))
      .filter(col("n_frames") =!= col("nf")).count() === 0)
  }
}
