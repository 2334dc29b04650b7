package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{TestSpark, Tables}
import graft.functions.GraftKernels

/** mm_batch_extract gate (SURVEY §2.4): batch boundaries, batch-size
  * bounds, partition isolation, and feature determinism of the per-
  * partition batched extraction path.
  */
class MultimodalSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def payloads(nPartitions: Int) = {
    import spark.implicits._
    Tables.documents(spark, TestSpark.sfDir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .repartition(nPartitions)
  }

  test("batches are bounded by batchSize and only the partition tail is smaller") {
    val df = payloads(4)
    val out = Multimodal.extractBatch(df, batchSize = 64).collect()
    assert(out.length === df.count())
    val sizes = out.map(_.getAs[Int]("batch_size"))
    assert(sizes.forall(s => s >= 1 && s <= 64))
    // per partition of n rows: n/64 full batches + at most one remainder →
    // across 4 partitions at most 4 undersized batches
    val undersized = sizes.filter(_ < 64).distinct
    assert(undersized.length <= 4)
  }

  test("batchSize larger than any partition → one batch per partition") {
    val df = payloads(5)
    val out = Multimodal.extractBatch(df, batchSize = 1000000).collect()
    val bySize = out.groupBy(_.getAs[Int]("batch_size")).view.mapValues(_.length)
    // every row reports its partition's row count as the batch size
    assert(bySize.keys.toSeq.sum === df.count() ||
      bySize.forall { case (sz, n) => n % sz == 0 })
  }

  test("features are deterministic and equal the direct kernel result") {
    import spark.implicits._
    val df = payloads(3)
    val expected = df.as[(Long, Array[Byte])].collect()
      .map { case (id, p) => id -> GraftKernels.byteFeature(p) }.toMap
    val got = Multimodal.extractBatch(df, batchSize = 32).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("feature")).toMap
    assert(got === expected)
    // batching layout must not affect features
    val got2 = Multimodal.extractBatch(df.repartition(7), batchSize = 5).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("feature")).toMap
    assert(got2 === expected)
  }

  test("mm_frame_sample: frame count/boundaries exact, features match sliced kernel") {
    import spark.implicits._
    val df = payloads(3)
    val frames = Multimodal.frameSample(df, frameLen = 64).collect()

    val raw = df.as[(Long, Array[Byte])].collect().toMap
    // per-doc frame count = ceil(len/64); tail short; others exactly 64
    raw.foreach { case (id, p) =>
      val mine = frames.filter(_.getAs[Long]("doc_id") == id)
        .sortBy(_.getAs[Int]("frame_idx"))
      assert(mine.length === (p.length + 63) / 64)
      mine.init.foreach(f => assert(f.getAs[Int]("frame_len") === 64))
      assert(mine.last.getAs[Int]("frame_len") === p.length - (mine.length - 1) * 64)
      // spot-check feature of frame 0 against a direct slice
      val f0 = java.util.Arrays.copyOfRange(p, 0, math.min(64, p.length))
      assert(mine.head.getAs[Long]("feature") === GraftKernels.byteFeature(f0))
    }
    assert(frames.length === raw.values.map(p => (p.length + 63) / 64).sum)
  }

  test("mm_metadata surfaces payload length and typed metadata consistently") {
    val out = Multimodal.mmMetadata(spark, TestSpark.sfDir)
    val row = out.filter(col("doc_id") === out.agg(min("doc_id")).head().getLong(0)).head()
    assert(row.getAs[String]("mime") === "text/plain")
    assert(row.getAs[Long]("payload_len") > 0)
  }

  test("mm_resize: exact target length, deterministic sampling, feature matches kernel") {
    import graft.functions.GraftKernels
    val payloads = graft.Tables.documents(spark, TestSpark.sfDir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
    val out = Multimodal.resize(payloads, targetLen = 48)
    assert(out.count() === payloads.count())
    assert(out.filter(length(col("payload")) =!= 48).count() === 0)
    // spot-check: resample matches an independent reimplementation
    val row = out.orderBy(col("doc_id")).head()
    val orig = payloads.orderBy(col("doc_id")).head().getAs[Array[Byte]]("payload")
    val expect = Array.tabulate(48)(i => orig(((i.toLong * orig.length) / 48).toInt))
    assert(row.getAs[Array[Byte]]("payload").toSeq === expect.toSeq)
    assert(row.getAs[Long]("feature") === GraftKernels.byteFeature(expect))
  }

  test("mm_embed: payloads become fixed-dim vectors the similarity stack consumes") {
    import graft.functions.GraftFunctions
    val payloads = graft.Tables.documents(spark, TestSpark.sfDir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
    val emb = Multimodal.mmEmbed(payloads)
    // fixed dimension, deterministic across runs
    assert(emb.filter(size(col("embedding")) =!= 16).count() === 0)
    val a = emb.orderBy(col("doc_id")).limit(5).collect().map(_.toSeq.toList)
    val b = Multimodal.mmEmbed(payloads).orderBy(col("doc_id")).limit(5)
      .collect().map(_.toSeq.toList)
    assert(a.toSeq === b.toSeq)
    // identical payloads embed identically → cosine 1; the ANN stack sees
    // a duplicate pair exactly as it would from a real encoder
    val copies = emb.select((col("doc_id") + 1000000L).as("c_id"),
      col("embedding").as("c_vec")).filter(col("c_id") < 1000005L)
    val sims = emb.filter(col("doc_id") < 5)
      .join(copies, col("doc_id") + 1000000L === col("c_id"))
      .select(GraftFunctions.cosine(col("embedding"), col("c_vec")).as("s"))
      .collect().map(_.getDouble(0))
    assert(sims.length === 5 && sims.forall(s => math.abs(s - 1.0) < 1e-9))
  }

  test("mm_cdc_neardup: CDC chunk digests are edit-local; fixed blocks are not") {
    import scala.jdk.CollectionConverters._
    def digs(p: Array[Byte]): Set[Long] =
      GraftKernels.cdcChunks(p).toLongArray().toSet
    val texts = Tables.documents(spark, TestSpark.sfDir)
      .filter(length(col("text")) > 300)
      .orderBy(col("doc_id")).limit(20)
      .select(col("text")).collect().map(_.getString(0))
    assert(texts.length === 20)
    for (t <- texts) {
      val p = t.getBytes("UTF-8")
      // the operator's twin: one byte replaced mid-stream + 3 appended
      val mid = math.max(p.length / 2, 1)
      val twin = (p.take(mid - 1) :+ 'X'.toByte) ++ p.drop(mid) ++
        " v2".getBytes("UTF-8")
      val (a, b) = (digs(p), digs(twin))
      val inter = (a & b).size
      val union = a.size + b.size - inter
      // edit-locality: the mid-edit re-cuts its neighborhood, the append
      // re-cuts the tail; everything else survives → J well above 0.5
      assert(2 * inter >= union,
        s"CDC twin Jaccard below 0.5: $inter/$union (n=${a.size})")
      // an INSERTION shifts all downstream offsets; CDC must not care:
      // inserting 5 bytes at 1/4 depth still leaves a majority of chunks
      val q = p.length / 4
      val ins = p.take(q) ++ "ABCDE".getBytes("UTF-8") ++ p.drop(q)
      val c = digs(ins)
      val i2 = (a & c).size
      val u2 = a.size + c.size - i2
      assert(2 * i2 >= u2,
        s"CDC insertion Jaccard below 0.5: $i2/$u2 (n=${a.size})")
    }
    // determinism + digest-set shape: sorted distinct longs
    val one = GraftKernels.cdcChunks(texts.head.getBytes("UTF-8")).toLongArray()
    assert(one.toSeq === one.sorted.toSeq && one.distinct.length === one.length)
  }

  test("mm_cdc_neardup: hot digest never builds a posting array (two-pass df cap)") {
    import spark.implicits._
    // 500 payloads ALL sharing one hot chunk digest (df = 500, way over
    // the cap) — the all-zeros-block / shared-file-header pathology —
    // plus one rare digest per adjacent pair (df = 2)
    val n = 500
    val sigs = (0 until n)
      .map(i => (i.toLong, Seq(0L, 1000L + i / 2)))
      .toDF("doc_id", "digs")
    val out = Multimodal.cdcCandidatePairs(sigs, dfMax = 16)

    // STRUCTURAL: the df prune must run BEFORE any posting array exists —
    // the collect_list aggregate sits above a join, and strictly below
    // that join sits a count-only aggregate (no CollectList anywhere in
    // the join subtree). If the plan ever regresses to cap-after-collect,
    // the hot digest's 500-id array materializes in one buffer first.
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join}
    import org.apache.spark.sql.catalyst.expressions.aggregate.CollectList
    val plan = out.queryExecution.optimizedPlan
    def hasCollectList(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan) =
      p.collect { case a: Aggregate => a }.exists(_.aggregateExpressions.exists(
        _.collectFirst { case _: CollectList => () }.isDefined))
    val joins = plan.collect { case j: Join => j }
    assert(joins.nonEmpty, "expected the df-prune join in the plan")
    assert(joins.forall(j => !hasCollectList(j)),
      "posting arrays must not be built below the df-prune join")
    assert(hasCollectList(plan),
      "the posting build (collect_list) must exist above the join")

    // BEHAVIORAL: the hot digest emits zero pairs; every adjacent pair
    // survives via its rare digest
    val got = out.select("i", "j").as[(Long, Long)].collect().toSet
    val expected = (0 until n / 2).map(k => (2L * k, 2L * k + 1)).toSet
    assert(got === expected)
  }
}
