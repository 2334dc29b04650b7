package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}
import graft.functions.GraftFunctions

/** Gates for sim_topk_*: the bounded-heap aggregate must reproduce the
  * window-function top-k exactly, and LSH recall vs exact is measured.
  */
class SimilaritySpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("fused ivfTopCells kernel == the cellRanks reference expression, " +
      "full ranking, every corpus vector") {
    val e = Tables.embeddings(spark, TestSpark.sfDir)
    val cents = Similarity.sampledCentroids(e, 16)
    // reference: the struct-array sort form; fused: the one-loop kernel —
    // the FULL 16-cell ranking must agree on every vector (any csim tie
    // or float drift would reorder a suffix and fail here, before it
    // could silently shift candidates in sim_topk_ivf)
    val both = e.select(col("vec_id"),
        transform(Similarity.cellRanks(cents)(col("embedding")),
          s => s.getField("cent_id")).as("ref"),
        GraftFunctions.ivfTopCells(col("embedding"), cents, cents.length)
          .as("fused"))
      .withColumn("agree", col("ref") === col("fused"))
    val disagree = both.filter(!col("agree")).count()
    assert(disagree === 0L,
      s"$disagree vectors rank cells differently under the fused kernel")
    assert(both.count() > 0)
  }

  test("bounded-heap top-k equals row_number window top-k") {
    val agg = Similarity.simTopkBruteforce(spark, TestSpark.sfDir).collect()

    val e = Tables.embeddings(spark, TestSpark.sfDir)
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("sim_raw").desc, col("c_id"))
    val win = e.select(col("vec_id").as("c_id"), col("embedding").as("c_vec"))
      .crossJoin(broadcast(q))
      .filter(col("c_id") =!= col("q_id"))
      .select(col("q_id"), col("c_id"),
        GraftFunctions.cosine(col("q_vec"), col("c_vec")).as("sim_raw"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 10)
      .select(col("q_id"), col("rank").cast("bigint").as("rank"), col("c_id"),
        round(col("sim_raw"), 6).as("sim"))
      .orderBy(col("q_id"), col("rank"))
      .collect()

    assert(agg.map(_.toSeq).toSeq === win.map(_.toSeq).toSeq)
    assert(agg.length === 100) // 10 queries × k=10
  }

  test("top-k tie-break is deterministic: equal scores rank by ascending id") {
    import spark.implicits._
    val df = Seq((1L, 10L, 0.5), (1L, 3L, 0.5), (1L, 7L, 0.9), (1L, 5L, 0.5))
      .toDF("q_id", "c_id", "sim_raw")
    val got = df.groupBy(col("q_id"))
      .agg(GraftFunctions.topKByScore(col("sim_raw"), col("c_id"), 3).as("top"))
      .select(explode(col("top")).as("t")).select(col("t.c_id")).as[Long].collect()
    assert(got.toSeq === Seq(7L, 3L, 5L)) // 0.9 first, then 0.5s by id asc
  }

  test("sim_knn_graph: well-formed ranks and recall vs exact per-vector top-3") {
    val knn = Similarity.simKnnGraph(spark, TestSpark.sfDir).collect()
    // ranks are 1..k consecutive per vector, neighbors never self
    knn.groupBy(_.getLong(0)).foreach { case (v, rows) =>
      assert(rows.map(_.getLong(1)).sorted.toSeq ===
        (1L to rows.length).toSeq, s"ranks of $v")
      assert(rows.forall(_.getLong(2) != v), s"self-neighbor at $v")
    }
    // exact top-3 via all-pairs window (test-scale only)
    val e = Tables.embeddings(spark, TestSpark.sfDir)
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("sim_raw").desc, col("c_id"))
    val exact = e.select(col("vec_id").as("q_id"), col("embedding").as("qv"))
      .crossJoin(e.select(col("vec_id").as("c_id"), col("embedding").as("cv")))
      .filter(col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"),
        GraftFunctions.cosine(col("qv"), col("cv")).as("sim_raw"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = knn.map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (exact & got).size.toDouble / exact.size
    assert(recall >= 0.5, s"kNN-graph recall $recall below floor")
  }

  test("sim_topk_ivf: high recall vs exact top-k on the test corpus") {
    def keys(rows: Array[org.apache.spark.sql.Row]): Set[(Long, Long)] =
      rows.map(r => (r.getLong(0), r.getLong(2))).toSet
    val exact = keys(Similarity.simTopkBruteforce(spark, TestSpark.sfDir).collect())
    val ivf = keys(Similarity.simTopkIvf(spark, TestSpark.sfDir).collect())
    val recall = (exact & ivf).size.toDouble / exact.size
    assert(recall >= 0.6, s"IVF recall $recall below floor")
  }

  test("sim_ivf_train: Lloyd iterations improve the IVF objective, deterministically") {
    val e = Tables.embeddings(spark, TestSpark.sfDir)
    def objective(cents: Array[(Long, Array[Float])]): Double = {
      // mean best-centroid cosine over the corpus — higher is tighter cells
      val scored = cents.map { case (_, cv) =>
        GraftFunctions.cosine(col("embedding"),
          typedlit(cv.toSeq)) }
      e.select(array_max(array(scored: _*)).as("best"))
        .agg(avg(col("best"))).head().getDouble(0)
    }
    val init = e.filter(col("vec_id") < 8).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val trained = Similarity.kmeansTrain(spark, TestSpark.sfDir, k = 8, iters = 3)
    assert(trained.length === 8)
    assert(objective(trained) > objective(init),
      "training must tighten cells vs the sampled-id init")
    // deterministic: same data, same init → identical centroids
    val again = Similarity.kmeansTrain(spark, TestSpark.sfDir, k = 8, iters = 3)
    assert(trained.map(_._1).toSeq === again.map(_._1).toSeq)
    trained.zip(again).foreach { case ((_, a), (_, b)) =>
      a.zip(b).foreach { case (x, y) => assert(math.abs(x - y) < 1e-5f) }
    }
    // the trained table drops into the probe dataflow and still finds
    // real neighbors
    def keys(rows: Array[org.apache.spark.sql.Row]): Set[(Long, Long)] =
      rows.map(r => (r.getLong(0), r.getLong(2))).toSet
    val exact = keys(Similarity.simTopkBruteforce(spark, TestSpark.sfDir).collect())
    val probed = keys(
      Similarity.simTopkIvfWith(spark, TestSpark.sfDir, trained, nprobe = 4).collect())
    val recall = (exact & probed).size.toDouble / exact.size
    assert(recall >= 0.5, s"trained-IVF recall $recall below floor")
  }

  test("sim_topk_pq: recall floor vs exact squared-L2 top-k at two SFs; " +
      "ranks well-formed") {
    // exact top-10 under PQ's native metric (squared L2, ascending)
    def exactL2(dir: String): Set[(Long, Long)] = {
      val e = Tables.embeddings(spark, dir)
      val dcol = aggregate(
        zip_with(col("qv"), col("cv"), (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, z) => acc + z)
      val w = Window.partitionBy(col("q_id"))
        .orderBy(col("d2").asc, col("c_id"))
      val dbl = transform(col("embedding"), _.cast("double"))
      e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), dbl.as("qv"))
        .crossJoin(e.select(col("vec_id").as("c_id"), dbl.as("cv")))
        .filter(col("q_id") =!= col("c_id"))
        .select(col("q_id"), col("c_id"), dcol.as("d2"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 10)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    def recallAt(dir: String): Double = {
      val pq = Similarity.simTopkPq(spark, dir).collect()
      // full dense ranks, distances non-decreasing per query
      pq.groupBy(_.getLong(0)).foreach { case (_, rows) =>
        val byRank = rows.sortBy(_.getLong(1))
        assert(byRank.map(_.getLong(1)).toSeq === (1L to byRank.length).toSeq)
        val ds = byRank.map(_.getDouble(3)).toSeq
        assert(ds === ds.sorted)
      }
      val got = pq.map(r => (r.getLong(0), r.getLong(2))).toSet
      val exact = exactL2(dir)
      (exact & got).size.toDouble / exact.size
    }
    // 500 vectors vs 64 codewords at both SFs — the genuinely quantized
    // regime (measured 0.47 / 0.52 on these corpora; floors with
    // headroom, and at the knn-graph/trained-IVF floor level)
    assert(recallAt(TestSpark.sfDir) >= 0.4,
      "PQ recall below floor at the spec SF")
    assert(recallAt("/root/testdata/sf0.01") >= 0.45,
      "PQ recall below floor at the gate SF")
  }

  test("sim_topk_lsh: high recall vs exact top-k on the test corpus") {
    def keys(rows: Array[org.apache.spark.sql.Row]): Set[(Long, Long)] =
      rows.map(r => (r.getLong(0), r.getLong(2))).toSet
    val exact = keys(Similarity.simTopkBruteforce(spark, TestSpark.sfDir).collect())
    val lsh = keys(Similarity.simTopkLsh(spark, TestSpark.sfDir).collect())
    val recall = (exact & lsh).size.toDouble / exact.size
    // approximate by design; the bucketed candidate path must still find
    // the bulk of the true neighbors on this corpus
    assert(recall >= 0.8, s"LSH recall $recall below floor")
  }

  test("sim_ivf_incremental: STORED index (centroids + assignments from " +
      "parquet) probes identically to full recompute; replayed assignment " +
      "is idempotent") {
    import spark.implicits._
    val dir = TestSpark.sfDir
    val wh = TestSpark.tmpDir("ivf_warehouse")
    val e = graft.Tables.embeddings(spark, dir)
    def cvecs(df: org.apache.spark.sql.DataFrame) =
      df.select(col("vec_id").as("c_id"), col("embedding").as("c_vec"))

    // LOAD 1: the standing corpus materializes its centroid table and
    // cell-assignment relation as warehouse parquet — the artifacts an
    // incremental ANN pipeline keeps so later loads never re-assign it
    val cents = Similarity.sampledCentroids(e, 16)
    cents.toSeq.map { case (id, v) => (id, v.toSeq) }.toDF("cid", "cv")
      .write.mode("overwrite").parquet(s"$wh/centroids")
    Similarity.ivfAssign(cvecs(e.filter(col("vec_id") < 400)), cents)
      .write.mode("overwrite").parquet(s"$wh/cells")

    // LOAD 2: the feed assigns map-side against the STORED centroid
    // table only, and the probe reads stored ∪ feed
    val storedCents = spark.read.parquet(s"$wh/centroids").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).sortBy(_._1)
    assert(storedCents.map(_._1).toSeq === cents.map(_._1).toSeq)
    val feed = Similarity.ivfAssign(
      cvecs(e.filter(col("vec_id") >= 400)), storedCents)
    val assigned = spark.read.parquet(s"$wh/cells").unionByName(feed)
    val queries = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val fromDisk = Similarity
      .ivfProbe(assigned, queries, storedCents, nprobe = 6)
      .collect().map(_.toSeq).toSeq
    val recompute = Similarity.simTopkIvf(spark, dir, cells = 16, nprobe = 6)
      .collect().map(_.toSeq).toSeq
    assert(fromDisk === recompute)

    // replay idempotence: re-assigning the standing corpus from the
    // stored centroids reproduces the stored assignment relation exactly
    val replayed = Similarity
      .ivfAssign(cvecs(e.filter(col("vec_id") < 400)), storedCents)
      .select(col("c_id"), col("cell")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val stored = spark.read.parquet(s"$wh/cells")
      .select(col("c_id"), col("cell")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(replayed === stored)
  }
}
