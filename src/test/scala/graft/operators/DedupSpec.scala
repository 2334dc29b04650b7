package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{TestSpark, Tables}
import graft.functions.GraftFunctions

/** Gates for the banded near-dup operators: banding must reproduce its
  * exact exhaustive counterpart (recall, not just precision), and the
  * empty-token clique failure mode must stay fixed.
  */
class DedupSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("graph_triangles equals driver brute force over the same pair relation") {
    // independent witness: enumerate triangles by set intersection over
    // dedup_embedding's pair output (the operator's own input relation),
    // then compare per-vertex counts, degrees, and the coefficient rule
    val pairs = Dedup.dedupEmbedding(spark, TestSpark.sfDir)
      .select(col("i"), col("j")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val adj = scala.collection.mutable.HashMap
      .empty[Long, scala.collection.mutable.Set[Long]]
    pairs.foreach { case (a, b) =>
      adj.getOrElseUpdate(a, scala.collection.mutable.Set.empty) += b
      adj.getOrElseUpdate(b, scala.collection.mutable.Set.empty) += a
    }
    val triPerVertex = scala.collection.mutable.HashMap
      .empty[Long, Long].withDefaultValue(0L)
    for ((a, b) <- pairs; c <- adj(a) & adj(b); if b < c) {
      triPerVertex(a) += 1; triPerVertex(b) += 1; triPerVertex(c) += 1
    }
    val got = Dedup.graphTriangles(spark, TestSpark.sfDir).collect()
    assert(got.nonEmpty)
    assert(got.map(_.getLong(0)).toSet === adj.keySet.toSet)
    got.foreach { r =>
      val (id, deg, tri, coef) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(deg === adj(id).size.toLong, s"degree of $id")
      assert(tri === triPerVertex(id), s"triangles of $id")
      val want = if (deg >= 2)
        BigDecimal(2.0 * tri / (deg * (deg - 1)))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      else 0.0
      assert(coef === want, s"coefficient of $id")
    }
  }

  test("dedup_minhash_lsh equals exhaustive all-pairs shingle Jaccard") {
    val lsh = Dedup.dedupMinhashLsh(spark, TestSpark.sfDir).collect()

    // exhaustive counterpart, same shingles, no LSH
    val toks = split(col("text"), " ")
    val sh3 = when(size(toks) >= 3,
      transform(sequence(lit(0), size(toks) - 3),
        i => concat_ws(" ", element_at(toks, i + 1), element_at(toks, i + 2),
          element_at(toks, i + 3)))).otherwise(array().cast("array<string>"))
    val s = Tables.documents(spark, TestSpark.sfDir)
      .select(col("doc_id"), array_distinct(sh3).as("sh"))
      .filter(size(col("sh")) > 0)
    val exact = s.alias("a").join(s.alias("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("i"), col("b.doc_id").as("j"),
        round(size(array_intersect(col("a.sh"), col("b.sh"))).cast("double") /
          size(array_union(col("a.sh"), col("b.sh"))), 6).as("jac"))
      .filter(col("jac") >= 0.5)
      .orderBy(col("i"), col("j"))
      .collect()

    assert(lsh.map(_.toSeq).toSeq === exact.map(_.toSeq).toSeq)
    assert(lsh.nonEmpty) // the sf has planted near-dups; an empty pass is vacuous
  }

  test("dedup_simhash banding equals exhaustive hamming<=3 (pigeonhole recall=1)") {
    val banded = Dedup.dedupSimhash(spark, TestSpark.sfDir).collect()

    val toks = split(col("text"), " ")
    val sigs = Tables.documents(spark, TestSpark.sfDir)
      .filter(size(toks) > 0)
      .select(col("doc_id"), GraftFunctions.simhash64(toks).as("sig"))
    val exact = sigs.alias("a").join(sigs.alias("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("i"), col("b.doc_id").as("j"),
        bit_count(col("a.sig").bitwiseXOR(col("b.sig"))).as("hamming"))
      .filter(col("hamming") <= 3)
      .orderBy(col("i"), col("j"))
      .collect()

    assert(banded.map(_.toSeq).toSeq === exact.map(_.toSeq).toSeq)
  }

  test("dedup_embedding: label-free RHP blocking finds the bulk of all-pairs matches") {
    val blocked = Dedup.dedupEmbedding(spark, TestSpark.sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    val e = Tables.embeddings(spark, TestSpark.sfDir)
    val exact = e.alias("a").join(e.alias("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("i"), col("b.vec_id").as("j"),
        round(GraftFunctions.cosine(col("a.embedding"), col("b.embedding")), 6)
          .as("sim"))
      .filter(col("sim") >= 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(blocked.subsetOf(exact)) // blocking can only lose pairs, never invent
    val recall = if (exact.isEmpty) 1.0 else (blocked & exact).size.toDouble / exact.size
    // this corpus's qualifying pairs sit barely over τ=0.4 (sim≈0.40-0.48,
    // i.e. near-random angles) — the hardest possible regime for any LSH
    // family; 16 tables × 4 bits model to ≈0.94 recall at p(0.4)≈0.63
    // (measured 0.96 at sf0.1, 0.9+ here)
    assert(recall >= 0.85, s"embedding blocking recall $recall below floor")
  }

  test("short/empty docs cannot form LSH candidate cliques") {
    import spark.implicits._
    // 50 docs with < 3 tokens (identical sentinel signatures) + 2 real dups
    val shorts = (0 until 50).map(i => (i.toLong, if (i % 2 == 0) "" else "one two"))
    val dups = Seq((100L, "alpha beta gamma delta epsilon zeta eta theta"),
      (101L, "alpha beta gamma delta epsilon zeta eta theta"))
    val df = (shorts ++ dups).toDF("doc_id", "text")

    val toksC = split(col("text"), " ")
    val sh3 = when(size(toksC) >= 3,
      transform(sequence(lit(0), size(toksC) - 3),
        i => concat_ws(" ", element_at(toksC, i + 1), element_at(toksC, i + 2),
          element_at(toksC, i + 3)))).otherwise(array().cast("array<string>"))
    val docs = df.select(col("doc_id"), array_distinct(sh3).as("sh"))
      .filter(size(col("sh")) > 0)
    // after the guard, only the two real docs can band at all
    assert(docs.count() === 2)

    // the full operator over the same frame shape: build directly on a temp
    // parquet dir so the public entry point is what's exercised
    val dir = TestSpark.tmpDir("dedup_guard")
    df.withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val pairs = Dedup.dedupMinhashLsh(spark, dir).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSeq === Seq((100L, 101L)))

    val sPairs = Dedup.dedupSimhash(spark, dir)
      .select(col("i"), col("j")).collect().map(r => (r.getLong(0), r.getLong(1)))
    // simhash keeps docs with >=1 token: "one two" docs are all identical
    // text → identical signatures → legitimately near-dup pairs; the
    // *empty* docs must contribute nothing.
    assert(!sPairs.exists { case (i, j) => i % 2 == 0 && i < 50 && j % 2 == 0 })
  }

  test("dedup_substring: re-crawled copies share every aligned window") {
    val spans = Dedup.dedupSubstring(spark, TestSpark.sfDir).collect()
    assert(spans.nonEmpty)
    spans.foreach { r =>
      assert(r.getLong(1) >= 2, s"span ${r.getString(0)} n_docs")
      assert(r.getLong(2) >= r.getLong(1), s"span ${r.getString(0)} n_occ")
    }
    // independent driver witness: the first >=20-token doc's first aligned
    // window MUST be reported (its verbatim re-crawl copy is the second
    // occurrence), and the canonical first_doc must be the original id,
    // never the id-shifted copy
    val row = Tables.documents(spark, TestSpark.sfDir)
      .select(col("doc_id"), col("text"))
      .filter(size(split(col("text"), " ")) >= 20)
      .orderBy(col("doc_id")).limit(1).collect()(0)
    val window = row.getString(1).split(" ").take(20).mkString(" ")
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(window.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val hit = spans.find(_.getString(0) == md)
    assert(hit.isDefined, "first aligned window of a re-crawled doc missing")
    assert(hit.get.getLong(3) <= row.getLong(0))
  }

  test("dedup_winnow: every pair sharing a >=20-token run shares a " +
      "selected fingerprint (brute-force stride-1 witness)") {
    val dir = TestSpark.sfDir
    // brute-force ground truth: a contiguous shared run of >= 20 tokens
    // exists between two docs iff they share SOME verbatim 20-token
    // window at stride 1 — enumerate all of them over the same shifted
    // re-crawl corpus the operator builds
    val d = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val corpus = d.unionAll(d.select((col("doc_id") + 1000000L).as("doc_id"),
      concat(lit("xshift "), col("text")).as("text")))
    val win = corpus
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"), explode(expr(
        """IF(size(w) < 20, array(),
             transform(sequence(1, size(w) - 19),
               i -> array_join(slice(w, i, 20), ' ')))""")).as("s20"))
      .distinct()
    val brutePairs = win.join(
        win.select(col("doc_id").as("d2"), col("s20")), Seq("s20"))
      .filter(col("doc_id") < col("d2"))
      .select(col("doc_id"), col("d2")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // the shifted copies make the witness non-vacuous: every >=20-token
    // doc shares its whole text with its copy at INCOMPATIBLE stride
    // offsets (1 mod 10), the exact family stride-aligned windows miss
    assert(brutePairs.exists { case (a, b) => b == a + 1000000L })
    val fps = Dedup.winnowFingerprints(spark, dir)
    val fpPairs = fps.join(
        fps.select(col("doc_id").as("d2"), col("span_fp")), Seq("span_fp"))
      .filter(col("doc_id") < col("d2"))
      .select(col("doc_id"), col("d2")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // the winnowing theorem: recall is exactly 1 on >=20-token runs
    val missed = brutePairs -- fpPairs
    assert(missed.isEmpty, s"winnow recall failure on pairs: $missed")
  }

  test("dedup_incremental_minhash: STORED band-table cross-load equals " +
      "recompute, and a replayed load drops everything") {
    val dir = TestSpark.sfDir
    val wh = TestSpark.tmpDir("mh_warehouse")
    val sketch = Dedup.minhashSketch(spark, dir)
    val docs = sketch.filter(size(col("sh")) > 0)
    // LOAD 1: the standing corpus materializes its band table + shingle
    // relation as warehouse parquet — the artifacts an incremental
    // pipeline keeps so later loads never re-sketch the corpus
    Dedup.bandTable(docs.filter(col("doc_id") < 250))
      .write.mode("overwrite").parquet(s"$wh/bands")
    docs.filter(col("doc_id") < 250).select(col("doc_id"), col("sh"))
      .write.mode("overwrite").parquet(s"$wh/shingles")
    // LOAD 2: the feed dedups against the STORED relations only
    val feed = docs.filter(col("doc_id") >= 250)
    val dupFromDisk = Dedup.incrementalNearDup(
        spark.read.parquet(s"$wh/bands"),
        spark.read.parquet(s"$wh/shingles"), feed)
      .collect().map(_.getLong(0)).toSet
    // the from-disk decomposition = the single-relation operator
    val keptOp = Dedup.dedupIncrementalMinhash(spark, dir)
      .collect().map(_.getLong(0)).toSet
    val allFeed = Tables.documents(spark, dir)
      .filter(col("doc_id") >= 250).select(col("doc_id"))
      .collect().map(_.getLong(0)).toSet
    assert(keptOp === allFeed -- dupFromDisk)
    // replay idempotence: a feed that IS the warehouse (jac(x,x)=1)
    // dedups to nothing — the cross-load analogue of the reference's
    // already-loaded CVE set difference
    val replayDup = Dedup.incrementalNearDup(
        spark.read.parquet(s"$wh/bands"),
        spark.read.parquet(s"$wh/shingles"),
        docs.filter(col("doc_id") < 250))
      .collect().map(_.getLong(0)).toSet
    val whIds = docs.filter(col("doc_id") < 250)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(replayDup === whIds)
  }

  test("lsh bucket-width guard: a 10k-member hot bucket reports as a clique " +
      "and emits zero pairs; no posting array builds below the df prune") {
    import spark.implicits._
    // 10k near-identical docs all land in ONE bucket (the crawl-scale
    // boilerplate pathology); 200 normal docs form adjacent pairs in
    // their own width-2 buckets
    val n = 10000
    val hot = (0 until n).map(i => (i.toLong, 0, 777))
    val normal = (0 until 200).map(i => (100000L + i, 1, i / 2))
    val posts = (hot ++ normal).toDF("vec_id", "tbl", "bucket")
    val (pairs, cliques) = Dedup.cappedBucketPairs(
      posts, "tbl", "bucket", "vec_id", maxWidth = 16)

    // STRUCTURAL: widths come from a count-only aggregate BELOW the
    // posting-build join — a hot bucket must never materialize its
    // member array (the cap-after-collect regression would buffer all
    // 10k ids in one aggregation buffer before dropping them)
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join}
    import org.apache.spark.sql.catalyst.expressions.aggregate.CollectList
    def hasCollectList(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan) =
      p.collect { case a: Aggregate => a }.exists(_.aggregateExpressions.exists(
        _.collectFirst { case _: CollectList => () }.isDefined))
    val plan = pairs.queryExecution.optimizedPlan
    val joins = plan.collect { case j: Join => j }
    assert(joins.nonEmpty, "expected the width-prune join in the plan")
    assert(joins.forall(j => !hasCollectList(j)),
      "posting arrays must not build below the width-prune join")

    // BEHAVIORAL: bounded completion, clique reported, hot pairs absent
    val gotCliques = cliques.select("tbl", "bucket", "width")
      .as[(Int, Int, Long)].collect().toSet
    assert(gotCliques === Set((0, 777, n.toLong)))
    val gotPairs = pairs.select("i", "j").as[(Long, Long)].collect().toSet
    val expected = (0 until 100).map(k =>
      (100000L + 2 * k, 100000L + 2 * k + 1)).toSet
    assert(gotPairs === expected)
  }
}
