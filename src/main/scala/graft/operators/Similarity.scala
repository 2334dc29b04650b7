package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.GraftFunctions

/** Approximate-nearest-neighbor search over the embeddings table
  * (SURVEY.md §2.3 sim_*).
  *
  * Scale shape: the query set is always the small side and is broadcast;
  * the corpus streams through map-side cosine + a bounded-heap partial
  * top-k aggregate ([[GraftFunctions.topKByScore]]) — each task forwards at
  * most k candidates per query into the exchange, so shuffle volume is
  * O(|Q|·k) no matter the corpus size (a row_number window would instead
  * funnel the entire scored corpus through |Q| reducer partitions). The LSH
  * variant replaces the full scan with band-bucket candidate generation,
  * turning O(|Q|·|C|) into O(|Q|·bucket) — the 100 TB path.
  */
object Similarity {

  private val K = 10

  /** Shared tail: scored (q_id, c_id, sim_raw) → per-query best-K rows with
    * dense ranks, deterministic (sim desc, c_id asc) order.
    */
  private def topK(scored: DataFrame, k: Int = K): DataFrame =
    scored
      .groupBy(col("q_id"))
      .agg(GraftFunctions.topKByScore(col("sim_raw"), col("c_id"), k).as("top"))
      .select(col("q_id"), posexplode(col("top")))
      .select(col("q_id"), (col("pos") + 1).cast("bigint").as("rank"),
        col("col.c_id").as("c_id"), round(col("col.sim"), 6).as("sim"))
      .orderBy(col("q_id"), col("rank"))

  /** §2.3 sim_topk_bruteforce: exact top-k cosine neighbors for a fixed
    * query set (vec_id < 10). Queries broadcast, cosine computed map-side
    * over one corpus pass, partial top-k before the only shuffle.
    */
  def simTopkBruteforce(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    topK(
      e.select(col("vec_id").as("c_id"), col("embedding").as("c_vec"))
        .crossJoin(broadcast(q))
        .filter(col("c_id") =!= col("q_id"))
        .select(col("q_id"), col("c_id"),
          GraftFunctions.cosine(col("q_vec"), col("c_vec")).as("sim_raw")))
  }

  /** §2.3 sim_topk_lsh: approximate top-k via random-hyperplane LSH —
    * `tables` hash tables × `bits`-bit signatures; a corpus vector is a
    * candidate for a query iff they share a bucket in any table; candidates
    * dedup on bare (q_id, c_id) — the corpus vector rides along as a value
    * column (it is functionally dependent on c_id), but float arrays never
    * serve as grouping keys — then exact-cosine rerank and bounded-heap
    * top-k.
    *
    * Blocking is the shared coordinate-difference RHP family
    * ([[RhpBlocking]]) with constants baked into the plan AND the DuckDB
    * oracle — the gate replicates candidate generation exactly, so this
    * operator is hash-exact-verified end to end, not rows-only.
    *
    * Defaults (5 bits × 32 tables) are tuned for this corpus's weak
    * neighbors (top-10 sims ≈ 0.3 ⇒ per-bit collision ≈ 0.6, per-table
    * 0.6^5, union recall ≈ 0.85 — asserted by SimilaritySpec). A corpus
    * with genuinely near duplicates (sim ≥ 0.8) wants MORE bits per table
    * (smaller buckets, cheaper candidates) — raise `bits` as similarity
    * concentrates; recall per (bits, tables, sim) is 1-(1-p^bits)^tables
    * with p = 1 - acos(sim)/pi.
    */
  private[graft] val LshTables = 32
  private[graft] val LshBits = 5
  private[graft] val LshDim = 64
  private[graft] val LshSeed = 11L

  /** The per-table bucket expressions as DuckDB SQL (for the oracle). */
  private[graft] def lshBucketSqlExprs(alias: String): Seq[String] =
    RhpBlocking.bucketSqlExprs(alias, LshTables, LshBits, LshDim, LshSeed)

  def simTopkLsh(spark: SparkSession, dir: String): DataFrame =
    simTopkLsh(spark, dir, bits = LshBits, tables = LshTables)

  def simTopkLsh(spark: SparkSession, dir: String, bits: Int, tables: Int): DataFrame = {
    val e = Tables.embeddings(spark, dir)

    // per-table signature rows: (id, ..., table, bucket) — all buckets from
    // ONE codegen'd kernel call (the unrolled 32×5 CASE projection
    // overflowed janino and fell out of whole-stage codegen)
    def explodeSigs(df: DataFrame, id: String, keep: Seq[String]): DataFrame =
      df.select((col(id) +: keep.map(col) :+ posexplode(
          GraftFunctions.rhpBuckets(col("__vec"), tables, bits, LshDim, LshSeed))
          .as(Seq("table", "bucket"))): _*)

    val q = explodeSigs(
      e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("embedding").as("__vec")),
      "q_id", Seq.empty)
    val c = explodeSigs(
      e.select(col("vec_id").as("c_id"), col("embedding").as("__vec"),
        col("embedding").as("c_vec")),
      "c_id", Seq("c_vec"))

    val cand = c.join(broadcast(q), Seq("table", "bucket"))
      .filter(col("c_id") =!= col("q_id"))
      .select(col("q_id"), col("c_id"), col("c_vec"))
      .dropDuplicates("q_id", "c_id")

    val qVecs = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    topK(
      cand.join(broadcast(qVecs), Seq("q_id"))
        .select(col("q_id"), col("c_id"),
          GraftFunctions.cosine(col("q_vec"), col("c_vec")).as("sim_raw")))
  }

  /** §2.3 sim_topk_ivf: approximate top-k via an IVF (inverted-file) index —
    * the classic ANN scale path alongside LSH.
    *
    *  - `cells` deterministic centroids (an SF-independent sample: the
    *    corpus vectors with the `cells` smallest vec_ids) are broadcast;
    *  - each corpus vector is assigned map-side to its nearest centroid
    *    (one bounded argmax per row — no shuffle, no state);
    *  - each query probes its `nprobe` nearest cells; candidates are the
    *    corpus vectors in those cells — at scale the cell assignment is
    *    the partition key, so a probe reads `nprobe/cells` of the corpus
    *    instead of all of it;
    *  - exact-cosine rerank + bounded-heap top-k, same as the other paths.
    *
    * Real IVF trains centroids with k-means; the assignment/probe/rerank
    * dataflow — the part Spark owns — is identical, and a trained centroid
    * table drops in by replacing `cents`. Recall vs exact is asserted in
    * SimilaritySpec.
    */
  def simTopkIvf(spark: SparkSession, dir: String): DataFrame =
    simTopkIvf(spark, dir, cells = 16, nprobe = 6)

  /** sim_ivf_train: distributed Lloyd iterations producing the trained
    * centroid table a production IVF index uses (the sampled-id centroids
    * of [[simTopkIvf]] are the drop-in untrained stand-in).
    *
    * Spark-first shape per iteration: assignment is a map-side argmax
    * against the BROADCAST centroids (no shuffle, no state), and the
    * update is ONE shuffle of (cell, dim) partial sums — explode by
    * dimension keeps the aggregation map-side combinable, and the k·dim
    * result is driver-tiny by construction (k centroids, not data).
    * Deterministic: init = the `k` smallest vec_ids, mean computed
    * per-dimension from exact counts.
    */
  def kmeansTrain(spark: SparkSession, dir: String, k: Int, iters: Int)
      : Array[(Long, Array[Float])] = {
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
    var cents: Array[(Long, Array[Float])] = e.filter(col("vec_id") < k)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    for (_ <- 0 until iters) {
      // fused argmax kernel — same ranking as the cellRanks reference
      val assigned = e.withColumn("cell",
        element_at(GraftFunctions.ivfTopCells(col("embedding"), cents, 1), 1))
      val updated = assigned
        .select(col("cell"), posexplode(col("embedding")).as(Seq("dim", "x")))
        .groupBy(col("cell"), col("dim"))
        .agg(sum(col("x")).as("sx"), count(lit(1)).as("n"))
        .collect()
        .groupBy(_.getLong(0))
        .map { case (cell, rows) =>
          val dim = rows.map(_.getInt(1)).max + 1
          val v = new Array[Float](dim)
          rows.foreach(r => v(r.getInt(1)) = (r.getDouble(2) / r.getLong(3)).toFloat)
          (cell, v)
        }
      // empty cells keep their previous centroid (deterministic)
      cents = cents.map { case (cid, cv) => (cid, updated.getOrElse(cid, cv)) }
    }
    cents
  }

  /** Best-first cell ranking of a vector against an explicit centroid
    * table — the REFERENCE form of the ranking every IVF path evaluates.
    * The hot paths ([[ivfAssign]]/[[ivfProbe]]) run the fused
    * [[GraftFunctions.ivfTopCells]] kernel instead (one straight-line
    * loop; this struct-array form allocates |cells| structs per row and
    * sorts them with an interpreted comparator — measured 41 µs/row at 64
    * cells in the ann drill, ~10× the fused kernel). SimilaritySpec pins
    * the two bit-identical on the full corpus, so assignment and probe
    * can never disagree with the spec'd reference (or the DuckDB oracle,
    * which replicates this ranking in SQL).
    */
  private[graft] def cellRanks(cents: Array[(Long, Array[Float])])(vec: Column): Column = {
    val scored = cents.map { case (cid, cv) =>
      struct(GraftFunctions.cosine(vec, typedlit(cv.toSeq)).as("csim"),
        lit(cid).as("cent_id"))
    }
    reverse(array_sort(array(scored.toIndexedSeq: _*)))
  }

  /** The deterministic sampled centroid table (`cells` smallest vec_ids)
    * — SF-independent, tiny, collected at plan build like any broadcast
    * build side; a trained table ([[kmeansTrain]]) drops in unchanged.
    */
  private[graft] def sampledCentroids(e: DataFrame, cells: Int)
      : Array[(Long, Array[Float])] =
    e.filter(col("vec_id") < cells)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))

  /** Map-side IVF cell assignment of a (c_id, c_vec) relation against a
    * centroid table — the per-load work of an incrementally maintained
    * index (and, written to parquet, the warehouse artifact a standing
    * corpus keeps so it never re-assigns; see [[simIvfIncremental]]).
    */
  private[graft] def ivfAssign(vecs: DataFrame,
      cents: Array[(Long, Array[Float])]): DataFrame =
    vecs.withColumn("cell",
      element_at(GraftFunctions.ivfTopCells(col("c_vec"), cents, 1), 1))

  /** IVF probe over an explicit (c_id, c_vec, cell) assignment relation:
    * queries rank their nprobe nearest cells map-side, broadcast into the
    * cell-keyed assignment table, exact-cosine rerank + bounded-heap
    * top-k. The assignment relation may be freshly computed OR loaded
    * from the warehouse — the dataflow is identical.
    */
  private[graft] def ivfProbe(assigned: DataFrame, queries: DataFrame,
      cents: Array[(Long, Array[Float])], nprobe: Int): DataFrame = {
    val q = queries
      .select(col("q_id"), col("q_vec"),
        explode(GraftFunctions.ivfTopCells(col("q_vec"), cents, nprobe))
          .as("cell"))
    topK(
      assigned.join(broadcast(q), Seq("cell"))
        .filter(col("c_id") =!= col("q_id"))
        .select(col("q_id"), col("c_id"),
          GraftFunctions.cosine(col("q_vec"), col("c_vec")).as("sim_raw")))
  }

  /** IVF probe over an explicit (trained) centroid table — identical
    * dataflow to [[simTopkIvf]], centroids swapped in.
    */
  def simTopkIvfWith(spark: SparkSession, dir: String,
      cents: Array[(Long, Array[Float])], nprobe: Int): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    ivfProbe(
      ivfAssign(e.select(col("vec_id").as("c_id"), col("embedding").as("c_vec")),
        cents),
      e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec")),
      cents, nprobe)
  }

  def simTopkIvf(spark: SparkSession, dir: String, cells: Int, nprobe: Int): DataFrame =
    simTopkIvfWith(spark, dir,
      sampledCentroids(Tables.embeddings(spark, dir), cells), nprobe)

  /** §2.3 sim_ivf_incremental: ANN over an INCREMENTALLY-LOADED corpus —
    * the stored-index story of [[dedupIncrementalMinhash]] (minhash band
    * table) and mm_cdc_incremental (CDC digest index) completed for the
    * IVF family. The standing corpus (vec_id < 400) keeps its centroid
    * table AND cell-assignment relation as warehouse artifacts — it is
    * never re-trained or re-assigned; an arriving feed (vec_id ≥ 400)
    * assigns map-side against the STORED centroid table and appends; a
    * probe reads the union. Because assignment is deterministic in the
    * centroid table alone, the stored-index probe is bit-identical to
    * recomputing the whole index — which is exactly what the oracle
    * grades (same SQL as sim_topk_ivf), and SimilaritySpec drives the
    * decomposition from parquet on disk.
    *
    * Scale shape: per-load cost tracks the DELTA (the feed's map-side
    * argmax); the standing assignment relation is cell-keyed and slim;
    * the probe broadcast is O(queries·nprobe) rows.
    */
  def simIvfIncremental(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val cents = sampledCentroids(e, 16)
    val standing = ivfAssign(
      e.filter(col("vec_id") < 400)
        .select(col("vec_id").as("c_id"), col("embedding").as("c_vec")), cents)
    val feed = ivfAssign(
      e.filter(col("vec_id") >= 400)
        .select(col("vec_id").as("c_id"), col("embedding").as("c_vec")), cents)
    ivfProbe(standing.unionAll(feed),
      e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec")),
      cents, nprobe = 6)
  }

  /** §2.3 sim_knn_graph: the whole-corpus k-nearest-neighbor graph (k=3)
    * — the primitive under embedding-based dedup clustering, diversity
    * sampling and semantic-cluster pruning: EVERY vector gets neighbors,
    * not just a fixed query set, so a per-query broadcast can't work.
    * Candidates come from the shared coordinate-difference RHP bucket
    * family (the dedup_embedding constants — baked into plan AND oracle,
    * so candidate generation itself is hash-gated); pair emission streams
    * from sorted bucket arrays; each unordered pair's exact cosine is
    * computed ONCE, then symmetrized into both directions; a bounded-heap
    * top-k per vector keeps shuffle volume O(n·k), never O(n²).
    */
  def simKnnGraph(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    // width-capped two-pass bucket pipeline (Dedup.cappedBucketPairs):
    // hot-bucket cliques report instead of emitting quadratic pairs
    val (cand, _) = Dedup.cappedBucketPairs(
      e.select(col("vec_id"), posexplode(GraftFunctions.rhpBuckets(
          col("embedding"), Dedup.EmbTables, Dedup.EmbBits, Dedup.EmbDim,
          Dedup.EmbSeed)))
        .toDF("vec_id", "tbl", "bucket"),
      "tbl", "bucket", "vec_id")
    // persist = plan barrier: the symmetrizing explode references sim_raw
    // from two struct branches, and without the barrier CollapseProject
    // would inline the cosine kernel into both (2× eval per pair).
    // Released by GraftCaches.release(spark) after the caller's action —
    // the embedding contract; it cannot be unpersisted here because the
    // returned plan still reads it
    val scored = cand
      .join(e.select(col("vec_id").as("i"), col("embedding").as("v_i")), Seq("i"))
      .join(e.select(col("vec_id").as("j"), col("embedding").as("v_j")), Seq("j"))
      .select(col("i"), col("j"),
        GraftFunctions.cosine(col("v_i"), col("v_j")).as("sim_raw"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sym = scored.select(explode(array(
        struct(col("i").as("q_id"), col("j").as("c_id"), col("sim_raw")),
        struct(col("j").as("q_id"), col("i").as("c_id"), col("sim_raw")))).as("e"))
      .select(col("e.q_id").as("q_id"), col("e.c_id").as("c_id"),
        col("e.sim_raw").as("sim_raw"))
    topK(sym, k = 3)
      .select(col("q_id").as("vec_id"), col("rank"),
        col("c_id").as("nbr_id"), col("sim"))
      .orderBy(col("vec_id"), col("rank"))
  }

  /** §2.3 sim_range_search: ALL corpus neighbors within cosine ≥ τ of each
    * query — the radius-query complement to top-k (retrieval wants "the 10
    * best", contamination / near-dup audits want "everything this close").
    * Queries broadcast, cosine + threshold evaluate map-side inside the
    * scan — unlike top-k there is no heap and NO shuffle at all beyond the
    * output sort: the filter is the aggregation. The testdata's nearest
    * sim to τ sits 1.7e-4 away, so the raw-double comparison cannot flip
    * between engines.
    */
  def simRangeSearch(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    e.select(col("vec_id").as("c_id"), col("embedding").as("c_vec"))
      .crossJoin(broadcast(q))
      .filter(col("c_id") =!= col("q_id"))
      .select(col("q_id"), col("c_id"),
        GraftFunctions.cosine(col("q_vec"), col("c_vec")).as("sim_raw"))
      .filter(col("sim_raw") >= 0.28)
      .select(col("q_id"), col("c_id"), round(col("sim_raw"), 6).as("sim"))
      .orderBy(col("q_id"), col("c_id"))
  }

  /** Squared L2 over two equal-length double arrays as a SEQUENTIAL fold
    * (zip_with then left-to-right aggregate) — the DuckDB mirror
    * (list_transform + list_reduce) folds in the same order, so the two
    * engines produce the same double bit-for-bit; no agg-ordering
    * nondeterminism ever touches a PQ distance.
    */
  private def d2(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, z) => acc + z)

  /** §2.3 sim_topk_pq: top-k ANN via product quantization (Jégou et al.
    * 2011) — the COMPRESSION side of the ANN family (LSH buckets ✓, IVF
    * cells ✓, PQ codes —): 64-dim vectors quantize to 16 subspace
    * codeword ids (6 bits each), a 12-byte code standing in for 256
    * bytes of floats, and queries rank the whole corpus by asymmetric
    * distance (exact query subvector → codeword lookup tables) without
    * ever touching the original vectors.
    *
    * Codebook: per subspace s (4 dims each — on this corpus the 16×4
    * split recalls 0.52 vs 0.31 for 8×8 at the same code budget), the
    * 64 training vectors' subvectors (vec_id < 64 — the sim_topk_ivf
    * fixed-training-id convention: the oracle replicates without
    * k-means in SQL; recall vs exact L2 top-k is floor-asserted at two
    * SFs in SimilaritySpec).
    * Encoding = per-subspace argmin of squared L2 (d2 asc, codeword id
    * asc tie-break — an array_min over struct(d, j), so each distance
    * evaluates ONCE). ADC score = the 16 per-subspace LUT entries summed
    * in fixed s order — every float op is a sequential fold mirrored
    * exactly in the oracle, so ranks cannot flip between engines.
    *
    * Scale shape: the codebook is a 1-row broadcast (16 subspaces × 64
    * codewords); encoding and ADC scoring are MAP-SIDE projections over
    * one corpus pass each (no shuffle touches a float vector — the 16-small-int
    * codes relation is what a 100 TB deployment persists as its index
    * artifact, the band-table/centroid-table pattern); the only
    * aggregation is the bounded-heap top-k, shuffling O(queries · k)
    * rows. Recall is graded against exact cosine in SimilaritySpec.
    */
  def simTopkPq(spark: SparkSession, dir: String): DataFrame = {
    val S = 16; val D = 4 // 16 subspaces × 4 dims = the 64-dim embeddings
    val sub = Tables.embeddings(spark, dir)
      .select(col("vec_id"),
        transform(col("embedding"), _.cast("double")).as("v"))
      .select(col("vec_id"),
        transform(sequence(lit(0), lit(S - 1)),
          s => slice(col("v"), s * D + 1, lit(D))).as("subs"))
    // 1-row broadcast codebook: cb[s][j] = training vector j's subspace-s
    // subvector, j ordered — sorted structs land in attributes before any
    // lambda references them (the CLAUDE.md array_sort contract)
    val cb = sub.filter(col("vec_id") < 64)
      .select(col("vec_id").as("j"), posexplode(col("subs")))
      .select(col("j"), col("pos").as("s"), col("col").as("cw"))
      .groupBy(col("s"))
      .agg(array_sort(collect_list(struct(col("j"), col("cw")))).as("jcw"))
      .select(col("s"), transform(col("jcw"), _.getField("cw")).as("cws"))
      .agg(array_sort(collect_list(struct(col("s"), col("cws")))).as("scs"))
      .select(transform(col("scs"), _.getField("cws")).as("cb"))
    val withCb = sub.crossJoin(broadcast(cb))
    // encode: vec → 16 codeword ids, map-side over the broadcast codebook
    val enc = withCb.select(col("vec_id").as("c_id"),
      zip_with(col("cb"), col("subs"), (cws, sv) =>
        array_min(transform(cws, (cw, j) =>
          struct(d2(sv, cw).as("d"), j.as("j")))).getField("j")).as("codes"))
    // per-query LUT: 16 arrays of 64 query-subvector→codeword distances
    val qs = withCb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"),
        zip_with(col("cb"), col("subs"), (cws, sv) =>
          transform(cws, cw => d2(sv, cw))).as("qlut"))
    val scored = enc.crossJoin(broadcast(qs))
      .filter(col("c_id") =!= col("q_id"))
      .select(col("q_id"), col("c_id"),
        aggregate(zip_with(col("codes"), col("qlut"),
            (c, ql) => element_at(ql, (c + 1).cast("int"))),
          lit(0.0), (acc, x) => acc + x).as("adist"))
    scored.groupBy(col("q_id"))
      .agg(GraftFunctions.topKByScore(-col("adist"), col("c_id"), K).as("top"))
      .select(col("q_id"), posexplode(col("top")))
      .select(col("q_id"), (col("pos") + 1).cast("bigint").as("rank"),
        col("col.c_id").as("c_id"), round(-col("col.sim"), 6).as("adist"))
      .orderBy(col("q_id"), col("rank"))
  }

  /** Exact top-k by L2 — the ground truth for the PQ path (ADC ranks by
    * L2, not cosine). Same broadcast-queries + bounded-heap shape as
    * [[simTopkBruteforce]]; the negated distance rides the max-heap.
    */
  private[graft] def exactL2TopK(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    topK(
      e.select(col("vec_id").as("c_id"), col("embedding").as("c_vec"))
        .crossJoin(broadcast(q))
        .filter(col("c_id") =!= col("q_id"))
        .select(col("q_id"), col("c_id"),
          (-d2(col("q_vec").cast("array<double>"),
            col("c_vec").cast("array<double>"))).as("sim_raw")))
  }

  /** §2.3 sim_recall_report: the index-quality audit rendered as a query
    * — recall@10 of every approximate ANN path against ITS exact ground
    * truth (LSH and IVF rank by cosine → exact-cosine top-k; PQ's ADC
    * ranks by L2 → exact-L2 top-k), in integer parts-per-million. This
    * is what a pipeline owner watches before trusting an index for
    * dedup or retrieval: the report recomputes the candidate paths the
    * graded operators themselves use, so the number IS the production
    * index's recall, not a simulation.
    *
    * Scale shape: each branch is the already-audited operator plan
    * (bounded-heap top-k, bucket/cell/code candidates); the report adds
    * only slim (q_id, c_id) semi-joins and 1-row count aggregates —
    * O(queries·k) rows total. Recall is exact integer division; the
    * oracle composes the SAME DuckDB texts the component queries are
    * graded with, so truth and approximation can never drift apart.
    */
  def simRecallReport(spark: SparkSession, dir: String): DataFrame = {
    def ids(df: DataFrame): DataFrame = df.select(col("q_id"), col("c_id"))
    // DELIBERATELY UNCACHED (r16 measured negative, twice): the truth
    // relations are multi-consumer (each row() reads its truth twice,
    // and exactCos feeds both the ivf and lsh rows — 4 plan occurrences
    // of the brute-force pipeline, 2 of the L2 one), which looks like
    // the textbook persist+eager-count case. But the report's wall time
    // is bounded by its SLOWEST branch (the PQ pipeline), and all the
    // redundant truth evaluations run as concurrent subtrees of the one
    // union action — they hide entirely in scheduler slack. Persisting
    // them (even with the two counts submitted as concurrent jobs,
    // guide §2.6) measured 4.63 → 6.11-9.36 s same-window isolated:
    // the materialization jobs serialize AHEAD of the union action and
    // nothing downstream gets faster. Leave the redundancy to the
    // scheduler; on a slack-free cluster revisit with the A/B in
    // OPTIMIZATION_r16.md.
    val exactCos = ids(simTopkBruteforce(spark, dir))
    val exactL2 = ids(exactL2TopK(spark, dir))
    def row(name: String, truth: DataFrame, approx: DataFrame): DataFrame =
      truth.join(approx, Seq("q_id", "c_id"), "left_semi")
        .agg(count(lit(1)).as("matched"))
        .crossJoin(truth.agg(count(lit(1)).as("n_truth")))
        .select(lit(name).as("method"), col("n_truth"), col("matched"),
          expr("(1000000 * matched) div n_truth").cast("bigint")
            .as("recall_ppm"))
    row("ivf", exactCos, ids(simTopkIvf(spark, dir)))
      .unionAll(row("lsh", exactCos, ids(simTopkLsh(spark, dir))))
      .unionAll(row("pq", exactL2, ids(simTopkPq(spark, dir))))
      .orderBy(col("method"))
  }

  private[graft] val CoresetK = 8

  /** §2.3 pipeline_coreset: k-center greedy (farthest-point) diversity
    * sampling over the embedding corpus — the coreset-selection primitive
    * under "pick k maximally-diverse exemplars" (Sener & Savarese 2018's
    * core-set active learning; Gonzalez 1985's 2-approximation). Seeded
    * at the smallest vec_id; each round selects the vector whose MAXIMUM
    * cosine similarity to the already-chosen set is smallest (the
    * farthest point under cosine), ties toward the smaller id. `cover_sim`
    * reports that selection-time similarity — the radius curve a curator
    * reads to pick k — NULL for the seed.
    *
    * Scale shape: greedy selection is inherently sequential in k, but
    * each of the k rounds is ONE map-side scan: the state relation
    * carries (vec_id, vec, smax = max cosine to chosen so far), the new
    * center folds in as `greatest(smax, cosine(vec, center))` against a
    * 256-byte broadcast literal — min over the chosen set never
    * recomputes — and the argmin is a 1-row struct-min aggregate
    * (smax asc, vec_id asc), the same k·dim bounded driver result per
    * round the k-means trainer already owns. Rounds land in
    * [[graft.Barriers.roundBarrier]] (O(1) lineage, the CLAUDE.md
    * iterative contract). The selection compares raw doubles computed by
    * the identical sequential fold on both engines (incremental
    * greatest ≡ max over the set), so the DuckDB recursive-CTE oracle
    * matches bit-for-bit; only the reported cover_sim rounds to 6dp.
    */
  def pipelineCoreset(spark: SparkSession, dir: String): DataFrame = {
    pipelineCoreset(spark, dir, CoresetK)
  }

  def pipelineCoreset(spark: SparkSession, dir: String, k: Int): DataFrame = {
    import spark.implicits._
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
    val seed = e.orderBy(col("vec_id")).limit(1)
      .collect()(0) // 1 row: the deterministic seed center
    val seedId = seed.getLong(0)
    val seedVec = seed.getSeq[Float](1)
    val chosen = scala.collection.mutable.ArrayBuffer[(Long, Long, Option[Double])](
      (1L, seedId, None))
    var state = graft.Barriers.roundBarrier(
      e.filter(col("vec_id") =!= seedId)
        .select(col("vec_id"), col("embedding"),
          GraftFunctions.cosine(col("embedding"), typedlit(seedVec)).as("smax")))
    var step = 2
    while (step <= k) {
      val best = state
        .agg(min(struct(col("smax"), col("vec_id"), col("embedding"))).as("b"))
        .select(col("b.smax"), col("b.vec_id"), col("b.embedding"))
        .collect()(0) // 1 row: this round's center (+ its 256-byte vector)
      val cover = best.getDouble(0)
      val id = best.getLong(1)
      val vec = best.getSeq[Float](2)
      chosen += ((step.toLong, id, Some(cover)))
      if (step < k) {
        state = graft.Barriers.roundBarrier(
          state.filter(col("vec_id") =!= id)
            .select(col("vec_id"), col("embedding"),
              greatest(col("smax"),
                GraftFunctions.cosine(col("embedding"), typedlit(vec)))
                .as("smax")))
      }
      step += 1
    }
    chosen.toSeq.toDF("rank", "vec_id", "cover_raw")
      .select(col("rank"), col("vec_id"),
        round(col("cover_raw"), 6).as("cover_sim"))
      .orderBy(col("rank"))
  }

  /** §2.3 sim_mmr: maximal-marginal-relevance re-ranking — the
    * diversity-aware selection primitive a curation pipeline runs AFTER
    * retrieval (coreset covers the corpus; MMR balances relevance to a
    * QUERY against redundancy among the picks): from the top-`MmrC`
    * candidates by cosine relevance to the probe vector (vec_id 0),
    * greedily select `MmrK` maximizing
    * λ·rel(c) − (1−λ)·max_{s∈chosen} sim(c, s), λ = 0.7.
    *
    * Scale shape: candidate generation is the distributed part — one
    * scan, map-side cosine against the broadcast probe, TakeOrdered 50
    * on (raw rel DESC, vec_id) — and the greedy runs driver-side over
    * the BOUNDED candidate set (50 vectors, 13 KB): bounded by
    * construction like the coreset finishing step, not corpus data. The
    * driver cosine replicates the kernel formula (ascending-index
    * double accumulation, dot/(√na·√nb)) so scores hash-match DuckDB's
    * list_cosine_similarity; the selection compares RAW doubles with a
    * vec_id tie-break, mirrored by the oracle's recursive struct-min.
    */
  private[graft] val MmrK = 10
  private[graft] val MmrC = 50
  private[graft] val MmrLambda = 0.7
  // the complement is its own LITERAL, not 1.0 - MmrLambda: the double
  // nearest 0.3 differs from 1.0-0.7 by one ulp, and the oracle writes 0.3
  private[graft] val MmrLambdaComp = 0.3

  def simMmr(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
    val qVec = e.filter(col("vec_id") === 0L)
      .collect()(0).getSeq[Float](1) // 1 row: the deterministic probe
    val cands = e.filter(col("vec_id") =!= 0L)
      .select(col("vec_id"), col("embedding"),
        GraftFunctions.cosine(col("embedding"), typedlit(qVec)).as("rel"))
      .orderBy(col("rel").desc, col("vec_id"))
      .limit(MmrC)
      .collect() // bounded: MmrC rows of 64 floats + a double
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getDouble(2)))
    // driver cosine == GraftKernels.cosineF == DuckDB
    // list_cosine_similarity: ascending-index double accumulation
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length && i < b.length) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      if (na == 0.0 || nb == 0.0) 0.0
      else dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val chosen = scala.collection.mutable.ArrayBuffer[(Long, Long, Double, Double)]()
    val picked = scala.collection.mutable.ArrayBuffer[(Long, Array[Float])]()
    var rank = 1
    while (rank <= MmrK && picked.size < cands.length) {
      // argmax (score, then SMALLEST vec_id): scan in vec_id order with
      // strict > keeps the first (smallest id) maximum — the oracle's
      // min{'ns': -score, 'id': vec_id} struct-compare exactly
      var best: (Long, Array[Float], Double, Double) = null
      cands.filter(c => !picked.exists(_._1 == c._1))
        .sortBy(_._1)
        .foreach { case (id, vec, rel) =>
          val maxSim =
            if (picked.isEmpty) 0.0
            else picked.map(p => cos(vec, p._2)).max
          val score = MmrLambda * rel - MmrLambdaComp * maxSim
          if (best == null || score > best._4) best = (id, vec, rel, score)
        }
      chosen += ((rank.toLong, best._1, best._3, best._4))
      picked += ((best._1, best._2))
      rank += 1
    }
    chosen.toSeq.toDF("rank", "vec_id", "rel_raw", "score_raw")
      .select(col("rank"), col("vec_id"),
        round(col("rel_raw"), 6).as("rel_sim"),
        round(col("score_raw"), 6).as("mmr_score"))
      .orderBy(col("rank"))
  }
}
