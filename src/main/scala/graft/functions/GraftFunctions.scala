package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.GraftColumns

/** Public Column API for graft's custom Catalyst expressions.
  *
  * Thin forwarder: the expression definitions live under
  * org.apache.spark.sql.graft (Spark keeps the expression-building
  * surface private[sql]); users import this object alongside
  * org.apache.spark.sql.functions._.
  */
object GraftFunctions {
  /** cosine(a, b) over array<float> or array<double> → double. */
  def cosine(a: Column, b: Column): Column = GraftColumns.cosine(a, b)
  /** k-minima MinHash signature of a token array. */
  def minhashSignature(tokens: Column, k: Int = 128, seed: Int = 42): Column =
    GraftColumns.minhashSignature(tokens, k, seed)
  /** 64-bit frequency-weighted SimHash of a token array. */
  def simhash64(tokens: Column): Column = GraftColumns.simhash64(tokens)
  /** Random-hyperplane LSH bucket signature of a float vector. */
  def rhpSignature(vec: Column, bits: Int = 16, seed: Int = 42): Column =
    GraftColumns.rhpSignature(vec, bits, seed)
  /** All coordinate-difference RHP table buckets as one array<int>. */
  def rhpBuckets(vec: Column, tables: Int, bits: Int, dim: Int, seed: Long): Column =
    GraftColumns.rhpBuckets(vec, tables, bits, dim, seed)
  /** Best-`take` IVF centroid ids of `vec`, best-first by
    * (cosine desc, cent_id desc) — one fused kernel per row. */
  def ivfTopCells(vec: Column, cents: Array[(Long, Array[Float])],
      take: Int): Column = GraftColumns.ivfTopCells(vec, cents, take)
  /** Cardinality of the union of bitmap_agg bitmaps (popcount of OR). */
  def bitmapOrCount(bitmaps: Column): Column =
    GraftColumns.bitmapOrCount(bitmaps)
  /** Generator: stream all unordered (i, j) element pairs of a sorted
    * array — never materializes the b²/2 pair list of a hot LSH bucket.
    */
  def pairs(sortedIds: Column): Column = GraftColumns.pairs(sortedIds)
  /** Jaccard of two sorted+distinct string arrays (single merge walk). */
  def jaccardSorted(a: Column, b: Column): Column = GraftColumns.jaccardSorted(a, b)
  /** Jaccard of two sorted+distinct int arrays (id-mapped fast path). */
  def jaccardSortedInt(a: Column, b: Column): Column =
    GraftColumns.jaccardSortedInt(a, b)
  def containmentSorted(a: Column, b: Column): Column =
    GraftColumns.containmentSorted(a, b)
  /** 64-bit FNV-1a rolling fingerprint of a string. */
  def fingerprint64(text: Column): Column = GraftColumns.fingerprint64(text)
  /** 64-bucket byte histogram (edit-distance prefilter signature). */
  def charHist64(text: Column): Column = GraftColumns.charHist64(text)
  /** Per-group bisection probe bucket index — smallest i with
    * v ≤ mids(grp)(i) (binary search; −1 for a group with no open
    * bracket this round). The bucketized-round kernel of both
    * quantile-bisection cores. */
  def bisectBucket(grp: Column, v: Column,
      mids: Seq[(Option[String], Array[Long])]): Column =
    GraftColumns.bisectBucket(grp, v, mids)
  /** L1 distance between two int histograms (histL1 > 2k ⇒ edit > k). */
  def histL1(a: Column, b: Column): Column = GraftColumns.histL1(a, b)
  /** Bloom-filter sketch aggregate over xxhash64 values. */
  def bloomAgg(hashed64: Column, items: Long, bits: Long): Column =
    GraftColumns.bloomAgg(hashed64, items, bits)
  /** Bloom membership probe (no false negatives). */
  def bloomMightContain(bloom: Column, hashed64: Column): Column =
    GraftColumns.bloomMightContain(bloom, hashed64)
  /** Deterministic stub feature over a binary payload (§2.4 multimodal). */
  def byteFeature(payload: Column): Column = GraftColumns.byteFeature(payload)
  def byteEnergy(payload: Column): Column = GraftColumns.byteEnergy(payload)

  /** Average-hash perceptual fingerprint (8×8 slice grid vs grid mean). */
  def avgHash64(payload: Column): Column = GraftColumns.avgHash64(payload)

  def cdcChunks(payload: Column): Column = GraftColumns.cdcChunks(payload)
  def cdcChunkLens(payload: Column): Column = GraftColumns.cdcChunkLens(payload)

  def misraGries(item: Column, k: Int): Column =
    org.apache.spark.sql.graft.GraftAggregates.misraGries(item, k)
  /** Count-Min sketch (overestimate-only point counts; exact-add merge). */
  def countMin(item: Column, depth: Int, width: Int): Column =
    org.apache.spark.sql.graft.GraftAggregates.countMin(item, depth, width)
  /** Per-group bounded top-k of (score, id) — map-side partial, O(k) state. */
  def topKByScore(score: Column, id: Column, k: Int): Column =
    org.apache.spark.sql.graft.GraftAggregates.topKByScore(score, id, k)
  /** Sequential Σ term in (key asc, term asc) order — bit-identical to
    * aggregate(sort_array(collect_list(struct(key, term))), 0.0, +) with
    * primitive buffers; throws `overflowMsg` past `maxWidth` pairs/group.
    */
  def sortedKeyFold(key: Column, term: Column, maxWidth: Long,
      overflowMsg: String): Column =
    org.apache.spark.sql.graft.GraftAggregates.sortedKeyFold(
      key, term, maxWidth, overflowMsg)
}
