/* Custom aggregate functions. Same packaging rationale as expressions.scala. */
package org.apache.spark.sql.graft

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Bounded max-heap of (score, id): keeps the k best by (score desc,
  * id asc). The evictable "worst" element sits at the queue head.
  */
final class TopKHeap(val k: Int) {
  // head = worst kept: lowest score, then highest id
  private val worstFirst: Ordering[(Double, Long)] = (a, b) => {
    val c = java.lang.Double.compare(b._1, a._1)
    if (c != 0) c else java.lang.Long.compare(a._2, b._2)
  }
  val q = new mutable.PriorityQueue[(Double, Long)]()(worstFirst)

  def add(score: Double, id: Long): Unit = {
    if (q.size < k) q.enqueue((score, id))
    else if (worstFirst.compare((score, id), q.head) < 0) { // better than worst
      q.dequeue(); q.enqueue((score, id))
    }
  }

  /** Best-first (score desc, id asc). Non-destructive: window-frame
    * execution may eval() the same aggregation buffer once per row, so
    * draining the queue here would corrupt every evaluation after the
    * first (under `worstFirst`, the best element is the ordering's
    * minimum, so an ascending sort is already best-first).
    */
  def sorted: Array[(Double, Long)] = q.toArray.sorted(worstFirst)
}

/** top_k_by_score(score double, id long, k): per-group bounded top-k as
  * array<struct<c_id,sim>> ordered best-first.
  *
  * This is the scale-safe alternative to `row_number().over(partitionBy
  * (group))` top-k: a window shuffles EVERY scored row to one reducer per
  * group (with a 100 TB corpus each reducer receives the whole corpus),
  * while a TypedImperativeAggregate combines map-side — each task sends at
  * most k (score, id) pairs per group into the exchange, so the shuffle is
  * O(groups · k), independent of corpus size.
  */
case class TopKByScore(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKHeap] with ExpectsInputTypes {

  require(k > 0, s"top-k requires k > 0, got $k")

  override def children: Seq[Expression] = Seq(score, id)
  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType, LongType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("c_id", LongType, nullable = false),
      StructField("sim", DoubleType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): TopKHeap = new TopKHeap(k)

  override def update(buf: TopKHeap, input: InternalRow): TopKHeap = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      buf.add(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKHeap, other: TopKHeap): TopKHeap = {
    other.q.foreach { case (s, i) => buf.add(s, i) }
    buf
  }

  override def eval(buf: TopKHeap): Any =
    new GenericArrayData(buf.sorted.map { case (s, i) =>
      new GenericInternalRow(Array[Any](i, s))
    })

  override def serialize(buf: TopKHeap): Array[Byte] = {
    val arr = buf.q.toArray
    val bb = ByteBuffer.allocate(4 + arr.length * 16)
    bb.putInt(arr.length)
    arr.foreach { case (s, i) => bb.putDouble(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKHeap = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val h = new TopKHeap(k)
    var x = 0
    while (x < n) { h.add(bb.getDouble, bb.getLong); x += 1 }
    h
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKByScore =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKByScore =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(score = newChildren(0), id = newChildren(1))
  override def prettyName: String = "top_k_by_score"
}

/** Misra-Gries frequent-items summary with k-1 counters. The classic
  * guarantee: every stored estimate is a LOWER bound on the true count,
  * short by at most n/k (n = items seen), and any item with true
  * frequency > n/k is guaranteed present. Merge is the Agarwal et al.
  * (Mergeable Summaries, PODS'12) reduction: sum counters, then subtract
  * the k-th largest count from all and keep positives — the combined
  * sketch keeps the n/k bound over the combined stream, which is what
  * makes the aggregate map-side combinable.
  */
final class MGSketch(val k: Int) {
  val counts = new mutable.HashMap[String, Long]

  def add(item: String, w: Long = 1L): Unit = {
    counts.get(item) match {
      case Some(c) => counts.update(item, c + w)
      case None if counts.size < k - 1 => counts.update(item, w)
      case None =>
        // decrement-all by min(w, current minimum) repeatedly is the
        // textbook loop; for w = 1 a single decrement round suffices
        var dec = w
        while (dec > 0 && counts.size >= k - 1) {
          val m = math.min(dec, counts.values.min)
          counts.mapValuesInPlace((_, c) => c - m)
          counts.filterInPlace((_, c) => c > 0)
          dec -= m
        }
        if (dec > 0) counts.update(item, dec)
    }
  }

  def mergeIn(other: MGSketch): Unit = {
    other.counts.foreach { case (i, c) =>
      counts.update(i, counts.getOrElse(i, 0L) + c)
    }
    if (counts.size > k - 1) {
      val kth = counts.values.toArray.sorted(Ordering[Long].reverse).apply(k - 1)
      counts.mapValuesInPlace((_, c) => c - kth)
      counts.filterInPlace((_, c) => c > 0)
    }
  }
}

/** misra_gries(item string, k): per-group heavy hitters as
  * array<struct<item, count_lo>> (count desc, item asc), count_lo the
  * guaranteed lower bound.
  *
  * The scale story mirrors [[TopKByScore]]: an exact per-item groupBy
  * count at 100 TB shuffles one row per DISTINCT item (a crawl-scale
  * vocabulary); this summary crosses the exchange as at most k-1
  * counters per task regardless of vocabulary size, with the n/k error
  * bound as the explicit price — the right trade everywhere a "what
  * dominates this stream" answer doesn't need exact tails.
  */
case class MisraGries(
    item: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MGSketch] with ExpectsInputTypes {

  require(k > 1, s"misra_gries requires k > 1, got $k")

  override def children: Seq[Expression] = Seq(item)
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("count_lo", LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): MGSketch = new MGSketch(k)

  override def update(buf: MGSketch, input: InternalRow): MGSketch = {
    val v = item.eval(input)
    // toString copies out of the (reused) UTF8String scan buffer
    if (v != null) buf.add(v.toString)
    buf
  }

  override def merge(buf: MGSketch, other: MGSketch): MGSketch = {
    buf.mergeIn(other); buf
  }

  override def eval(buf: MGSketch): Any =
    new GenericArrayData(buf.counts.toArray
      .sortBy { case (i, c) => (-c, i) }
      .map { case (i, c) =>
        new GenericInternalRow(Array[Any](
          org.apache.spark.unsafe.types.UTF8String.fromString(i), c))
      })

  override def serialize(buf: MGSketch): Array[Byte] = {
    val items = buf.counts.toArray
    val enc = items.map { case (i, c) =>
      (i.getBytes(java.nio.charset.StandardCharsets.UTF_8), c) }
    val bb = ByteBuffer.allocate(4 + enc.map(_._1.length + 12).sum)
    bb.putInt(enc.length)
    enc.foreach { case (b, c) =>
      bb.putInt(b.length); bb.put(b); bb.putLong(c) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MGSketch = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val s = new MGSketch(k)
    var x = 0
    while (x < n) {
      val len = bb.getInt
      val b = new Array[Byte](len)
      bb.get(b)
      val c = bb.getLong
      s.counts.update(new String(b, java.nio.charset.StandardCharsets.UTF_8), c)
      x += 1
    }
    s
  }

  override def withNewMutableAggBufferOffset(o: Int): MisraGries =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MisraGries =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(item = newChildren(0))
  override def prettyName: String = "misra_gries"
}

/** Count-Min sketch buffer: depth × width long counters, flat row-major.
  * Point estimates read min over rows — overestimates only, never under
  * (Cormode & Muthukrishnan 2005).
  */
final class CMSketch(val depth: Int, val width: Int) {
  val cells = new Array[Long](depth * width)

  def add(item: String): Unit = {
    var r = 0
    while (r < depth) {
      cells(r * width + CMSketch.bucket(item, r, width)) += 1L
      r += 1
    }
  }

  def mergeIn(other: CMSketch): Unit = {
    var i = 0
    while (i < cells.length) { cells(i) += other.cells(i); i += 1 }
  }
}

object CMSketch {
  /** Row-seeded FNV-1a-64 over UTF-8 bytes (the repo's standing digest
    * family — CdcChunks uses the same constants); the row seed folds in
    * via a golden-ratio multiple so the d hash functions are pairwise
    * distinct but individually the familiar FNV walk.
    */
  def hash(item: String, row: Int): Long = {
    var h = 0xcbf29ce484222325L ^ (row.toLong * 0x9e3779b97f4a7c15L)
    val b = item.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < b.length) {
      h = (h ^ (b(i) & 0xffL)) * 0x100000001b3L
      i += 1
    }
    h
  }

  def bucket(item: String, row: Int, width: Int): Int =
    java.lang.Math.floorMod(hash(item, row), width.toLong).toInt

  /** Point estimate over an eval()'d sketch matrix: min over rows of the
    * row's bucket counter. The query side of the sketch — tests and
    * embedders probe the returned array<array<long>> with this.
    */
  def estimate(matrix: Seq[Seq[Long]], item: String): Long =
    matrix.zipWithIndex.map { case (row, r) =>
      row(bucket(item, r, row.length))
    }.min
}

/** count_min(item string, depth, width): per-group Count-Min sketch as
  * array<array<long>> (depth rows × width counters). Estimates via
  * [[CMSketch.estimate]] are NEVER below the true count, and exceed it
  * by at most ~e·n/width with probability 1 − e^−depth — the dual of
  * [[MisraGries]] (which bounds UNDERestimates): together they bracket a
  * frequency from both sides with constant memory.
  *
  * The scale story is [[MisraGries]]'s exactly: an exact per-item count
  * at 100 TB shuffles one row per distinct item; this summary crosses
  * the exchange as a fixed depth·width counter block per task regardless
  * of vocabulary size, and the elementwise-add merge is EXACT — the
  * merged sketch is bit-identical to a single-pass sketch of the same
  * rows under any partitioning (asserted in SketchSpec), so unlike most
  * sketches its answer carries no partitioning nondeterminism at all.
  */
case class CountMin(
    item: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CMSketch] with ExpectsInputTypes {

  require(depth >= 1 && depth <= 16,
    s"count_min depth must be in [1,16], got $depth")
  require(width >= 2, s"count_min width must be >= 2, got $width")

  override def children: Seq[Expression] = Seq(item)
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def nullable: Boolean = false
  override def dataType: DataType =
    ArrayType(ArrayType(LongType, containsNull = false), containsNull = false)

  override def createAggregationBuffer(): CMSketch = new CMSketch(depth, width)

  override def update(buf: CMSketch, input: InternalRow): CMSketch = {
    val v = item.eval(input)
    // toString copies out of the (reused) UTF8String scan buffer
    if (v != null) buf.add(v.toString)
    buf
  }

  override def merge(buf: CMSketch, other: CMSketch): CMSketch = {
    buf.mergeIn(other); buf
  }

  override def eval(buf: CMSketch): Any =
    new GenericArrayData((0 until depth).map { r =>
      new GenericArrayData(
        java.util.Arrays.copyOfRange(buf.cells, r * width, (r + 1) * width))
    }.toArray[Any])

  override def serialize(buf: CMSketch): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.cells.length)
    buf.cells.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): CMSketch = {
    val bb = ByteBuffer.wrap(bytes)
    val s = new CMSketch(depth, width)
    var i = 0
    while (i < s.cells.length) { s.cells(i) = bb.getLong; i += 1 }
    s
  }

  override def withNewMutableAggBufferOffset(o: Int): CountMin =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CountMin =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(item = newChildren(0))
  override def prettyName: String = "count_min"
}

/** EXACT distinct count over a bounded DENSE integer id domain via a
  * fixed-size bitmap — the bitmap-index aggregate of the OLAP engines
  * (Druid's bitmap indexes, ClickHouse groupBitmap): one
  * map-side-combined aggregate whose partial state is a
  * ⌈(maxId+1)/64⌉-word bitmap merged by OR, evaluated by popcount.
  *
  * Why it exists next to count(DISTINCT): Spark plans count(DISTINCT k)
  * as a two-phase aggregate that first SHUFFLES every distinct
  * (group, k) pair — at 100 TB the exchange carries the distinct pairs
  * themselves (potentially ~the fact table). This aggregate's exchange
  * carries ONE fixed-size bitmap per (group, map partition) no matter
  * how many rows, and OR-merge is associative/commutative, so the
  * result is partitioning-independent and exact — no sketch error like
  * HLL. The trade is memory bounded by the ID DOMAIN, not the data:
  * per-group state is (maxId+1)/8 bytes, which is why the domain is
  * capped loudly below — dense bounded surrogate keys (customers,
  * parts, suppliers: exactly the warehouse dimension-key shape) are in;
  * open domains (hashes, URLs) must stay on count(DISTINCT)/HLL.
  *
  * Cap contract: maxId ≤ 2²⁶−1 (8 MiB/group buffer) and ids outside
  * [0, maxId] THROW — the fixpoint-cap rule: a silently dropped or
  * wrapped id would be an exactness bug the oracle might not catch at
  * test SF.
  */
case class BitmapDistinct(
    child: Expression,
    maxId: Long,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with ExpectsInputTypes {

  require(maxId >= 0 && maxId <= (1L << 26) - 1,
    s"bitmap_distinct domain must fit [0, 2^26-1] (8 MiB/group): $maxId")

  private val words = ((maxId >> 6) + 1).toInt

  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType

  override def createAggregationBuffer(): Array[Long] = new Array[Long](words)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val any = child.eval(input)
    if (any == null) return buf // SQL aggregates skip nulls
    val id = any.asInstanceOf[Long]
    require(id >= 0 && id <= maxId,
      s"bitmap_distinct id outside declared domain [0, $maxId]: $id")
    buf((id >> 6).toInt) |= 1L << (id & 63)
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < words) { buf(i) |= other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = {
    var n = 0L
    var i = 0
    while (i < words) { n += java.lang.Long.bitCount(buf(i)); i += 1 }
    n
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * words)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(words)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(o: Int): BitmapDistinct =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BitmapDistinct =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
  override def prettyName: String = "bitmap_distinct"
}

/** The bitmap ITSELF as the aggregate value (BinaryType little-endian
  * words) — [[BitmapDistinct]]'s sibling for workflows that MERGE
  * bitmaps after aggregation instead of counting immediately: the
  * bitmap-index pattern where per-grain (per-day, per-segment) bitmaps
  * are stored or window-combined and cardinalities are taken of UNIONS
  * (q_sliding_distinct ORs 7 daily bitmaps per output row — exact
  * sliding distinct with the fact table scanned ONCE, where the naive
  * plan re-scans it per window). Same domain contract as
  * BitmapDistinct: dense ids in [0, maxId], 2²⁶ cap, out-of-domain
  * THROWS, nulls skip. The serialized form is deterministic
  * (partitioning-independent under OR-merge), so downstream popcounts
  * hash-match the oracle.
  */
case class BitmapAgg(
    child: Expression,
    maxId: Long,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with ExpectsInputTypes {

  require(maxId >= 0 && maxId <= (1L << 26) - 1,
    s"bitmap_agg domain must fit [0, 2^26-1] (8 MiB/group): $maxId")

  private val words = ((maxId >> 6) + 1).toInt

  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): Array[Long] = new Array[Long](words)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val any = child.eval(input)
    if (any == null) return buf
    val id = any.asInstanceOf[Long]
    require(id >= 0 && id <= maxId,
      s"bitmap_agg id outside declared domain [0, $maxId]: $id")
    buf((id >> 6).toInt) |= 1L << (id & 63)
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < words) { buf(i) |= other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = serialize(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(o: Int): BitmapAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BitmapAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
  override def prettyName: String = "bitmap_agg"
}

/** One-pass subsampling-replicate accumulator (q_orders_subsample_ci's
  * engine): for each of `b` deterministic half-samples — inclusion iff
  * ((key·2654435761 + rep·40503 + 692873) mod (2³¹−1)) · 48271
  * mod (2³¹−1) < 2³⁰, the MINSTD-mixed hash the oracle replicates —
  * accumulates (Σ value, row count) into a single long[2b] buffer.
  *
  * This is the 2b conditional (sum, count) aggregate pairs expressed as
  * ONE expression: no ×b row explode ever materializes, and the
  * analyzer/optimizer/codegen pass sees 1 aggregate instead of 2b
  * (measured: the 400-expression form spent ~1.8 s per run in fixed
  * driver-side work at ANY data size). The per-row update hoists
  * key·2654435761 mod m out of the replicate loop, leaving ~5 integer
  * ops per (row, replicate). Merge is an exact elementwise add, so the
  * result is partitioning-independent, like every sketch in this file.
  */
case class SubsampleSums(
    key: Expression,
    value: Expression,
    b: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with ExpectsInputTypes {

  require(b >= 1 && b <= 4096, s"subsample_sums replicates in [1,4096], got $b")

  private val M = 2147483647L // 2^31 - 1 (MINSTD modulus)
  // rep·40503 + 692873 < 2^31 for every rep < 4096: precomputed residues
  private lazy val cb: Array[Long] =
    Array.tabulate(b)(r => r.toLong * 40503L + 692873L)

  override def children: Seq[Expression] = Seq(key, value)
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType, LongType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("b", LongType, nullable = false),
    StructField("s", LongType, nullable = false),
    StructField("m", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](2 * b)

  // largest key whose k·2654435761 stays inside Long: past it the raw
  // multiply wraps SILENTLY to a negative h0 and biases replicate
  // inclusion, where the SQL expression this aggregate replaced failed
  // loudly under ANSI overflow — so fail loudly here too (the
  // fixpoint-cap contract: caps THROW, never silently degrade)
  private val MaxKey = Long.MaxValue / 2654435761L

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val kAny = key.eval(input)
    val vAny = value.eval(input)
    // a null key/value drops the row, like the pre-aggregate filter did
    // (SQL aggregates skip nulls; unboxing null to 0L would invent a row)
    if (kAny == null || vAny == null) return buf
    val k = kAny.asInstanceOf[Long]
    val v = vAny.asInstanceOf[Long]
    require(k >= 0 && k <= MaxKey,
      s"subsample_sums key out of hash range [0, $MaxKey]: $k")
    val h0 = (k * 2654435761L) % M
    var r = 0
    while (r < b) {
      var t = h0 + cb(r)
      if (t >= M) t -= M
      if (t * 48271L % M < 1073741824L) {
        buf(2 * r) += v
        buf(2 * r + 1) += 1L
      }
      r += 1
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any =
    new GenericArrayData(Array.tabulate[Any](b) { r =>
      new GenericInternalRow(
        Array[Any](r.toLong, buf(2 * r), buf(2 * r + 1)))
    })

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(2 * b)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(o: Int): SubsampleSums =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SubsampleSums =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(key = newChildren(0), value = newChildren(1))
  override def prettyName: String = "subsample_sums"
}

/** Growable primitive (key, term) pair buffer for [[SortedKeyFold]] —
  * parallel long/double arrays, no per-element boxing or struct rows.
  */
final class KeyFoldBuf(initial: Int = 16) {
  var keys: Array[Long] = new Array[Long](initial)
  var terms: Array[Double] = new Array[Double](initial)
  var n: Int = 0
  def add(k: Long, t: Double): Unit = {
    if (n == keys.length) {
      keys = java.util.Arrays.copyOf(keys, n * 2)
      terms = java.util.Arrays.copyOf(terms, n * 2)
    }
    keys(n) = k; terms(n) = t; n += 1
  }
}

/** sorted_key_fold(key long, term double): the SEQUENTIAL float fold
  * Σ term ordered by (key asc, term asc), as one aggregate.
  *
  * Bit-identical to the expression chain it replaces —
  * `aggregate(sort_array(collect_list(struct(key, term))), 0.0d,
  * (acc, x) -> acc + x.term)` — because the sort is the same
  * lexicographic struct order (Long order on key; SQLOrderingUtil
  * double semantics on term ties: x == y compares 0, so -0.0 ties 0.0)
  * and the fold adds the identical doubles in the identical order from
  * the identical 0.0 seed. The float-exactness contract (e.g. the
  * Brandes δ accumulation, where addition order decides bits the
  * oracle hashes) is therefore preserved.
  *
  * Why it exists (r17): the collect_list chain pays generic
  * ArrayData/struct machinery on the hot path — per-row
  * GenericInternalRow allocation in update, full ArrayData
  * deserialize-and-foreach per partial-buffer merge
  * (Collect.deserialize was the top task-thread frame in the
  * graph_betweenness stall dumps), an UnsafeArrayData copy in
  * sort_array, and an interpreted higher-order fold. This buffer is
  * two primitive arrays: O(1) unboxed append, bulk array-copy merge,
  * 16 B/pair serialization, one index sort + tight fold loop at eval.
  *
  * `maxWidth` guards the per-group width exactly like the guarded fold
  * it replaces (the width is one group's row count — e.g. a hub
  * degree): past it the aggregate THROWS the caller-supplied message
  * (the fixpoint-cap contract: loud, never a truncation). The check
  * runs in update/merge, so an over-cap group dies while its buffer is
  * still ~maxWidth pairs, BEFORE the sort — earlier than the
  * assert_true-in-fold-seed it replaces, which only fired after the
  * degree-sized row had materialized.
  */
case class SortedKeyFold(
    key: Expression,
    term: Expression,
    maxWidth: Long,
    overflowMsg: String,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KeyFoldBuf] with ExpectsInputTypes {

  require(maxWidth > 0, s"fold width cap must be positive: $maxWidth")

  override def children: Seq[Expression] = Seq(key, term)
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType, DoubleType)
  override def nullable: Boolean = false
  override def dataType: DataType = DoubleType

  private def widthGuard(n: Int): Unit =
    if (n > maxWidth)
      throw new IllegalStateException(
        s"$overflowMsg: fold width $n past $maxWidth")

  override def createAggregationBuffer(): KeyFoldBuf = new KeyFoldBuf()

  override def update(buf: KeyFoldBuf, input: InternalRow): KeyFoldBuf = {
    val k = key.eval(input)
    val t = term.eval(input)
    if (k != null && t != null) {
      buf.add(k.asInstanceOf[Long], t.asInstanceOf[Double])
      widthGuard(buf.n)
    }
    buf
  }

  override def merge(buf: KeyFoldBuf, other: KeyFoldBuf): KeyFoldBuf = {
    var i = 0
    while (i < other.n) { buf.add(other.keys(i), other.terms(i)); i += 1 }
    widthGuard(buf.n)
    buf
  }

  override def eval(buf: KeyFoldBuf): Any = {
    val idx = Array.range(0, buf.n)
    // (key asc, term asc) — the struct(key, term) sort_array order;
    // double ties via SQLOrderingUtil semantics (x == y → 0 first, so
    // -0.0 ties 0.0; NaN handling never differs on equal-key ties that
    // the callers' unique keys rule out anyway)
    val sorted = idx.sortWith { (a, b) =>
      val kc = java.lang.Long.compare(buf.keys(a), buf.keys(b))
      if (kc != 0) kc < 0
      else {
        val x = buf.terms(a); val y = buf.terms(b)
        if (x == y) false else java.lang.Double.compare(x, y) < 0
      }
    }
    var acc = 0.0
    var i = 0
    while (i < sorted.length) { acc += buf.terms(sorted(i)); i += 1 }
    acc
  }

  override def serialize(buf: KeyFoldBuf): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.n * 16)
    bb.putInt(buf.n)
    var i = 0
    while (i < buf.n) { bb.putLong(buf.keys(i)); bb.putDouble(buf.terms(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KeyFoldBuf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val b = new KeyFoldBuf(math.max(16, n))
    var i = 0
    while (i < n) { b.add(bb.getLong, bb.getDouble); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): SortedKeyFold =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SortedKeyFold =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(key = newChildren(0), term = newChildren(1))
  override def prettyName: String = "sorted_key_fold"
}

object GraftAggregates {
  /** Column API: per-group top-k of (score, id), best-first. */
  def topKByScore(score: Column, id: Column, k: Int): Column =
    ExpressionUtils.column(
      TopKByScore(ExpressionUtils.expression(score),
        ExpressionUtils.expression(id), k).toAggregateExpression())

  /** Column API: Misra-Gries heavy hitters with k-1 counters. */
  def misraGries(item: Column, k: Int): Column =
    ExpressionUtils.column(
      MisraGries(ExpressionUtils.expression(item), k).toAggregateExpression())

  /** Column API: Count-Min sketch, depth × width counters. */
  def countMin(item: Column, depth: Int, width: Int): Column =
    ExpressionUtils.column(
      CountMin(ExpressionUtils.expression(item), depth, width)
        .toAggregateExpression())

  /** Column API: b-replicate subsample (Σ value, count) pairs keyed by
    * the MINSTD inclusion hash of (key, replicate).
    */
  def subsampleSums(key: Column, value: Column, b: Int): Column =
    ExpressionUtils.column(
      SubsampleSums(ExpressionUtils.expression(key),
        ExpressionUtils.expression(value), b).toAggregateExpression())

  /** Column API: sequential Σ term over (key asc, term asc) order —
    * the sorted-fold float-exactness primitive. `maxWidth` throws
    * `overflowMsg` past the per-group width cap.
    */
  def sortedKeyFold(key: Column, term: Column, maxWidth: Long,
      overflowMsg: String): Column =
    ExpressionUtils.column(
      SortedKeyFold(ExpressionUtils.expression(key),
        ExpressionUtils.expression(term), maxWidth, overflowMsg)
        .toAggregateExpression())

  /** Column API: exact bitmap distinct count over ids in [0, maxId]. */
  def bitmapDistinct(id: Column, maxId: Long): Column =
    ExpressionUtils.column(
      BitmapDistinct(ExpressionUtils.expression(id), maxId)
        .toAggregateExpression())

  /** Column API: the id bitmap itself (binary), OR-mergeable downstream. */
  def bitmapAgg(id: Column, maxId: Long): Column =
    ExpressionUtils.column(
      BitmapAgg(ExpressionUtils.expression(id), maxId)
        .toAggregateExpression())
}
