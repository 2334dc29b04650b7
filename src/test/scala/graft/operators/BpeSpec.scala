package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** §2.4 gate for pipeline_bpe_fit: the distributed merge loop must equal
  * a plain-Scala BPE reference on the real corpus vocabulary, and the
  * greedy left-to-right overlap rule is pinned on synthetic words.
  */
class BpeSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  /** Driver BPE reference: identical semantics, plain Scala strings. */
  private def refBpe(words: Seq[(String, Long)], rounds: Int)
      : Seq[(Long, String, String, Long, String)] = {
    var tbl: Seq[(Vector[String], Long)] =
      words.map { case (w, f) => (w.split("").toVector, f) }
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Long, String, String, Long, String)]
    var round = 1
    var done = false
    while (round <= rounds && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      tbl.foreach { case (syms, f) =>
        syms.sliding(2).foreach {
          case Seq(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + f
          case _ =>
        }
      }
      val cand = counts.toSeq
        .sortBy { case ((l, r), c) => (-c, l, r) }.headOption
      cand match {
        case Some(((l, r), c)) if c >= 2 =>
          out += ((round.toLong, l, r, c, l + r))
          tbl = tbl.map { case (syms, f) =>
            val acc = scala.collection.mutable.ArrayBuffer.empty[String]
            syms.foreach { x =>
              if (acc.nonEmpty && acc.last == l && x == r) {
                acc.remove(acc.size - 1); acc += (l + r)
              } else acc += x
            }
            (acc.toVector, f)
          }
          round += 1
        case _ => done = true
      }
    }
    out.toSeq
  }

  test("pipeline_bpe_fit equals the driver BPE reference on the corpus") {
    val words = Tables.documents(spark, TestSpark.sfDir)
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val got = TextAnalysis.pipelineBpeFit(spark, TestSpark.sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getString(4))).toSeq
    assert(got === refBpe(words, 12))
    assert(got.nonEmpty) // the corpus must actually produce merges
  }

  test("greedy left-to-right merging never re-merges a fresh symbol") {
    import spark.implicits._
    // 'aaaa' x3: pair (a,a) counts 9 (overlapping); merging yields
    // (aa)(aa), NOT (aa)a a or a(aa)a — then round 2 merges (aa,aa)
    val words = Seq(("aaaa", 3L)).toDF("w", "freq")
    val got = TextAnalysis.bpeFitCore(words, 3)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getString(4))).toSeq
    assert(got === Seq(
      (1L, "a", "a", 9L, "aa"),
      (2L, "aa", "aa", 3L, "aaaa")))
  }

  test("tie-breaks are lexical on (left, right) at equal count") {
    import spark.implicits._
    // 'ba' and 'ab' both have count 2; (a,b) wins lexically
    val words = Seq(("ab", 2L), ("ba", 2L)).toDF("w", "freq")
    val got = TextAnalysis.bpeFitCore(words, 1)
      .collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(got === Seq(("a", "b", 2L)))
  }

  test("pipeline_bpe_apply: symbols round-trip to the original word " +
      "and per-doc stats match a driver replica") {
    import spark.implicits._
    val wordFreq = Tables.documents(spark, TestSpark.sfDir)
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
    val (_, fitted) = TextAnalysis.bpeRun(wordFreq, 12)
    // lossless: merging never alters the byte content of a word
    val broken = fitted
      .filter(concat_ws("", col("syms")) =!= col("w")).count()
    assert(broken === 0L)
    // replica: learn merges with the driver reference, apply by string
    val words = wordFreq.collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val merges = refBpe(words, 12).map(m => (m._2, m._3))
    def applyAll(w: String): Int = {
      var syms = w.split("").toVector
      merges.foreach { case (l, r) =>
        val acc = scala.collection.mutable.ArrayBuffer.empty[String]
        syms.foreach { x =>
          if (acc.nonEmpty && acc.last == l && x == r) {
            acc.remove(acc.size - 1); acc += (l + r)
          } else acc += x
        }
        syms = acc.toVector
      }
      syms.size
    }
    val subRef = words.map { case (w, _) => w -> applyAll(w) }.toMap
    val docs = Tables.documents(spark, TestSpark.sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expected = docs.map { case (id, text) =>
      val ws = text.split(" ", -1).toSeq
      val chars = ws.map(_.length.toLong).sum
      val bpe = ws.map(w => subRef(w).toLong).sum
      (id, ws.size.toLong, bpe, chars,
        math.rint(chars.toDouble / bpe.toDouble * 1e6) / 1e6)
    }.toSet
    val got = TextAnalysis.pipelineBpeApply(spark, TestSpark.sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSet
    assert(got === expected)
  }
}
