package graft.functions

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Cross-implementation property gates for the codegen'd kernels — each
  * kernel is checked against an INDEPENDENT straight-Scala implementation
  * (different arithmetic path), not against itself.
  */
class KernelSpec extends AnyFunSuite {

  private def fArr(xs: Seq[Float]): GenericArrayData = new GenericArrayData(xs.toArray)
  private def sArr(xs: Seq[String]): GenericArrayData =
    new GenericArrayData(xs.map(UTF8String.fromString).toArray)

  // deterministic pseudo-random floats (no RNG state shared with kernels)
  private def vec(seed: Int, n: Int = 64): Seq[Float] =
    (0 until n).map(i => math.sin(seed * 997.0 + i * 13.7).toFloat)

  test("cosine: matches independent implementation, symmetric, bounded, self=1") {
    def naive(a: Seq[Float], b: Seq[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
      if (na == 0 || nb == 0) 0.0 else dot / (na * nb)
    }
    for (s <- 1 to 20) {
      val a = vec(s); val b = vec(s + 100)
      val k = GraftKernels.cosineF(fArr(a), fArr(b))
      assert(math.abs(k - naive(a, b)) < 1e-12)
      assert(math.abs(GraftKernels.cosineF(fArr(b), fArr(a)) - k) === 0.0) // symmetry
      assert(k >= -1.0 - 1e-12 && k <= 1.0 + 1e-12)
      assert(math.abs(GraftKernels.cosineF(fArr(a), fArr(a)) - 1.0) < 1e-12)
    }
    assert(GraftKernels.cosineF(fArr(Seq(0f, 0f)), fArr(Seq(1f, 2f))) === 0.0)
    // scale invariance: cos(2a, b) == cos(a, b) up to fp
    val a = vec(7); val b = vec(8)
    assert(math.abs(GraftKernels.cosineF(fArr(a.map(_ * 2)), fArr(b)) -
      GraftKernels.cosineF(fArr(a), fArr(b))) < 1e-9)
  }

  test("fingerprint64: matches independent BigInt FNV-1a; stable; input-sensitive") {
    def naive(s: String): Long = {
      val mask = BigInt("FFFFFFFFFFFFFFFF", 16)
      var h = BigInt("cbf29ce484222325", 16)
      s.getBytes("UTF-8").foreach { b =>
        h = h ^ BigInt(b & 0xff)
        h = (h * BigInt("100000001b3", 16)) & mask
      }
      h.longValue
    }
    val samples = Seq("", "a", "ab", "hello world", "héllo wörld ünïcode",
      "the quick brown fox", "the quick brown fox.", "\u0000\u0001\u0002")
    samples.foreach { s =>
      assert(GraftKernels.fingerprint64(UTF8String.fromString(s)) === naive(s), s"on '$s'")
    }
    assert(GraftKernels.fingerprint64(UTF8String.fromString("abc")) !==
      GraftKernels.fingerprint64(UTF8String.fromString("acb")))
  }

  test("minHash: signature similarity estimates Jaccard within sampling error") {
    // two token sets with known overlap: |A|=|B|=200, |A∩B|=150 ⇒ J=150/250=0.6
    val common = (0 until 150).map(i => s"tok_c$i")
    val a = sArr(common ++ (0 until 50).map(i => s"tok_a$i"))
    val b = sArr(common ++ (0 until 50).map(i => s"tok_b$i"))
    val k = 512
    val sa = GraftKernels.minHash(a, k, 42)
    val sb = GraftKernels.minHash(b, k, 42)
    val agree = (0 until k).count(i => sa.getInt(i) == sb.getInt(i))
    val est = agree.toDouble / k
    // stderr = sqrt(J(1-J)/k) ≈ 0.0217; 4σ band
    assert(math.abs(est - 0.6) < 0.09, s"minhash estimate $est vs true 0.6")
    // identical sets ⇒ identical signatures; determinism across calls
    assert((0 until k).forall(i =>
      GraftKernels.minHash(a, k, 42).getInt(i) === sa.getInt(i)))
  }

  test("simHash64: deterministic, order-insensitive, overlap-sensitive") {
    val t1 = sArr(Seq("a", "b", "c", "d", "e", "f", "g", "h"))
    val t1r = sArr(Seq("h", "g", "f", "e", "d", "c", "b", "a"))
    val sig1 = GraftKernels.simHash64(t1)
    assert(GraftKernels.simHash64(t1r) === sig1) // bag semantics: order-free
    // near-identical docs have closer signatures than unrelated docs
    def ham(x: Long, y: Long): Int = java.lang.Long.bitCount(x ^ y)
    val base = (0 until 100).map(i => s"w$i")
    val near = base.updated(0, "CHANGED")
    val far = (0 until 100).map(i => s"zz$i")
    val hNear = ham(GraftKernels.simHash64(sArr(base)), GraftKernels.simHash64(sArr(near)))
    val hFar = ham(GraftKernels.simHash64(sArr(base)), GraftKernels.simHash64(sArr(far)))
    assert(hNear < hFar)
    assert(GraftKernels.simHash64(sArr(Seq.empty)) === 0L) // the clique sentinel
  }

  test("jaccardSorted: matches set-arithmetic on sorted distinct arrays") {
    def naive(a: Seq[String], b: Seq[String]): Double = {
      val (sa, sb) = (a.toSet, b.toSet)
      if (sa.isEmpty && sb.isEmpty) 0.0
      else (sa & sb).size.toDouble / (sa | sb).size
    }
    val cases = Seq(
      (Seq("a", "b", "c"), Seq("b", "c", "d")),
      (Seq.empty[String], Seq("x")),
      (Seq("a"), Seq("a")),
      (Seq("a", "z"), Seq("b", "y")),
      ((0 until 100).map(i => f"t$i%03d"), (50 until 150).map(i => f"t$i%03d")))
    cases.foreach { case (a, b) =>
      val got = GraftKernels.jaccardSorted(sArr(a.sorted), sArr(b.sorted))
      assert(math.abs(got - naive(a, b)) < 1e-15, s"on $a vs $b")
    }
  }

  test("containmentSorted: matches set-arithmetic; asymmetric; empty-left is 0") {
    def naive(a: Seq[String], b: Seq[String]): Double = {
      val sa = a.toSet
      if (sa.isEmpty) 0.0 else (sa & b.toSet).size.toDouble / sa.size
    }
    val cases = Seq(
      (Seq("a", "b", "c"), Seq("b", "c", "d")),
      (Seq.empty[String], Seq("x")),
      (Seq("a"), Seq("a")),
      (Seq("a", "b"), Seq("a", "b", "c", "d", "e")),
      ((0 until 80).map(i => f"t$i%03d"), (0 until 100).map(i => f"t$i%03d")))
    cases.foreach { case (a, b) =>
      val got = GraftKernels.containmentSorted(sArr(a.sorted), sArr(b.sorted))
      assert(math.abs(got - naive(a, b)) < 1e-15, s"on $a vs $b")
      // asymmetry: a fully inside b gives 1.0 left-to-right only
    }
    assert(GraftKernels.containmentSorted(
      sArr(Seq("a", "b")), sArr(Seq("a", "b", "c"))) === 1.0)
    assert(GraftKernels.containmentSorted(
      sArr(Seq("a", "b", "c")), sArr(Seq("a", "b"))) < 1.0)
  }

  test("rhpSignature: deterministic, within bit range, input-sensitive") {
    val v1 = fArr(vec(1)); val v2 = fArr(vec(2))
    val s1 = GraftKernels.rhpSignature(v1, 8, 42)
    assert(GraftKernels.rhpSignature(v1, 8, 42) === s1)
    assert(s1 >= 0 && s1 < 256)
    // different seeds give different tables (on at least one of these vecs)
    assert((1 to 10).exists(t => GraftKernels.rhpSignature(v1, 8, 42 + t) != s1) ||
      GraftKernels.rhpSignature(v2, 8, 43) != GraftKernels.rhpSignature(v2, 8, 42))
  }

  test("jaccardSortedInt == jaccardSorted under any id bijection") {
    def iArr(xs: Seq[Int]): GenericArrayData = new GenericArrayData(xs.toArray)
    val rng = new scala.util.Random(7)
    for (_ <- 1 to 200) {
      val universe = (0 until 40).map(i => f"tok$i%02d")
      val a = rng.shuffle(universe).take(1 + rng.nextInt(20)).sorted
      val b = rng.shuffle(universe).take(1 + rng.nextInt(20)).sorted
      // a random bijection universe -> distinct ints, order-preserved per set
      val ids = rng.shuffle((1 to 1000).toList).take(universe.size)
      val idOf = universe.zip(ids).toMap
      val ai = a.map(idOf).sorted
      val bi = b.map(idOf).sorted
      val s = GraftKernels.jaccardSorted(sArr(a), sArr(b))
      val i = GraftKernels.jaccardSortedInt(iArr(ai), iArr(bi))
      assert(s === i, s"bijection changed jaccard: $a vs $b")
    }
  }

  test("histL1 edit-distance bound is lossless: L1 > 2k never holds for edit <= k") {
    def hist(s: String): GenericArrayData = {
      val h = new Array[Int](64)
      s.getBytes("UTF-8").foreach(b => h(b & 63) += 1)
      new GenericArrayData(h)
    }
    val rng = new scala.util.Random(11)
    val alpha = "abcdefghijklmnopqrstuvwxyz 0123456789"
    for (_ <- 1 to 300) {
      val base = (0 until 50 + rng.nextInt(100))
        .map(_ => alpha(rng.nextInt(alpha.length))).mkString
      // apply k random single-char edits (insert/delete/substitute)
      val k = rng.nextInt(21)
      var s = base
      for (_ <- 0 until k) {
        val op = rng.nextInt(3)
        val pos = rng.nextInt(s.length)
        s = op match {
          case 0 => s.substring(0, pos) + alpha(rng.nextInt(alpha.length)) + s.substring(pos)
          case 1 if s.length > 1 => s.substring(0, pos) + s.substring(pos + 1)
          case _ => s.substring(0, pos) + alpha(rng.nextInt(alpha.length)) + s.substring(pos + 1)
        }
      }
      // true edit distance <= k by construction; the bound must hold
      val l1 = GraftKernels.histL1(hist(base), hist(s))
      assert(l1 <= 2 * k, s"L1 $l1 > 2k=${2 * k} would have pruned a true pair")
    }
  }

  test("rhpBuckets kernel == the unrolled per-table bucket expressions") {
    import graft.operators.RhpBlocking
    val tables = 16; val bits = 4; val dim = 64; val seed = 7L
    val pairs = RhpBlocking.indexPairs(tables, bits, dim, seed)
    val flat = pairs.flatten.flatMap { case (i, j) => Seq(i - 1, j - 1) }.toArray
    for (s <- 1 to 25) {
      val v = vec(s)
      val got = GraftKernels.rhpBuckets(fArr(v), flat, bits)
      val want = pairs.map { tbl =>
        tbl.zipWithIndex.map { case ((i, j), b) =>
          if (v(i - 1) > v(j - 1)) 1 << b else 0
        }.sum
      }
      assert(got.toIntArray().toSeq === want, s"vec $s")
    }
  }
}
