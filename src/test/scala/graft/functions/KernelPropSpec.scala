package graft.functions

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck property gates for the kernels — randomized inputs instead
  * of the fixed vectors of KernelSpec (both run; this one explores the
  * input space, that one pins exact known answers).
  */
class KernelPropSpec extends AnyFunSuite {

  /** Run a ScalaCheck property under a fixed seed budget; fail loudly. */
  private def check(prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  private def sArr(xs: Seq[String]): GenericArrayData =
    new GenericArrayData(xs.map(UTF8String.fromString).toArray)
  private def fArr(xs: Seq[Float]): GenericArrayData =
    new GenericArrayData(xs.toArray)

  private val tokenGen: Gen[String] =
    Gen.chooseNum(0, 5000).map(i => s"tok$i")
  private val tokenSetGen: Gen[Seq[String]] =
    Gen.listOf(tokenGen).map(_.distinct)

  test("jaccardSorted == set arithmetic for arbitrary token sets") {
    check(Prop.forAll(tokenSetGen, tokenSetGen) { (a, b) =>
      val expected = {
        val (sa, sb) = (a.toSet, b.toSet)
        if (sa.isEmpty && sb.isEmpty) 0.0
        else (sa & sb).size.toDouble / (sa | sb).size
      }
      val got = GraftKernels.jaccardSorted(sArr(a.sorted), sArr(b.sorted))
      math.abs(got - expected) < 1e-12
    })
  }

  test("fingerprint64 == independent BigInt FNV-1a for arbitrary strings") {
    val mask = BigInt("FFFFFFFFFFFFFFFF", 16)
    def naive(s: String): Long = {
      var h = BigInt("cbf29ce484222325", 16)
      s.getBytes("UTF-8").foreach { b =>
        h = ((h ^ BigInt(b & 0xff)) * BigInt("100000001b3", 16)) & mask
      }
      h.longValue
    }
    check(Prop.forAll(Gen.asciiPrintableStr) { s =>
      GraftKernels.fingerprint64(UTF8String.fromString(s)) == naive(s)
    })
  }

  test("cosine symmetric and bounded for arbitrary float vectors") {
    val vecGen: Gen[Seq[Float]] =
      Gen.listOfN(16, Gen.chooseNum(-100, 100).map(_ / 10.0f))
    check(Prop.forAll(vecGen, vecGen) { (a, b) =>
      val ab = GraftKernels.cosineF(fArr(a), fArr(b))
      val ba = GraftKernels.cosineF(fArr(b), fArr(a))
      ab == ba && ab >= -1.0 - 1e-9 && ab <= 1.0 + 1e-9
    })
  }

  test("minHash signatures of equal sets are equal; of disjoint large sets differ") {
    check(Prop.forAll(tokenSetGen.suchThat(_.nonEmpty)) { a =>
      val s1 = GraftKernels.minHash(sArr(a), 64, 42)
      val s2 = GraftKernels.minHash(sArr(scala.util.Random.shuffle(a)), 64, 42)
      (0 until 64).forall(i => s1.getInt(i) == s2.getInt(i)) // order-free
    })
  }

  test("simHash64 order-insensitive for arbitrary token bags") {
    check(Prop.forAll(Gen.listOf(tokenGen).suchThat(_.nonEmpty)) { bag =>
      GraftKernels.simHash64(sArr(bag)) ==
        GraftKernels.simHash64(sArr(bag.reverse))
    })
  }

  test("cdcChunkLens partitions the payload; digests never outnumber chunks") {
    val bytesGen: Gen[Array[Byte]] =
      Gen.listOf(Gen.chooseNum(-128, 127).map(_.toByte)).map(_.toArray)
    check(Prop.forAll(bytesGen) { payload =>
      val lens = GraftKernels.cdcChunkLens(payload).toLongArray()
      val digs = GraftKernels.cdcChunks(payload).toLongArray()
      // lengths are positive and sum to the payload size (a partition);
      // the digest SET is the distinct view of the same chunk sequence
      lens.forall(_ > 0) &&
        lens.sum == payload.length.toLong &&
        digs.length <= math.max(lens.length, 1) &&
        (payload.isEmpty || (lens.nonEmpty && digs.nonEmpty))
    })
  }
}
