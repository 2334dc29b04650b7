package graft.operators

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck gates for the ALGEBRAIC claims the relational operators
  * stand on — each property is the exact lemma a query's Scaladoc
  * asserts, checked against a brute-force model on randomized inputs
  * (the oracle gate proves the claims on the shipped corpora; these
  * prove them on the input space).
  */
class AlgebraPropSpec extends AnyFunSuite {

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  private val W = 60L // band width (model units)

  private val tsListGen: Gen[List[Long]] =
    Gen.listOf(Gen.chooseNum(0L, 2000L))

  test("band-join bucket expansion finds EXACTLY the naive theta pairs " +
      "(q_events_band_join's losslessness lemma)") {
    check(Prop.forAll(tsListGen) { ts =>
      val ev = ts.zipWithIndex // (tus, id)
      val naive = (for {
        (ta, ia) <- ev; (tb, ib) <- ev
        if ia != ib && math.abs(tb - ta) <= W
      } yield (ia, ib)).toSet
      // probe fans out to bucket-1, bucket, bucket+1; build sits in its
      // bucket; equi-join on bucket then the exact predicate
      val byBucket = ev.groupBy { case (t, _) => t / W }
      val expanded = (for {
        (ta, ia) <- ev
        bkt <- List(ta / W - 1, ta / W, ta / W + 1)
        (tb, ib) <- byBucket.getOrElse(bkt, Nil)
        if ia != ib && math.abs(tb - ta) <= W
      } yield (ia, ib)).toSet
      naive == expanded
    })
  }

  test("day - dense_rank(day) islands yield the true longest run " +
      "(q_user_streaks' gaps-and-islands lemma)") {
    val daysGen = Gen.listOf(Gen.chooseNum(0L, 60L)).map(_.distinct)
    check(Prop.forAll(daysGen) { days =>
      val sorted = days.sorted
      // brute force: longest run of consecutive integers
      val brute =
        if (sorted.isEmpty) 0
        else sorted.tail.foldLeft((1, 1, sorted.head)) {
          case ((best, cur, prev), d) =>
            val c = if (d == prev + 1) cur + 1 else 1
            (math.max(best, c), c, d)
        }._1
      // islands: day - rank constant within a consecutive run
      val islands = sorted.zipWithIndex.groupBy { case (d, r) => d - r }
      val viaIslands = if (islands.isEmpty) 0 else islands.values.map(_.size).max
      brute == viaIslands
    })
  }

  test("dyadic EWMA sums are order-independent in IEEE doubles " +
      "(q_events_ewma's exactness lemma)") {
    val countsGen = Gen.listOfN(20, Gen.chooseNum(0L, 1000000L))
    check(Prop.forAll(countsGen, Gen.chooseNum(1L, 999999L)) { (cs, seed) =>
      val terms = cs.zipWithIndex.map { case (c, k) => c * math.pow(0.5, k) }
      val fwd = terms.foldLeft(0.0)(_ + _)
      val rev = terms.reverse.foldLeft(0.0)(_ + _)
      val shuffled = new scala.util.Random(seed).shuffle(terms)
        .foldLeft(0.0)(_ + _)
      // bitwise equality — the claim is exactness, not approximation
      fwd == rev && java.lang.Double.doubleToLongBits(fwd) ==
        java.lang.Double.doubleToLongBits(shuffled)
    })
  }

  test("HITS: deferring normalization to one final division preserves " +
      "the ranking (graph_hits' rescaling lemma)") {
    // random small bipartite graph; 3 rounds normalized-per-round vs
    // unnormalized must produce identical per-side score RATIOS
    val edgeGen = Gen.listOf(
      Gen.zip(Gen.chooseNum(0, 8), Gen.chooseNum(0, 8))).map(_.distinct)
    check(Prop.forAll(edgeGen) { es =>
      es.isEmpty || {
        val cs = es.map(_._1).distinct
        def rounds(norm: Boolean): (Map[Int, Double], Map[Int, Double]) = {
          var h = cs.map(_ -> 1.0).toMap
          var a = Map.empty[Int, Double]
          for (_ <- 1 to 3) {
            a = es.groupBy(_._2).map { case (s, g) =>
              s -> g.map(e => h.getOrElse(e._1, 0.0)).sum }
            if (norm) { val m = a.values.max; a = a.map { case (k, v) => k -> v / m } }
            h = es.groupBy(_._1).map { case (c, g) =>
              c -> g.map(e => a.getOrElse(e._2, 0.0)).sum }
            if (norm) { val m = h.values.max; h = h.map { case (k, v) => k -> v / m } }
          }
          (h, a)
        }
        val (hN, aN) = rounds(norm = true)
        val (hU, aU) = rounds(norm = false)
        def ratiosAgree(n: Map[Int, Double], u: Map[Int, Double]): Boolean = {
          val mn = n.values.max; val mu = u.values.max
          n.forall { case (k, v) =>
            math.abs(v / mn - u(k) / mu) < 1e-9 }
        }
        ratiosAgree(hN, hU) && ratiosAgree(aN, aU)
      }
    })
  }

  test("doubled tie-averaged ranks satisfy the U-statistic identity " +
      "U1 + U2 = n1*n2 (q_value_mannwhitney's rank lemma)") {
    val samplesGen = for {
      a <- Gen.nonEmptyListOf(Gen.chooseNum(-50, 50))
      b <- Gen.nonEmptyListOf(Gen.chooseNum(-50, 50))
    } yield (a, b)
    check(Prop.forAll(samplesGen) { case (a, b) =>
      val all = (a.map((_, 1)) ++ b.map((_, 2)))
      // doubled rank 2r = 2|less| + |equal| + 1 per distinct value
      def rank2(v: Int): Long =
        2L * all.count(_._1 < v) + all.count(_._1 == v) + 1
      val n1 = a.size.toLong; val n2 = b.size.toLong
      val u2a = a.map(rank2).sum - n1 * (n1 + 1) // doubled U1
      val u2b = b.map(rank2).sum - n2 * (n2 + 1) // doubled U2
      // identity: U1 + U2 = n1*n2, so doubled: u2a + u2b = 2*n1*n2;
      // and the doubled U equals twice the pairwise count
      // #(a>b) + #(a==b)/2 exactly (ties in halves stay integral x2)
      val pairs2 = (for { x <- a; y <- b } yield
        if (x > y) 2L else if (x == y) 1L else 0L).sum
      u2a + u2b == 2 * n1 * n2 && u2a == pairs2
    })
  }

  test("the runs-test change count is chunking-independent and " +
      "R = 1 + changes equals the direct run count (q_orders_runs_test)") {
    val signsGen = Gen.nonEmptyListOf(Gen.oneOf(0L, 1L))
    check(Prop.forAll(signsGen) { signs =>
      val changes = signs.sliding(2).count {
        case Seq(x, y) => x != y
        case _ => false
      }
      // direct run count: group consecutive equal signs
      var runs = 1
      signs.sliding(2).foreach {
        case Seq(x, y) if x != y => runs += 1
        case _ =>
      }
      1 + changes == runs
    })
  }

  test("stub-PCM byteEnergy equals the BigInt reference on arbitrary " +
      "payloads (mm_vad's kernel lemma)") {
    check(Prop.forAll(Gen.listOf(Gen.chooseNum(-128, 127))) { bs =>
      val payload = bs.map(_.toByte).toArray
      val expected = bs.map { b =>
        val a = BigInt((b & 0xff) - 128); a * a
      }.sum
      BigInt(graft.functions.GraftKernels.byteEnergy(payload)) == expected
    })
  }
}
