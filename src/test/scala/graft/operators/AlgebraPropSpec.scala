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

  test("cell-grid concordance counting equals naive pairwise tau " +
      "counts on binned data (q_events_kendall's grid lemma)") {
    val xyGen = Gen.nonEmptyListOf(for {
      x <- Gen.chooseNum(0, 5); y <- Gen.chooseNum(0, 4)
    } yield (x, y))
    check(Prop.forAll(xyGen) { pts =>
      // naive: count concordant/discordant unordered pairs directly
      val idx = pts.zipWithIndex
      val naive = (for {
        ((x1, y1), i) <- idx; ((x2, y2), j) <- idx if i < j
      } yield {
        if (x1 == x2 || y1 == y2) (0L, 0L)
        else if ((x1 < x2) == (y1 < y2)) (1L, 0L)
        else (0L, 1L)
      }).foldLeft((0L, 0L)) { case ((c, d), (pc, pd)) => (c + pc, d + pd) }
      // grid: cell counts, ordered cell pairs x1<x2 weighted by products
      // .toSeq: a for-yield of pairs over a MAP rebuilds a Map and
      // collapses colliding (count, 0) keys (the Map.flatMap trap)
      val cells = pts.groupBy(identity)
        .map { case (k, v) => k -> v.size.toLong }.toSeq
      val grid = (for {
        ((x1, y1), n1) <- cells; ((x2, y2), n2) <- cells if x1 < x2
      } yield {
        if (y1 < y2) (n1 * n2, 0L)
        else if (y1 > y2) (0L, n1 * n2)
        else (0L, 0L)
      }).foldLeft((0L, 0L)) { case ((c, d), (pc, pd)) => (c + pc, d + pd) }
      naive == grid
    })
  }

  test("Theil-Sen slope is shift-equivariant and scale-equivariant " +
      "(q_orders_theilsen's robustness lemma)") {
    val yGen = Gen.listOfN(9, Gen.chooseNum(-1000, 1000))
    check(Prop.forAll(yGen) { ys0 =>
      val ys = ys0.map(_.toDouble)
      def sen(v: Seq[Double]): Double = {
        val slopes = (for {
          i <- v.indices; j <- v.indices if j > i
        } yield ((v(j) - v(i)) / (j - i), i, j)).sortBy(t => (t._1, t._2, t._3))
        val n = slopes.size
        (slopes((n + 1) / 2 - 1)._1 + slopes((n + 2) / 2 - 1)._1) / 2
      }
      val base = sen(ys)
      val shifted = sen(ys.map(_ + 37.0))
      val scaled = sen(ys.map(_ * 3.0))
      math.abs(shifted - base) < 1e-9 &&
        math.abs(scaled - 3.0 * base) < 1e-6
    })
  }

  test("Mahalanobis d2 is invariant to per-axis affine rescaling " +
      "(q_customer_mahalanobis' closed-form lemma)") {
    val ptsGen = Gen.listOfN(8, for {
      x <- Gen.chooseNum(1, 40); y <- Gen.chooseNum(1, 5000)
    } yield (x.toLong, y.toLong))
      // degenerate covariances (an axis constant, or perfectly
      // collinear axes) make det 0 — the lemma quantifies over
      // general-position samples only
      .suchThat { p =>
        val xs = p.map(_._1); val ys = p.map(_._2)
        val n = p.size.toLong
        val sxx = n * xs.map(x => x * x).sum - xs.sum * xs.sum
        val syy = n * ys.map(y => y * y).sum - ys.sum * ys.sum
        val sxy = n * p.map { case (x, y) => x * y }.sum - xs.sum * ys.sum
        sxx * syy - sxy * sxy != 0
      }
    def d2(pts: Seq[(Double, Double)]): Seq[Double] = {
      val n = pts.size.toDouble
      val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
      val sxx2 = pts.map(p => p._1 * p._1).sum
      val syy2 = pts.map(p => p._2 * p._2).sum
      val sxy2 = pts.map(p => p._1 * p._2).sum
      val sxx = n * sxx2 - sx * sx
      val syy = n * syy2 - sy * sy
      val sxy = n * sxy2 - sx * sy
      val det = sxx * syy - sxy * sxy
      pts.map { case (x, y) =>
        val dx = n * x - sx; val dy = n * y - sy
        val q = syy * dx * dx - 2.0 * sxy * dx * dy + sxx * dy * dy
        (n - 1.0) * q / (n * det)
      }
    }
    check(Prop.forAll(ptsGen) { ptsL =>
      val pts = ptsL.map { case (x, y) => (x.toDouble, y.toDouble) }
      val base = d2(pts)
      val rescaled = d2(pts.map { case (x, y) => (x * 5.0 + 3.0, y / 7.0) })
      base.zip(rescaled).forall { case (a, b) =>
        math.abs(a - b) <= 1e-6 * math.max(1.0, math.abs(a)) }
    })
  }

  test("lcm denominators divide exactly AND integer-ranked RA equals " +
      "rational-ranked RA (graph_link_prediction / graph_closeness " +
      "exactness lemmas)") {
    assert((2 to 16).forall(720720 % _ == 0))
    assert((1 to 12).forall(27720 % _ == 0))
    val degSetGen = Gen.nonEmptyListOf(Gen.chooseNum(2, 16))
    check(Prop.forAll(degSetGen, degSetGen) { (a, b) =>
      def raNum(ds: List[Int]): Long = ds.map(720720L / _).sum
      def raExact(ds: List[Int]): BigDecimal =
        ds.map(d => BigDecimal(1) / d).sum
      // integer ordering agrees with exact rational ordering, always
      raNum(a).compare(raNum(b)) ==
        raExact(a).compare(raExact(b))
    })
  }

  test("frontier Bellman-Ford equals full relaxation at every horizon " +
      "(graph_weighted_sssp's losslessness lemma, model level)") {
    val edgeGen = Gen.listOf(for {
      u <- Gen.chooseNum(0L, 14L); v <- Gen.chooseNum(0L, 14L)
      w <- Gen.chooseNum(1L, 9L) if u != v
    } yield (u, v, w))
    check(Prop.forAll(edgeGen, Gen.chooseNum(0, 6)) { (es, rounds) =>
      val seeds = es.map(_._1).filter(_ % 2 == 0).distinct.sorted.take(2)
      // full: relax EVERY known vertex each round
      var full = Map[Long, Long](seeds.map(_ -> 0L): _*)
      for (_ <- 1 to rounds) {
        val next = scala.collection.mutable.Map(full.toSeq: _*)
        for ((u, v, w) <- es; du <- full.get(u))
          if (!next.contains(v) || du + w < next(v)) next(v) = du + w
        full = next.toMap
      }
      // frontier: relax only last round's improved set
      var dist = Map[Long, Long](seeds.map(_ -> 0L): _*)
      var frontier = dist
      var r = 0
      while (r < rounds && frontier.nonEmpty) {
        val cand = scala.collection.mutable.Map[Long, Long]()
        for ((u, v, w) <- es; du <- frontier.get(u)) {
          val nd = du + w
          if (cand.get(v).forall(nd < _)) cand(v) = nd
        }
        val improved = cand.filter { case (v, nd) =>
          dist.get(v).forall(nd < _) }.toMap
        dist = dist ++ improved
        frontier = improved
        r += 1
      }
      dist == full
    })
  }

  test("exact-rank q80 flags exactly n - floor(4n/5) days " +
      "(q_events_tail_dependence's threshold lemma)") {
    check(Prop.forAll(Gen.chooseNum(1L, 5000L)) { n =>
      (1L to n).count(r => r * 5 > n * 4) == n - (4 * n) / 5
    })
  }

  test("VMR over nonzero entries with N symbolic equals the full-vector " +
      "sample variance/mean (text_burstiness' zeros lemma)") {
    val gen = for {
      nz <- Gen.nonEmptyListOf(Gen.chooseNum(1L, 50L))
      zeros <- Gen.chooseNum(1, 100)
    } yield (nz, zeros)
    check(Prop.forAll(gen) { case (nz, zeros) =>
      val full = nz ++ List.fill(zeros)(0L)
      val n = full.size
      val mean = full.sum.toDouble / n
      val varS = full.map(c => (c - mean) * (c - mean)).sum / (n - 1)
      val brute = varS / mean
      val s = nz.sum; val ss = nz.map(c => c * c).sum
      val formula = (n.toLong * ss - s * s).toDouble / (s * (n - 1L))
      math.abs(brute - formula) <= 1e-9 * math.max(1.0, math.abs(brute))
    })
  }

  test("ANOVA sums decompose: SSB + SSW = SST off exact integer group " +
      "moments (q_lineitem_anova's decomposition lemma)") {
    val gGen = Gen.nonEmptyListOf(
      Gen.nonEmptyListOf(Gen.chooseNum(1L, 50L)))
    check(Prop.forAll(gGen) { groups =>
      val all = groups.flatten
      val nTot = all.size.toLong
      val sTot = all.sum
      val ssTot = all.map(q => q * q).sum
      val grand = (sTot * sTot).toDouble / nTot
      val tsum = groups.map { g =>
        val s = g.sum; (s * s).toDouble / g.size }.sum
      val ssb = tsum - grand
      val ssw = ssTot.toDouble - tsum
      val sst = ssTot.toDouble - grand
      math.abs(ssb + ssw - sst) <=
        1e-9 * math.max(1.0, math.abs(sst))
    })
  }

  test("MI is non-negative and bounded by both marginal entropies " +
      "(q_events_mutual_info's information inequalities)") {
    val tableGen = for {
      rows <- Gen.chooseNum(2, 5); cols <- Gen.chooseNum(2, 7)
      cells <- Gen.listOfN(rows * cols, Gen.chooseNum(0L, 200L))
      if cells.sum > 0
    } yield (rows, cols, cells)
    check(Prop.forAll(tableGen) { case (rows, cols, cells) =>
      val c = Array.tabulate(rows, cols)((i, j) => cells(i * cols + j))
      val n = cells.sum.toDouble
      val rx = (0 until rows).map(i => c(i).sum)
      val cy = (0 until cols).map(j => (0 until rows).map(c(_)(j)).sum)
      val mi = (for {
        i <- 0 until rows; j <- 0 until cols if c(i)(j) > 0
      } yield c(i)(j) / n *
        math.log(c(i)(j) * n / (rx(i).toDouble * cy(j)))).sum
      def h(m: Seq[Long]) =
        m.filter(_ > 0).map(v => -v / n * math.log(v / n)).sum
      mi >= -1e-9 && mi <= h(rx) + 1e-9 && mi <= h(cy) + 1e-9
    })
  }
}
