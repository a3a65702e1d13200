package graft

import graft.search.Matcher
import org.scalatest.funsuite.AnyFunSuite

/** Hungarian max-weight matching — micro fixtures per FIXTURES.md §B.6 and
  * properties mirroring networkx.max_weight_matching semantics
  * (reference: search/content_search.py:335-345).
  */
class MatcherSpec extends AnyFunSuite {

  private def approx(a: Double, b: Double, tol: Double = 1e-9) =
    math.abs(a - b) <= tol

  test("2x2 clear diagonal") {
    val (s, a) = Matcher.maxWeight(Array(Array(1.0, 0.1), Array(0.1, 1.0)))
    assert(approx(s, 2.0))
    assert(a.toSeq == Seq(0, 1))
  }

  test("2x2 anti-diagonal beats greedy") {
    // greedy picks (0,0)=0.9 then nothing better than 0.0 → 0.9;
    // optimal is 0.8 + 0.7 = 1.5
    val (s, _) = Matcher.maxWeight(Array(Array(0.9, 0.8), Array(0.7, 0.0)))
    assert(approx(s, 1.5))
  }

  test("rectangular 3x2 and transposed 2x3 agree") {
    val w = Array(Array(0.5, 0.9), Array(0.8, 0.1), Array(0.3, 0.2))
    val (s1, a1) = Matcher.maxWeight(w)
    val t = Array(Array(0.5, 0.8, 0.3), Array(0.9, 0.1, 0.2))
    val (s2, _) = Matcher.maxWeight(t)
    assert(approx(s1, s2))
    assert(approx(s1, 1.7)) // 0.9 + 0.8
    assert(a1.count(_ >= 0) == 2)
  }

  test("zero-weight edges contribute nothing") {
    val (s, _) = Matcher.maxWeight(Array(Array(0.0, 0.0), Array(0.0, 0.0)))
    assert(approx(s, 0.0))
  }

  test("empty and single") {
    assert(Matcher.maxWeight(Array.empty[Array[Double]])._1 == 0.0)
    val (s, a) = Matcher.maxWeight(Array(Array(0.42)))
    assert(approx(s, 0.42) && a.toSeq == Seq(0))
  }

  test("properties on random matrices: valid, bounded, >= greedy") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 300) {
      val n = 1 + rnd.nextInt(6)
      val m = 1 + rnd.nextInt(6)
      val w = Array.fill(n, m)(rnd.nextDouble())
      val (score, assign) = Matcher.maxWeight(w)
      val used = assign.filter(_ >= 0)
      assert(used.distinct.length == used.length, "assignment must be injective")
      val sum = assign.zipWithIndex.collect {
        case (j, i) if j >= 0 && j < w(i).length => w(i)(j)
      }.sum
      assert(approx(score, sum), "score equals matched weight sum")
      assert(score <= w.map(_.max).sum + 1e-9, "bounded by row maxima")
      // greedy lower bound
      val takenR = scala.collection.mutable.Set[Int]()
      val takenC = scala.collection.mutable.Set[Int]()
      var greedy = 0.0
      (for (i <- 0 until n; j <- 0 until m) yield (w(i)(j), i, j))
        .sortBy(-_._1).foreach { case (v, i, j) =>
          if (!takenR(i) && !takenC(j)) { greedy += v; takenR += i; takenC += j }
        }
      assert(score >= greedy - 1e-9, "at least as good as greedy")
    }
  }

  test("brute-force optimality on small matrices") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 100) {
      val n = 1 + rnd.nextInt(4)
      val m = 1 + rnd.nextInt(4)
      val w = Array.fill(n, m)(rnd.nextDouble())
      val (score, _) = Matcher.maxWeight(w)
      // brute force over all injective row→col maps
      def best(rows: List[Int], free: Set[Int]): Double = rows match {
        case Nil => 0.0
        case r :: rest =>
          val skip = best(rest, free)
          val take = free.map(c => w(r)(c) + best(rest, free - c))
            .foldLeft(Double.MinValue)(math.max)
          math.max(skip, if (free.isEmpty) Double.MinValue else take)
      }
      val opt = best((0 until n).toList, (0 until m).toSet)
      assert(approx(score, opt, 1e-9), s"hungarian $score vs brute $opt")
    }
  }
}
