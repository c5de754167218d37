package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Aggregators.VarWelford
import graft.plans.MinHashConstants

/** Algebraic laws the distributed paths depend on: partial aggregates
  * merge in arbitrary split order (Spark's map-side combine), and
  * MinHash signatures compose under set union (what lets signatures
  * be computed per-partition and merged). Seeded generative checks,
  * 200 cases each.
  */
class PropertySpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(20260812L)
  private def doubles(n: Int) = List.fill(n)((rnd.nextDouble() - 0.5) * 2e6)
  private def longs(n: Int) = List.fill(n)(rnd.nextLong())

  test("Welford: any split-and-merge equals sequential accumulation") {
    for (_ <- 1 to 200) {
      val xs = doubles(2 + rnd.nextInt(200))
      val cut = rnd.nextInt(xs.length)
      val seq = xs.foldLeft(VarWelford.zero)(_.add(_))
      val (l, r) = xs.splitAt(cut)
      val merged = l.foldLeft(VarWelford.zero)(_.add(_))
        .merge(r.foldLeft(VarWelford.zero)(_.add(_)))
      assert(seq.n == merged.n)
      assert(math.abs(seq.variance - merged.variance) <=
        1e-9 * math.max(1.0, math.abs(seq.variance)), s"n=${xs.length} cut=$cut")
    }
  }

  test("Welford variance matches two-pass reference") {
    for (_ <- 1 to 200) {
      val xs = doubles(2 + rnd.nextInt(200))
      val w = xs.foldLeft(VarWelford.zero)(_.add(_))
      val mean = xs.sum / xs.length
      val ref = xs.map(x => (x - mean) * (x - mean)).sum / (xs.length - 1)
      assert(math.abs(w.variance - ref) <= 1e-8 * math.max(1.0, ref))
    }
  }

  private def sig(hashes: Seq[Long], k: Int): Seq[Long] = {
    val (a, b) = MinHashConstants.perms(k)
    Seq.tabulate(k)(p =>
      if (hashes.isEmpty) Long.MaxValue else hashes.map(h => a(p) * h + b(p)).min)
  }

  test("MinHash signatures merge by elementwise min under set union") {
    for (_ <- 1 to 200) {
      val xs = longs(rnd.nextInt(50))
      val ys = longs(rnd.nextInt(50))
      val union = sig(xs ++ ys, 16)
      val merged = sig(xs, 16).zip(sig(ys, 16)).map { case (p, q) => math.min(p, q) }
      assert(union == merged)
    }
  }

  test("Welford merge with zero is identity") {
    for (_ <- 1 to 50) {
      val w = doubles(rnd.nextInt(100)).foldLeft(VarWelford.zero)(_.add(_))
      assert(w.merge(VarWelford.zero) == w && VarWelford.zero.merge(w) == w)
    }
  }
}
