package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregators (the UDAF extension surface). */
object Aggregators {

  /** Welford/Chan single-pass mean+variance state: numerically stable
    * under parallel merge (the partial-aggregate path Spark runs
    * map-side), unlike the naive sum/sum-of-squares sketch which
    * cancels catastrophically at large counts.
    */
  final case class Welford(n: Long, mean: Double, m2: Double) {
    def add(x: Double): Welford = {
      val n1 = n + 1
      val d = x - mean
      val mean1 = mean + d / n1
      Welford(n1, mean1, m2 + d * (x - mean1))
    }
    def merge(o: Welford): Welford =
      if (n == 0) o
      else if (o.n == 0) this
      else {
        val nt = n + o.n
        val d = o.mean - mean
        Welford(nt, mean + d * o.n / nt, m2 + o.m2 + d * d * n * o.n / nt)
      }
    def variance: Double = if (n < 2) 0.0 else m2 / (n - 1)
  }

  /** Sample variance as a typed Aggregator over Double. */
  object VarWelford extends Aggregator[Double, Welford, Double] {
    override def zero: Welford = Welford(0L, 0.0, 0.0)
    override def reduce(b: Welford, a: Double): Welford = b.add(a)
    override def merge(b1: Welford, b2: Welford): Welford = b1.merge(b2)
    override def finish(r: Welford): Double = r.variance
    override def bufferEncoder: Encoder[Welford] = Encoders.product[Welford]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }
}
