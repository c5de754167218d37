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

/** Column wrappers for the Roaring-bitmap exact-distinct surface (the
  * Doris BITMAP_UNION capability — see plans/BitmapExpressions.scala).
  */
object Bitmaps {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftglue.Glue
  import graft.plans.{BitmapAndCardinality, BitmapBuildAgg, BitmapCardinality, BitmapIntersectAgg, BitmapToArray, BitmapUnionAgg}

  /** Aggregate an integral key column into a serialized distinct-set
    * bitmap (binary). NULL keys are skipped.
    */
  def bitmapBuild(key: Column): Column =
    Glue.column(BitmapBuildAgg(Glue.expression(key)).toAggregateExpression())

  /** OR-merge stored bitmap blobs — the rollup re-aggregation. */
  def bitmapUnion(bm: Column): Column =
    Glue.column(BitmapUnionAgg(Glue.expression(bm)).toAggregateExpression())

  /** Exact cardinality of a stored bitmap. */
  def bitmapCount(bm: Column): Column =
    Glue.column(BitmapCardinality(Glue.expression(bm)))

  /** Exact |a ∩ b| of two stored bitmaps. */
  def bitmapAndCount(a: Column, b: Column): Column =
    Glue.column(BitmapAndCardinality(Glue.expression(a), Glue.expression(b)))

  /** AND-merge stored bitmaps across rows (MATCH_ALL). */
  def bitmapIntersect(bm: Column): Column =
    Glue.column(BitmapIntersectAgg(Glue.expression(bm)).toAggregateExpression())

  /** Materialize a stored bitmap's id set (ascending array<bigint>). */
  def bitmapToArray(bm: Column): Column =
    Glue.column(BitmapToArray(Glue.expression(bm)))
}
