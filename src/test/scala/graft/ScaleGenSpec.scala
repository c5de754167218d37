package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The sf-scale-up generator (tools/ScaleGen) behind the SURVEY §7.7
  * ratio measurements: the properties that make the scaled corpus an
  * honest scaling probe rather than a degenerate one.
  */
class ScaleGenSpec extends AnyFunSuite {
  import SharedSpark.{sf, spark}

  private val out = s"${operators.Lakehouse.scratch}/scalegen_spec"

  private lazy val generated: Unit =
    tools.ScaleGen.run(spark, sf, out, 3)

  test("copies multiply SF-scaled tables exactly, fixed dims stay fixed") {
    generated
    def n(t: String, d: String) = spark.read.parquet(s"$d/$t.parquet").count()
    for (t <- Seq("customer", "orders", "lineitem", "events", "documents", "embeddings"))
      assert(n(t, out) == 3 * n(t, sf), t)
    for (t <- Seq("region", "nation"))
      assert(n(t, out) == n(t, sf), t)
  }

  test("FK joins land inside the same copy: join cardinality scales linearly") {
    generated
    val o = spark.read.parquet(s"$out/orders.parquet")
    val c = spark.read.parquet(s"$out/customer.parquet")
    val joined = o.join(c, o("o_custkey") === c("c_custkey")).count()
    val src = Tables(spark, sf, "orders")
      .join(Tables(spark, sf, "customer"),
        col("o_custkey") === col("c_custkey")).count()
    assert(joined == 3 * src, s"$joined vs 3x$src")
  }

  test("embedding rotation: within-copy geometry exact, cross-copy cosine collapsed") {
    generated
    val e = spark.read.parquet(s"$out/embeddings.parquet")
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      a.indices.foreach { i =>
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i)
      }
      d / math.sqrt(na * nb)
    }
    val base = e.where(col("vec_id").isin(0L, 1L, 10000000L, 10000001L))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    // within-copy pairs: rotation is orthogonal, so copy-1's (0,1)
    // cosine equals copy-0's EXACTLY (same floats, shifted)
    val c0 = cos(base(0L), base(1L))
    val c1 = cos(base(10000000L), base(10000001L))
    assert(math.abs(c0 - c1) < 1e-6, s"$c0 vs $c1")
    // cross-copy: the same source vector rotated is quasi-random — far
    // below any near-dup threshold, so dedup output scales ~N, not N²
    assert(math.abs(cos(base(0L), base(10000000L))) < 0.8,
      s"cross-copy cosine ${cos(base(0L), base(10000000L))}")
  }

  test("text weave kills cross-copy near-dups, preserves within-copy dups") {
    generated
    val d = spark.read.parquet(s"$out/documents.parquet")
    def shingles(t: String): Set[String] =
      t.toLowerCase.split("\\s+").toSeq.sliding(3).map(_.mkString(" ")).toSet
    def jac(a: Set[String], b: Set[String]): Double =
      if (a.isEmpty && b.isEmpty) 1.0 else (a & b).size.toDouble / (a | b).size
    val texts = d.where(col("doc_id").isin(0L, 1000000L, 2000000L))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // copy 1 and copy 2 of doc 0 differ from copy 0 and from each other
    val s0 = shingles(texts(0L))
    assert(jac(s0, shingles(texts(1000000L))) < 0.8, "copy-1 too close to copy-0")
    assert(jac(shingles(texts(1000000L)), shingles(texts(2000000L))) < 0.8,
      "copy-1 too close to copy-2")
    // within-copy: an exact dup pair in the source stays an exact dup
    // pair after the same weave — find one source exact-dup pair if any
    val dupPair = Tables(spark, sf, "documents")
      .groupBy("text").agg(collect_list("doc_id").as("ids"))
      .where(size(col("ids")) >= 2)
      .select(col("ids").getItem(0), col("ids").getItem(1))
      .limit(1).collect().headOption
    dupPair.foreach { r =>
      val (a, b) = (r.getLong(0) + 1000000L, r.getLong(1) + 1000000L)
      val woven = d.where(col("doc_id").isin(a, b))
        .select("text").collect().map(_.getString(0))
      assert(woven(0) == woven(1), s"within-copy exact dup broken for ($a,$b)")
    }
  }
}
