package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Vectors
import graft.plans.MinHashConstants

/** Native codegen expressions (E03/E04) against independent reference
  * implementations.
  */
class VectorExprSpec extends AnyFunSuite {
  import SharedSpark.{sf, spark}

  private lazy val emb = Tables(spark, sf, "embeddings").limit(50).cache()

  test("CosineSimilarity matches the HOF reference within 1e-12") {
    val pairs = emb.select(col("vec_id"), col("embedding").as("a"))
      .crossJoin(emb.select(col("embedding").as("b")).limit(5))
    val diff = pairs.select(
      abs(Vectors.cosineSim(col("a"), col("b")) - Vectors.cosineSimHof(col("a"), col("b"))).as("d"))
      .agg(max("d")).head().getDouble(0)
    assert(diff < 1e-12, s"max diff $diff")
  }

  test("CosineSimilarity: self-similarity 1, zero vector 0") {
    val one = emb.select(Vectors.cosineSim(col("embedding"), col("embedding")).as("c"))
      .agg(min("c"), max("c")).head()
    assert(math.abs(one.getDouble(0) - 1.0) < 1e-12 && math.abs(one.getDouble(1) - 1.0) < 1e-12)
    val z = emb.select(Vectors.cosineSim(col("embedding"),
      array_repeat(lit(0.0f), 64)).as("c")).agg(max("c")).head().getDouble(0)
    assert(z == 0.0)
  }

  test("MinHashSignature matches a Scala reference on real shingle hashes") {
    val rows = operators.DedupOps.tokenized(spark, sf)
      .select(col("doc_id"), operators.DedupOps.shingleHashes(col("ws")).as("sh"),
        Vectors.minhash(operators.DedupOps.shingleHashes(col("ws")), 16).as("sig"))
      .limit(20).collect()
    val (a, b) = MinHashConstants.perms(16)
    rows.foreach { r =>
      val sh = r.getSeq[Long](1)
      val sig = r.getSeq[Long](2)
      val expected = Array.tabulate(16) { p =>
        if (sh.isEmpty) Long.MaxValue else sh.map(h => a(p) * h + b(p)).min
      }
      assert(sig == expected.toSeq, s"doc ${r.getLong(0)}")
    }
  }

  test("SimHash64 matches a Scala reference on token hashes") {
    val rows = Tables(spark, sf, "documents")
      .select(transform(split(col("text"), " "), w => xxhash64(w)).as("th"),
        Vectors.simhash(transform(split(col("text"), " "), w => xxhash64(w))).as("sh"))
      .limit(20).collect()
    rows.foreach { r =>
      val th = r.getSeq[Long](0)
      val votes = new Array[Int](64)
      th.foreach { h => (0 until 64).foreach { b =>
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1 } }
      val expected = (0 until 64).foldLeft(0L)((acc, b) =>
        if (votes(b) > 0) acc | (1L << b) else acc)
      assert(r.getLong(1) == expected)
    }
  }

  test("HyperplaneSketch matches the seeded reference math") {
    val nT = 3; val bits = 8; val dim = 64
    val rows = Tables(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding"),
        Vectors.hyperplaneSketches(col("embedding"), nT, bits, dim).as("sk"))
      .limit(20).collect()
    // Reference: same generation order as HyperplaneSketch.planes.
    val rnd = new scala.util.Random(42L)
    val planes = Array.fill(nT * bits * dim)(rnd.nextGaussian())
    rows.foreach { r =>
      val v = r.getSeq[Float](1)
      val sk = r.getSeq[Long](2)
      val expected = Seq.tabulate(nT) { t =>
        (0 until bits).foldLeft(0L) { (key, b) =>
          val off = (t * bits + b) * dim
          val dot = (0 until math.min(dim, v.length)).map(i => planes(off + i) * v(i)).sum
          if (dot >= 0) key | (1L << b) else key
        }
      }
      assert(sk == expected, s"vec ${r.getLong(0)}")
    }
  }

  test("NearestCentroid matches a Scala argmin reference and first-min tie rule") {
    import spark.implicits._
    val cents = Array(Array(0f, 0f), Array(3f, 4f), Array(0f, 0f)) // dup centroid: tie
    val df = Seq(
      (1L, Seq(0.1f, 0.1f)),   // nearest 0 (tie with 2 -> first wins)
      (2L, Seq(3.1f, 3.9f)),   // nearest 1
      (3L, Seq(0f, 0f))).toDF("id", "v")
    val got = df.select(col("id"),
      Vectors.nearestCentroid(col("v"), cents).as("cell"))
      .as[(Long, Int)].collect().toMap
    assert(got == Map(1L -> 0, 2L -> 1, 3L -> 0))
  }

  test("native expressions survive CODEGEN_ONLY mode (no silent fallback)") {
    val key = "spark.sql.codegen.factoryMode"
    val old = spark.conf.getOption(key)
    spark.conf.set(key, "CODEGEN_ONLY")
    try {
      val cents = Array(Array.fill(64)(0.1f), Array.tabulate(64)(i => i / 64f))
      val n = Tables(spark, sf, "embeddings")
        .select(
          Vectors.cosineSim(col("embedding"), col("embedding")).as("c"),
          Vectors.hyperplaneSketches(col("embedding"), 2, 4, 64).as("sk"),
          Vectors.nearestCentroid(col("embedding"), cents).as("nc"))
        .where(col("c") > 0.5).count()
      assert(n > 0)
      val m = operators.DedupOps.tokenized(spark, sf)
        .select(
          Vectors.minhash(operators.DedupOps.shingleHashes(col("ws")), 16).as("sig"),
          Vectors.simhash(transform(col("ws"), w => xxhash64(w))).as("sh"))
        .count()
      assert(m > 0)
    } finally {
      old match { case Some(v) => spark.conf.set(key, v); case None => spark.conf.unset(key) }
    }
  }

  test("near-identical token bags give near-identical simhash") {
    import spark.implicits._
    val df = Seq(
      ("a b c d e f g h i j", "b a c d e f g h i j"),
      ("a b c d e f g h i j", "z y x w v u t s r q")).toDF("t1", "t2")
    val hams = df.select(bit_count(
      Vectors.simhash(transform(split(col("t1"), " "), w => xxhash64(w))).bitwiseXOR(
        Vectors.simhash(transform(split(col("t2"), " "), w => xxhash64(w))))).as("h"))
      .collect().map(_.getInt(0))
    assert(hams(0) == 0)   // same bag, different order
    assert(hams(1) > 10)   // disjoint bags
  }
}

/** Roaring-bitmap exact-distinct aggregation (B41, the Doris
  * BITMAP_UNION capability): partial merge across many partitions,
  * blob round trip through a rollup union, and the mergeable
  * ObjectHashAggregate plan shape.
  */
class BitmapExprSpec extends AnyFunSuite {
  import SharedSpark.spark
  import graft.functions.Bitmaps

  test("bitmap build/union/count is exact across partitions and rollup levels") {
    // 20 input partitions; key domain overlaps heavily across groups
    // (every bucket sees a shifted slice of the key space), so the
    // union must actually dedup across partial blobs, not just sum.
    val df = spark.range(0, 100000, 1, 20)
      .selectExpr("id % 7 AS g", "(id * 37) % 7919 AS k")
    val mv = df.groupBy("g").agg(Bitmaps.bitmapBuild(col("k")).as("bm"))
    // per-group exactness
    val perGroup = mv.select(col("g"), Bitmaps.bitmapCount(col("bm")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = df.groupBy("g").agg(countDistinct("k").as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perGroup === expected)
    // rollup-by-union exactness: the global distinct served from blobs
    val global = mv.agg(
      Bitmaps.bitmapCount(Bitmaps.bitmapUnion(col("bm"))).as("c"))
      .head().getLong(0)
    assert(global === 7919L, s"global=$global")
    // NULL keys are skipped, count(DISTINCT) semantics
    val withNulls = spark.range(10)
      .selectExpr("CASE WHEN id % 2 = 0 THEN id END AS k")
    assert(withNulls.agg(Bitmaps.bitmapCount(Bitmaps.bitmapBuild(col("k"))))
      .head().getLong(0) === 5L)
  }

  test("bitmap aggregation plans as mergeable ObjectHashAggregate with partial map-side combine") {
    val df = spark.range(0, 1000, 1, 4).selectExpr("id % 3 AS g", "id AS k")
    val plan = df.groupBy("g").agg(Bitmaps.bitmapBuild(col("k")).as("bm"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
    // two-phase: a partial aggregate below the exchange
    assert("ObjectHashAggregate".r.findAllIn(plan).length >= 2, plan)
  }

  test("bitmap_and_count: exact intersection cardinality of stored blobs") {
    val a = spark.range(0, 1000).selectExpr("id AS k")
      .agg(Bitmaps.bitmapBuild(col("k")).as("bm")).withColumn("j", lit(1))
    val b = spark.range(500, 2000).selectExpr("id AS k")
      .agg(Bitmaps.bitmapBuild(col("k")).as("bm2")).withColumn("j", lit(1))
    val n = a.join(b, "j")
      .select(Bitmaps.bitmapAndCount(col("bm"), col("bm2")).as("c"))
      .head().getLong(0)
    assert(n === 500L)
  }
}

/** MATCH_ALL intersection aggregate + id materialization (B42). */
class BitmapIntersectSpec extends AnyFunSuite {
  import SharedSpark.spark
  import graft.functions.Bitmaps

  test("bitmap_intersect ANDs across rows; null-buffer identity survives partial merge") {
    import spark.implicits._
    // three posting lists over many partitions: AND = {30..39}
    val bms = Seq((0, 0L, 40L), (1, 10L, 50L), (2, 30L, 70L)).toDF("term", "lo", "hi")
      .select(col("term"), explode(sequence(col("lo"), col("hi") - 1)).as("k"))
      .repartition(6)
      .groupBy("term").agg(Bitmaps.bitmapBuild(col("k")).as("bm"))
    val ids = bms.agg(Bitmaps.bitmapIntersect(col("bm")).as("bm"))
      .select(Bitmaps.bitmapToArray(col("bm")).as("ids"))
      .head().getSeq[Long](0)
    assert(ids === (30L until 40L))
    // empty input relation → empty bitmap, not a crash
    val none = bms.where(col("term") > 99)
      .agg(Bitmaps.bitmapCount(Bitmaps.bitmapIntersect(col("bm"))))
      .head().getLong(0)
    assert(none === 0L)
    // disjoint lists → genuinely empty intersection
    val d = Seq((0, 0L, 10L), (1, 20L, 30L)).toDF("term", "lo", "hi")
      .select(col("term"), explode(sequence(col("lo"), col("hi") - 1)).as("k"))
      .groupBy("term").agg(Bitmaps.bitmapBuild(col("k")).as("bm"))
      .agg(Bitmaps.bitmapCount(Bitmaps.bitmapIntersect(col("bm")))).head().getLong(0)
    assert(d === 0L)
  }

  test("SortedBucket equals the size(filter(bounds, <= v)) HOF it replaced") {
    // the Z-order rank formula: count of cut points <= value
    val cuts = Array(-3.5, -1.0, -1.0, 0.0, 2.25, 7.5, 7.5, 100.0)
    val vals = Seq(-10.0, -3.5, -1.0, -0.5, 0.0, 2.24999, 2.25, 7.5, 99.9,
      100.0, 1e9, Double.NaN)
    import spark.implicits._
    val df = vals.toDF("v")
    val boundsCol = array(cuts.map(lit(_)): _*)
    val rows = df.select(col("v"),
      Vectors.sortedBucket(col("v"), cuts).as("native"),
      size(filter(boundsCol, b => b <= col("v"))).cast("long").as("hof")).collect()
    rows.foreach { r =>
      assert(r.getLong(1) == r.getLong(2), s"value ${r.get(0)}: native ${r.getLong(1)} hof ${r.getLong(2)}")
    }
    // NULL input: the HOF yields 0 (every comparison fails), never NULL
    val n = df.select(Vectors.sortedBucket(lit(null).cast("double"), cuts).as("b"))
      .head().getLong(0)
    assert(n == 0L)
    // empty cuts: rank 0 everywhere
    val e = df.select(Vectors.sortedBucket(col("v"), Array.empty[Double]).as("b"))
      .agg(max("b")).head().getLong(0)
    assert(e == 0L)
  }
}
