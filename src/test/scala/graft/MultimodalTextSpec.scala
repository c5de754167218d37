package graft

import org.scalatest.funsuite.AnyFunSuite

class MultimodalTextSpec extends AnyFunSuite {
  import SharedSpark.{sf, spark}

  test("multimodal decode: schema, typed metadata, bounded batches, determinism") {
    val df = Registry.byName("q_multimodal_meta").run(spark, sf)
    assert(df.columns.toSeq == Seq("doc_id", "media_type", "n_bytes", "content_hash",
      "width", "height", "duration_ms", "batch_size"))
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val tpe = r.getString(1)
      assert(Set("image", "audio", "video")(tpe))
      assert(r.getInt(7) <= 64 && r.getInt(7) >= 1) // batch bound
      tpe match {
        case "image" => assert(r.getInt(4) > 0 && r.getLong(6) == 0L)
        case "audio" => assert(r.getInt(4) == 0 && r.getLong(6) > 0L)
        case _       => assert(r.getInt(4) > 0 && r.getLong(6) > 0L)
      }
    }
    // Deterministic across runs (stub decode is pure)
    val again = Registry.byName("q_multimodal_meta").run(spark, sf).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("multimodal features: L1-normalized 16-bin histograms, deterministic distances") {
    val rows = Registry.byName("q_multimodal_features").run(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(2) >= 0.0 && r.getDouble(2) < 1.0) // centroid distance bounded
    }
    val again = Registry.byName("q_multimodal_features").run(spark, sf).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("langid emits a prediction from the profile set for every doc") {
    val rows = Registry.byName("q_text_langid").run(spark, sf).collect()
    val langs = operators.TextOps.langProfiles.map(_._1).toSet + "unknown"
    assert(rows.nonEmpty)
    rows.foreach(r => assert(langs(r.getString(1))))
  }

  test("quality score stays in [0,1] and token counts are consistent") {
    val rows = Registry.byName("q_text_quality").run(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getDouble(5) >= 0.0 && r.getDouble(5) <= 1.0)
      assert(r.getLong(1) > 0)
    }
  }

  test("fingerprint is order-invariant under shingle-set equality only") {
    val rows = Registry.byName("q_text_fingerprint").run(spark, sf).collect()
    assert(rows.map(_.getLong(1)).distinct.length > rows.length / 2) // mostly unique
  }
}
