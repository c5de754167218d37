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

  test("PPM decoder inverts the generator: exact header dims and pixel plane") {
    import operators.Multimodal
    val blob = Multimodal.makePpm(seed = 1007L)
    val (w, h, rgb) = Multimodal.parsePpm(blob)
    assert(w == 8 + (1007 % 25) && h == 8 + ((1007L >>> 8) % 17).toInt)
    assert(rgb.length == w * h * 3)
    // hand-crafted 2x1 image: white and black pixel -> known resize
    val tiny = "P6\n2 1\n255\n".getBytes("US-ASCII") ++
      Array[Byte](-1, -1, -1, 0, 0, 0)
    val (tw, th, trgb) = Multimodal.parsePpm(tiny)
    assert((tw, th) == (2, 1))
    val luma = Multimodal.resizeLuma(tw, th, trgb, 2, 1)
    assert(math.abs(luma(0) - 1f) < 1e-3 && luma(1) == 0f)
  }

  test("WAV decoder recovers sample rate and exact duration from chunks") {
    import operators.Multimodal
    val blob = Multimodal.makeWav(seed = 31L)
    val (rate, channels, bits, data) = Multimodal.parseWav(blob)
    assert(rate == 8000 && channels == 1 && bits == 8)
    assert(data.length == 1600 + (31 % 6400)) // samples embedded by the generator
  }

  test("Y4M decoder recovers geometry, fps and the frame count") {
    import operators.Multimodal
    val blob = Multimodal.makeY4m(seed = 12L)
    val (w, h, fps, frames) = Multimodal.parseY4m(blob)
    assert((w, h) == (16, 12) && fps == 25.0)
    assert(frames.size == 2 + (12 % 6))
    assert(frames.forall(_.length == 16 * 12))
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
