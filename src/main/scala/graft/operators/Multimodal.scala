package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** D13/D18: multimodal columns with REAL codecs. Media payloads are
  * opaque BINARY columns; decode / feature-extraction runs
  * per-partition in fixed-size batches (the shape a production
  * decoder or Arrow-batched UDF needs: codec init amortized per
  * batch, bounded memory per batch — not per row, not whole
  * partition).
  *
  * The payloads are VALID files in three public uncompressed formats
  * chosen to be decodable with zero external libraries — P6 PPM
  * (image), RIFF/PCM WAV (audio), YUV4MPEG2 (video) — and the
  * decoders below genuinely parse them: header fields give
  * width/height/rate, pixel/sample planes are decoded, images go
  * through a real nearest-neighbor resize and videos through real
  * frame extraction before featurization. Swapping in a JPEG/FLAC
  * codec changes only the three parse functions; every Spark-side
  * shape stays.
  *
  * Since the corpus tables carry no media, the blobs are synthesized
  * deterministically per doc_id (a seeded LCG byte stream wrapped in
  * real headers) — generation is the stand-in, decoding is real.
  */
object Multimodal {

  /** Raw media row: opaque payload + source metadata. */
  final case class MediaRow(doc_id: Long, media_type: String, blob: Array[Byte])

  /** Decoded-feature row emitted by the batched decoder. */
  final case class MediaFeatures(
      doc_id: Long, media_type: String, n_bytes: Long, content_hash: Long,
      width: Int, height: Int, duration_ms: Long, batch_size: Int)

  private val BatchSize = 64

  // ---------------- synthesis (valid files, deterministic) ----------

  private def byteStream(seed: Long): Iterator[Byte] = {
    var x = seed * 6364136223846793005L + 1442695040888963407L
    Iterator.continually {
      x = x * 6364136223846793005L + 1442695040888963407L
      (x >>> 33).toByte
    }
  }

  /** Valid binary P6 PPM: `P6\n<w> <h>\n255\n` + w*h RGB triples. */
  def makePpm(seed: Long): Array[Byte] = {
    val w = 8 + (seed % 25).toInt
    val h = 8 + ((seed >>> 8) % 17).toInt
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    header ++ byteStream(seed).take(w * h * 3).toArray
  }

  /** Valid RIFF/WAVE, PCM mono 8-bit 8 kHz. */
  def makeWav(seed: Long): Array[Byte] = {
    val rate = 8000
    val n = 1600 + (seed % 6400).toInt // 200..999 ms
    val data = byteStream(seed).take(n).toArray
    val out = java.nio.ByteBuffer.allocate(44 + n)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + n)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(rate).putInt(rate) // sample rate, byte rate (8-bit mono)
      .putShort(1).putShort(8) // block align, bits
      .put("data".getBytes("US-ASCII")).putInt(n)
      .put(data)
    out.array()
  }

  /** Valid YUV4MPEG2, C420, 16×12 at 25 fps, 2..7 frames. */
  def makeY4m(seed: Long): Array[Byte] = {
    val (w, h) = (16, 12)
    val frames = 2 + (seed % 6).toInt
    val header = s"YUV4MPEG2 W$w H$h F25:1 Ip A1:1 C420\n".getBytes("US-ASCII")
    val frameBytes = w * h + 2 * (w / 2) * (h / 2)
    val bs = byteStream(seed)
    val body = (0 until frames).flatMap { _ =>
      "FRAME\n".getBytes("US-ASCII") ++ bs.take(frameBytes).toArray
    }
    header ++ body
  }

  /** Synthesized media table over documents: one valid media file per
    * doc, type cycling deterministically by doc_id.
    */
  def syntheticMedia(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // fan: synthesis AND the downstream decode both run partition-local
    // on this frame — without it the whole media path is one scan task
    Tables.fan(Tables(s, d, "documents").select("doc_id")).as[Long].map { id =>
      (id % 3) match {
        case 0 => MediaRow(id, "image", makePpm(id + 7))
        case 1 => MediaRow(id, "audio", makeWav(id + 7))
        case _ => MediaRow(id, "video", makeY4m(id + 7))
      }
    }.toDF()
  }

  // ---------------- real decoders ----------------------------------

  /** P6 PPM parse: tokenized header (comments allowed), then the
    * binary RGB plane. Returns (width, height, rgb bytes).
    */
  def parsePpm(blob: Array[Byte]): (Int, Int, Array[Byte]) = {
    var i = 0
    def token(): String = {
      while (i < blob.length &&
        (blob(i) == ' ' || blob(i) == '\n' || blob(i) == '\t' || blob(i) == '\r')) i += 1
      if (i < blob.length && blob(i) == '#') { // comment to EOL
        while (i < blob.length && blob(i) != '\n') i += 1
        return token()
      }
      val s = i
      while (i < blob.length && !(blob(i) == ' ' || blob(i) == '\n' ||
        blob(i) == '\t' || blob(i) == '\r')) i += 1
      new String(blob, s, i - s, "US-ASCII")
    }
    require(token() == "P6", "not a P6 PPM")
    val w = token().toInt
    val h = token().toInt
    require(token().toInt == 255, "only maxval 255 supported")
    i += 1 // single whitespace after maxval
    (w, h, java.util.Arrays.copyOfRange(blob, i, i + w * h * 3))
  }

  /** RIFF/WAVE parse: walks the chunk list for fmt + data. Returns
    * (sampleRate, channels, bitsPerSample, pcm bytes).
    */
  def parseWav(blob: Array[Byte]): (Int, Int, Int, Array[Byte]) = {
    val bb = java.nio.ByteBuffer.wrap(blob).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourcc(at: Int) = new String(blob, at, 4, "US-ASCII")
    require(fourcc(0) == "RIFF" && fourcc(8) == "WAVE", "not a RIFF/WAVE")
    var pos = 12
    var rate = 0; var channels = 0; var bits = 0
    var data: Array[Byte] = Array.empty
    while (pos + 8 <= blob.length) {
      val id = fourcc(pos)
      val size = bb.getInt(pos + 4)
      id match {
        case "fmt " =>
          channels = bb.getShort(pos + 10)
          rate = bb.getInt(pos + 12)
          bits = bb.getShort(pos + 22)
        case "data" =>
          data = java.util.Arrays.copyOfRange(blob, pos + 8, pos + 8 + size)
        case _ => ()
      }
      pos += 8 + size + (size & 1) // chunks are word-aligned
    }
    require(rate > 0 && data.nonEmpty, "missing fmt/data chunk")
    (rate, channels, bits, data)
  }

  /** YUV4MPEG2 parse: header params (W/H/F), then FRAME-delimited
    * C420 planes. Returns (width, height, fps, Y planes per frame).
    */
  def parseY4m(blob: Array[Byte]): (Int, Int, Double, Seq[Array[Byte]]) = {
    var nl = blob.indexOf('\n'.toByte)
    val header = new String(blob, 0, nl, "US-ASCII")
    val parts = header.split(" ")
    require(parts(0) == "YUV4MPEG2", "not a YUV4MPEG2 stream")
    def param(p: Char): Option[String] =
      parts.find(s => s.nonEmpty && s.head == p).map(_.tail)
    val w = param('W').get.toInt
    val h = param('H').get.toInt
    val fps = param('F').map { f =>
      val Array(num, den) = f.split(":"); num.toDouble / den.toDouble
    }.getOrElse(25.0)
    val ySize = w * h
    val frameBytes = ySize + 2 * (w / 2) * (h / 2)
    val frames = Seq.newBuilder[Array[Byte]]
    var pos = nl + 1
    while (pos < blob.length) {
      val fe = blob.indexOf('\n'.toByte, pos)
      require(new String(blob, pos, 5, "US-ASCII") == "FRAME", "bad frame marker")
      val start = fe + 1
      frames += java.util.Arrays.copyOfRange(blob, start, start + ySize)
      pos = start + frameBytes
    }
    (w, h, fps, frames.result())
  }

  // ---------------- decode + featurize (batched) --------------------

  /** Batched real decode: sniffs the container magic, parses the
    * header/planes, emits typed metadata. One batch per codec-init
    * unit, exactly as an Arrow-batched Python UDF would shape it.
    */
  private def decodeBatch(batch: Seq[MediaRow]): Seq[MediaFeatures] =
    batch.map { m =>
      val hash = scala.util.hashing.MurmurHash3.bytesHash(m.blob, 42).toLong & 0x7FFFFFFFL
      val (w, h, durMs) = m.media_type match {
        case "image" =>
          val (pw, ph, _) = parsePpm(m.blob); (pw, ph, 0L)
        case "audio" =>
          val (rate, channels, bits, data) = parseWav(m.blob)
          val samples = data.length / (channels * math.max(1, bits / 8))
          (0, 0, samples.toLong * 1000L / rate)
        case _ =>
          val (vw, vh, fps, frames) = parseY4m(m.blob)
          (vw, vh, (frames.size * 1000L / fps).toLong)
      }
      MediaFeatures(m.doc_id, m.media_type, m.blob.length.toLong, hash, w, h, durMs, batch.size)
    }

  /** Real nearest-neighbor resize of a decoded RGB image to tw×th
    * luminance (the thumbnail step of an image ingest).
    */
  def resizeLuma(w: Int, h: Int, rgb: Array[Byte], tw: Int, th: Int): Array[Float] = {
    val out = new Array[Float](tw * th)
    var ty = 0
    while (ty < th) {
      var tx = 0
      while (tx < tw) {
        val sx = math.min(w - 1, tx * w / tw)
        val sy = math.min(h - 1, ty * h / th)
        val p = (sy * w + sx) * 3
        val r = rgb(p) & 0xFF; val g = rgb(p + 1) & 0xFF; val b = rgb(p + 2) & 0xFF
        out(ty * tw + tx) = (0.299f * r + 0.587f * g + 0.114f * b) / 255f
        tx += 1
      }
      ty += 1
    }
    out
  }

  private def l1(hist: Array[Float]): Array[Float] = {
    val s = math.max(1e-9f, hist.sum); hist.map(_ / s)
  }

  /** Real featurization from DECODED content: images are resized
    * (nearest-neighbor 8×8) then luminance-histogrammed, audio is
    * amplitude-histogrammed from the PCM samples, video frame-samples
    * its first frame's Y plane — all 16-bin L1-normalized vectors
    * feeding the D05-07 ANN operators.
    */
  private def featurize(batch: Seq[MediaRow]): Seq[(Long, String, Array[Float])] =
    batch.map { m =>
      val hist = new Array[Float](16)
      m.media_type match {
        case "image" =>
          val (w, h, rgb) = parsePpm(m.blob)
          resizeLuma(w, h, rgb, 8, 8).foreach(l => hist(math.min(15, (l * 16).toInt)) += 1f)
        case "audio" =>
          val (_, _, _, data) = parseWav(m.blob)
          data.foreach(b => hist((b & 0xFF) >> 4) += 1f)
        case _ =>
          val (_, _, _, frames) = parseY4m(m.blob)
          frames.head.foreach(b => hist((b & 0xFF) >> 4) += 1f)
      }
      (m.doc_id, m.media_type, l1(hist))
    }

  /** Batched per-partition decode: groups each partition's rows into
    * fixed-size batches and maps them through the decoder — the Scala
    * analogue of `mapInPandas` with a bounded Arrow batch.
    */
  def decodeFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow]
      .mapPartitions(_.grouped(BatchSize).flatMap(decodeBatch))
      .toDF()
  }

  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow]
      .mapPartitions(_.grouped(BatchSize).flatMap(featurize))
      .toDF("doc_id", "media_type", "features")
  }

  val qs: Seq[Q] = Seq(
    Q("q_multimodal_features",
      (s, d) => {
        // Per-type centroid distance: how far each doc's feature
        // vector sits from its media type's mean (driver-free, one
        // shuffle on the tiny type key via a broadcast-back join).
        val feats = extractFeatures(syntheticMedia(s, d))
        val centroids = feats
          .groupBy("media_type")
          .agg(array((0 until 16).map(i =>
            avg(element_at(col("features"), i + 1))): _*).as("centroid"))
        feats.join(broadcast(centroids), "media_type")
          .select(col("doc_id"), col("media_type"),
            round(sqrt(aggregate(
              zip_with(col("features"), col("centroid"),
                (f, c) => (f.cast("double") - c) * (f.cast("double") - c)),
              lit(0.0), (acc, v) => acc + v)), 6).as("dist"))
          .orderBy("doc_id")
      },
      None),

    Q("q_multimodal_meta",
      (s, d) => decodeFeatures(syntheticMedia(s, d))
        .select("doc_id", "media_type", "n_bytes", "content_hash",
          "width", "height", "duration_ms", "batch_size")
        .orderBy("doc_id"),
      None),
  )
}
