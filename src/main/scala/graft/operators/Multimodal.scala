package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** D13: multimodal column plumbing. Media payloads are opaque BINARY
  * columns with typed metadata; decode / feature-extraction runs
  * per-partition in fixed-size batches (the shape a real
  * image/audio decoder or Arrow-batched UDF needs: amortize codec
  * init per batch, bounded memory per batch — not per row, not whole
  * partition). The decode itself is a clearly-marked deterministic
  * STUB (no codec libs in this environment); everything around it —
  * schema, encoders, batching, partition parallelism — is real.
  */
object Multimodal {

  /** Raw media row: opaque payload + source metadata. */
  final case class MediaRow(doc_id: Long, media_type: String, blob: Array[Byte])

  /** Decoded-feature row emitted by the batched decode stub. */
  final case class MediaFeatures(
      doc_id: Long, media_type: String, n_bytes: Long, content_hash: Long,
      width: Int, height: Int, duration_ms: Long, batch_size: Int)

  private val BatchSize = 64

  /** STUB decoder: stands in for an image/audio/video codec. Features
    * are derived deterministically from the payload bytes so specs and
    * the driver's rows-check are stable. A real deployment swaps only
    * this function (per-batch, so codec handles amortize).
    */
  private def decodeBatch(batch: Seq[MediaRow]): Seq[MediaFeatures] =
    batch.map { m =>
      val h = scala.util.hashing.MurmurHash3.bytesHash(m.blob, 42).toLong & 0x7FFFFFFFL
      val (w0, h0, dur) = m.media_type match {
        case "image" => (((h % 1920) + 64).toInt, ((h % 1080) + 64).toInt, 0L)
        case "audio" => (0, 0, (h % 600000L) + 1000L)
        case _       => (((h % 1280) + 64).toInt, ((h % 720) + 64).toInt, (h % 7200000L) + 1000L)
      }
      MediaFeatures(m.doc_id, m.media_type, m.blob.length.toLong, h, w0, h0, dur, batch.size)
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

  /** D18: binary → fixed-width feature vector (the decode+embed step
    * of a multimodal ingest): 16-bin byte histogram, L1-normalized —
    * stands in for a real image/audio embedding while exercising the
    * same schema (array<float>), batching, and downstream use
    * (feature vectors feed the D05-07 ANN operators directly).
    */
  private def featurize(batch: Seq[MediaRow]): Seq[(Long, String, Array[Float])] =
    batch.map { m =>
      val hist = new Array[Float](16)
      m.blob.foreach(b => hist((b & 0xFF) >> 4) += 1f)
      val n = math.max(1f, m.blob.length.toFloat)
      (m.doc_id, m.media_type, hist.map(_ / n))
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
        val media = Tables(s, d, "documents").select(
          col("doc_id"),
          element_at(array(lit("image"), lit("audio"), lit("video")),
            (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("media_type"),
          encode(col("text"), "UTF-8").as("blob"))
        // Per-type centroid distance: how far each doc's feature
        // vector sits from its media type's mean (driver-free, one
        // shuffle on the tiny type key via a broadcast-back join).
        val feats = extractFeatures(media)
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
      (s, d) => {
        // Synthesize the media table from documents (UTF-8 payload as
        // the opaque blob; type cycles deterministically by doc_id).
        val media = Tables(s, d, "documents").select(
          col("doc_id"),
          element_at(array(lit("image"), lit("audio"), lit("video")),
            (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("media_type"),
          encode(col("text"), "UTF-8").as("blob"))
        decodeFeatures(media)
          .select("doc_id", "media_type", "n_bytes", "content_hash",
            "width", "height", "duration_ms", "batch_size")
          .orderBy("doc_id")
      },
      None),
  )
}
