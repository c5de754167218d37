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

  val qs: Seq[Q] = Seq(
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
