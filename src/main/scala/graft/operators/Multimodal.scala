package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns for training-data pipelines: media payloads are opaque
  * `binary` columns with typed metadata; decode / feature-extract / resize /
  * frame-sample run as batched per-partition transforms (the Scala analog of
  * `mapInPandas`: one iterator pass, batch-shaped work, schema declared
  * up-front).
  *
  * The actual codec step is a STUB — image/audio libs are not in this
  * container — marked by [[stubDecode]]: a deterministic fake that derives
  * metadata from byte length. Everything around it (binary schema,
  * partitioning, batch iterator shape, typed output) is the real 100 TB
  * plumbing and is tested.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, kind: String, media: Array[Byte])
  final case class MediaMeta(
      doc_id: Long,
      kind: String,
      n_bytes: Int,
      width: Int,
      height: Int,
      duration_ms: Long
  )

  /** Build a media table from `documents`: kind by doc_id % 3, payload =
    * 4-byte magic + the text bytes (deterministic, binary-typed).
    */
  def mediaTable(spark: SparkSession, doc: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    doc.select(
        col("doc_id"),
        when(pmod(col("doc_id"), lit(3)) === 0, "image")
          .when(pmod(col("doc_id"), lit(3)) === 1, "audio")
          .otherwise("video").as("kind"),
        concat(
          when(pmod(col("doc_id"), lit(3)) === 0, lit("IMG0"))
            .when(pmod(col("doc_id"), lit(3)) === 1, lit("AUD0"))
            .otherwise(lit("VID0")),
          col("text")).cast("binary").as("media"))
      .as[MediaRow]
  }

  /** STUB codec: deterministic fake metadata from byte length. A real
    * deployment swaps this one function for an actual decoder (libjpeg /
    * ffmpeg bindings) — the surrounding pipeline shape is unchanged.
    */
  def stubDecode(kind: String, media: Array[Byte]): (Int, Int, Long) = {
    val n = media.length
    val width = n % 640 + 16
    val height = n % 480 + 16
    val durationMs = if (kind == "image") 0L else n.toLong * 3L
    (width, height, durationMs)
  }

  /** Batched decode pass: one partition = one batch iterator (the
    * mapInPandas shape), emitting typed metadata.
    */
  def decodeMeta(spark: SparkSession, media: Dataset[MediaRow]): Dataset[MediaMeta] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val (w, h, d) = stubDecode(r.kind, r.media)
        MediaMeta(r.doc_id, r.kind, r.media.length, w, h, d)
      }
    }
  }

  /** Frame-sample stub: split the payload into up to `n` fixed-stride chunks
    * (the partition/batch plumbing of video frame sampling; the decode of
    * each frame is the same stub boundary).
    */
  def frameSample(spark: SparkSession, media: Dataset[MediaRow], n: Int = 4): DataFrame = {
    import spark.implicits._
    media
      .flatMap { r =>
        val stride = math.max(1, r.media.length / n)
        (0 until math.min(n, r.media.length)).map { i =>
          val from = i * stride
          val until = math.min(r.media.length, from + stride)
          if (from < r.media.length)
            Some((r.doc_id, i, java.util.Arrays.copyOfRange(r.media, from, until)))
          else None
        }.flatten
      }
      .toDF("doc_id", "frame_idx", "frame")
  }
}
