package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media payloads travel as opaque `binary`
  * columns with typed metadata structs alongside.
  *
  * The Spark-side contract — schema, partition-parallel decode via
  * mapPartitions over the binary column, stable output shape — is real
  * and tested. The codec itself is a clearly-marked deterministic STUB
  * (`fakeDecode`): this container has no image/audio libraries, so the
  * stub derives metadata purely from the byte content. Swapping in a real
  * decoder changes only the function body, not the plumbing or the plan
  * shape.
  *
  * Scale notes: decode runs inside mapPartitions — one task per input
  * split, no shuffle, no driver involvement; exactly how a 100 TB media
  * lake is feature-extracted.
  */
object Multimodal {

  /** Typed metadata produced by the (stub) decoder. */
  final case class MediaMeta(doc_id: Long, n_bytes: Long, width: Long,
                             height: Long, format: String)

  /** STUB decoder: deterministic metadata from raw bytes. A real
    * implementation would parse the container header here. */
  def fakeDecode(id: Long, bytes: Array[Byte]): MediaMeta = {
    val n = bytes.length.toLong
    val format = (n % 3) match {
      case 0 => "png"
      case 1 => "jpeg"
      case _ => "webp"
    }
    MediaMeta(id, n, n % 640 + 1, n % 480 + 1, format)
  }

  /** Attach a binary payload column derived from text (UTF-8 bytes) —
    * stand-in for reading real media blobs from a lake. */
  def withBinaryPayload(df: DataFrame, text: String = "text",
                        out: String = "media"): DataFrame =
    df.withColumn(out, col(text).cast("binary"))

  /** Partition-parallel metadata extraction over the binary column. */
  def extractMeta(df: DataFrame, id: String = "doc_id",
                  bin: String = "media"): Dataset[MediaMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(id), col(bin)).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (i, b) => fakeDecode(i, b) })
  }

  /** STUB frame sampler: every `stride`-th fixed-size byte slice of a
    * "video" payload — demonstrates the 1-row → N-frame-rows explode
    * shape (generator output) without a real codec. */
  def sampleFrames(df: DataFrame, id: String = "doc_id", bin: String = "media",
                   frameSize: Int = 16, stride: Int = 4): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(id), col(bin)).as[(Long, Array[Byte])]
      .flatMap { case (i, b) =>
        b.grouped(frameSize).zipWithIndex
          .collect { case (frame, idx) if idx % stride == 0 =>
            (i, idx.toLong, frame)
          }
      }
      .toDF(id, "frame_idx", "frame_bytes")
  }
}
