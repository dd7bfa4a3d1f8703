package graft.ops

import graft.T
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (builder mandate beyond SURVEY §2): treat
  * image/audio payloads as opaque `binary` columns with typed metadata,
  * and run decode / feature-extract / frame-sample as a partition-batched
  * transform — the Scala analogue of a vectorized (mapInPandas-style)
  * UDF: one iterator per partition, batch-shaped work, no per-row
  * serialization round trip.
  *
  * STUB NOTE: no image/audio codecs exist in this container, so
  * `fakeDecode` is a clearly-marked deterministic stand-in (dimensions
  * derived from a byte hash). The Spark-side plumbing — binary schema,
  * partition batching, output schema, pushdown-friendly metadata
  * columns — is real and tested (MultimodalSpec).
  */
object Multimodal {

  /** Deterministic stand-in for an image decoder: (width, height,
    * channels) from a stable hash of the payload bytes. A real deployment
    * swaps only this function. */
  private[graft] def fakeDecode(payload: Array[Byte]): (Int, Int, Int) = {
    var h = 1125899906842597L
    var i = 0
    while (i < payload.length) { h = 31 * h + payload(i); i += 1 }
    val w = 64 + math.floorMod(h, 448).toInt
    val hh = 64 + math.floorMod(h >> 16, 448).toInt
    (w, hh, 3)
  }

  val outSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType), StructField("byte_len", IntegerType),
    StructField("width", IntegerType), StructField("height", IntegerType),
    StructField("channels", IntegerType), StructField("thumb_len", IntegerType)))

  /** documents → opaque binary payloads + metadata (the ingest shape). */
  def binaryTable(spark: SparkSession, sfDir: String): DataFrame =
    T.t(spark, sfDir, "documents").select(
      col("doc_id"),
      encode(col("text"), "UTF-8").cast(BinaryType).as("payload"),
      struct(lit("image/fake").as("mime"), col("lang").as("src_lang"),
        length(col("text")).as("orig_len")).as("meta"))

  val frameSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType), StructField("n_frames", IntegerType),
    StructField("sampled", IntegerType), StructField("rs_width", IntegerType),
    StructField("rs_height", IntegerType), StructField("frame_sum", LongType)))

  /** Resize + frame-sample stage over the decoded payloads: aspect-
    * preserving fit into a 256-box (pure arithmetic on the decoded dims,
    * the shape a real resize kernel slots into), and every-8th "frame"
    * sampling treating the payload as fixed-width frames (a video/audio
    * stand-in; `frame_sum` checksums the sampled bytes so the output is
    * deterministic and testable). Same partition-batched plumbing as
    * decodePipeline — one iterator per partition, no per-row UDF. */
  def frameSamplePipeline(spark: SparkSession, sfDir: String): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(frameSchema)
    val frameBytes = 16
    val every = 8
    binaryTable(spark, sfDir)
      .select("doc_id", "payload")
      .repartition(col("doc_id"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val (w, h, _) = fakeDecode(bytes)
          // aspect-preserving resize into a 256x256 box
          val scale = 256.0 / math.max(w, h)
          val (rw, rh) = (math.max(1, math.round(w * scale).toInt),
            math.max(1, math.round(h * scale).toInt))
          val nFrames = math.max(1, bytes.length / frameBytes)
          var sampled = 0
          var sum = 0L
          var f = 0
          while (f < nFrames) {
            if (f % every == 0) {
              sampled += 1
              var i = f * frameBytes
              val end = math.min(i + frameBytes, bytes.length)
              while (i < end) { sum += bytes(i) & 0xff; i += 1 }
            }
            f += 1
          }
          org.apache.spark.sql.Row(id, nFrames, sampled, rw, rh, sum)
        }
      }(enc)
  }

  /** Partition-batched decode + feature extract + "frame sample" (byte
    * slice as thumbnail stand-in). */
  def decodePipeline(spark: SparkSession, sfDir: String): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    binaryTable(spark, sfDir)
      .select("doc_id", "payload")
      .repartition(col("doc_id"))  // spread decode work evenly
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val (w, h, c) = fakeDecode(bytes)
          val thumb = bytes.take(math.min(16, bytes.length))
          org.apache.spark.sql.Row(id, bytes.length, w, h, c, thumb.length)
        }
      }(enc)
  }
}
