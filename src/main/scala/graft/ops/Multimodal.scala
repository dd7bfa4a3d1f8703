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
  * The decode path is REAL: payloads are genuine PNG bytes (synthesized
  * deterministically per document — no image corpus ships with the
  * testdata) and `decodeImage` runs the JDK's javax.imageio PNG codec,
  * headless-safe, no external libraries. This replaces the round-3..5
  * `fakeDecode` hash stub; a production deployment swaps the synthetic
  * payload generator for its real ingest bytes and keeps everything else.
  */
object Multimodal {

  // ImageIO's default cache spools every encode/decode through a TEMP
  // FILE — per-image disk I/O that dwarfs the codec itself on a batch
  // pipeline. Classloading this object (first touch of any codec call,
  // per executor JVM) switches it to in-memory streams once.
  javax.imageio.ImageIO.setUseCache(false)

  /** Deterministic synthetic PNG: dimensions and pixel gradient derived
    * from (doc_id, orig_len), so tests can assert the DECODED dimensions
    * against values known without decoding. Real image bytes — the
    * decode below exercises the actual codec, not a stand-in. */
  private[graft] def pngPayload(docId: Long, seedLen: Int): Array[Byte] = {
    val w = 16 + (docId % 48).toInt
    val h = 16 + math.floorMod(seedLen, 48)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    // write the B,G,R raster bytes directly: same pixels as per-pixel
    // setRGB (TYPE_3BYTE_BGR stores the sRGB values verbatim) without
    // its per-call ColorModel round trip
    val data = img.getRaster.getDataBuffer
      .asInstanceOf[java.awt.image.DataBufferByte].getData
    val base = (docId % 255).toInt
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = (x * 31 + y * 7 + base) & 0xFFFFFF
        val i = (y * w + x) * 3
        data(i) = (v & 0xFF).toByte
        data(i + 1) = ((v >> 8) & 0xFF).toByte
        data(i + 2) = ((v >> 16) & 0xFF).toByte
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Real image decode via the JDK's ImageIO. Returns (width, height,
    * color components). Throws on undecodable bytes — a quarantine
    * branch would catch per-row in a production ingest. */
  private[graft] def decodeImage(payload: Array[Byte]): (Int, Int, Int) = {
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(payload))
    require(img != null, "undecodable image payload")
    (img.getWidth, img.getHeight, img.getColorModel.getNumComponents)
  }

  /** documents → opaque binary payloads + typed metadata (the ingest
    * shape for DOCUMENT bytes). The payload is the text's UTF-8 bytes, so
    * octet_length(payload) == length(text) on this ASCII corpus and the
    * whole binary path stays DuckDB-oracle-checkable (mm_metadata_stats). */
  def binaryTable(spark: SparkSession, sfDir: String): DataFrame =
    T.t(spark, sfDir, "documents").select(
      col("doc_id"),
      encode(col("text"), "UTF-8").cast(BinaryType).as("payload"),
      struct(lit("application/octet-stream").as("mime"),
        col("lang").as("src_lang"),
        length(col("text")).as("orig_len")).as("meta"))

  val binSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType), StructField("payload", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType), StructField("src_lang", StringType),
      StructField("orig_len", IntegerType))))))

  /** documents → real PNG image payloads + typed metadata (the ingest
    * shape for IMAGE bytes; no image corpus ships with the testdata, so
    * the payloads are synthesized deterministically per document).
    * Synthesis is partition-batched like every other stage — the encoder
    * runs executor-side, nothing touches the driver. */
  def imageTable(spark: SparkSession, sfDir: String): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(binSchema)
    T.t(spark, sfDir, "documents")
      .select(col("doc_id"), col("lang"), length(col("text")).as("orig_len"))
      .repartition(col("doc_id"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val len = r.getInt(2)
          org.apache.spark.sql.Row(id, pngPayload(id, len),
            org.apache.spark.sql.Row("image/png", r.getString(1), len))
        }
      }(enc)
  }

  val outSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType), StructField("byte_len", IntegerType),
    StructField("width", IntegerType), StructField("height", IntegerType),
    StructField("channels", IntegerType), StructField("thumb_len", IntegerType)))

  val frameSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType), StructField("n_frames", IntegerType),
    StructField("sampled", IntegerType), StructField("rs_width", IntegerType),
    StructField("rs_height", IntegerType), StructField("frame_sum", LongType)))

  /** Resize + frame-sample stage over the decoded payloads: aspect-
    * preserving fit into a 256-box (pure arithmetic on the REAL decoded
    * dims, the shape a resize kernel slots into), and every-8th "frame"
    * sampling treating the payload as fixed-width frames (a video/audio
    * stand-in; `frame_sum` checksums the sampled bytes so the output is
    * deterministic and testable). Same partition-batched plumbing as
    * decodePipeline — one iterator per partition, no per-row UDF. */
  def frameSamplePipeline(spark: SparkSession, sfDir: String): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(frameSchema)
    val frameBytes = 16
    val every = 8
    imageTable(spark, sfDir)
      .select("doc_id", "payload")
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val (w, h, _) = decodeImage(bytes)
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

  val thumbSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType), StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("thumb_checksum", LongType),
    StructField("mean_lum_x100", LongType)))

  /** REAL pixel resize (not the dimension-arithmetic stand-in of
    * frameSamplePipeline): decode the PNG through the JDK codec,
    * nearest-neighbor resample to an 8×8 RGB thumbnail, and emit
    * deterministic stats of the RESAMPLED pixels — a positional
    * wrapping-Long checksum over the 64 samples in raster order and an
    * integer mean luminance (BT.601 weights, exact integer division).
    * All-integer arithmetic on a deterministic payload → bit-identical
    * at any parallelism; the synthetic gradient means Round9cSpec can
    * recompute every checksum from the closed-form pixel formula
    * WITHOUT ImageIO, proving the decode→resize path end-to-end.
    * Same partition-batched shape as the other stages. */
  def resizeThumbnail(spark: SparkSession, sfDir: String): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(thumbSchema)
    imageTable(spark, sfDir)
      .select("doc_id", "payload")
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1)))
          require(img != null, "undecodable image payload")
          val (w, h) = (img.getWidth, img.getHeight)
          var cs = 0L
          var lum = 0L
          var ty = 0
          while (ty < 8) {
            var tx = 0
            while (tx < 8) {
              val rgb = img.getRGB(tx * w / 8, ty * h / 8) // NN sample
              val rr = (rgb >> 16) & 0xFF
              val gg = (rgb >> 8) & 0xFF
              val bb = rgb & 0xFF
              cs = cs * 1000003L + ((rr << 16) | (gg << 8) | bb)
              lum += (299 * rr + 587 * gg + 114 * bb) / 1000
              tx += 1
            }
            ty += 1
          }
          org.apache.spark.sql.Row(id, w, h, cs, lum * 100L / 64L)
        }
      }(enc)
  }

  val phashSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType), StructField("phash", LongType)))

  /** Perceptual average-hash (aHash) per image: decode the PNG, NN-sample
    * an 8×8 luminance grid (same sampling as resizeThumbnail), threshold
    * each sample against the integer mean → 64 bits, raster order, bit
    * 63-i for sample i. All-integer, deterministic payloads →
    * bit-identical at any parallelism. */
  def phashTable(spark: SparkSession, sfDir: String): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(phashSchema)
    imageTable(spark, sfDir)
      .select("doc_id", "payload")
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1)))
          require(img != null, "undecodable image payload")
          val (w, h) = (img.getWidth, img.getHeight)
          val lum = new Array[Int](64)
          var s = 0L
          var i = 0
          while (i < 64) {
            val rgb = img.getRGB((i % 8) * w / 8, (i / 8) * h / 8)
            lum(i) = (299 * ((rgb >> 16) & 0xFF) + 587 * ((rgb >> 8) & 0xFF) +
              114 * (rgb & 0xFF)) / 1000
            s += lum(i)
            i += 1
          }
          val mean = s / 64
          var hash = 0L
          i = 0
          while (i < 64) {
            if (lum(i) > mean) hash |= 1L << (63 - i)
            i += 1
          }
          org.apache.spark.sql.Row(id, hash)
        }
      }(enc)
  }

  /** Image near-duplicate pairs: SimHash-style banding of the 64-bit
    * aHash into 8×8-bit chunks — two images within Hamming distance ≤ 7
    * share at least one intact band by pigeonhole, so the default
    * radius 6 is candidate-COMPLETE, not heuristic (the earlier 4×16
    * banding was only complete at radius 3 and could silently miss a
    * distance-4..6 pair whose corrupted bits landed in all four bands;
    * Round11Spec now asserts exact equality with brute force). The pair
    * join is an equi-join on (band, chunk) — key-partitioned, never
    * all-pairs — and the exact Hamming distance re-check
    * (`bit_count(xor)`) runs only on banded candidates. Narrower bands
    * mean fuller buckets (≤256 distinct chunks per band); at corpus
    * scale the production guard is the winnow-style per-bucket
    * frequency cap, dropping boilerplate chunks before the self-join.
    * The image-dedup primitive for a multimodal training-data pipeline,
    * built on the REAL decode path. */
  def phashNearDup(spark: SparkSession, sfDir: String,
      maxHamming: Int = 6): DataFrame = {
    require(maxHamming <= 7,
      s"8-band pigeonhole guarantee holds for maxHamming <= 7, got $maxHamming")
    val ph = phashTable(spark, sfDir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bands = ph.select(col("doc_id"), col("phash"),
      explode(expr("sequence(0, 7)")).as("band"))
      .select(col("doc_id"), col("phash"), col("band"),
        expr("shiftright(phash, band * 8) & 255").as("chunk"))
    val a = bands.select(col("band"), col("chunk"),
      col("doc_id").as("a_id"), col("phash").as("a_hash"))
    val b = bands.select(col("band"), col("chunk"),
      col("doc_id").as("b_id"), col("phash").as("b_hash"))
    a.join(b, Seq("band", "chunk"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        expr("bit_count(a_hash ^ b_hash)").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
      .orderBy("a_id", "b_id")
  }

  /** Partition-batched decode + feature extract + thumbnail stand-in
    * (leading byte slice). Dimensions come from the real PNG codec. */
  def decodePipeline(spark: SparkSession, sfDir: String): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    imageTable(spark, sfDir)
      .select("doc_id", "payload")
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val (w, h, c) = decodeImage(bytes)
          val thumb = bytes.take(math.min(16, bytes.length))
          org.apache.spark.sql.Row(id, bytes.length, w, h, c, thumb.length)
        }
      }(enc)
  }

  // ---- audio modality -----------------------------------------------------

  /** Integer-deterministic PCM16 sample: a doc-frequency sawtooth.
    * Pure integer arithmetic — bit-identical on any JVM/platform (no
    * Math.sin, whose libm results are platform-dependent), which is what
    * lets the spec recompute every feature closed-form. */
  private[graft] def sampleAt(docId: Long, i: Int): Short =
    (((i * (docId % 7 + 1)) % 256 - 128) * 256).toShort

  private[graft] def wavSampleCount(docId: Long): Int =
    800 + (docId % 1600).toInt

  /** Deterministic synthetic WAV: a genuine RIFF/WAVE container (44-byte
    * canonical header + PCM16LE mono frames at 8 kHz) around the integer
    * sawtooth — real audio bytes, so decode exercises the JDK's actual
    * javax.sound.sampled WAV codec, mirroring what pngPayload/ImageIO do
    * for the image modality. */
  private[graft] def wavPayload(docId: Long): Array[Byte] = {
    val n = wavSampleCount(docId)
    val rate = 8000
    val bb = java.nio.ByteBuffer.allocate(44 + n * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")); bb.putInt(36 + n * 2)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")); bb.putInt(16)
    bb.putShort(1); bb.putShort(1) // PCM, mono
    bb.putInt(rate); bb.putInt(rate * 2) // byte rate
    bb.putShort(2); bb.putShort(16) // block align, bits
    bb.put("data".getBytes("US-ASCII")); bb.putInt(n * 2)
    var i = 0
    while (i < n) { bb.putShort(sampleAt(docId, i)); i += 1 }
    bb.array()
  }

  /** Decode a WAV payload through the REAL JDK audio stack
    * (AudioSystem): header-parsed format + PCM frames back as shorts. */
  private[graft] def decodeWav(bytes: Array[Byte]): (Int, Array[Short]) = {
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      val fmt = ais.getFormat
      require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1,
        s"unexpected WAV shape: $fmt")
      val raw = ais.readAllBytes()
      val out = new Array[Short](raw.length / 2)
      var i = 0
      while (i < out.length) {
        out(i) = ((raw(2 * i) & 0xFF) | (raw(2 * i + 1) << 8)).toShort
        i += 1
      }
      (fmt.getSampleRate.toInt, out)
    } finally ais.close()
  }

  val audioSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType), StructField("sample_rate", IntegerType),
    StructField("n_samples", IntegerType), StructField("n_frames", IntegerType),
    StructField("peak_frame", IntegerType), StructField("peak_rms", DoubleType),
    StructField("mean_rms", DoubleType)))

  /** documents → WAV payloads → per-frame RMS energy features: 256-sample
    * frames (tail partial frame included), per-frame root-mean-square,
    * the peak frame (first index on ties) and the mean frame RMS — the
    * silence-detection / loudness-normalization primitives of an audio
    * ingest pipeline. Same partition-batched plumbing as the image
    * stages: synth and decode both run inside one mapPartitions, nothing
    * touches the driver, and the doubles are rounded through the
    * DuckRound canon kernel so results are hash-stable. */
  def audioEnergyPipeline(spark: SparkSession, sfDir: String): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(audioSchema)
    T.t(spark, sfDir, "documents")
      .select(col("doc_id"))
      .repartition(col("doc_id"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val (rate, samples) = decodeWav(wavPayload(id))
          val frame = 256
          val nFrames = (samples.length + frame - 1) / frame
          var peakIdx = 0
          var peak = -1.0
          var sumRms = 0.0
          var f = 0
          while (f < nFrames) {
            val from = f * frame
            val until = math.min(from + frame, samples.length)
            var acc = 0.0
            var i = from
            while (i < until) {
              val s = samples(i).toDouble; acc += s * s; i += 1
            }
            val rms = math.sqrt(acc / (until - from))
            if (rms > peak) { peak = rms; peakIdx = f }
            sumRms += rms
            f += 1
          }
          org.apache.spark.sql.Row(id, rate, samples.length, nFrames,
            peakIdx, graft.expr.DuckRound.round(peak, 6),
            graft.expr.DuckRound.round(sumRms / nFrames, 6))
        }
      }(enc)
  }
}
