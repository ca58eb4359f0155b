package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media payloads ride as opaque `binary`
  * columns with typed metadata; decode / feature-extract runs as
  * per-partition imperative code over the binary bytes.
  *
  * q62/q80 use REAL JDK codecs (javax.imageio PNG, javax.sound.sampled
  * WAV): each doc derives a deterministic synthetic image / PCM clip,
  * ENCODES it through the real codec into the binary column, ships the
  * payload across a real exchange, and DECODES it back through the
  * codec before computing per-frame / per-window statistics. Both
  * codecs are lossless (PNG, 16-bit PCM), so the decoded pixels /
  * samples equal the generating formula exactly — which is what the
  * DuckDB oracle recomputes analytically. Hash parity therefore gates
  * the DECODE: a codec that returned wrong pixels/samples would fail
  * the oracle. A user pointing external PNG/WAV payloads at the same
  * mapPartitions operators runs the identical decode path.
  *
  * q61/q83 keep the byte-slice arithmetic form (binary metadata /
  * stride resample) whose oracle mirrors the bytes directly.
  */
object Multimodal {

  private val FrameBytes = 64
  private val MaxFrames = 8

  /** Deterministic grayscale test image for `doc_id`: height
    * [[ImgH]] rows, width 16 + (doc_id mod 17), pixel(x, y) =
    * (doc_id·31 + x·7 + y·13) mod 256 — integer arithmetic the oracle
    * replays with generate_series.
    */
  private val ImgH = 8
  private[graft] def imgWidth(id: Long): Int = (16 + id % 17).toInt
  private[graft] def pixel(id: Long, x: Int, y: Int): Int = ((id * 31 + x * 7 + y * 13) % 256).toInt

  /** Deterministic 16-bit PCM clip for `doc_id`: 256 + (doc_id mod 91)
    * samples, sample(t) = ((doc_id·7919 + t·104729) mod 65536) − 32768.
    */
  private[graft] def clipLen(id: Long): Int = (256 + id % 91).toInt
  private[graft] def sample(id: Long, t: Int): Int =
    (((id * 7919 + t.toLong * 104729) % 65536) - 32768).toInt

  /** Encode the doc's synthetic image as a real PNG via the supplied
    * (per-partition, reused) ImageWriter.
    */
  private[graft] def encodePng(writer: javax.imageio.ImageWriter, id: Long): Array[Byte] = {
    val w = imgWidth(id)
    val img = new java.awt.image.BufferedImage(
      w, ImgH, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < ImgH) {
      var x = 0
      while (x < w) { raster.setSample(x, y, 0, pixel(id, x, y)); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.write(img)
    } finally ios.close()
    bos.toByteArray
  }

  /** Encode the doc's synthetic clip as a real RIFF/WAVE payload
    * (PCM_SIGNED, 16-bit little-endian, mono).
    */
  private[graft] def encodeWav(id: Long): Array[Byte] = {
    val n = clipLen(id)
    val pcm = new Array[Byte](n * 2)
    var t = 0
    while (t < n) {
      val s = sample(id, t)
      pcm(t * 2) = (s & 0xff).toByte
      pcm(t * 2 + 1) = ((s >> 8) & 0xff).toByte
      t += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  val all: Seq[Q] = Seq(
    // binary ingestion + metadata: payload bytes, sizes, head fingerprint
    Q(
      "q61_binary_meta",
      (s, d) =>
        Tables.documents(s, d)
          .withColumn("payload", encode(col("text"), "UTF-8"))
          .select(
            col("doc_id"),
            length(col("payload")).as("n_bytes"),
            col("n_chars"),
            lower(hex(encode(substring(col("text"), 1, 8), "UTF-8"))).as("head_hex"),
            md5(col("payload")).as("payload_md5")
          )
          .orderBy(col("doc_id")),
      Some("""
        SELECT doc_id,
               CAST(octet_length(encode(text)) AS INT) AS n_bytes,
               n_chars,
               lower(hex(encode(substr(text, 1, 8)))) AS head_hex,
               md5(text) AS payload_md5
        FROM documents ORDER BY doc_id""")
    ),

    // REAL image decode/frame-sample: each doc's deterministic image is
    // PNG-encoded (one reused ImageWriter per partition), the payload
    // crosses a real exchange as a binary column, then PNG-decoded (one
    // reused ImageReader per partition) and scanned row-by-row — the
    // per-frame stats hash-match an oracle that regenerates the pixels
    // analytically, so parity gates the decode itself.
    Q(
      "q62_frame_extract",
      (s, d) => {
        val src = Tables.documents(s, d).select(col("doc_id"))
        val binSchema = new StructType()
          .add("doc_id", LongType)
          .add("payload", BinaryType)
        val encoded = src.mapPartitions { rows =>
          // one codec handle per partition, reused across rows
          val writer = javax.imageio.ImageIO.getImageWritersByFormatName("png").next()
          rows.map { r =>
            val id = r.getLong(0)
            Row(id, encodePng(writer, id))
          }
        }(org.apache.spark.sql.Encoders.row(binSchema))
        val outSchema = new StructType()
          .add("doc_id", LongType)
          .add("frame_id", IntegerType)
          .add("frame_len", IntegerType)
          .add("px_sum", LongType)
          .add("px_max", IntegerType)
          .add("px_min", IntegerType)
          .add("px_wsum", LongType)
        encoded
          .repartition(col("doc_id")) // the binary column ships for real
          .mapPartitions { rows =>
            val reader = javax.imageio.ImageIO.getImageReadersByFormatName("png").next()
            rows.flatMap { r =>
              val id = r.getLong(0)
              val iis = javax.imageio.ImageIO.createImageInputStream(
                new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1)))
              reader.setInput(iis)
              val img = reader.read(0)
              iis.close()
              val raster = img.getRaster
              val w = img.getWidth
              (0 until img.getHeight).iterator.map { y =>
                var x = 0; var sum = 0L; var mx = 0; var mn = 255; var ws = 0L
                while (x < w) {
                  val p = raster.getSample(x, y, 0)
                  sum += p
                  if (p > mx) mx = p
                  if (p < mn) mn = p
                  ws += p.toLong * (((x + 1).toLong * 2654435761L) % 1000000007L)
                  x += 1
                }
                Row(id, y, w, sum, mx, mn, ws)
              }
            }
          }(org.apache.spark.sql.Encoders.row(outSchema))
          .orderBy(col("doc_id"), col("frame_id"))
      },
      Some(s"""
        WITH g AS (SELECT doc_id, CAST(16 + doc_id % 17 AS INT) AS w FROM documents),
        fr AS (SELECT doc_id, w, unnest(generate_series(0, ${ImgH - 1})) AS y FROM g),
        px AS (SELECT doc_id, w, y,
                      list_transform(generate_series(0, w - 1),
                        x -> (doc_id * 31 + x * 7 + y * 13) % 256) AS ps,
                      list_transform(generate_series(0, w - 1),
                        x -> ((doc_id * 31 + x * 7 + y * 13) % 256)
                             * (((x + 1) * 2654435761) % 1000000007)) AS ws
               FROM fr)
        SELECT doc_id,
               CAST(y AS INT) AS frame_id,
               w AS frame_len,
               CAST(list_sum(ps) AS BIGINT) AS px_sum,
               CAST(list_max(ps) AS INT) AS px_max,
               CAST(list_min(ps) AS INT) AS px_min,
               CAST(list_sum(ws) AS BIGINT) AS px_wsum
        FROM px ORDER BY doc_id, frame_id""")
    ),

    // REAL audio decode/feature-extract: each doc's deterministic PCM
    // clip is WAV-encoded (javax.sound.sampled), the RIFF payload ships
    // as a binary column across an exchange, is decoded back through
    // AudioSystem (header parse + format negotiation), and per-window
    // energy/peak/trough over the decoded 16-bit samples hash-match an
    // oracle that regenerates the samples analytically.
    Q(
      "q80_audio_windows",
      (s, d) => {
        val src = Tables.documents(s, d).select(col("doc_id"))
        val binSchema = new StructType()
          .add("doc_id", LongType)
          .add("payload", BinaryType)
        val encoded = src.mapPartitions { rows =>
          rows.map { r =>
            val id = r.getLong(0)
            Row(id, encodeWav(id))
          }
        }(org.apache.spark.sql.Encoders.row(binSchema))
        val outSchema = new StructType()
          .add("doc_id", LongType)
          .add("window_id", IntegerType)
          .add("n_samples", IntegerType)
          .add("energy", LongType)
          .add("peak", IntegerType)
          .add("trough", IntegerType)
        encoded
          .repartition(col("doc_id"))
          .mapPartitions { rows =>
            rows.flatMap { r =>
              val id = r.getLong(0)
              val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
                new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1)))
              val fmt = ais.getFormat
              require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 && !fmt.isBigEndian,
                s"unexpected decoded format: $fmt")
              val pcm = ais.readAllBytes()
              ais.close()
              val n = pcm.length / 2
              val nWin = math.min(MaxFrames, (n + FrameBytes - 1) / FrameBytes)
              (0 until nWin).iterator.map { w =>
                val off = w * FrameBytes
                val len = math.min(FrameBytes, n - off)
                var i = 0; var energy = 0L; var peak = -32768; var trough = 32767
                while (i < len) {
                  val t = off + i
                  val v = ((pcm(t * 2) & 0xff) | (pcm(t * 2 + 1) << 8)).toShort.toInt
                  energy += v.toLong * v
                  if (v > peak) peak = v
                  if (v < trough) trough = v
                  i += 1
                }
                Row(id, w, len, energy, peak, trough)
              }
            }
          }(org.apache.spark.sql.Encoders.row(outSchema))
          .orderBy(col("doc_id"), col("window_id"))
      },
      Some(s"""
        WITH g AS (SELECT doc_id, CAST(256 + doc_id % 91 AS INT) AS n FROM documents),
        w AS (SELECT doc_id, n,
                     unnest(generate_series(0,
                       least($MaxFrames, CAST(ceil(n / $FrameBytes.0) AS INT)) - 1)) AS win
              FROM g),
        sm AS (SELECT doc_id, win,
                      CAST(least($FrameBytes, n - win * $FrameBytes) AS INT) AS len,
                      list_transform(
                        generate_series(win * $FrameBytes,
                                        win * $FrameBytes + least($FrameBytes, n - win * $FrameBytes) - 1),
                        t -> (doc_id * 7919 + t * 104729) % 65536 - 32768) AS ss
               FROM w)
        SELECT doc_id,
               CAST(win AS INT) AS window_id,
               len AS n_samples,
               CAST(list_sum(list_transform(ss, v -> v * v)) AS BIGINT) AS energy,
               CAST(list_max(ss) AS INT) AS peak,
               CAST(list_min(ss) AS INT) AS trough
        FROM sm ORDER BY doc_id, window_id""")
    ),

    // stubbed resize/resample: deterministic 4:1 stride downsample of
    // the payload (every 4th byte), the media-resize slot of the
    // multimodal pipeline — a real image resize swaps the stride for a
    // codec scale call; the column shape (binary in, smaller binary +
    // fingerprint out, pure projection, no shuffle) is what matters.
    Q(
      "q83_resample",
      (s, d) =>
        Tables.documents(s, d)
          .select(
            col("doc_id"),
            col("n_chars"),
            array_join(
              transform(
                sequence(lit(1), col("n_chars").cast(IntegerType), lit(4)),
                i => col("text").substr(i, lit(1))),
              "").as("small"))
          .select(
            col("doc_id"),
            col("n_chars"),
            length(col("small")).as("resized_chars"),
            md5(col("small")).as("resized_md5"))
          .orderBy(col("doc_id")),
      Some("""
        WITH r AS (
          SELECT doc_id, n_chars,
                 array_to_string(list_transform(
                   generate_series(1, CAST(n_chars AS INT), 4),
                   i -> substr(text, i, 1)), '') AS small
          FROM documents)
        SELECT doc_id, n_chars,
               CAST(len(small) AS INT) AS resized_chars,
               md5(small) AS resized_md5
        FROM r ORDER BY doc_id""")
    )
  )
}
