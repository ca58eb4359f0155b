package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

/** Gates for the real-codec multimodal operators: the PNG / WAV
  * round-trips must reproduce the generating formulas exactly (the
  * property the q62/q80 oracles rest on), and the query surface must
  * emit one frame per image row / one window per 64 decoded samples.
  */
class MultimodalSpec extends SparkSpec {

  test("PNG encode→decode round-trips the exact formula pixels") {
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("png").next()
    for (id <- Seq(0L, 1L, 16L, 17L, 12345L)) {
      val bytes = Multimodal.encodePng(writer, id)
      // sanity: it really is a PNG payload
      assert((bytes(0) & 0xff) == 0x89 && bytes(1) == 'P' && bytes(2) == 'N' && bytes(3) == 'G',
        s"doc $id payload lacks the PNG magic")
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(img.getWidth == Multimodal.imgWidth(id) && img.getHeight == 8)
      val raster = img.getRaster
      for (y <- 0 until img.getHeight; x <- 0 until img.getWidth)
        assert(raster.getSample(x, y, 0) == Multimodal.pixel(id, x, y),
          s"doc $id pixel ($x,$y) decoded wrong")
    }
  }

  test("WAV encode→decode round-trips the exact formula samples") {
    for (id <- Seq(0L, 7L, 90L, 91L, 98765L)) {
      val bytes = Multimodal.encodeWav(id)
      assert(bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F',
        s"doc $id payload lacks the RIFF magic")
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val fmt = ais.getFormat
      assert(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 && !fmt.isBigEndian)
      val pcm = ais.readAllBytes()
      val n = pcm.length / 2
      assert(n == Multimodal.clipLen(id), s"doc $id decoded $n samples")
      for (t <- 0 until n) {
        val v = ((pcm(t * 2) & 0xff) | (pcm(t * 2 + 1) << 8)).toShort.toInt
        assert(v == Multimodal.sample(id, t), s"doc $id sample $t decoded wrong")
      }
    }
  }

  test("q62 emits one frame per image row with the doc's true width") {
    val rows = SparkEntry.queries("q62_frame_extract")(spark, sf("sf0.001"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("frames"), min(col("frame_len")).as("wmin"),
        max(col("frame_len")).as("wmax"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(1) == 8, s"doc $id must emit 8 frames")
      assert(r.getInt(2) == Multimodal.imgWidth(id) && r.getInt(3) == Multimodal.imgWidth(id),
        s"doc $id frame width must equal the decoded image width")
    }
  }

  test("q80 window accounting covers every decoded sample exactly once") {
    val rows = SparkEntry.queries("q80_audio_windows")(spark, sf("sf0.001"))
      .groupBy(col("doc_id"))
      .agg(sum(col("n_samples")).as("covered"), count(lit(1)).as("wins"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(1) == Multimodal.clipLen(id),
        s"doc $id windows must cover the full decoded clip")
      assert(r.getLong(2) == (Multimodal.clipLen(id) + 63) / 64)
    }
  }

  test("dHash banding is pigeonhole-complete: banded pairs == brute-force pairs (q202)") {
    // 4 disjoint 16-bit bands over 64 bits guarantee any pair within
    // Hamming DhMaxHamming=3 shares a band — so the banded join must
    // reproduce the all-pairs result EXACTLY, not approximately
    val hd = Multimodal.imageDhash(spark, sf("sf0.001"))
      .select("doc_id", "h0", "h1").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val brute = (for {
      (a, a0, a1) <- hd; (b, b0, b1) <- hd if a < b
      ham = java.lang.Long.bitCount(a0 ^ b0) + java.lang.Long.bitCount(a1 ^ b1)
      if ham <= 3
    } yield (a, b, ham)).toSet
    val banded = SparkEntry.queries("q202_image_neardup_pairs")(spark, sf("sf0.001"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(banded == brute,
      s"banded != brute: missing ${(brute -- banded).take(5)}, extra ${(banded -- brute).take(5)}")
    assert(brute.nonEmpty, "fixture must contain planted near-dup pairs")
    // planted structure holds: qualifying pairs live inside 4-doc base
    // blocks (cross-base hashes are independent 64-bit values)
    assert(brute.forall { case (a, b, _) => (a >> 2) == (b >> 2) },
      s"unexpected cross-base pair: ${brute.find { case (a, b, _) => (a >> 2) != (b >> 2) }}")
  }

  test("audio banding is pigeonhole-complete: banded pairs == brute-force pairs (q205)") {
    // 4 disjoint 16-bit bands over the 64-bit fingerprint guarantee
    // any pair within Hamming AuMaxHamming=3 shares a band — banded
    // must reproduce all-pairs EXACTLY
    val hd = Multimodal.audioFingerprint(spark, sf("sf0.001"))
      .select("doc_id", "h0", "h1").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val brute = (for {
      (a, a0, a1) <- hd; (b, b0, b1) <- hd if a < b
      ham = java.lang.Long.bitCount(a0 ^ b0) + java.lang.Long.bitCount(a1 ^ b1)
      if ham <= 3
    } yield (a, b, ham)).toSet
    val banded = SparkEntry.queries("q205_audio_neardup_pairs")(spark, sf("sf0.001"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(banded == brute,
      s"banded != brute: missing ${(brute -- banded).take(5)}, extra ${(banded -- brute).take(5)}")
    assert(brute.nonEmpty, "fixture must contain planted near-dup pairs")
    // planted structure holds: qualifying pairs live inside 4-doc base
    // blocks (cross-base fingerprints are independent 64-bit values)
    assert(brute.forall { case (a, b, _) => (a >> 2) == (b >> 2) },
      s"unexpected cross-base pair: ${brute.find { case (a, b, _) => (a >> 2) != (b >> 2) }}")
  }

  test("decoded-PCM audio fingerprint equals the analytic print (codec transparency, q204)") {
    val md = java.security.MessageDigest.getInstance("MD5")
    for (id <- Seq(0L, 3L, 17L, 199L, 4242L)) {
      // through the real codec
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(Multimodal.encodeTexWav(md, id)))
      val pcm = ais.readAllBytes()
      val (h0, h1) = Multimodal.afpOf(pcm)
      // analytic twin straight from the sample formula, no codec
      val n = Multimodal.texClipLen(id)
      val lo = (0 to 65).map(i => i * n / 65)
      val e = (0 until 65).map(i =>
        (lo(i) until lo(i + 1)).map { t =>
          val v = Multimodal.texSample(md, id, t).toLong; v * v
        }.sum)
      val c = (0 until 65).map(i => (lo(i + 1) - lo(i)).toLong)
      var e0 = 0L; var e1 = 0L
      for (i <- 0 until 64 if e(i) * c(i + 1) > e(i + 1) * c(i)) {
        if (i < 32) e0 |= 1L << i else e1 |= 1L << (i - 32)
      }
      assert((h0, h1) == (e0, e1), s"doc $id audio print diverged from the analytic form")
    }
  }

  test("q206 serves from the frozen index exactly what an inline recompute derives") {
    // the GraphSpec served≡inline discipline: a stale/torn published
    // image-hash index (e.g. a missed formatVersion bump) must show up
    // as a divergence from the inline standing/delta recompute; the
    // brute-force pair set also re-proves banding completeness on the
    // incremental split
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, sf("sf0.001")).select(col("doc_id"))
    def hashes(side: org.apache.spark.sql.DataFrame) =
      Multimodal.imageDhashOf(side).select("doc_id", "h0", "h1").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val standing = hashes(docs.filter(Multimodal.imgStanding))
    val delta = hashes(docs.filter(!Multimodal.imgStanding))
    assert(delta.nonEmpty && standing.nonEmpty, "split must populate both sides")
    val brute = (for {
      (n, n0, n1) <- delta; (x, x0, x1) <- standing
      ham = java.lang.Long.bitCount(n0 ^ x0) + java.lang.Long.bitCount(n1 ^ x1)
      if ham <= 3
    } yield (n, x, ham)).toSet
    val served = SparkEntry.queries("q206_incremental_image_neardup")(spark, sf("sf0.001"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(served == brute,
      s"served != inline: missing ${(brute -- served).take(5)}, extra ${(served -- brute).take(5)}")
  }

  test("decoded-raster dHash equals the analytic hash (codec transparency, q201)") {
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("png").next()
    val md = java.security.MessageDigest.getInstance("MD5")
    for (id <- Seq(0L, 3L, 17L, 199L, 4242L)) {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(Multimodal.encodeTexPng(writer, md, id)))
      val (h0, h1) = Multimodal.dhashOf(img.getRaster)
      // analytic twin straight from the pixel formula, no codec
      val w = Multimodal.texWidth(id)
      var e0 = 0L; var e1 = 0L
      for (j <- 0 until 8) {
        val lo = (0 to 9).map(i => i * w / 9)
        val s = (0 until 9).map(i =>
          (lo(i) until lo(i + 1)).map(x => Multimodal.texPixel(md, id, x, j).toLong).sum)
        val c = (0 until 9).map(i => (lo(i + 1) - lo(i)).toLong)
        for (i <- 0 until 8 if s(i) * c(i + 1) > s(i + 1) * c(i)) {
          if (j < 4) e0 |= 1L << (j * 8 + i) else e1 |= 1L << ((j - 4) * 8 + i)
        }
      }
      assert((h0, h1) == (e0, e1), s"doc $id dHash diverged from the analytic form")
    }
  }
}
