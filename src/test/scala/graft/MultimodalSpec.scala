package graft

import org.apache.spark.sql.functions._
import graft.llm.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  lazy val media = Multimodal.asMedia(Tables.documents(spark, sf0001), "doc_id", "text")

  test("asMedia: binary payload survives round-trip, modality assigned") {
    val rows = media.limit(10).collect()
    assert(rows.forall(r => Set("image", "audio", "video")(r.getString(1))))
    val doc = Tables.documents(spark, sf0001).filter($"doc_id" === rows.head.getLong(0))
      .select("text").head().getString(0)
    assert(new String(rows.head.getAs[Array[Byte]](2), "UTF-8") == doc)
  }

  test("decodeImageStub: deterministic, sane metadata") {
    val a = Multimodal.decodeImageStub(media).collect().sortBy(_.media_id)
    val b = Multimodal.decodeImageStub(media).collect().sortBy(_.media_id)
    assert(a.toSeq == b.toSeq)
    a.foreach { d =>
      assert(d.width >= 64 && d.width < 256)
      assert(d.height >= 64 && d.height < 256)
      assert(d.mean_byte >= 0.0 && d.mean_byte < 256.0)
      assert(d.n_bytes > 0)
    }
  }

  test("decodeImage: genuine javax.imageio round-trip recovers encoder closed form") {
    val docs = Tables.documents(spark, sf0001)
    val decoded = Multimodal.decodeImage(Multimodal.syntheticPng(docs, "doc_id"))
      .collect().sortBy(_.media_id)
    assert(decoded.nonEmpty)
    decoded.foreach { d =>
      assert(d.decoded, s"media ${d.media_id} must decode (real PNG bytes)")
      assert(d.width == 4 + (d.media_id % 13).toInt)
      assert(d.height == 4 + (d.media_id % 11).toInt)
      assert(d.channels == 3)
      assert(d.mean_px == (d.media_id % 256).toDouble, // constant fill → exact
        s"media ${d.media_id}: mean ${d.mean_px}")
    }
  }

  test("decodeImage: undecodable payloads take the stub fallback, flagged") {
    val d = Multimodal.decodeImage(media).collect()
    assert(d.nonEmpty)
    assert(d.forall(!_.decoded), "text bytes are not an image")
    assert(d.forall(_.channels == 0))
    assert(d.forall(r => r.width >= 64 && r.width < 256))
  }

  test("decodeAudio: genuine javax.sound WAV round-trip recovers encoder closed form") {
    val docs = Tables.documents(spark, sf0001)
    val decoded = Multimodal.decodeAudio(Multimodal.syntheticWav(docs, "doc_id"))
      .collect().sortBy(_.media_id)
    assert(decoded.nonEmpty)
    decoded.foreach { d =>
      assert(d.decoded, s"media ${d.media_id} must decode (real WAV bytes)")
      assert(d.sample_rate == 8000 && d.channels == 1)
      assert(d.n_frames == 64 + (d.media_id % 128))
      assert(d.mean_abs == ((d.media_id % 100) * 100).toDouble)
    }
    // text payloads are not audio → flagged fallback
    val bad = Multimodal.decodeAudio(media).collect()
    assert(bad.forall(!_.decoded))
  }

  test("decodeVideoMeta: AVI chunk walk + MP4 box walk recover writer closed forms") {
    val docs = Tables.documents(spark, sf0001)
    val decoded = Multimodal.decodeVideoMeta(
        Multimodal.syntheticVideo(docs, "doc_id"))
      .collect().sortBy(_.media_id)
    assert(decoded.nonEmpty)
    decoded.foreach { d =>
      val id = d.media_id
      assert(d.decoded, s"media $id must parse (real container bytes)")
      if (id % 2 == 0) {
        assert(d.container == "avi")
        assert(d.width == 160 + (id % 8).toInt * 16)
        assert(d.height == 120 + (id % 6).toInt * 8)
        assert(d.duration_ms == (20 + id % 10) * (30 + id % 90))
      } else {
        assert(d.container == "mp4")
        assert(d.width == 320 + (id % 16).toInt * 8)
        assert(d.height == 240 + (id % 9).toInt * 16)
        assert(d.duration_ms == (5 + id % 55) * 1000)
      }
    }
    // text payloads are neither container → flagged fallback
    val bad = Multimodal.decodeVideoMeta(media).collect()
    assert(bad.forall(!_.decoded))
    assert(bad.forall(_.container == "unknown"))
  }

  test("decodeVideoFrame: first MJPEG frame round-trips the writer's closed form exactly") {
    val ids = spark.range(64).toDF("doc_id")
    val got = Multimodal.decodeVideoFrame(
        Multimodal.syntheticMjpegAvi(ids, "doc_id"))
      .collect().sortBy(_.media_id)
    assert(got.length == 64)
    for (d <- got) {
      val id = d.media_id
      assert(d.decoded, s"id $id did not decode")
      assert(d.n_frames == 1 + (id % 4).toInt)
      assert(d.width == 16 + (id % 8).toInt * 8)
      assert(d.height == 16 + (id % 6).toInt * 8)
      assert(d.channels == 3)
      // quality-1.0 JPEG of a constant GRAY image decodes bit-exactly
      assert(d.mean_px == (id % 256).toDouble,
        s"id $id mean ${d.mean_px} != ${id % 256}")
    }
    // the container-metadata pass reads the same AVIs (header is real)
    val meta = Multimodal.decodeVideoMeta(
        Multimodal.syntheticMjpegAvi(ids, "doc_id"))
      .collect().sortBy(_.media_id)
    assert(meta.forall(m => m.decoded && m.container == "avi"))
    assert(meta.forall(m => m.duration_ms == 40L * (1 + m.media_id % 4)))
    // non-AVI payloads degrade to decoded=false with zero frames
    val bad = Multimodal.decodeVideoFrame(media).collect()
    assert(bad.forall(d => !d.decoded && d.n_frames == 0))
  }

  test("decodeVideoFrame: a registered custom FrameDecoder handles a non-MJPEG bitstream") {
    // a fake codec: frames starting "FAKE" decode to a constant 2x2
    // single-band raster of the 5th byte — stands in for the FFI
    // decoder a real H.264 deployment would register
    object FakeDecoder extends Multimodal.FrameDecoder {
      val name = "fake-codec"
      def decode(f: Array[Byte]): Option[java.awt.image.BufferedImage] =
        if (f.length >= 5 && new String(f.take(4), "US-ASCII") == "FAKE") {
          val img = new java.awt.image.BufferedImage(2, 2,
            java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
          val v = f(4) & 0xff
          for (x <- 0 until 2; y <- 0 until 2)
            img.getRaster.setSample(x, y, 0, v)
          Some(img)
        } else None
    }
    val frame = "FAKE".getBytes("US-ASCII") :+ 77.toByte
    val avi = Multimodal.mjpegAviBytes(2, 2, Seq(frame))
    val media = Seq((1L, avi)).toDF("media_id", "payload")
    // default chain (JDK JPEG only): frame present but unclaimed
    val without = Multimodal.decodeVideoFrame(media).collect().head
    assert(!without.decoded && without.n_frames == 1)
    // with the fake codec registered ahead of the default: decodes,
    // raster statistics flow through the unchanged plumbing
    val it = Multimodal.decodeVideoFrame(media,
      Seq(FakeDecoder, Multimodal.ImageIoFrameDecoder)).collect().head
    assert(it.decoded && it.width == 2 && it.height == 2 &&
      it.channels == 1 && it.mean_px == 77.0, it.toString)
    // MJPEG still decodes through the same chain (fallthrough works)
    val ids = spark.range(4).toDF("doc_id")
    val mj = Multimodal.decodeVideoFrame(
      Multimodal.syntheticMjpegAvi(ids, "doc_id"),
      Seq(FakeDecoder, Multimodal.ImageIoFrameDecoder)).collect()
    assert(mj.forall(_.decoded))
  }

  test("frameSample stride=1 covers all payload bytes; stride=2 halves frames") {
    val all = Multimodal.frameSample(media, frameBytes = 64, stride = 1)
    val half = Multimodal.frameSample(media, frameBytes = 64, stride = 2)
    val totalBytes = all.agg(sum("frame_bytes")).collect()(0).getLong(0)
    val payloadBytes = media.agg(sum(octet_length($"payload"))).collect()(0).getLong(0)
    assert(totalBytes == payloadBytes)
    val nAll = all.count(); val nHalf = half.count()
    assert(nHalf >= nAll / 2 && nHalf <= nAll / 2 + media.count())
  }

  test("dhash64: brightness-shift invariant, texture-sensitive, sub-grid payloads excluded") {
    // same texture group at different brightness deltas -> identical
    // dHash (the shift cancels exactly under the truncating box mean);
    // different groups -> far hashes (independent mixed textures)
    val ids = Seq(0L, 50L, 100L, 1L, 2L).toDF("id") // g=0 x3, g=1, g=2
    val hashed = Multimodal.dhash64(
        Multimodal.syntheticTexturedPng(ids, "id", groups = 50))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(hashed.values.forall(_._2), "all PNGs must decode")
    assert(hashed(0L)._1 == hashed(50L)._1 &&
      hashed(0L)._1 == hashed(100L)._1,
      "brightness shift must not move the dHash")
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(hashed(0L)._1, hashed(1L)._1) > 3 &&
      ham(hashed(0L)._1, hashed(2L)._1) > 3 &&
      ham(hashed(1L)._1, hashed(2L)._1) > 3,
      "distinct textures must not band-collide")
    // undecodable bytes and sub-9x8 rasters degrade to decoded=false
    val junk = Seq((7L, Array[Byte](1, 2, 3), "image")).toDF(
      "media_id", "payload", "modality")
    val j = Multimodal.dhash64(junk).collect().head
    assert(!j.getBoolean(2) && j.getLong(1) == 0L)
    // pigeonhole recall is structural: the hamming-0 pair always found
    val pairs = graft.llm.Dedup.hammingNearDup(
        Multimodal.dhash64(Multimodal.syntheticTexturedPng(
          Seq(0L, 50L, 1L).toDF("id"), "id", groups = 50)),
        "dhash", "media_id", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.toSeq == Seq((0L, 50L, 0)), pairs.mkString(";"))
  }

  test("ahash64: gain/offset invariant, waveform-sensitive, short/junk payloads excluded") {
    // same waveform group under different gain (x1..x4) and DC offset
    // -> identical fingerprint (energies scale by gain^2 exactly,
    // offsets cancel in differences); different groups -> far hashes
    val ids = Seq(0L, 50L, 100L, 150L, 1L, 2L).toDF("id")
    val hashed = Multimodal.ahash64(
        Multimodal.syntheticNoiseWav(ids, "id", groups = 50))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2)))
      .toMap
    assert(hashed.values.forall(_._2), "all WAVs must decode")
    assert(Set(50L, 100L, 150L).forall(i => hashed(i)._1 == hashed(0L)._1),
      "gain/offset transforms must not move the fingerprint")
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(hashed(0L)._1, hashed(1L)._1) > 3 &&
      ham(hashed(0L)._1, hashed(2L)._1) > 3 &&
      ham(hashed(1L)._1, hashed(2L)._1) > 3,
      "distinct waveforms must not band-collide")
    // undecodable bytes and short clips degrade to decoded=false
    val junk = Seq((7L, Array[Byte](1, 2, 3), "audio")).toDF(
      "media_id", "payload", "modality")
    val j = Multimodal.ahash64(junk).collect().head
    assert(!j.getBoolean(2) && j.getLong(1) == 0L)
    val short = Multimodal.ahash64(Multimodal.syntheticWav(
      Seq(5L).toDF("id"), "id")).collect().head // 64..192 frames < 2048
    assert(!short.getBoolean(2), "sub-2048-sample clips must be excluded")
    // pigeonhole recall is structural: the hamming-0 pair always found
    val pairs = graft.llm.Dedup.hammingNearDup(
        Multimodal.ahash64(Multimodal.syntheticNoiseWav(
          Seq(0L, 50L, 1L).toDF("id"), "id", groups = 50)),
        "ahash", "media_id", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.toSeq == Seq((0L, 50L, 0)), pairs.mkString(";"))
  }

  test("dhashFrames + signatureNearDup: JPEG-exact block textures, any-frame pairing, min distance") {
    // brightness-shifted twins in the same group: every frame's dHash
    // identical (8x8-aligned blocks survive quality-1.0 JPEG exactly,
    // the shift cancels in the comparisons); group g has 2 + g%3 frames
    val ids = Seq(0L, 50L, 100L, 1L, 2L).toDF("id")
    val sigs = Multimodal.dhashFrames(
        Multimodal.syntheticBlockMjpegAvi(ids, "id", groups = 50))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getBoolean(3)))
      .toMap
    assert(sigs.values.forall(_._2), "every frame must decode")
    assert(sigs.keys.count(_._1 == 0L) == 2 && // group 0: 2 frames
      sigs.keys.count(_._1 == 1L) == 3 &&      // group 1: 3 frames
      sigs.keys.count(_._1 == 2L) == 4)        // group 2: 4 frames
    (0 until 2).foreach { k =>
      assert(sigs((0L, k.toLong))._1 == sigs((50L, k.toLong))._1 &&
        sigs((0L, k.toLong))._1 == sigs((100L, k.toLong))._1,
        s"frame $k dHash must be brightness-invariant")
    }
    // frames within a video are distinct patterns; cross-group far
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(sigs((0L, 0L))._1 != sigs((0L, 1L))._1)
    assert(ham(sigs((0L, 0L))._1, sigs((1L, 0L))._1) > 3)
    // any-frame pairing: twins at min hamming 0; no cross-group pair
    val pairs = graft.llm.Dedup.signatureNearDup(
        Multimodal.dhashFrames(Multimodal.syntheticBlockMjpegAvi(
            Seq(0L, 50L, 1L, 2L).toDF("id"), "id", groups = 50))
          .filter($"decoded"),
        "dhash", "media_id", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.toSeq == Seq((0L, 50L, 0)), pairs.mkString(";"))
    // non-AVI payloads surface as one decoded=false row at frame -1
    val junk = Seq((7L, Array[Byte](9, 9, 9), "video")).toDF(
      "media_id", "payload", "modality")
    val j = Multimodal.dhashFrames(junk).collect()
    assert(j.length == 1 && j.head.getLong(1) == -1L && !j.head.getBoolean(3))
  }

  test("videoQuality: planted freeze run + black tail closed forms, dhash half of identity, junk, guards") {
    // id 0: n=5, r=2 -> [200, 100, 100, f3=3, f4=4]: max run 2 (not
    //   frozen at threshold 3), 2 near-black frames -> 400000 ppm
    // id 7: n=8, r=3 -> run 3 (frozen), black 4 of 8 -> 500000 ppm
    val got = Multimodal.videoQuality(
        Multimodal.syntheticFreezeMjpegAvi(Seq(0L, 7L).toDF("id"), "id"),
        blackThreshold = 16, freezeRun = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getBoolean(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getBoolean(5), r.getLong(6), r.getLong(7)))).toMap
    assert(got(0L) == ((true, 5L, 0L, 2L, false, 2L, 400000L)),
      got(0L).toString)
    assert(got(7L) == ((true, 8L, 0L, 3L, true, 4L, 500000L)),
      got(7L).toString)
    // frame identity is dHash AND mean: two same-mean frames with
    // different block textures must NOT extend a run (a mean-only
    // identity would see [A, B, B] as one 3-run)
    def jpeg(img: java.awt.image.BufferedImage): Array[Byte] = {
      val writer = javax.imageio.ImageIO
        .getImageWritersByFormatName("jpeg").next()
      val params = writer.getDefaultWriteParam
      params.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      params.setCompressionQuality(1.0f)
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null),
        params)
      ios.close(); writer.dispose()
      bos.toByteArray
    }
    def blockImg(v: (Int, Int) => Int): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(
        72, 64, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      for (by <- 0 until 8; bx <- 0 until 9) {
        val g = v(bx, by)
        val rgb = (g << 16) | (g << 8) | g
        for (y <- by * 8 until by * 8 + 8; x <- bx * 8 until bx * 8 + 8)
          img.setRGB(x, y, rgb)
      }
      img
    }
    // A: 6 columns of 50 + 3 of 200 (mean 100, horizontal edges ->
    // dhash != 0); B: 4 row-bands of 50 + 4 of 150 (mean 100, rows
    // constant horizontally -> dhash 0)
    val a = jpeg(blockImg((bx, _) => if (bx < 6) 50 else 200))
    val bF = jpeg(blockImg((_, by) => if (by < 4) 50 else 150))
    val abb = Seq((1L,
      Multimodal.mjpegAviBytes(72, 64, Seq(a, bF, bF)), "video"))
      .toDF("media_id", "payload", "modality")
    val vq = Multimodal.videoQuality(abb, freezeRun = 2).collect().head
    assert(vq.getLong(2) == 3L && vq.getLong(4) == 2L &&
      vq.getBoolean(5), vq.toString)
    // an undecodable frame breaks a run and counts as n_undecoded
    val bjb = Seq((2L,
      Multimodal.mjpegAviBytes(72, 64,
        Seq(bF, Array[Byte](1, 2, 3), bF)), "video"))
      .toDF("media_id", "payload", "modality")
    val vj = Multimodal.videoQuality(bjb, freezeRun = 2).collect().head
    assert(vj.getLong(2) == 3L && vj.getLong(3) == 1L &&
      vj.getLong(4) == 1L && !vj.getBoolean(5), vj.toString)
    // frameless junk degrades to one decoded = false row
    val junk = Seq((7L, Array[Byte](9, 9, 9), "video")).toDF(
      "media_id", "payload", "modality")
    val j = Multimodal.videoQuality(junk).collect().head
    assert(!j.getBoolean(1) && j.getLong(2) == 0L)
    intercept[IllegalArgumentException] {
      Multimodal.videoQuality(junk, blackThreshold = -1)
    }
    intercept[IllegalArgumentException] {
      Multimodal.videoQuality(junk, freezeRun = 1)
    }
  }

  test("audioQuality: pulse-WAV closed forms, junk excluded, threshold guard") {
    // id 0: n=256, a=1, amp=1000 -> peak 1000, silence (255e6)//256,
    //   no clipping (1000 < 20000)
    // id 38: n=864, a=39, amp=20000 -> clip (39e6)//864, silence
    //   (825e6)//864
    val got = Multimodal.audioQuality(
        Multimodal.syntheticPulseWav(Seq(0L, 38L).toDF("id"), "id"),
        silenceThreshold = 500, clipThreshold = 20000)
      .collect().map(r => r.getLong(0) -> ((r.getBoolean(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got(0L) == ((true, 256L, 1000L, 996093L, 0L)), got(0L).toString)
    assert(got(38L) == ((true, 864L, 20000L, 954861L, 45138L)),
      got(38L).toString)
    val junk = Seq((7L, Array[Byte](1, 2, 3), "audio")).toDF(
      "media_id", "payload", "modality")
    val j = Multimodal.audioQuality(junk).collect().head
    assert(!j.getBoolean(1) && j.getLong(2) == 0L)
    intercept[IllegalArgumentException] {
      Multimodal.audioQuality(junk, silenceThreshold = 600,
        clipThreshold = 500)
    }
  }

  test("imageQuality: gradient-PNG closed forms per band, flat flag, junk row, guard") {
    // id 0: h=8, base=10, step=0 -> every band FLAT; band 0 all 10
    //   (dark: 10 < 32), band 1 all 30 (dark), band 2 all 50 (not)
    // id 899: h=16, base=109, step=4 -> band 0 spans 109..169, band 2
    //   spans 149..209 with rows y >= 11 past the 192 bright line
    //   (5 of 16 rows -> 312500 ppm); mean band 2 =
    //   16*(16*149 + 4*120)*1000 // 256 = 179000 milli
    val got = Multimodal.imageQuality(
        Multimodal.syntheticGradientPng(Seq(0L, 899L).toDF("id"), "id"),
        darkThreshold = 32, brightThreshold = 192)
      .collect().map(r => (r.getLong(0), r.getInt(1)) ->
        ((r.getBoolean(2), r.getLong(3), r.getInt(4), r.getInt(5),
          r.getLong(6), r.getLong(7), r.getLong(8), r.getBoolean(9))))
      .toMap
    assert(got.size == 6)
    assert(got((0L, 0)) ==
      ((true, 128L, 10, 10, 10000L, 1000000L, 0L, true)),
      got((0L, 0)).toString)
    assert(got((0L, 1)) ==
      ((true, 128L, 30, 30, 30000L, 1000000L, 0L, true)),
      got((0L, 1)).toString)
    assert(got((0L, 2)) ==
      ((true, 128L, 50, 50, 50000L, 0L, 0L, true)),
      got((0L, 2)).toString)
    assert(got((899L, 0)) ==
      ((true, 256L, 109, 169, 139000L, 0L, 0L, false)),
      got((899L, 0)).toString)
    assert(got((899L, 2)) ==
      ((true, 256L, 149, 209, 179000L, 0L, 312500L, false)),
      got((899L, 2)).toString)
    // an undecodable payload degrades to one band = -1 row, flagged
    val junk = Seq((7L, Array[Byte](1, 2, 3), "image")).toDF(
      "media_id", "payload", "modality")
    val j = Multimodal.imageQuality(junk).collect()
    assert(j.length == 1 && j.head.getInt(1) == -1 &&
      !j.head.getBoolean(2) && j.head.getLong(3) == 0L)
    intercept[IllegalArgumentException] {
      Multimodal.imageQuality(junk, darkThreshold = 200,
        brightThreshold = 100)
    }
  }

  test("resizeStub: every payload becomes exactly targetBytes; short ones zero-padded") {
    val resized = Multimodal.resizeStub(media, targetBytes = 100)
    val sizes = resized.select("resized_bytes").distinct()
      .collect().map(_.getInt(0)).toSet
    assert(sizes == Set(100))
    // a payload shorter than target keeps its prefix and pads with NULs
    val shortRow = resized
      .filter(octet_length($"payload") < 100)
      .select($"payload", $"resized").head()
    val (orig, res) = (shortRow.getAs[Array[Byte]](0), shortRow.getAs[Array[Byte]](1))
    assert(res.take(orig.length).sameElements(orig))
    assert(res.drop(orig.length).forall(_ == 0))
  }
}
