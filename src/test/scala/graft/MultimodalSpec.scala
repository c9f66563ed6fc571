package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.MultimodalOps

/** Real-codec path of the multimodal surface: PNG/BMP decode through the
  * JDK's javax.imageio inside mapPartitions (no external libraries), with
  * bit-deterministic integer features. The q50-q52 stub path (text blobs
  * reinterpreted as samples) remains for the text fixtures; this spec
  * proves the decode step itself is real, not a container limitation. */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def encode(fmt: String, w: Int, h: Int)(px: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, px(x, y))
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, out), s"no $fmt writer in JDK")
    out.toByteArray
  }

  test("imageFeatures decodes PNG/BMP via the JDK codec, exactly") {
    import spark.implicits._
    // 8x4, left half black, right half white
    val halves = (x: Int, _: Int) => if (x < 4) 0x000000 else 0xffffff
    val rows = Seq(
      1L -> encode("png", 8, 4)(halves),
      2L -> encode("bmp", 8, 4)(halves),
      3L -> "not an image at all".getBytes("UTF-8"))
    val got = MultimodalOps.imageFeatures(rows.toDF("doc_id", "media")
      .as[(Long, Array[Byte])]).collect().sortBy(_.doc_id)

    for (f <- got.take(2)) {
      assert(f.width == 8 && f.height == 4, s"${f.doc_id}: ${f.width}x${f.height}")
      // 16 black pixels in bin 0, 16 white in bin 7, nothing between
      assert(f.hist.toSeq == Seq(16L, 0L, 0L, 0L, 0L, 0L, 0L, 16L), f.hist.toSeq)
      // 4x4 grid: left two columns black, right two white, every row
      val expectGrid = Seq.fill(4)(Seq(0L, 0L, 255L, 255L)).flatten
      assert(f.grid.toSeq == expectGrid, f.grid.toSeq)
    }
    // undecodable blob -> sentinel row, not an exception
    assert(got(2).width == -1 && got(2).hist == null)

    // determinism across runs (same features, same order of arrays)
    val again = MultimodalOps.imageFeatures(rows.toDF("doc_id", "media")
      .as[(Long, Array[Byte])]).collect().sortBy(_.doc_id)
    assert(got.take(2).map(_.grid.toSeq).toSeq == again.take(2).map(_.grid.toSeq).toSeq)
  }

  private def wav(bigEndian: Boolean, channels: Int, samples: Array[Short]): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
      8000f, 16, channels, 2 * channels, 8000f, bigEndian)
    val raw = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (s, i) =>
      if (bigEndian) { raw(2 * i) = (s >> 8).toByte; raw(2 * i + 1) = s.toByte }
      else { raw(2 * i) = s.toByte; raw(2 * i + 1) = (s >> 8).toByte }
    }
    val ain = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(raw), fmt, samples.length / channels)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ain, javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  test("audioFeatures decodes WAV PCM via the JDK codec, exactly") {
    import spark.implicits._
    // square wave +-1000, 64 frames mono; stereo variant with ch2 = +-2000
    val mono = Array.tabulate(64)(i => if (i % 2 == 0) 1000 else -1000).map(_.toShort)
    val stereo = Array.tabulate(128)(i =>
      (if (i % 2 == 0) (if (i % 4 == 0) 1000 else -1000) // ch1
       else (if (i % 4 == 1) 2000 else -2000)).toShort)  // ch2
    val rows = Seq(
      1L -> wav(bigEndian = false, channels = 1, mono),
      2L -> wav(bigEndian = false, channels = 2, stereo),
      3L -> "definitely not audio".getBytes("UTF-8"))
    val got = MultimodalOps.audioFeatures(rows.toDF("doc_id", "media")
      .as[(Long, Array[Byte])]).collect().sortBy(_.doc_id)

    assert(got(0).channels == 1 && got(0).sample_rate == 8000)
    assert(got(0).n_frames == 64 && got(0).peak == 1000 && got(0).mean_abs == 1000)
    assert(got(1).channels == 2 && got(1).n_frames == 64)
    assert(got(1).peak == 2000 && got(1).mean_abs == 1500, s"${got(1)}")
    assert(got(2).channels == -1 && got(2).peak == -1L)
  }

  /** Minimal MJPEG AVI: RIFF('AVI ') > LIST('movi') > one '00dc' chunk
    * per JPEG frame (even-padded, per the RIFF spec). Real players want
    * an hdrl too; the parser contract is the chunk layer, which this
    * exercises faithfully. */
  private def mjpegAvi(frames: Seq[Array[Byte]]): Array[Byte] = {
    def chunk(id: String, data: Array[Byte]): Array[Byte] = {
      val size = data.length
      val b = java.nio.ByteBuffer.allocate(8 + size + (size & 1))
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put(id.getBytes("US-ASCII")).putInt(size).put(data)
      b.array()
    }
    val movi = "movi".getBytes("US-ASCII") ++
      frames.flatMap(f => chunk("00dc", f)).toArray
    val body = "AVI ".getBytes("US-ASCII") ++ chunk("LIST", movi)
    chunk("RIFF", body)
  }

  test("videoFeatures samples MJPEG AVI frames through the JDK JPEG codec") {
    import spark.implicits._
    // 10 solid-gray frames with distinct levels 20, 40, ..., 200
    val frames = (1 to 10).map { i =>
      val g = i * 20
      encode("jpg", 8, 8)((_, _) => (g << 16) | (g << 8) | g)
    }
    val rows = Seq(
      1L -> mjpegAvi(frames),
      2L -> "not a video".getBytes("UTF-8"))
    val got = MultimodalOps.videoFeatures(rows.toDF("doc_id", "media")
      .as[(Long, Array[Byte])], everyNth = 4).collect().sortBy(_.doc_id)

    assert(got(0).n_frames == 10 && got(0).n_sampled == 3) // frames 0, 4, 8
    // JPEG is lossy but a solid frame decodes within a few gray levels
    val expected = Seq(20L, 100L, 180L)
    got(0).frame_means.toSeq.zip(expected).foreach { case (m, e) =>
      assert(math.abs(m - e) <= 4, s"mean $m vs $e")
    }
    assert(got(1).n_frames == -1L && got(1).frame_means == null)

    // bit-determinism across runs (JDK JPEG decode is deterministic)
    val again = MultimodalOps.videoFeatures(rows.toDF("doc_id", "media")
      .as[(Long, Array[Byte])], everyNth = 4).collect().sortBy(_.doc_id)
    assert(got(0).frame_means.toSeq == again(0).frame_means.toSeq)
  }

  test("a gradient image pools to strictly increasing grid cells") {
    import spark.implicits._
    // 16x16 horizontal gradient: gray = x * 16 (0..240)
    val grad = (x: Int, _: Int) => { val g = x * 16; (g << 16) | (g << 8) | g }
    val feats = MultimodalOps.imageFeatures(
      Seq(9L -> encode("png", 16, 16)(grad)).toDF("doc_id", "media")
        .as[(Long, Array[Byte])]).head()
    // every gray value 0,16,...,240 appears 16 times -> 32 per bin * 8 bins
    assert(feats.hist.toSeq == Seq.fill(8)(32L), feats.hist.toSeq)
    // grid columns increase left to right; rows identical
    val row0 = feats.grid.slice(0, 4).toSeq
    assert(row0 == row0.sorted && row0.distinct.size == 4, row0)
    assert(feats.grid.toSeq == (row0 ++ row0 ++ row0 ++ row0), feats.grid.toSeq)
  }
}
