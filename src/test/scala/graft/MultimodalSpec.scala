package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val media = Seq(
    (1L, "image", "hello world".getBytes("UTF-8")),
    (2L, "audio", Array.fill[Byte](200)(7)),
    (3L, "video", Array.fill[Byte](130)(1))
  ).toDF("media_id", "kind", "payload")

  test("decodeAndFeaturize is deterministic, bounded, and keeps ids") {
    val got = Multimodal.decodeAndFeaturize(media).collect()
      .map(m => m.media_id -> m).toMap
    assert(got.keySet == Set(1L, 2L, 3L))
    assert(got(1L).n_bytes == 11L && got(2L).n_bytes == 200L)
    got.values.foreach { m =>
      assert(m.feature.length == Multimodal.FeatureDim)
      assert(m.feature.forall(f => f >= 0.0f && f < 1.0f))
    }
    // determinism: same payload -> same features
    val again = Multimodal.decodeAndFeaturize(media).collect()
      .map(m => m.media_id -> m.feature.toSeq).toMap
    assert(again(1L) == got(1L).feature.toSeq)
  }

  test("featurize matches the md5-derived oracle formula") {
    val bytes = "hello world".getBytes("UTF-8")
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(bytes).map("%02x".format(_)).mkString
    val f0 = (java.lang.Long.parseLong(hex.substring(0, 6), 16) % 1000L)
      .toFloat / 1000.0f
    assert(Multimodal.featurize(bytes)(0) == f0)
  }

  test("PpmFeaturizer decodes a real P6 image: dims, maxval, channel means") {
    import graft.operators.PpmFeaturizer
    // 2x2 image: pure red, pure green, pure blue, mid gray
    val pixels = Array[Int](255, 0, 0, 0, 255, 0, 0, 0, 255, 128, 128, 128)
      .map(_.toByte)
    val ppm = "P6\n2 2\n255\n".getBytes("US-ASCII") ++ pixels
    val f = PpmFeaturizer.featurize(ppm)
    assert(f(0) == 2.0f && f(1) == 2.0f && f(2) == 255.0f)
    // mean R = (255+0+0+128)/4/255
    assert(math.abs(f(3) - 383.0 / 4 / 255) < 1e-6)
    assert(math.abs(f(4) - 383.0 / 4 / 255) < 1e-6)
    assert(math.abs(f(5) - 383.0 / 4 / 255) < 1e-6)
    assert(f(6) == 4.0f && f(7) == 1.0f)
    // comment lines in the header parse too
    val withComment = "P6\n# made by graft\n2 2\n255\n".getBytes("US-ASCII") ++ pixels
    assert(PpmFeaturizer.featurize(withComment).toSeq == f.toSeq)
    // corrupt payloads featurize to zeros, never throw
    assert(PpmFeaturizer.featurize("P6\n9 9\n255\n".getBytes("US-ASCII"))
      .forall(_ == 0.0f))
    // 3*w*h would overflow Int: the Long-math bound must still reject
    assert(PpmFeaturizer.featurize(
      "P6\n50000 50000\n255\n".getBytes("US-ASCII")).forall(_ == 0.0f))
    assert(PpmFeaturizer.featurize(Array[Byte](1, 2, 3)).forall(_ == 0.0f))
    // maxval > 255 means 2-byte samples, which this scanner does not read
    // — must take the zeros path, not parse as 1-byte and emit garbage
    val wide = "P6\n2 2\n65535\n".getBytes("US-ASCII") ++
      Array.fill[Byte](2 * 3 * 4)(77.toByte)
    assert(PpmFeaturizer.featurize(wide).forall(_ == 0.0f))
  }

  test("ImageIoFeaturizer decodes generated PNG/BMP/GIF fixtures") {
    import graft.operators.ImageIoFeaturizer
    def encode(fmt: String, w: Int, h: Int,
               rgb: (Int, Int, Int)): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val px = (rgb._1 << 16) | (rgb._2 << 8) | rgb._3
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, px)
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, bos), s"no $fmt writer")
      bos.toByteArray
    }
    for (fmt <- Seq("png", "bmp", "gif")) {
      val f = ImageIoFeaturizer.featurize(encode(fmt, 6, 4, (255, 128, 0)))
      assert(f(0) == 6.0f && f(1) == 4.0f, s"$fmt dims")
      assert(f(2) >= 3.0f) // RGB (gif palette still exposes >= 3 components)
      assert(math.abs(f(3) - 1.0) < 0.02, s"$fmt mean R ${f(3)}")
      assert(math.abs(f(4) - 128.0 / 255) < 0.02, s"$fmt mean G ${f(4)}")
      assert(math.abs(f(5) - 0.0) < 0.02, s"$fmt mean B ${f(5)}")
      assert(f(6) == 24.0f && f(7) == 1.5f, s"$fmt count/aspect")
    }
    // undecodable payloads take the zeros path, never throw
    assert(ImageIoFeaturizer.featurize("not an image".getBytes)
      .forall(_ == 0.0f))
    assert(ImageIoFeaturizer.featurize(Array.emptyByteArray)
      .forall(_ == 0.0f))
  }

  test("ImageIoFeaturizer runs through the same mapPartitions plan") {
    import graft.operators.{ImageIoFeaturizer, Multimodal}
    val img = new java.awt.image.BufferedImage(5, 2,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 2; x <- 0 until 5) img.setRGB(x, y, 0x4080C0)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val png = bos.toByteArray
    val df = Seq((1L, "image", png), (2L, "image", "garbage".getBytes))
      .toDF("media_id", "kind", "payload")
    val out = Multimodal.decodeAndFeaturize(df, ImageIoFeaturizer)
      .collect().map(m => m.media_id -> m).toMap
    assert(out(1L).feature(0) == 5.0f && out(1L).feature(1) == 2.0f)
    assert(out(1L).n_bytes == png.length.toLong)
    assert(out(2L).feature.forall(_ == 0.0f)) // corrupt row survives
  }

  test("dHash56: perceptual hash is brightness-shift invariant, " +
    "perturbed-pixel pairs stay within small Hamming, distinct images " +
    "are far, PNG/BMP/PPM encodings of the same pixels agree") {
    // a deterministic gradient image (per-pixel gray values)
    def gray(w: Int, h: Int)(g: (Int, Int) => Int)
        : java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val v = g(x, y) & 0xff
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      img
    }
    def enc(img: java.awt.image.BufferedImage, fmt: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, bos))
      bos.toByteArray
    }
    def ppm(w: Int, h: Int)(g: (Int, Int) => Int): Array[Byte] = {
      val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
      val body = new Array[Byte](3 * w * h)
      for (y <- 0 until h; x <- 0 until w; c <- 0 until 3)
        body(3 * (y * w + x) + c) = (g(x, y) & 0xff).toByte
      header ++ body
    }
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val base = (x: Int, y: Int) => (5 * x + 3 * y + x * y / 4) % 200
    val hBase = Multimodal.dHash56(enc(gray(32, 32)(base), "png"))
    // encoding invariance: PNG, BMP and raw PPM of identical pixels
    assert(hBase == Multimodal.dHash56(enc(gray(32, 32)(base), "bmp")))
    assert(hBase == Multimodal.dHash56(ppm(32, 32)(base)))
    // brightness-shift invariance: +40 on every pixel flips no comparison
    assert(hBase == Multimodal.dHash56(
      ppm(32, 32)((x, y) => base(x, y) + 40)))
    // a FEW perturbed pixels: near-dup within small Hamming distance
    val perturbed = (x: Int, y: Int) =>
      if (x == 5 && y < 3) 255 else base(x, y)
    val hNear = Multimodal.dHash56(ppm(32, 32)(perturbed))
    assert(ham(hBase, hNear) <= 3, s"hamming ${ham(hBase, hNear)}")
    // a genuinely different image: far away
    val hFar = Multimodal.dHash56(
      ppm(32, 32)((x, y) => (251 * x * x + 131 * y + 17 * x * y) % 256))
    assert(ham(hBase, hFar) > 10, s"hamming ${ham(hBase, hFar)}")
    // undecodable -> null; non-divisible dims use exact cross-multiplied
    // means (no crash, deterministic)
    assert(Multimodal.dHash56("not an image".getBytes) == null)
    assert(Multimodal.dHash56(ppm(30, 22)(base)) ==
      Multimodal.dHash56(ppm(30, 22)(base)))
    // the bulk path: perturbed pair found, distinct pair rejected, the
    // corrupt row drops out
    val media = Seq(
      (1L, enc(gray(32, 32)(base), "png")),
      (2L, ppm(32, 32)(perturbed)),
      (3L, ppm(32, 32)((x, y) => (251 * x * x + 131 * y + 17 * x * y) % 256)),
      (4L, "garbage".getBytes))
      .toDF("media_id", "payload")
    val hashes = Multimodal.dHashes(media)
    assert(hashes.count() == 3) // corrupt payload dropped
    val pairs = graft.operators.Dedup.hashPairs(hashes, maxHamming = 3)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("decodeAndFeaturize accepts a pluggable codec (same Spark plan)") {
    import graft.operators.PpmFeaturizer
    val pixels = Array.fill[Byte](3 * 6)(100.toByte)
    val ppm = "P6\n3 2\n255\n".getBytes("US-ASCII") ++ pixels
    val df = Seq((10L, "image", ppm)).toDF("media_id", "kind", "payload")
    val out = Multimodal.decodeAndFeaturize(df, PpmFeaturizer)
      .collect().head
    assert(out.media_id == 10L && out.n_bytes == ppm.length)
    assert(out.feature(0) == 3.0f && out.feature(1) == 2.0f)
    assert(math.abs(out.feature(3) - 100.0 / 255) < 1e-6)
  }

  test("sampleFrames emits one row per stride chunk") {
    val got = Multimodal.sampleFrames(media, stride = 64)
      .groupBy("media_id").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(got(1L) == 1L)  // 11 bytes -> 1 frame
    assert(got(2L) == 4L)  // 200 bytes -> ceil(200/64) = 4
    assert(got(3L) == 3L)  // 130 bytes -> 3
  }

  test("resizedLuma: exact integer area means, ragged cells, upscale " +
    "covers only reachable cells, undecodable payloads drop") {
    // 10x6 grayscale PPM resized to 4x4: ragged bins (10/4 and 6/4 are
    // not integral), checked against a naive JVM reimplementation
    val w = 10; val h = 6
    val px = Array.tabulate(w * h)(i => (7 * i + 3) % 256)
    val body = px.flatMap(v => Array(v.toByte, v.toByte, v.toByte))
    val ppm = s"P6\n$w $h\n255\n".getBytes("US-ASCII") ++ body
    val media = Seq((1L, ppm), (2L, "garbage".getBytes("UTF-8")))
      .toDF("media_id", "payload")
    val got = Multimodal.resizedLuma(media, 4, 4)
      .as[(Long, Int, Int, Long)].collect()
    assert(got.forall(_._1 == 1L)) // the garbage payload dropped
    assert(got.length == 16)
    val sums = Array.ofDim[Long](16); val counts = Array.ofDim[Long](16)
    for (y <- 0 until h; x <- 0 until w) {
      val c = (y * 4 / h) * 4 + (x * 4 / w)
      sums(c) += 1000L * px(y * w + x); counts(c) += 1
    }
    got.foreach { case (_, ky, kx, v) =>
      val c = ky * 4 + kx
      assert(v == sums(c) / counts(c), s"cell ($kx,$ky)")
    }
    // upscale past the source: only covered cells emit (2x2 -> 5x5
    // reaches cells {0, 2} per axis: floor(x*5/2) = 0 or 2)
    val tiny = "P6\n2 2\n255\n".getBytes("US-ASCII") ++
      Array.fill(12)(100.toByte)
    val up = Multimodal.resizedLuma(
        Seq((3L, tiny)).toDF("media_id", "payload"), 5, 5)
      .as[(Long, Int, Int, Long)].collect()
    assert(up.length == 4)
    assert(up.map(r => (r._2, r._3)).toSet ==
      Set((0, 0), (0, 2), (2, 0), (2, 2)))
    assert(up.forall(_._4 == 100000L)) // 1000 x luma of a flat gray
  }

  test("resizedLumaGrid: a pivot of resizedLuma — same cells row-major, " +
    "-1 sentinels exactly on uncovered cells, droppers drop") {
    val w = 10; val h = 6
    val px = Array.tabulate(w * h)(i => (11 * i + 5) % 256)
    val body = px.flatMap(v => Array(v.toByte, v.toByte, v.toByte))
    val ppm = s"P6\n$w $h\n255\n".getBytes("US-ASCII") ++ body
    val tiny = "P6\n2 2\n255\n".getBytes("US-ASCII") ++
      Array.fill(12)(100.toByte)
    val media = Seq((1L, ppm), (2L, "garbage".getBytes("UTF-8")),
      (3L, tiny)).toDF("media_id", "payload")
    val grids = Multimodal.resizedLumaGrid(media, 5, 5)
      .as[(Long, Seq[Long])].collect().toMap
    assert(grids.keySet == Set(1L, 3L)) // garbage dropped
    val cells = Multimodal.resizedLuma(media, 5, 5)
      .as[(Long, Int, Int, Long)].collect()
      .map { case (id, ky, kx, v) => (id, ky * 5 + kx) -> v }.toMap
    for (id <- Seq(1L, 3L); c <- 0 until 25)
      assert(grids(id)(c) == cells.getOrElse((id, c), -1L),
        s"id $id cell $c")
  }
}
