package graft

import graft.operators.{Dedup, Multimodal, Video}
import org.apache.spark.sql.functions._

class VideoSpec extends SparkSpec {
  import spark.implicits._

  // the q75 fixture formula: family p, tier q, frame t
  private def frameFor(p: Int, q: Int, t: Int, w: Int = 32, h: Int = 32)
      : Array[Int] =
    Array.tabulate(w * h) { idx =>
      val x = idx % w; val y = idx / w
      val v = (3 * x + 5 * y + 7 * p + x * y + 2 * t * x +
        (if (x < 2 && t < 4) q else 0)) % 256
      v * 0x010101
    }

  private def aviFor(p: Int, q: Int, nf: Int = 6): Array[Byte] =
    Video.buildAviRgb24(Array.tabulate(nf)(frameFor(p, q, _)), 32, 32)

  test("AVI round-trip: encode then strict-decode returns every frame's " +
    "luma grid") {
    val frames = Array.tabulate(6)(frameFor(3, 1, _))
    val bytes = Video.buildAviRgb24(frames, 32, 32)
    val Some((w, h, lumas)) = Video.decodeAviLuma(bytes)
    assert(w == 32 && h == 32 && lumas.size == 6)
    for (t <- 0 until 6; idx <- Seq(0, 17, 31 * 32 + 31)) {
      val v = frames(t)(idx) & 0xff // grayscale: R = G = B = v
      assert(lumas(t)(idx) == 1000L * v)
    }
  }

  test("DIB rows pad to 4-byte strides: odd widths round-trip exactly") {
    // w = 30 -> 90-byte rows pad to 92; a stride bug would shear rows
    val w = 30; val h = 8
    val frame = Array.tabulate(w * h) { idx =>
      val v = (7 * idx + 13) % 256; v * 0x010101
    }
    val bytes = Video.buildAviRgb24(Array(frame), w, h)
    val Some((dw, dh, lumas)) = Video.decodeAviLuma(bytes)
    assert(dw == w && dh == h)
    assert(lumas.head.indices.forall(i =>
      lumas.head(i) == 1000L * (frame(i) & 0xff)))
  }

  test("the chunk walker agrees with the JDK's own DIB decode") {
    // the DIB payload inside a '00db' chunk IS a BMP pixel array: wrap
    // the exact container bytes in a BITMAPFILEHEADER + the strf
    // BITMAPINFOHEADER and javax.imageio (a REAL independent decoder)
    // must read the identical grid — bottom-up rows, BGR order, stride
    // padding all cross-checked, as the WAV parser is checked against
    // javax.sound.sampled
    val bytes = aviFor(11, 2, nf = 1)
    // locate the one '00db' chunk in the container bytes
    // (idx1 also holds '00db' ids, but it sits AFTER movi, so the first
    // match is the frame chunk)
    val tagBytes = "00db".getBytes("US-ASCII")
    val at = bytes.indices.find(i => i + 4 <= bytes.length &&
      bytes(i) == tagBytes(0) && bytes(i + 1) == tagBytes(1) &&
      bytes(i + 2) == tagBytes(2) && bytes(i + 3) == tagBytes(3)).get
    val size = java.nio.ByteBuffer.wrap(bytes, at + 4, 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
    val dib = bytes.slice(at + 8, at + 8 + size)
    val bmp = java.nio.ByteBuffer.allocate(14 + 40 + size)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bmp.put('B'.toByte).put('M'.toByte).putInt(14 + 40 + size)
      .putShort(0).putShort(0).putInt(14 + 40)
      .putInt(40).putInt(32).putInt(32).putShort(1).putShort(24)
      .putInt(0).putInt(size).putInt(0).putInt(0).putInt(0).putInt(0)
      .put(dib)
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bmp.array()))
    assert(img != null && img.getWidth == 32 && img.getHeight == 32)
    val Some((_, _, lumas)) = Video.decodeAviLuma(bytes)
    for (y <- 0 until 32; x <- 0 until 32) {
      val rgb = img.getRGB(x, y)
      val jdkLuma = 299L * ((rgb >> 16) & 0xff) +
        587L * ((rgb >> 8) & 0xff) + 114L * (rgb & 0xff)
      assert(lumas.head(y * 32 + x) == jdkLuma,
        s"luma mismatch at ($x,$y)")
    }
  }

  test("parser rejects what it does not own, tolerates what it should") {
    val good = aviFor(1, 0)
    assert(Video.decodeAviLuma(good).isDefined)
    // truncation must be rejected, not mis-read
    assert(Video.decodeAviLuma(good.take(good.length - 10)).isEmpty)
    assert(Video.decodeAviLuma("nonsense".getBytes).isEmpty)
    assert(Video.fingerprint56(Array.emptyByteArray) == null)
    // a compressed stream (biCompression != 0) is not ours
    val strfAt = good.indices.find(i =>
      good(i) == 's' && good(i + 1) == 't' && good(i + 2) == 'r' &&
        good(i + 3) == 'f').get
    val comp = good.clone()
    comp(strfAt + 8 + 16) = 1 // biCompression -> BI_RLE8
    assert(Video.decodeAviLuma(comp).isEmpty)
    // 8bpp is not ours either
    val bpp = good.clone()
    bpp(strfAt + 8 + 14) = 8
    assert(Video.decodeAviLuma(bpp).isEmpty)
    // a JUNK chunk before hdrl is legal RIFF and must be skipped: splice
    // right after the 12-byte RIFF/AVI header, growing the declared size
    val junk = "JUNK".getBytes("US-ASCII") ++
      Array[Byte](4, 0, 0, 0) ++ Array[Byte](9, 9, 9, 9)
    val spliced = good.take(12) ++ junk ++ good.drop(12)
    assert(Video.decodeAviLuma(spliced).isDefined)
    assert(Video.decodeAviLuma(spliced).get._3.size == 6)
  }

  test("frameHashes samples at real frame boundaries") {
    val media = Seq((5L, aviFor(2, 1))).toDF("media_id", "payload")
    val all = Video.frameHashes(media).as[(Long, Int, Long)].collect()
    assert(all.map(_._2).sorted.sameElements(0 until 6))
    val sampled = Video.frameHashes(media, frameStep = 2)
      .as[(Long, Int, Long)].collect()
    assert(sampled.map(_._2).sorted.sameElements(Seq(0, 2, 4)))
    // the sampled decoder skips (not post-filters) non-sampled chunks
    // and its grids are byte-identical to the full decode's
    val full = Video.decodeAviLuma(aviFor(2, 1)).get
    val Some((sw, sh, sfs)) = Video.decodeAviLumaSampled(aviFor(2, 1), 2)
    assert(sw == full._1 && sh == full._2)
    assert(sfs.map(_._1) == Vector(0, 2, 4))
    sfs.foreach { case (t, luma) =>
      assert(luma.sameElements(full._3(t)))
    }
    // per-frame hashes equal the image dHash of that frame's pixels
    val byIdx = all.map(t => t._2 -> t._3).toMap
    for (t <- 0 until 6) {
      val luma = frameFor(2, 1, t).map(v => 1000L * (v & 0xff))
      assert(byIdx(t) == Multimodal.dHashOfGrid(32, 32, luma))
    }
  }

  test("idx1 seek: agrees with the walker, never touches skipped chunks, " +
    "falls back on a broken index, handles absolute offsets") {
    def occurrences(bytes: Array[Byte], s: String): Seq[Int] = {
      val t = s.getBytes("US-ASCII")
      bytes.indices.filter(i => i + 4 <= bytes.length &&
        t.indices.forall(j => bytes(i + j) == t(j)))
    }
    for (nf <- Seq(6, 7); step <- Seq(2, 3)) {
      val bytes = aviFor(4, 2, nf)
      val sampled = Video.decodeAviLumaSampled(bytes, step)
      // ground truth: full decode, then post-filter
      val Some((w, h, all)) = Video.decodeAviLuma(bytes)
      assert(sampled.isDefined)
      val (sw, sh, sfs) = sampled.get
      assert((sw, sh) == ((w, h)))
      assert(sfs.map(_._1) == (0 until nf by step).toVector)
      sfs.foreach { case (i, luma) => assert(luma.sameElements(all(i))) }
    }
    // corrupt a SKIPPED frame's chunk header so the strict walker aborts:
    // the indexed path must still decode (it seeks past without reading)
    val bytes = aviFor(4, 2, 6)
    val clean = Video.decodeAviLumaSampled(bytes, 2).get
    val frame1Hdr = occurrences(bytes, "00db")(1) // second frame chunk
    val broken = bytes.clone()
    java.nio.ByteBuffer.wrap(broken)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(frame1Hdr + 4, Int.MaxValue) // size overruns the buffer
    assert(Video.decodeAviLuma(broken).isEmpty) // walker: malformed
    val viaIndex = Video.decodeAviLumaSampled(broken, 2)
    assert(viaIndex.isDefined) // seek: damage confined to a skipped chunk
    assert(viaIndex.get._3.map(_._1) == clean._3.map(_._1))
    viaIndex.get._3.zip(clean._3).foreach { case ((_, a), (_, b)) =>
      assert(a.sameElements(b)) }
    // break the idx1 FIRST entry: neither offset convention validates,
    // the decoder falls back to the walker and output is unchanged
    val badIdx = bytes.clone()
    val idxAt = occurrences(bytes, "idx1").head
    java.nio.ByteBuffer.wrap(badIdx)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(idxAt + 8 + 8, 12345) // first entry's offset field
    val viaWalk = Video.decodeAviLumaSampled(badIdx, 2).get
    assert(viaWalk._3.map(_._1) == clean._3.map(_._1))
    viaWalk._3.zip(clean._3).foreach { case ((_, a), (_, b)) =>
      assert(a.sameElements(b)) }
    // absolute-offset convention: rewrite every entry to a file offset
    val absIdx = bytes.clone()
    val abb = java.nio.ByteBuffer.wrap(absIdx)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val moviAt = occurrences(bytes, "movi").head
    for (e <- 0 until 6) {
      val off = abb.getInt(idxAt + 8 + 16 * e + 8)
      abb.putInt(idxAt + 8 + 16 * e + 8, off + moviAt)
    }
    val viaAbs = Video.decodeAviLumaSampled(absIdx, 2).get
    assert(viaAbs._3.map(_._1) == clean._3.map(_._1))
    viaAbs._3.zip(clean._3).foreach { case ((_, a), (_, b)) =>
      assert(a.sameElements(b)) }
    // REORDERED idx1 (legal AVI, entries not in movi order): the indexed
    // path numbers frames by entry order, the walker by chunk order — so
    // the seek path must detect the non-monotonic offsets and fall back,
    // keeping frame NUMBERING identical between frameStep paths. Without
    // the guard, sampling 0,2,4 here would decode frames 0,1,4.
    val reord = bytes.clone()
    val rbb = java.nio.ByteBuffer.wrap(reord)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val o1 = rbb.getInt(idxAt + 8 + 16 * 1 + 8)
    val o2 = rbb.getInt(idxAt + 8 + 16 * 2 + 8)
    rbb.putInt(idxAt + 8 + 16 * 1 + 8, o2) // swap entries 1 and 2
    rbb.putInt(idxAt + 8 + 16 * 2 + 8, o1)
    val viaReord = Video.decodeAviLumaSampled(reord, 2).get
    assert(viaReord._3.map(_._1) == clean._3.map(_._1))
    viaReord._3.zip(clean._3).foreach { case ((_, a), (_, b)) =>
      assert(a.sameElements(b)) }
  }

  test("temporal-majority fingerprint: strict majority of sampled frames, " +
    "bit by bit") {
    val bytes = aviFor(9, 3)
    val media = Seq((1L, bytes)).toDF("media_id", "payload")
    val frameHs = Video.frameHashes(media, frameStep = 2)
      .as[(Long, Int, Long)].collect().map(_._3)
    assert(frameHs.length == 3)
    val expected = (0 until Dedup.SimhashBits).foldLeft(0L) { (acc, j) =>
      val cnt = frameHs.count(h => ((h >> j) & 1L) == 1L)
      if (2 * cnt > frameHs.length) acc | (1L << j) else acc
    }
    assert(Video.fingerprint56(bytes, frameStep = 2) == expected)
  }

  test("same-family tiers are Hamming-close and the banded join finds " +
    "them end-to-end (brute force is the contract)") {
    val rows = Seq(
      (0L, 4, 0), (1L, 4, 1), (2L, 4, 2), (10L, 9, 0), (20L, 13, 0))
    val media = rows.map { case (id, p, q) => (id, aviFor(p, q)) }
      .toDF("media_id", "payload")
    val prints = Video.fingerprints(media, frameStep = 2)
      .as[(Long, Long)].collect().toMap
    assert(prints.size == 5)
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    // tiers perturb two pixel columns on a majority of sampled frames:
    // only the kx=0 vs kx=1 comparisons (8 bits) can move, and the
    // fixture keeps families within the banding threshold
    assert(ham(prints(0L), prints(1L)) <= 3)
    assert(ham(prints(0L), prints(2L)) <= 3)
    val pairs = Dedup.hashPairs(Video.fingerprints(media, frameStep = 2),
        maxHamming = 3)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)) && pairs.contains((0L, 2L)))
    val brute = (for {
      (a, ha) <- prints.toSeq; (b, hb) <- prints.toSeq
      if a < b && ham(ha, hb) <= 3
    } yield (a, b)).toSet
    assert(pairs == brute)
  }
}
