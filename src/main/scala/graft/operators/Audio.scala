package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Audio-column plumbing for training-data pipelines (builder north star:
  * image/AUDIO/video as opaque binary columns with real decode at the
  * codec boundary). Mirrors the image path ([[Multimodal]]): payloads are
  * opaque `binary`, the decoder is a REAL codec (a strict RIFF/WAVE PCM
  * parser, cross-validated in specs against the JDK's own
  * `javax.sound.sampled` decode of the same bytes), features are
  * deterministic integer math an external oracle can replay, and the
  * fingerprint feeds the SAME banded Hamming dedup as text SimHash and
  * image dHash ([[Dedup.hashPairs]] / [[Dedup.hashDeduped]]).
  *
  * The 56-bit fingerprint is the classic energy-delta acoustic hash
  * (Haitsma–Kalker-shaped, reduced to one band): split the signal into
  * 57 fixed windows, bit j = (energy(j+1) > energy(j)). Energies are
  * exact integer sums of (sample − 128)² — byte-deterministic across
  * engines, no float anywhere, so a SQL oracle replays the whole chain
  * from the sample formula (q74, the q69 pattern).
  *
  * The reference has no audio surface (its payload is embedding vectors,
  * core/data_structures.py:24); this family exists for the repo-level
  * LLM-pipeline brief, like the image family beside it.
  */
object Audio {

  /** Fingerprint geometry: 57 windows × 32 samples → 56 delta bits
    * (SimhashBits, so audio prints ride the same 4×14 pigeonhole bands
    * as image/text hashes). */
  val WindowSize = 32
  val NumWindows: Int = Dedup.SimhashBits + 1
  val MinSamples: Int = WindowSize * NumWindows // 1824

  /** Encode 8-bit unsigned PCM mono samples (0..255) as a minimal but
    * fully standard RIFF/WAVE file — the fixture generator and the spec
    * round-trip source. */
  def buildWavPcm8(samples: Array[Int], sampleRate: Int = 8000)
      : Array[Byte] = {
    val n = samples.length
    val bb = java.nio.ByteBuffer.allocate(44 + n)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + n)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(sampleRate)
      .putInt(sampleRate) // byte rate (1 byte/frame)
      .putShort(1) // block align
      .putShort(8) // bits per sample
      .put("data".getBytes("US-ASCII")).putInt(n)
    var i = 0
    while (i < n) { bb.put((samples(i) & 0xff).toByte); i += 1 }
    bb.array()
  }

  /** Strict RIFF/WAVE PCM decoder: walks the chunk list (tolerating
    * extra chunks before `data`, as real encoders emit), validates
    * PCM / mono / 8-bit, and returns the unsigned samples (0..255).
    * Returns None for anything that is not a WAV this parser owns —
    * the bulk path drops such rows, mirroring [[Multimodal.dHashes]]'
    * undecodable-payload contract. */
  def decodeWavPcm8(bytes: Array[Byte]): Option[Array[Int]] = {
    if (bytes.length < 44) return None
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(): String = {
      val a = new Array[Byte](4); bb.get(a); new String(a, "US-ASCII")
    }
    if (tag() != "RIFF") return None
    bb.getInt // declared riff size; trust the buffer bound instead
    if (tag() != "WAVE") return None
    var fmtOk = false
    // chunk walk: fmt must precede data (the spec requires it; every
    // real encoder complies)
    while (bb.remaining() >= 8) {
      val id = tag()
      val size = bb.getInt
      if (size < 0 || size > bb.remaining()) return None
      id match {
        case "fmt " =>
          if (size < 16) return None
          val p0 = bb.position()
          val codec = bb.getShort
          val channels = bb.getShort
          bb.getInt // sample rate (any)
          bb.getInt // byte rate
          bb.getShort // block align
          val bits = bb.getShort
          if (codec != 1 || channels != 1 || bits != 8) return None
          fmtOk = true
          bb.position(p0 + size + (size & 1)) // chunks are word-aligned
        case "data" =>
          if (!fmtOk) return None
          val out = new Array[Int](size)
          var i = 0
          while (i < size) { out(i) = bb.get() & 0xff; i += 1 }
          return Some(out)
        case _ =>
          bb.position(bb.position() + size + (size & 1))
      }
    }
    None
  }

  /** Exact integer window energies: e(k) = Σ (sample − 128)² over window
    * k's `WindowSize` samples. */
  def windowEnergies(samples: Array[Int], numWindows: Int = NumWindows)
      : Array[Long] = {
    val out = new Array[Long](numWindows)
    var k = 0
    while (k < numWindows) {
      var e = 0L
      var t = 0
      while (t < WindowSize) {
        val d = samples(k * WindowSize + t) - 128
        e += d.toLong * d
        t += 1
      }
      out(k) = e
      k += 1
    }
    out
  }

  /** 56-bit energy-delta fingerprint of a WAV payload: bit j set iff
    * e(j+1) > e(j). Null (dropped by the bulk path) when the payload is
    * not a PCM-8 mono WAV or is shorter than [[MinSamples]]. */
  def fingerprint56(bytes: Array[Byte]): java.lang.Long =
    decodeWavPcm8(bytes) match {
      case Some(s) if s.length >= MinSamples =>
        val e = windowEnergies(s)
        var h = 0L
        var j = 0
        while (j < Dedup.SimhashBits) {
          if (e(j + 1) > e(j)) h |= 1L << j
          j += 1
        }
        java.lang.Long.valueOf(h)
      case _ => null
    }

  /** Bulk acoustic fingerprinting: (media_id, payload) → (_id, simhash),
    * one decode per row at the codec boundary (mapPartitions like the
    * image path — a native parse, correctly not an Expression).
    * Undecodable/short payloads drop. Output feeds [[Dedup.hashPairs]]
    * and [[Dedup.hashDeduped]] unchanged. */
  def fingerprints(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, payload) =>
        Option(fingerprint56(payload)).map(h => (id, h.longValue()))
      })
      .toDF("_id", "simhash")
  }
}
