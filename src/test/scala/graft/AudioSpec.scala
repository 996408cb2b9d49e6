package graft

import graft.operators.{Audio, Dedup}
import org.apache.spark.sql.functions._

class AudioSpec extends SparkSpec {
  import spark.implicits._

  private def sampsFor(p: Int, q: Int): Array[Int] =
    Array.tabulate(Audio.MinSamples) { t =>
      val k = t / Audio.WindowSize
      val a = (3 * k + 5 * p + k * p) % 17 + (if (q > 0 && k == q) 1 else 0)
      128 + (if (t % 2 == 0) a else -a)
    }

  test("WAV round-trip: encode then strict-decode returns the samples") {
    val s = sampsFor(3, 0)
    val bytes = Audio.buildWavPcm8(s)
    assert(Audio.decodeWavPcm8(bytes).get.sameElements(s))
  }

  test("the strict parser agrees with the JDK's own WAV codec") {
    // javax.sound.sampled is a REAL independent decoder of the same
    // bytes — if our RIFF walk mis-parsed offsets or sizes, the two
    // sample streams would diverge
    val s = sampsFor(7, 2)
    val bytes = Audio.buildWavPcm8(s, sampleRate = 8000)
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val fmt = in.getFormat
    assert(fmt.getChannels == 1 && fmt.getSampleSizeInBits == 8)
    val jdk = in.readAllBytes().map(_ & 0xff)
    assert(jdk.sameElements(s))
  }

  test("chunk walk tolerates extra chunks and rejects non-owned formats") {
    val s = sampsFor(1, 0)
    val plain = Audio.buildWavPcm8(s)
    // splice a LIST chunk between fmt and data (offset 36 = end of fmt)
    val list = "LIST".getBytes("US-ASCII") ++
      Array[Byte](4, 0, 0, 0) ++ "INFO".getBytes("US-ASCII")
    val spliced = plain.take(36) ++ list ++ plain.drop(36)
    assert(Audio.decodeWavPcm8(spliced).get.sameElements(s))
    // 16-bit flag must be rejected (we only own PCM-8 mono)
    val bad16 = plain.clone(); bad16(34) = 16
    assert(Audio.decodeWavPcm8(bad16).isEmpty)
    // stereo must be rejected
    val bad2ch = plain.clone(); bad2ch(22) = 2
    assert(Audio.decodeWavPcm8(bad2ch).isEmpty)
    // truncated data must be rejected, not mis-read
    assert(Audio.decodeWavPcm8(plain.take(plain.length - 10)).isEmpty)
    assert(Audio.fingerprint56("nonsense".getBytes) == null)
  }

  test("energy-delta fingerprints: same-family tiers are Hamming-close, " +
    "the banded join finds them end-to-end") {
    // family p=4 across tiers 0..2 + two unrelated families
    val rows = Seq(
      (0L, 4, 0), (1L, 4, 1), (2L, 4, 2), (10L, 9, 0), (20L, 13, 0))
    val media = rows.map { case (id, p, q) =>
      (id, Audio.buildWavPcm8(sampsFor(p, q)))
    }.toDF("media_id", "payload")
    val prints = Audio.fingerprints(media)
      .as[(Long, Long)].collect().toMap
    assert(prints.size == 5)
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    // a tier perturbs ONE window's amplitude -> at most the two adjacent
    // energy comparisons flip
    assert(ham(prints(0L), prints(1L)) <= 2)
    assert(ham(prints(0L), prints(2L)) <= 2)
    // end-to-end through the same banded Hamming join the image path uses
    val pairs = Dedup.hashPairs(Audio.fingerprints(media), maxHamming = 3)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)) && pairs.contains((0L, 2L)))
    // brute-force cross-check: the banded output IS the brute contract
    val brute = (for {
      (a, ha) <- prints.toSeq; (b, hb) <- prints.toSeq
      if a < b && ham(ha, hb) <= 3
    } yield (a, b)).toSet
    assert(pairs == brute)
  }

  test("fingerprint chain replays the integer formula exactly") {
    // independent recomputation of the energies + delta bits straight
    // from the sample formula (what the q74 oracle does in SQL)
    val p = 6; val q = 3
    val fp = Audio.fingerprint56(Audio.buildWavPcm8(sampsFor(p, q)))
    val e = (0 until Audio.NumWindows).map { k =>
      val a = (3 * k + 5 * p + k * p) % 17 + (if (q > 0 && k == q) 1 else 0)
      32L * a * a // 32 samples, each deviation ±a
    }
    val expect = (0 until Dedup.SimhashBits)
      .filter(j => e(j + 1) > e(j)).map(1L << _).sum
    assert(fp.longValue() == expect)
  }
}
