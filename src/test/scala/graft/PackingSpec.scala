package graft

import graft.operators.Packing
import org.apache.spark.sql.functions._

/** Sequence packing: concat-and-chunk manifest vs a sequential
  * reference (exact boundary arithmetic, coverage/partition
  * invariants), and per-shard next-fit vs a sequential reference
  * (capacity resets, truncation, shard isolation). */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  private def docsDF(lens: Seq[(Long, Int)]) =
    lens.map { case (id, n) => (id, Seq.fill(n)("tok").mkString(" ")) }
      .toDF("doc_id", "text")

  // whitespace-token corpus: subtokenCount("tok tok ...") = n
  private val fixture = Seq[(Long, Int)](
    (1L, 10), (2L, 64), (3L, 1), (4L, 200), (5L, 0), (6L, 63),
    (7L, 64), (8L, 65), (9L, 7), (10L, 128))

  test("packSequences equals the sequential concat-and-chunk reference " +
    "and its spans partition every document and fill every sequence") {
    val L = 64L
    val got = Packing.packSequences(docsDF(fixture), L)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
    // sequential reference: walk docs in id order, carry a global offset
    var off = 0L
    val want = fixture.sortBy(_._1).filter(_._2 > 0).flatMap { case (id, n) =>
      val rows = (off / L to (off + n - 1) / L).map { s =>
        (id, s, math.max(0L, s * L - off),
          math.min(n.toLong, (s + 1) * L - off),
          math.max(0L, off - s * L))
      }
      off += n
      rows
    }
    assert(got.toSeq == want)
    // per-doc spans partition [0, n)
    got.groupBy(_._1).foreach { case (id, rs) =>
      val n = fixture.find(_._1 == id).get._2.toLong
      val sorted = rs.sortBy(_._3)
      assert(sorted.head._3 == 0L && sorted.last._4 == n)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._4 == b._3, s"gap in doc $id")
        case _ =>
      }
    }
    // every sequence except the last is exactly full
    val total = fixture.map(_._2).sum.toLong
    val bySeq = got.groupBy(_._2).view
      .mapValues(_.map(r => r._4 - r._3).sum).toMap
    val lastSeq = (total - 1) / L
    bySeq.foreach { case (s, fill) =>
      if (s < lastSeq) assert(fill == L, s"seq $s fill $fill")
      else assert(fill == total - lastSeq * L)
    }
    // empty doc packs nowhere
    assert(!got.exists(_._1 == 5L))
  }

  test("packGreedy equals the sequential next-fit reference per shard; " +
    "capacity respected, over-long docs truncate into singletons") {
    val L = 50L
    val shards = 3
    val fx = Seq[(Long, Int)]((0L, 20), (1L, 45), (2L, 10), (3L, 30),
      (4L, 120), (5L, 50), (6L, 21), (7L, 3), (8L, 0), (9L, 49),
      (12L, 18), (15L, 33), (18L, 5))
    val got = Packing.packGreedy(docsDF(fx), L, shards)
      .as[(Long, Long, Long, Long, Long, Boolean)].collect()
      .sortBy(_._1).toSeq
    // sequential reference
    val want = fx.filter(_._2 > 0).map { case (id, n) =>
      (id, id % shards, math.min(n.toLong, L), n > L)
    }.groupBy(_._2).toSeq.flatMap { case (shard, ds) =>
      var seq = 0L; var run = 0L
      ds.sortBy(_._1).map { case (id, _, len, tr) =>
        if (seq == 0L || run + len > L) { seq += 1; run = len }
        else run += len
        (id, shard, seq, run - len, len, tr)
      }
    }.sortBy(_._1)
    assert(got == want)
    // invariants: fit within capacity, truncation contract, shard math
    got.foreach { case (id, sh, seq, off, len, tr) =>
      assert(off + len <= L, s"doc $id overflows")
      assert(sh == id % shards && seq >= 1)
      assert(tr == (fx.find(_._1 == id).get._2 > L))
      if (tr) assert(off == 0L && len == L) // singleton, truncated to fit
    }
    // each (shard, seq) holds docs at non-overlapping offsets
    got.groupBy(r => (r._2, r._3)).foreach { case (_, rs) =>
      val spans = rs.map(r => (r._4, r._4 + r._5)).sortBy(_._1)
      spans.sliding(2).foreach {
        case Seq(a, b) => assert(a._2 <= b._1)
        case _ =>
      }
    }
    // empty docs never pack
    assert(!got.exists(_._1 == 8L))
  }

  test("packGreedy shards are independent: adding docs to one shard " +
    "never moves another shard's packing") {
    val L = 40L
    val base = Seq[(Long, Int)]((0L, 30), (3L, 30), (1L, 12), (4L, 12))
    val more = base ++ Seq((6L, 25), (9L, 25)) // shard 0 only
    def pack(fx: Seq[(Long, Int)]) =
      Packing.packGreedy(docsDF(fx), L, 3)
        .as[(Long, Long, Long, Long, Long, Boolean)].collect()
        .filter(_._2 == 1L).sortBy(_._1).toSeq
    assert(pack(base) == pack(more))
  }

  test("seeded random corpora: both packers match their sequential " +
    "references across draws (lengths straddling L, sparse ids, dups " +
    "of L exactly)") {
    val rnd = new scala.util.Random(1234)
    for (draw <- 1 to 3) {
      val L = Seq(16L, 50L, 128L)(draw - 1)
      val n = 60 + rnd.nextInt(60)
      val fx = (0 until n).map { _ =>
        (rnd.nextLong(100000),
          // mix: tiny docs, ~L docs, exactly-L docs, over-L docs
          rnd.nextInt(4) match {
            case 0 => 1 + rnd.nextInt(5)
            case 1 => math.max(1, L.toInt - 2 + rnd.nextInt(5))
            case 2 => L.toInt
            case _ => L.toInt + 1 + rnd.nextInt(40)
          })
      }.distinctBy(_._1)
      // concat-and-chunk reference
      val gotSeq = Packing.packSequences(docsDF(fx), L)
        .as[(Long, Long, Long, Long, Long)].collect()
        .sortBy(r => (r._1, r._2)).toSeq
      var off = 0L
      val wantSeq = fx.sortBy(_._1).filter(_._2 > 0).flatMap { case (id, m) =>
        val rows = (off / L to (off + m - 1) / L).map { s =>
          (id, s, math.max(0L, s * L - off),
            math.min(m.toLong, (s + 1) * L - off),
            math.max(0L, off - s * L))
        }
        off += m
        rows
      }
      assert(gotSeq == wantSeq, s"packSequences draw $draw")
      // next-fit reference
      val shards = 1 + rnd.nextInt(5)
      val gotG = Packing.packGreedy(docsDF(fx), L, shards)
        .as[(Long, Long, Long, Long, Long, Boolean)].collect()
        .sortBy(_._1).toSeq
      val wantG = fx.filter(_._2 > 0)
        .map { case (id, m) =>
          (id, id % shards, math.min(m.toLong, L), m > L) }
        .groupBy(_._2).toSeq.flatMap { case (shard, ds) =>
          var seq = 0L; var run = 0L
          ds.sortBy(_._1).map { case (id, _, len, tr) =>
            if (seq == 0L || run + len > L) { seq += 1; run = len }
            else run += len
            (id, shard, seq, run - len, len, tr)
          }
        }.sortBy(_._1)
      assert(gotG == wantG, s"packGreedy draw $draw")
    }
  }

  test("input validation fails loudly") {
    intercept[IllegalArgumentException](
      Packing.packSequences(docsDF(fixture), 0L))
    intercept[IllegalArgumentException](
      Packing.packGreedy(docsDF(fixture), 64L, 0))
    intercept[IllegalArgumentException](
      Packing.packGreedy(
        Seq(("x", "a b")).toDF("doc_id", "text"), 64L, 2))
  }
}
