package graft

import graft.api.{FingerprintStore, SubstringDedupStore}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** PLAN-SHAPE gates for the durable stores' READ paths — the
  * correctness specs prove WHAT the reads return; these pin HOW, so a
  * refactor cannot silently regress the resolution plans:
  *
  *  - epoch pruning: a resolved read scans ONLY the epoch directories
  *    at or above the latest snapshot — never pruned-away or
  *    below-snapshot files (checked against the actual input file set,
  *    which is stronger than a partition-filter string);
  *  - the latest-wins window is the read's ONLY corpus exchange (one
  *    hash exchange for the row_number window), and a SINGLE-epoch
  *    resolution (fresh compact head) skips the window entirely — zero
  *    exchanges, a pure scan;
  *  - kept() adds exactly the one anti-join over the drop set, not a
  *    re-derivation of the artifacts. */
class StorePlanSpec extends SparkSpec {
  import spark.implicits._

  private def exchanges(df: DataFrame): Int =
    "Exchange hashpartitioning".r
      .findAllIn(df.queryExecution.executedPlan.toString).length

  private def epochsScanned(df: DataFrame): Set[Long] =
    df.inputFiles.flatMap(f =>
      "epoch=(\\d+)".r.findFirstMatchIn(f).map(_.group(1).toLong)).toSet

  private val H = 0x00FF00FF00L

  test("fingerprint store reads: multi-epoch components = one window " +
    "exchange over exactly the snapshot..head epochs; post-compact " +
    "single-epoch read = zero exchanges; pruned epochs never scanned") {
    val root = Files.createTempDirectory("graft-plan-fp").toString + "/s"
    val s = FingerprintStore.init(spark, root,
      Seq((1L, H), (2L, H), (3L, 0x7700AA0011L)).toDF("_id", "simhash"))
    s.append(Seq((10L, H ^ 1L)).toDF("_id", "simhash"))
    s.append(Seq((20L, 0x13572468ACL)).toDF("_id", "simhash"))

    // snapshot=0, head=2: the latest-wins window is the ONLY exchange,
    // and the scan covers exactly epochs {0,1,2}
    val comp = s.components
    assert(exchanges(comp) == 1,
      comp.queryExecution.executedPlan.toString.take(3000))
    assert(epochsScanned(comp) == Set(0L, 1L, 2L))

    // kept() = the artifacts' aggregation + ONE anti-join; the prints
    // union is partition-pruned the same way
    val allIds = Seq(1L, 2L, 3L, 10L, 20L).toDF("doc_id")
    val kept = s.kept(allIds)
    assert(epochsScanned(s.prints) == Set(0L, 1L, 2L))
    assert(kept.queryExecution.executedPlan.toString
      .contains("LeftAnti"))

    // compact → resolution collapses to the snapshot epoch alone: a
    // pure scan, NO window exchange, and the absorbed delta epochs are
    // gone from the input file set (they are gone from disk too, but
    // the gate is on the PLAN's file selection)
    val snap = s.compact()
    val comp2 = s.components
    assert(exchanges(comp2) == 0,
      comp2.queryExecution.executedPlan.toString.take(3000))
    assert(epochsScanned(comp2) == Set(snap))
    // prints epochs are data, never pruned — all still scanned
    assert(epochsScanned(s.prints) == Set(0L, 1L, 2L, snap))
  }

  test("substring store reads: deduped resolution windows once over " +
    "snapshot..head; corpus union scans every data epoch; post-compact " +
    "deduped is a windowless scan of the snapshot epoch") {
    val root = Files.createTempDirectory("graft-plan-sub").toString + "/s"
    val s = SubstringDedupStore.init(spark, root,
      Seq(1L -> "a b c d e f g h", 2L -> "x1 a b c d x2 x3 x4")
        .toDF("doc_id", "text"), 4)
    s.append(Seq(10L -> "z1 a b c d z2 z3 z4").toDF("doc_id", "text"))

    val ded = s.deduped
    assert(exchanges(ded) == 1,
      ded.queryExecution.executedPlan.toString.take(3000))
    assert(epochsScanned(ded) == Set(0L, 1L))
    assert(epochsScanned(s.corpus) == Set(0L, 1L))

    val snap = s.compact()
    val ded2 = s.deduped
    assert(exchanges(ded2) == 0,
      ded2.queryExecution.executedPlan.toString.take(3000))
    assert(epochsScanned(ded2) == Set(snap))
    assert(epochsScanned(s.corpus) == Set(0L, 1L, snap))
  }
}
