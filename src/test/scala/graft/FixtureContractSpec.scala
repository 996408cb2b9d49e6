package graft

import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.{Files, Paths}

/** Pins the driver-fixture contract (TESTDATA.md) so a regenerated fixture
  * set that the engine cannot read fails HERE with a schema diff, not as an
  * empty correctness file at round end (the round-6 failure mode: the
  * regenerated `events.ts` switched from TIMESTAMP(NANOS) to timestamp[us]
  * and three declared queries stopped planning).
  *
  * Contract pinned: every table loads; column NAMES match TESTDATA.md;
  * `events.ts` is one of the encodings the engine adapts to (nanos-as-long
  * BIGINT, TIMESTAMP, TIMESTAMP_NTZ); the embedding dim is probed from data,
  * never assumed. Plus a synthetic both-encodings equivalence gate for the
  * events loader itself.
  */
class FixtureContractSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  private val expectedCols: Map[String, Set[String]] = Map(
    "region" -> Set("r_regionkey", "r_name"),
    "nation" -> Set("n_nationkey", "n_name", "n_regionkey"),
    "customer" -> Set("c_custkey", "c_name", "c_nationkey", "c_acctbal",
      "c_mktsegment"),
    "supplier" -> Set("s_suppkey", "s_name", "s_nationkey", "s_acctbal"),
    "part" -> Set("p_partkey", "p_name", "p_brand", "p_type", "p_size",
      "p_retailprice"),
    "orders" -> Set("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderdate", "o_orderpriority"),
    "lineitem" -> Set("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_quantity", "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
      "l_linestatus", "l_shipdate"),
    "events" -> Set("event_id", "ts", "user_id", "event_type", "value",
      "props"),
    "documents" -> Set("doc_id", "text", "lang", "source", "n_chars"),
    "embeddings" -> Set("vec_id", "embedding", "label"))

  test("every driver fixture table loads with the TESTDATA.md columns") {
    assume(Files.exists(Paths.get(sfDir)), s"$sfDir not present")
    val diffs = expectedCols.flatMap { case (name, want) =>
      val got = Tables(spark, sfDir, name).columns.toSet
      if (got == want) None
      else Some(s"$name: missing=${want -- got} unexpected=${got -- want}")
    }
    assert(diffs.isEmpty, s"fixture schema drift:\n${diffs.mkString("\n")}")
  }

  test("events.ts carries an encoding the engine adapts to") {
    assume(Files.exists(Paths.get(sfDir)), s"$sfDir not present")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val t = Tables.events(spark, sfDir).schema("ts").dataType
    assert(Set[DataType](LongType, TimestampType, TimestampNTZType)(t),
      s"events.ts read as $t — extend Temporal.eventsUs before shipping")
    // and the adaptive loader actually plans + executes on it
    val out = graft.queries.Temporal.queries("q12_lag")(spark, sfDir)
    assert(out.limit(5).count() == 5)
  }

  test("embedding dim is probed from data, not assumed") {
    assume(Files.exists(Paths.get(sfDir)), s"$sfDir not present")
    val dims = Tables.embeddings(spark, sfDir)
      .select(size(col("embedding")).as("d")).distinct()
      .as[Int].collect()
    assert(dims.length == 1 && dims.head > 0,
      s"embedding dims not uniform/positive: ${dims.toSeq}")
  }

  test("eventsUs yields identical micros for long-nanos, timestamp, and " +
    "timestamp_ntz encodings") {
    val base = Seq(
      (1L, 1735689600000000L, 10L, "click", 1.5, "{}"),
      (2L, 1735689600123456L, 10L, "view", 2.5, "{}"),
      (3L, 1735693200999999L, 11L, "click", 3.5, "{}"))
    val dirA = Files.createTempDirectory("graft-ev-long").toString
    val dirB = Files.createTempDirectory("graft-ev-ts").toString
    val dirC = Files.createTempDirectory("graft-ev-ntz").toString
    // encoding A: raw int64 nanos (what nanosAsLong yields for NANOS files)
    base.map { case (id, us, u, et, v, p) => (id, us * 1000L, u, et, v, p) }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dirA/events.parquet")
    // encoding B: TIMESTAMP (LTZ) micros
    val withUs = base
      .map { case (id, us, u, et, v, p) => (id, us, u, et, v, p) }
      .toDF("event_id", "ts_us_raw", "user_id", "event_type", "value",
        "props")
    withUs.withColumn("ts", timestamp_micros(col("ts_us_raw")))
      .drop("ts_us_raw")
      .write.mode("overwrite").parquet(s"$dirB/events.parquet")
    // encoding C: TIMESTAMP_NTZ (isAdjustedToUTC=false) — the round-6
    // regenerated shape, whose correctness depends on the session TZ
    // staying pinned to UTC for the cast-through-LTZ micros extraction
    withUs.withColumn("ts",
        timestamp_micros(col("ts_us_raw")).cast("timestamp_ntz"))
      .drop("ts_us_raw")
      .write.mode("overwrite").parquet(s"$dirC/events.parquet")
    def run(d: String): Map[Long, Double] =
      graft.queries.Temporal.queries("q12_lag")(spark, d)
        .na.fill(-999.0, Seq("value_diff")) // null lag → sentinel (NaN != NaN)
        .as[(Long, Long, Double)].collect()
        .map(r => r._1 -> r._3).toMap
    val a = run(dirA)
    assert(a == run(dirB))
    assert(a == run(dirC))
    // and C really exercised the NTZ branch
    import org.apache.spark.sql.types.TimestampNTZType
    assert(graft.sources.Tables.events(spark, dirC)
      .schema("ts").dataType == TimestampNTZType)
  }
}
