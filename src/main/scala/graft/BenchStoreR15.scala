package graft

import graft.api.CurationDB
import graft.operators.{Ckpt, Dedup}
import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-15 optimization probes (dev tool, not a declared query).
  *
  * Mode `cdb` (default): phase-attributes the q122 CurationDB protocol
  * on the declared corpus — corp build, five-store init, three facade
  * appends, minhash compact, semantic retrain, cold open + historical
  * keptAt read — so the epoch-history query's wall is priced per phase
  * instead of as one opaque number.
  *
  * Mode `extend`: prices the r15 touched-component restriction in
  * [[graft.operators.Dedup.extendComponents]] on a SYNTHETIC
  * corpus-sized assignment (SPARK_GRAFT_R15_COMPS components ×
  * SPARK_GRAFT_R15_MEMBERS members, deterministic ids) extended by a
  * small batch of edges: the same call runs once with the restriction
  * forced ON (restrictMinBytes=0) and once forced OFF (huge), walls
  * reported side by side — the measured crossover the stats gate's
  * default threshold is sized from.
  */
object BenchStoreR15 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val mode = sys.env.getOrElse("SPARK_GRAFT_R15_MODE", "cdb")
    val spark = graft.api.GraftSession
      .builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def r3(x: Double): Double = math.rint(x * 1000) / 1000

    if (mode == "cdb") {
      // the exact q122 protocol, phase-timed
      val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
      val emb = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
      var corp: DataFrame = null
      val tCorp = timed {
        corp = Ckpt.eager(
          docs.join(emb, docs("doc_id") === emb("vec_id"))
            .select(col("doc_id"), col("text"),
              trim(substring(lower(regexp_replace(col("text"),
                "[^A-Za-z0-9 ]", "")), 1, 24)).as("key"),
              col("embedding")))
      }
      val mx = corp.agg(max(col("doc_id"))).head.getLong(0)
      val c1 = mx * 5 / 10; val c2 = mx * 7 / 10; val c3 = mx * 9 / 10
      val root = java.nio.file.Files
        .createTempDirectory("graft_r15cdb").toString + "/db"
      val cfg = CurationDB.Config(nCells = 8, maxStaleFrac = 10.0)
      var db: CurationDB = null
      val phases = scala.collection.mutable.ListBuffer[(String, Double)]()
      phases += "corp" -> tCorp
      phases += "init" -> timed {
        db = CurationDB.init(spark, root, corp.where(col("doc_id") <= c1),
          cfg)
      }
      phases += "append1" -> timed {
        db.append(corp.where(col("doc_id") > c1 && col("doc_id") <= c2))
      }
      phases += "mh_compact" -> timed { db.minhash.compact() }
      phases += "sm_retrain" -> timed { db.semantic.retrain(nCells = 8) }
      phases += "append2" -> timed {
        db.append(corp.where(col("doc_id") > c2 && col("doc_id") <= c3))
      }
      phases += "append3" -> timed {
        db.append(corp.where(col("doc_id") > c3))
      }
      phases += "open_read" -> timed {
        CurationDB.open(spark, root, cfg)
          .keptAt(2L, corp.select("doc_id"))
          .write.format("noop").mode("overwrite").save()
      }
      val ps = phases.map { case (k, v) => s""""$k":${r3(v)}""" }
        .mkString(",")
      println(s"""{"metric":"cdb_phases_r15","unit":"sec","sf":"$sfDir","total":${r3(phases.map(_._2).sum)},"phases":{$ps}}""")
    }

    if (mode == "extend") {
      import spark.implicits._
      val nComps = sys.env.getOrElse("SPARK_GRAFT_R15_COMPS", "200000").toLong
      val mPer = sys.env.getOrElse("SPARK_GRAFT_R15_MEMBERS", "10").toLong
      // assignment: component c has members c*mPer .. c*mPer+mPer-1,
      // labeled c*mPer (the min) — a valid CC output by construction
      val asg = Ckpt.eager(spark.range(nComps * mPer)
        .select(col("id"), (col("id") - pmod(col("id"), lit(mPer)))
          .as("component")))
      val n = asg.count()
      // batch: 1000 fresh ids, each pairing into one existing component
      // (every 97th), plus a few batch-internal chains
      val newPairs = spark.range(1000L).select(
        (col("id") * lit(97L * mPer)).as("id1"),
        (col("id") + lit(nComps * mPer)).as("id2"))
      def run(restrict: Boolean): Double = {
        spark.conf.set("spark.graft.extend.restrictMinBytes",
          if (restrict) "0" else Long.MaxValue.toString)
        val w = timed {
          Dedup.extendComponents(asg, newPairs)
            .write.format("noop").mode("overwrite").save()
        }
        spark.conf.unset("spark.graft.extend.restrictMinBytes")
        w
      }
      // warmup one small closure for JIT
      Dedup.extendComponents(
        Seq((1L, 1L), (2L, 1L)).toDF("id", "component"),
        Seq((2L, 3L)).toDF("id1", "id2")).collect()
      val repeats = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPEATS", "3").toInt
      val rs = (1 to repeats).map(_ => (run(restrict = true),
        run(restrict = false)))
      val on = rs.map(_._1).min; val off = rs.map(_._2).min
      println(s"""{"metric":"extend_restrict_r15","unit":"sec","n_assignment":$n,"n_new_pairs":1000,"restricted_wall_min":${r3(on)},"full_star_wall_min":${r3(off)}}""")
    }
    spark.stop()
  }
}
