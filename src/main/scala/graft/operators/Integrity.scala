package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Timeline integrity audit (SURVEY §2 rows 29, 48-49, 60; reference
  * /root/reference/core/reconstruction_service.py:299-358).
  *
  * Three set-based audits over the whole store at once (the reference loops
  * per content):
  *  - missing sequences: expected {1..max} minus actual, via `sequence()` +
  *    explode + left-anti join (core/reconstruction_service.py:322-332);
  *  - dangling deltas: delta rows whose from_seq has no version row
  *    (core/data_structures.py:184-186);
  *  - kind conflicts: (content_id, seq) present as both base and delta
  *    (storage/storage_engine.py:132-140).
  * Every audit is a hash-partitioned join/agg on content_id — scales to any
  * number of contents with no driver-side iteration.
  */
object Integrity {

  /** Rows (content_id, seq, issue) — issue in
    * ('missing_seq','dangling_from_seq','kind_conflict'). */
  def audit(versions: DataFrame): DataFrame = {
    val present = versions.select("content_id", "seq").distinct()

    val expected = versions.groupBy("content_id")
      .agg(max("seq").as("max_seq"))
      .select(col("content_id"),
        explode(sequence(lit(1), col("max_seq"))).as("seq"))

    val missing = expected.join(present, Seq("content_id", "seq"), "left_anti")
      .withColumn("issue", lit("missing_seq"))

    val dangling = versions.where(col("kind") === "delta")
      .select(col("content_id"), col("seq"), col("from_seq"))
      .join(present.withColumnRenamed("seq", "from_seq"),
        Seq("content_id", "from_seq"), "left_anti")
      .select(col("content_id"), col("seq"),
        lit("dangling_from_seq").as("issue"))

    val conflicts = versions.groupBy("content_id", "seq")
      .agg(countDistinct("kind").as("_kinds"))
      .where(col("_kinds") > 1)
      .select(col("content_id"), col("seq"), lit("kind_conflict").as("issue"))

    missing.select("content_id", "seq", "issue")
      .unionByName(dangling).unionByName(conflicts)
  }
}
