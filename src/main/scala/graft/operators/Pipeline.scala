package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The end-to-end training-data curation pipeline — the composition a
  * 100 TB corpus actually runs, assembled from the stage operators this
  * library proves one by one: language filter → quality-classifier gate →
  * exact dedup → eval-suite decontamination → deterministic split
  * assignment. Every stage decision is integer/hash-exact, so the FULL
  * composition replays bit-for-bit in an external engine (q90's oracle
  * runs the whole funnel in SQL), and the kept set is append-stable and
  * partition-invariant end to end.
  *
  * Scale shape, stage by stage:
  *   1. language + quality gates are PURE column predicates
  *      ([[TextAnalysis.predLangExpr]], [[QualityModels.marginExpr]] — a
  *      per-row long fold): map-only, applied at the scan, no shuffle.
  *   2. exact dedup is ONE text-hash-keyed aggregation; the canonical
  *      pick joins back on the SAME hash key so the exchange is reused
  *      across both consumers (the q18/q83 discipline).
  *   3. decontamination explodes survivor n-grams to 8-byte md5 keys and
  *      probes the BROADCAST distinct gram-key set of the (corpus-≪)
  *      eval suite ([[TextAnalysis.decontaminate]]); the dirty-id
  *      anti-join back is key-only.
  *   4. split assignment is a map-only md5 ppm draw
  *      ([[TextAnalysis.assignSplit]]).
  * The only corpus-sized shuffles are the dedup hash agg and its
  * join-back; text itself crosses the wire once (into the dedup agg's
  * canonical pick it never travels — only 16-byte (hash, id) rows).
  */
object Pipeline {

  /** Run the curation funnel over `docs` against a held-out `evalSuite`.
    * Returns one row per SURVIVING document: (doc_id, split, n_tokens) —
    * the training manifest a tokenizer shards from. Stage semantics:
    * keep docs predicted `lang`, with non-negative classifier margin,
    * that are the minimum-id copy of their exact text, and that share NO
    * `gramN`-gram with the eval suite; then assign train/val/test by the
    * md5 ppm draw. `docs` needs (doc_id, text); `evalSuite` needs text.
    */
  def curate(docs: DataFrame, evalSuite: DataFrame,
             lang: String = "en", gramN: Int = 4,
             splits: Seq[(String, Long)] = Seq(
               ("train", 800000L), ("val", 100000L), ("test", 100000L)))
      : DataFrame = {
    // stages 1+2: map-only predicates, pushed to the scan
    val gated = docs.where(
      TextAnalysis.predLangExpr(col("text")) === lang &&
        QualityModels.marginExpr(col("text")) >= 0L)
      .select(col("doc_id"), col("text"))
    // stage 3: exact dedup — hash agg + same-key join-back (exchange
    // reuse), keep the minimum-id copy of each distinct text
    val hashed = gated.withColumn("_h", md5(col("text").cast("binary")))
    val canon = hashed.groupBy("_h").agg(min("doc_id").as("_keep"))
    val deduped = hashed.join(canon, "_h")
      .where(col("doc_id") === col("_keep"))
      .select(col("doc_id"), col("text"))
    // stage 4: decontamination — any shared gram with the eval suite
    // disqualifies (the q53 rule; the graded q84 form slots in the same
    // anti-join if a deployment prefers a ratio threshold)
    val dirty = TextAnalysis.decontaminate(deduped, evalSuite, gramN)
      .select("doc_id")
    val clean = deduped.join(dirty, Seq("doc_id"), "left_anti")
    // stage 5: map-only split draw; emit the manifest
    TextAnalysis.assignSplit(clean, "doc_id", splits)
      .select(col("doc_id"), col("split"),
        TextAnalysis.tokenCount(col("text")).as("n_tokens"))
  }
}
