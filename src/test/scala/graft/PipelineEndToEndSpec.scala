package graft

import graft.operators.{Dedup, QualityModels, Retrieval, TextAnalysis}
import org.apache.spark.sql.functions._

/** The whole training-data pipeline COMPOSED, on the driver's real
  * documents table: near-dup dedup → decontamination → quality filter →
  * per-language budget selection → shard packing — with row accounting
  * and output invariants at every stage. Each stage is individually
  * oracle-checked elsewhere (q23b/q45, q53, q20/q60, q54, q46); this
  * spec proves the stages actually fit together the way a user would
  * chain them. */
class PipelineEndToEndSpec extends SparkSpec {
  import spark.implicits._

  test("documents -> dedup -> decontaminate -> quality -> budget " +
    "select -> shards: row accounting holds at every stage") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val n0 = docs.count()

    // 1. near-dup dedup: MinHash+LSH pairs at Jaccard >= 0.5, component
    //    closure, keep each cluster's minimum id
    val pairs = Dedup.nearDupPairs(docs, "doc_id", "text", tau = 0.5)
      .select(col("id1"), col("id2"))
    val deduped = Dedup.dedupedCorpusCC(docs, "doc_id", pairs)
    val n1 = deduped.count()
    assert(n1 <= n0 && n1 > 0)
    // the corpus HAS duplicate groups (q18's finding) — dedup must act
    assert(n1 < n0)

    // 2. decontamination against the held-out doc_id % 97 slice
    val heldOut = deduped.where(pmod(col("doc_id"), lit(97)) === 0)
    val train = deduped.where(pmod(col("doc_id"), lit(97)) =!= 0)
    val contaminated = TextAnalysis.decontaminate(train, heldOut)
      .select(col("doc_id"))
    val clean = train.join(contaminated, Seq("doc_id"), "left_anti")
    val n2 = clean.count()
    assert(n2 <= train.count())
    // nothing contaminated survives
    assert(clean.join(contaminated, Seq("doc_id"), "left_semi")
      .count() == 0)

    // 3. quality gate: hashed-classifier label 1 only
    val scored = QualityModels.hashedLinearScore(clean)
      .where(col("label") === 1).select("doc_id")
    val quality = clean.join(scored, Seq("doc_id"), "left_semi")
    val n3 = quality.count()
    assert(n3 <= n2 && n3 > 0)

    // 4. per-language token-budget selection
    val selected = TextAnalysis.selectByTokenBudget(quality, budget = 2000)
    val n4 = selected.count()
    assert(n4 <= n3 && n4 > 0)
    // budget respected per stratum (first doc may exceed alone — the
    // greedy prefix rule: cumulative <= budget)
    val perLang = selected.groupBy("lang")
      .agg(sum("n_subtokens").as("t")).as[(String, Long)].collect()
    assert(perLang.forall(_._2 <= 2000L))

    // 5. shard packing of the survivors
    val packed = TextAnalysis.packShards(
      selected.select("doc_id")
        .join(docs.select("doc_id", "text"), Seq("doc_id")),
      tokenBudget = 512)
    assert(packed.count() == n4)
    // shards are dense 0..max and every shard holds <= budget tokens
    // EXCEPT single-doc shards allowed over budget (a doc longer than
    // the budget still ships)
    val shardTotals = packed.groupBy("shard_id")
      .agg(sum("n_subtokens").as("t"), max("n_subtokens").as("m"))
      .as[(Long, Long, Long)].collect()
    val ids = shardTotals.map(_._1).sorted
    assert(ids.head == 0L && ids.last == ids.length - 1L)
    // greedy bound: a shard exceeds the budget only by its final
    // boundary-crossing doc — total <= budget + that shard's max doc
    assert(shardTotals.forall { case (_, t, m) => t <= 512 + m })

    // the funnel is monotone and documented
    assert(n0 >= n1 && n1 >= n2 && n2 >= n3 && n3 >= n4)

    // 6. the selected corpus is still SEARCHABLE: BM25 over the final
    //    set returns hits from within it only
    val qs = Seq((1L, "spark join table")).toDF("query_id", "qtext")
    val hits = Retrieval.bm25(
      selected.select("doc_id")
        .join(docs.select("doc_id", "text"), Seq("doc_id")), qs, 5)
    val hitIds = hits.select("doc_id").as[Long].collect().toSet
    val finalIds = selected.select("doc_id").as[Long].collect().toSet
    assert(hitIds.nonEmpty && hitIds.subsetOf(finalIds))
  }

  test("curate: every stage acts on an engineered fixture and the " +
    "manifest replays the JVM twin exactly") {
    import graft.operators.Pipeline
    // JVM twin of the md5-derived 56-bit key
    def md5L(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(7).map(b => f"$b%02x").mkString, 16)
    }
    // JVM twin of QualityModels.weightQ at the 256-bucket default
    def wq(t: String): Long = {
      val bkt = java.lang.Math.floorMod(md5L(t), 256L)
      java.lang.Math.floorMod(md5L("w" + bkt), 2000001L) - 1000000L
    }
    def margin(text: String): Long =
      text.trim.split("\\s+", -1).map(wq).sum
    // engineer one text per stage from a word pool: a positive-margin
    // english text, a negative-margin english text, and a german text
    val pool = Seq("data", "table", "row", "scan", "fast", "slow", "key",
      "agg", "merge", "part", "hash", "value", "batch", "join", "sort")
    val posW = pool.filter(w => wq(w) > 0L)
    val negW = pool.filter(w => wq(w) < 0L)
    assert(posW.nonEmpty && negW.nonEmpty) // pool spans both signs
    val posText = (posW.take(2) ++ posW.take(2)).mkString(" ")
    val negText = List.fill(4)(negW.head).mkString(" ")
    assert(margin(posText) > 0L && margin(negText) < 0L)
    val deText = "der und die das" // langid gate: predicted 'de'
    val contText = posText + " leak gram probe here" // shares no 4-gram yet
    val evalText = "leak gram probe here" // its 4-gram sits inside contText
    val docs = Seq(
      (1L, posText), // survives everything (min-id copy)
      (2L, posText), // exact duplicate of 1 -> dropped by dedup
      (3L, negText), // dropped by the margin gate
      (4L, deText), // dropped by the langid gate
      (5L, contText), // dropped by decontamination (if margin passes)
      (6L, posW.mkString(" ")) // independent survivor
    ).toDF("doc_id", "text")
    val eval = Seq((100L, evalText)).toDF("doc_id", "text")
    val out = Pipeline.curate(docs, eval)
      .select("doc_id", "split", "n_tokens")
      .as[(Long, String, Long)].collect().sortBy(_._1)
    val contaminatedPasses = margin(contText) >= 0L
    assert(out.map(_._1).toSeq == Seq(1L, 6L))
    // doc 5 must be dropped by DECONTAMINATION, not the margin gate —
    // assert the stage attribution when its margin passes
    if (contaminatedPasses) {
      val noEval = Pipeline.curate(docs,
        Seq((100L, "nothing shared at all ok")).toDF("doc_id", "text"))
        .select("doc_id").as[Long].collect().toSet
      assert(noEval.contains(5L)) // only the eval suite removed it
    }
    // split + token count replay the JVM twins
    out.foreach { case (id, split, nTok) =>
      val draw = java.lang.Math.floorMod(md5L(s"$id:split"), 1000000L)
      val expected = if (draw < 800000L) "train"
        else if (draw < 900000L) "val" else "test"
      assert(split == expected, s"doc $id split")
      val text = docs.where(col("doc_id") === id)
        .select("text").as[String].head()
      assert(nTok == text.trim.split("\\s+", -1).length.toLong)
    }
    // funnel accounting partitions the input with first-stage-wins
    // attribution: doc4 language, doc3 quality, doc2 duplicate,
    // doc5 contaminated (when its margin passes), docs 1+6 kept
    val funnel = Pipeline.funnelStats(docs, eval)
      .select("stage", "n_docs")
      .as[(String, Long)].collect().toMap
    assert(funnel("language") == 1L)
    assert(funnel.getOrElse("quality", 0L) ==
      (if (contaminatedPasses) 1L else 2L))
    assert(funnel("duplicate") == 1L)
    assert(funnel.getOrElse("contaminated", 0L) ==
      (if (contaminatedPasses) 1L else 0L))
    assert(funnel("kept") == 2L)
    assert(funnel.values.sum == 6L) // the rows partition the input
    // NULL text: the gate flags evaluate NULL — the coalesce guard must
    // attribute the row to 'language' (the first gate it cannot pass),
    // not let the when() chain fall through to 'duplicate'
    val withNull = docs.union(
      Seq((7L, null.asInstanceOf[String])).toDF("doc_id", "text"))
    val f2 = Pipeline.funnelStats(withNull, eval)
      .select("stage", "n_docs").as[(String, Long)].collect().toMap
    assert(f2("language") == 2L, s"null-text attribution: $f2")
    assert(f2("duplicate") == 1L)
    assert(f2.values.sum == 7L)
  }

  test("multimodal leg: text dedup and media dedup compose into one " +
    "drop set; the streaming guard agrees with the batch decision") {
    import graft.operators.{Multimodal, Video}
    import graft.queries.DedupQueries
    import graft.streaming.StreamingIngest
    val d = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$d/documents.parquet")
      .select("doc_id", "text")
    // each doc carries an image payload (the q69 fixture): a curation
    // pass drops a doc if EITHER its text near-dups or its media
    // fingerprint near-dups — the union of two kept-sets' complements
    val textKept = Dedup.dedupedCorpusCC(docs, "doc_id",
        Dedup.nearDupPairs(docs, "doc_id", "text", tau = 0.5)
          .select(col("id1"), col("id2")))
      .select("doc_id").as[Long].collect().toSet
    val media = DedupQueries.mediaFrame(spark, d)
    val mediaKept = Dedup.hashDeduped(
        docs.select("doc_id"), "doc_id",
        Multimodal.dHashes(media), maxHamming = 3)
      .select(col("doc_id").cast("long")).as[Long].collect().toSet
    val kept = textKept.intersect(mediaKept)
    val all = docs.select("doc_id").as[Long].collect().toSet
    assert(kept.nonEmpty && kept.subsetOf(all))
    // both modalities must actually bite on this corpus
    assert(textKept != all && mediaKept != all)
    // batch/stream agreement: a NEW batch of media rows screened by the
    // streaming fingerprint guard quarantines exactly the rows whose
    // fingerprint bands collide with the kept corpus's media index —
    // and every true near-dup of a kept image is among them
    val keptHashes = Multimodal.dHashes(media)
      .where(col("_id").isin(kept.toSeq: _*))
    val incoming = DedupQueries.videoFrame(spark, d)
      .where(col("media_id") < 40) // a small fresh batch (AVI payloads)
    val hashFn: Array[Byte] => java.lang.Long =
      (b: Array[Byte]) => Video.fingerprint56(b, 2)
    val quarantined = StreamingIngest.streamingFingerprintGuard(
        incoming, keptHashes, hashFn = hashFn, invert = true)
      .select("media_id").as[Long].collect().toSet
    val keptPrints = keptHashes.select("simhash").as[Long].collect()
    val incomingPrints = Video.fingerprints(incoming, 2)
      .as[(Long, Long)].collect()
    val trueDups = incomingPrints.filter { case (_, h) =>
      keptPrints.exists(e => java.lang.Long.bitCount(e ^ h) <= 3)
    }.map(_._1).toSet
    assert(trueDups.subsetOf(quarantined)) // pigeonhole: never misses
  }
}
