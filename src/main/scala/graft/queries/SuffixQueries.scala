package graft.queries

import graft.operators.{SubstringIndex, SuffixArray}
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Suffix-array oracle queries (round 9): the EXACT substring-repeat
  * machinery of Lee et al. 2022, distributed by prefix doubling
  * ([[graft.operators.SuffixArray]]). The DuckDB oracle replays the
  * identical construction — the same doubling levels as chained
  * dense_rank CTEs and the same rank-pyramid LCP walk as unrolled
  * left-join steps — so hash equality checks the whole algorithm, not a
  * summary of it. Output is intentionally base-order-invariant (a
  * suffix's max-LCP is intrinsic), so engine/oracle collation of the
  * token alphabet cannot matter.
  */
object SuffixQueries {

  /** Pinned doubling depth for the declared query: 2^7 = 128 >= the
    * fixture max document length (100 tokens; the operator validates and
    * would reject an undersized pin loudly). */
  private val Levels = 7

  /** Coverage threshold: 16 tokens, the repo-wide span-dedup window
    * (q57/q71/q81), so the exact numbers sit beside the screens'. */
  private val MinLen = 16

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Q96: per-doc EXACT substring-dedup accounting (Lee et al. 2022)
    // over the deterministic 20% shard of the augmented corpus
    // (doc_id % 5 = 0 — the copy tiers are % 25 / % 50 keyed, so the
    // shard keeps the FULL dup structure: exact copies (+20000) repeat
    // whole documents, stripped copies (+10000) share whole tails).
    // Output: longest corpus-repeated span (length + least start) AND
    // >= 16-token repeated-substring coverage per doc — the exact-
    // length refinement of the q57/q81 rolling-hash screens. The shard
    // bounds the declared query's bench cost; the operator itself is
    // full-corpus (scale probes run it unsharded — BENCH_LOCAL_r09.md).
    "q96_suffix_lrs" -> ((s, d) =>
      SuffixArray.substringDedupStats(
        DedupQueries.augDocs(s, d)
          .where(org.apache.spark.sql.functions.pmod(
            org.apache.spark.sql.functions.col("doc_id"),
            org.apache.spark.sql.functions.lit(5)) === 0),
        minLen = 16, levels = Levels).orderBy("doc_id")),

    // Q96b: EXACT-substring eval contamination (Lee et al. 2022 §4.2) —
    // the third member of the decontamination triad beside the n-gram
    // probe (q53, same eval split: doc_id % 97 = 0) and the semantic
    // probe (q91). Train = the 20% shard of the remaining docs PLUS
    // deliberately leaked eval copies (+30000, first token stripped —
    // the contamination the probe must catch). Per train doc:
    // max_shared = longest token span also occurring anywhere in the
    // eval corpus; >= 16-token coverage accounting.
    "q96b_substring_contamination" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      val docs = Tables.documents(s, d).select("doc_id", "text")
      val evalSet = docs.where(pmod(col("doc_id"), lit(97)) === 0)
      val train = docs
        .where(pmod(col("doc_id"), lit(97)) =!= 0 &&
          pmod(col("doc_id"), lit(5)) === 0)
        .unionByName(evalSet.select(
          (col("doc_id") + 30000).as("doc_id"),
          regexp_replace(col("text"), "^\\S+\\s+", "").as("text")))
      SuffixArray.evalOverlapStats(train, evalSet, minLen = 16,
        levels = Levels).orderBy("doc_id")
    }),

    // Q101: EXACT duplicated-span REMOVAL — the acting half of q96's
    // measurement (Lee et al. 2022 keep one occurrence of every
    // duplicated span): every 16-token window at EVERY alignment that
    // occurs >= 2 times across the shard keeps its canonical (least
    // (doc_id, pos)) occurrence and loses the rest, with the canonical
    // veto preserving the kept copy contiguously; text rebuilt in token
    // space. The sliding-window exact refinement of q71's aligned-tile
    // approximation, on the same shard as q96.
    "q101_substring_removal" -> ((s, d) =>
      SuffixArray.substringDeduped(
        DedupQueries.augDocs(s, d)
          .where(org.apache.spark.sql.functions.pmod(
            org.apache.spark.sql.functions.col("doc_id"),
            org.apache.spark.sql.functions.lit(5)) === 0),
        window = MinLen).orderBy("doc_id")),

    // Q109: SURGICAL eval decontamination — the acting half of q96b on
    // the SAME corpus (train shard + deliberately leaked stripped eval
    // copies): every 16-token train span also occurring anywhere in the
    // eval suite is excised, text rebuilt in token space. The leaked
    // +30000 docs lose their shared tails; clean docs keep (almost) all
    // their text instead of being dropped whole (the q53 rule's cost).
    "q109_eval_decontaminated" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      val docs = Tables.documents(s, d).select("doc_id", "text")
      val evalSet = docs.where(pmod(col("doc_id"), lit(97)) === 0)
      val train = docs
        .where(pmod(col("doc_id"), lit(97)) =!= 0 &&
          pmod(col("doc_id"), lit(5)) === 0)
        .unionByName(evalSet.select(
          (col("doc_id") + 30000).as("doc_id"),
          regexp_replace(col("text"), "^\\S+\\s+", "").as("text")))
      SuffixArray.evalDecontaminatedText(train, evalSet,
        window = MinLen).orderBy("doc_id")
    }),

    // Q111: INCREMENTAL substring-dedup maintenance — the engine runs
    // the maintained-index APPEND path (content-keyed window index over
    // the q101 base shard, then graft.operators.SubstringIndex
    // .appendDeduped for a batch of strictly-higher-id docs: a fresh
    // slice (+100000, doc_id % 5 = 1) plus tail-stripped copies of base
    // docs (+110000, % 5 = 0 and % 7 = 2 — these duplicate previously
    // UNIQUE base windows, exercising the touched-base recompute and the
    // canonical-veto re-activation). The oracle dedups the UNION from
    // scratch with the q101 rank formulation, so hash equality IS the
    // append-then-dedup ≡ from-scratch theorem.
    "q111_incremental_substring_dedup" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      val base = DedupQueries.augDocs(s, d)
        .where(pmod(col("doc_id"), lit(5)) === 0)
      val docs = Tables.documents(s, d).select("doc_id", "text")
      val batch = docs.where(pmod(col("doc_id"), lit(5)) === 1)
        .select((col("doc_id") + 100000).as("doc_id"), col("text"))
        .unionByName(docs
          .where(pmod(col("doc_id"), lit(5)) === 0 &&
            pmod(col("doc_id"), lit(7)) === 2)
          .select((col("doc_id") + 110000).as("doc_id"),
            regexp_replace(col("text"), "^\\S+\\s+", "").as("text")))
      // the index and the previous dedup result are PERSISTED artifacts
      // in the deployment (written beside the store by the prior round);
      // pin them here so the declared query pays for each once, like the
      // parquet read would — not once per downstream consumer
      val prior = graft.operators.Ckpt.eager(
        SuffixArray.substringDeduped(base, window = MinLen))
      val index = graft.operators.Ckpt.eager(
        SubstringIndex.buildIndex(base, MinLen))
      SubstringIndex.appendDeduped(
        baseDocs = base, baseDeduped = prior, index = index,
        newDocs = batch, window = MinLen).orderBy("doc_id")
    }),

    // Q115: dedup served straight FROM the maintained index — what a
    // deployment holding the persisted/streamed index artifact runs at
    // dedup time (graft.streaming.StreamingIngest.readSubstringIndex
    // merges per-batch partials into exactly this index): window keys
    // re-derive map-only and equi-join the index for canonical flags;
    // no per-key aggregation pass. Same corpus as q101 and the SAME
    // rank-formulation oracle — hash equality proves the content-keyed
    // index path ≡ the suffix-rank path, again (q111 proved it for
    // append; this is the read path).
    "q115_substring_dedup_indexed" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      val corpus = DedupQueries.augDocs(s, d)
        .where(pmod(col("doc_id"), lit(5)) === 0)
      val index = graft.operators.Ckpt.eager(
        SubstringIndex.buildIndex(corpus, MinLen))
      SubstringIndex.dedupeWithIndex(corpus, index, MinLen)
        .orderBy("doc_id")
    })
  )

  /** Shared SQL fragments for the doubling + walk replays. Every
    * multiply-consumed CTE is MATERIALIZED (DuckDB inlines per
    * consumer; the walk reads the final rank table 2x per level). */
  private def rl(k: Int) = (0 to k).map(i => s"r$i").mkString(", ")

  /** Tokenize `src` (a CTE of doc_id, text) and rank level 0. */
  private def tokenChain(src: String): String =
    s"""tk AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+')
       |    AS toks
       |  FROM $src WHERE trim(text) <> ''),
       |tku AS (SELECT doc_id, toks,
       |    unnest(range(0, len(toks))) AS p
       |  FROM tk),
       |tok AS (SELECT doc_id, CAST(p AS BIGINT) AS pos,
       |    CAST(len(toks) - p AS BIGINT) AS len_rem,
       |    toks[CAST(p AS INTEGER) + 1] AS term
       |  FROM tku),
       |lv0 AS (SELECT doc_id, pos, len_rem,
       |    CAST(dense_rank() OVER (ORDER BY term) AS BIGINT) AS r0
       |  FROM tok)""".stripMargin

  /** pr1..prN rank-pyramid walk steps over pr0 (g, da, pa, la, db, pb,
    * lb, acc). */
  private def walkSteps(levels: Int): String =
    (1 to levels).map { i =>
      val k = levels - i
      val d = 1L << k
      s"""pr$i AS (SELECT pr.g, pr.da, pr.pa, pr.la, pr.db, pr.pb, pr.lb,
         |    pr.acc + CASE WHEN ra.r$k IS NOT NULL AND rb.r$k IS NOT NULL
         |      AND ra.r$k = rb.r$k THEN $d ELSE 0 END AS acc
         |  FROM pr${i - 1} pr
         |  LEFT JOIN lv$levels ra
         |    ON ra.doc_id = pr.da AND ra.pos = pr.pa + pr.acc
         |  LEFT JOIN lv$levels rb
         |    ON rb.doc_id = pr.db AND rb.pos = pr.pb + pr.acc)"""
        .stripMargin
    }.mkString(",\n")

  /** Representative (least doc_id, pos) per final rank group. */
  private def repsCte(levels: Int): String =
    s"""reps AS MATERIALIZED (SELECT g, doc_id, pos, len_rem FROM (
       |    SELECT r$levels AS g, doc_id, pos, len_rem,
       |      row_number() OVER (PARTITION BY r$levels
       |        ORDER BY doc_id, pos) AS rn
       |    FROM lv$levels) WHERE rn = 1)""".stripMargin

  private def doubling(levels: Int): String = {
    (1 to levels).map { k =>
      val d = 1 << (k - 1)
      val mat = if (k == levels) "MATERIALIZED " else ""
      s"""p$k AS (SELECT doc_id, pos, len_rem, ${rl(k - 1)},
         |    coalesce(lead(r${k - 1}, $d)
         |      OVER (PARTITION BY doc_id ORDER BY pos), 0) AS nx
         |  FROM lv${k - 1}),
         |lv$k AS $mat(SELECT doc_id, pos, len_rem, ${rl(k - 1)},
         |    CAST(dense_rank() OVER (ORDER BY r${k - 1}, nx) AS BIGINT)
         |      AS r$k
         |  FROM p$k)""".stripMargin
    }.mkString(",\n")
  }

  /** q96: the full per-doc LRS + coverage replay. */
  private def lrsSql(levels: Int): String = {
    val aug = DedupQueries.augDocsSql
    s"""WITH $aug,
       |sub AS MATERIALIZED (SELECT doc_id, text FROM aug
       |  WHERE doc_id % 5 = 0),
       |${tokenChain("sub")},
       |${doubling(levels)},
       |${repsCte(levels)},
       |pr0 AS (SELECT a.g, a.doc_id AS da, a.pos AS pa, a.len_rem AS la,
       |    b.doc_id AS db, b.pos AS pb, b.len_rem AS lb,
       |    CAST(0 AS BIGINT) AS acc
       |  FROM reps a JOIN reps b ON b.g = a.g + 1),
       |${walkSteps(levels)},
       |lcpn AS MATERIALIZED (SELECT g, least(acc, la, lb) AS lcp
       |  FROM pr$levels),
       |cnt AS (SELECT r$levels AS g, count(*) AS n FROM lv$levels
       |  GROUP BY r$levels),
       |sl AS MATERIALIZED (SELECT t.doc_id, t.pos,
       |    greatest(CASE WHEN c.n > 1 THEN t.len_rem ELSE 0 END,
       |      coalesce(nx.lcp, 0), coalesce(pv.lcp, 0)) AS lcp
       |  FROM lv$levels t
       |  JOIN cnt c ON c.g = t.r$levels
       |  LEFT JOIN lcpn nx ON nx.g = t.r$levels
       |  LEFT JOIN lcpn pv ON pv.g = t.r$levels - 1),
       |cov AS (SELECT doc_id, pos, lcp,
       |  max(CASE WHEN lcp >= $MinLen THEN pos + lcp ELSE -1 END)
       |    OVER (PARTITION BY doc_id ORDER BY pos
       |      ROWS UNBOUNDED PRECEDING) AS rend
       |  FROM sl),
       |dm AS MATERIALIZED (SELECT doc_id, max(lcp) AS lrs_len,
       |  count(*) AS n_tokens,
       |  sum(CASE WHEN rend > pos THEN 1 ELSE 0 END) AS n_covered
       |  FROM cov GROUP BY doc_id),
       |ps AS (SELECT sl.doc_id, min(sl.pos) AS lrs_pos FROM sl
       |  JOIN dm ON dm.doc_id = sl.doc_id AND sl.lcp = dm.lrs_len
       |  GROUP BY sl.doc_id)
       |SELECT a.doc_id, CAST(coalesce(dm.lrs_len, 0) AS BIGINT) AS lrs_len,
       |  CAST(coalesce(ps.lrs_pos, 0) AS BIGINT) AS lrs_pos,
       |  CAST(coalesce(dm.n_tokens, 0) AS BIGINT) AS n_tokens,
       |  CAST(coalesce(dm.n_covered, 0) AS BIGINT) AS n_covered,
       |  CASE WHEN coalesce(dm.n_tokens, 0) > 0 THEN
       |    floor(CAST(dm.n_covered AS DOUBLE) / CAST(dm.n_tokens AS DOUBLE)
       |      * 10000.0 + 0.5) / 10000.0
       |  ELSE 0.0 END AS covered_frac
       |FROM sub a
       |LEFT JOIN dm ON dm.doc_id = a.doc_id
       |LEFT JOIN ps ON ps.doc_id = a.doc_id
       |ORDER BY a.doc_id""".stripMargin
  }

  /** q96b: the tagged-union contamination replay — same doubling, group
    * eval flags, nearest-eval groups via plain windows (the oracle may
    * use global windows; the engine uses segmented carries), the same
    * walk, coverage, rollup. */
  private def contamSql(levels: Int): String =
    s"""WITH corpus AS MATERIALIZED (
       |  SELECT doc_id, text FROM documents
       |    WHERE doc_id % 97 <> 0 AND doc_id % 5 = 0
       |  UNION ALL
       |  SELECT doc_id + 30000, regexp_replace(text, '^\\S+\\s+', '')
       |    FROM documents WHERE doc_id % 97 = 0
       |  UNION ALL
       |  SELECT -doc_id - 1, text FROM documents WHERE doc_id % 97 = 0),
       |${tokenChain("corpus")},
       |${doubling(levels)},
       |grp AS (SELECT r$levels AS g,
       |    max(CASE WHEN doc_id < 0 THEN 1 ELSE 0 END) AS has_eval
       |  FROM lv$levels GROUP BY r$levels),
       |gc AS MATERIALIZED (SELECT g, has_eval,
       |    max(CASE WHEN has_eval = 1 THEN g END)
       |      OVER (ORDER BY g ROWS UNBOUNDED PRECEDING) AS last_eval,
       |    min(CASE WHEN has_eval = 1 THEN g END)
       |      OVER (ORDER BY g ROWS BETWEEN CURRENT ROW AND
       |        UNBOUNDED FOLLOWING) AS next_eval
       |  FROM grp),
       |${repsCte(levels)},
       |cand AS (SELECT g, last_eval AS pg FROM gc
       |    WHERE has_eval = 0 AND last_eval IS NOT NULL
       |  UNION ALL
       |  SELECT g, next_eval FROM gc
       |    WHERE has_eval = 0 AND next_eval IS NOT NULL),
       |pr0 AS (SELECT c.g, a.doc_id AS da, a.pos AS pa, a.len_rem AS la,
       |    b.doc_id AS db, b.pos AS pb, b.len_rem AS lb,
       |    CAST(0 AS BIGINT) AS acc
       |  FROM cand c
       |  JOIN reps a ON a.g = c.g
       |  JOIN reps b ON b.g = c.pg),
       |${walkSteps(levels)},
       |shg AS MATERIALIZED (SELECT g, max(least(acc, la, lb)) AS sh
       |  FROM pr$levels GROUP BY g),
       |sfx AS (SELECT t.doc_id, t.pos,
       |    CASE WHEN gg.has_eval = 1 THEN t.len_rem
       |      ELSE coalesce(shg.sh, 0) END AS shared
       |  FROM lv$levels t
       |  JOIN gc gg ON gg.g = t.r$levels
       |  LEFT JOIN shg ON shg.g = t.r$levels
       |  WHERE t.doc_id >= 0),
       |cov AS (SELECT doc_id, pos, shared,
       |  max(CASE WHEN shared >= $MinLen THEN pos + shared ELSE -1 END)
       |    OVER (PARTITION BY doc_id ORDER BY pos
       |      ROWS UNBOUNDED PRECEDING) AS rend
       |  FROM sfx),
       |agg AS (SELECT doc_id, count(*) AS n_tokens,
       |  max(shared) AS max_shared,
       |  sum(CASE WHEN rend > pos THEN 1 ELSE 0 END) AS n_covered
       |  FROM cov GROUP BY doc_id)
       |SELECT c.doc_id,
       |  CAST(coalesce(agg.n_tokens, 0) AS BIGINT) AS n_tokens,
       |  CAST(coalesce(agg.max_shared, 0) AS BIGINT) AS max_shared,
       |  CAST(coalesce(agg.n_covered, 0) AS BIGINT) AS n_covered,
       |  CASE WHEN coalesce(agg.n_tokens, 0) > 0 THEN
       |    floor(CAST(agg.n_covered AS DOUBLE) / CAST(agg.n_tokens AS DOUBLE)
       |      * 10000.0 + 0.5) / 10000.0
       |  ELSE 0.0 END AS covered_frac
       |FROM (SELECT doc_id FROM corpus WHERE doc_id >= 0) c
       |LEFT JOIN agg ON agg.doc_id = c.doc_id
       |ORDER BY c.doc_id""".stripMargin

  /** q101: the removal replay — doubling only to floor(log2 W) (window
    * equality needs two overlapping 2^k-block ranks, never whole-suffix
    * separation), dup-window groups + canonical via one partitioned
    * row_number, the two coverage carries as per-doc running maxima,
    * rebuild via ordered string_agg. W = 16 is a power of two so the
    * composite-key shift is 0 and the key is r4 alone (the generic
    * shift path is brute-force-gated in SuffixArraySpec). */
  private def removalSql(window: Int): String = {
    val kLev = 63 - java.lang.Long.numberOfLeadingZeros(window.toLong)
    val aug = DedupQueries.augDocsSql
    s"""WITH $aug,
       |sub AS MATERIALIZED (SELECT doc_id, text FROM aug
       |  WHERE doc_id % 5 = 0),
       |${tokenChain("sub")},
       |${doubling(kLev)},
       |${removalTail(window)}""".stripMargin
  }

  /** The shared removal-replay tail (window keys → duplicate groups +
    * canonical → the two coverage carries → rebuild), over a corpus CTE
    * named `sub` that the caller supplies — q101 runs it on the base
    * shard, q111 on base ∪ appended batch (from-scratch over the union
    * IS the theorem the incremental engine path must hash-match). */
  private def removalTail(window: Int): String = {
    val kLev = 63 - java.lang.Long.numberOfLeadingZeros(window.toLong)
    s"""ky AS (SELECT doc_id, pos, len_rem, r$kLev AS k1,
       |    lead(r$kLev, ${window - (1 << kLev)})
       |      OVER (PARTITION BY doc_id ORDER BY pos) AS k2
       |  FROM lv$kLev),
       |win AS (SELECT doc_id, pos, k1, k2 FROM ky
       |  WHERE len_rem >= $window),
       |mk AS (SELECT doc_id, pos,
       |    row_number() OVER (PARTITION BY k1, k2 ORDER BY doc_id, pos)
       |      AS rn,
       |    count(*) OVER (PARTITION BY k1, k2) AS occ
       |  FROM win),
       |fl AS MATERIALIZED (SELECT doc_id, pos, rn = 1 AS canon
       |  FROM mk WHERE occ >= 2),
       |cov AS (SELECT t.doc_id, t.pos, t.term,
       |    max(CASE WHEN fl.canon = false THEN t.pos + $window
       |      ELSE -1 END) OVER (PARTITION BY t.doc_id ORDER BY t.pos
       |        ROWS UNBOUNDED PRECEDING) AS rr,
       |    max(CASE WHEN fl.canon = true THEN t.pos + $window
       |      ELSE -1 END) OVER (PARTITION BY t.doc_id ORDER BY t.pos
       |        ROWS UNBOUNDED PRECEDING) AS rc
       |  FROM tok t LEFT JOIN fl
       |    ON fl.doc_id = t.doc_id AND fl.pos = t.pos),
       |kp AS (SELECT doc_id, pos, term FROM cov
       |  WHERE NOT (rr > pos AND NOT rc > pos)),
       |reb AS (SELECT doc_id, string_agg(term, ' ' ORDER BY pos) AS text,
       |    count(*) AS n_after
       |  FROM kp GROUP BY doc_id),
       |nb AS (SELECT doc_id, count(*) AS n_before FROM tok
       |  GROUP BY doc_id)
       |SELECT s.doc_id, coalesce(reb.text, '') AS text,
       |  CAST(coalesce(nb.n_before, 0) AS BIGINT) AS n_tokens_before,
       |  CAST(coalesce(reb.n_after, 0) AS BIGINT) AS n_tokens_after
       |FROM sub s
       |LEFT JOIN nb ON nb.doc_id = s.doc_id
       |LEFT JOIN reb ON reb.doc_id = s.doc_id
       |ORDER BY s.doc_id""".stripMargin
  }

  /** q111: the INCREMENTAL append theorem replayed from scratch — the
    * oracle dedups the UNION (base shard + appended batch) with the rank
    * formulation; the engine runs the maintained-index append path
    * ([[graft.operators.SubstringIndex.appendDeduped]]), so hash
    * equality proves append-then-dedup ≡ from-scratch dedup of the
    * union, canonical-veto interactions included. */
  private def incrementalSql(window: Int): String = {
    val kLev = 63 - java.lang.Long.numberOfLeadingZeros(window.toLong)
    val aug = DedupQueries.augDocsSql
    s"""WITH $aug,
       |sub AS MATERIALIZED (
       |  SELECT doc_id, text FROM aug WHERE doc_id % 5 = 0
       |  UNION ALL
       |  SELECT doc_id + 100000, text FROM documents WHERE doc_id % 5 = 1
       |  UNION ALL
       |  SELECT doc_id + 110000, regexp_replace(text, '^\\S+\\s+', '')
       |  FROM documents WHERE doc_id % 5 = 0 AND doc_id % 7 = 2),
       |${tokenChain("sub")},
       |${doubling(kLev)},
       |${removalTail(window)}""".stripMargin
  }

  /** q109: the q96b tagged-union corpus, doubling only to floor(log2 W),
    * window keys, train windows matched against the DISTINCT eval key
    * set, one removal carry (no canonical veto — eval-shared content
    * survives nowhere), rebuild via ordered string_agg. */
  private def evalRemovalSql(window: Int): String = {
    val kLev = 63 - java.lang.Long.numberOfLeadingZeros(window.toLong)
    s"""WITH corpus AS MATERIALIZED (
       |  SELECT doc_id, text FROM documents
       |    WHERE doc_id % 97 <> 0 AND doc_id % 5 = 0
       |  UNION ALL
       |  SELECT doc_id + 30000, regexp_replace(text, '^\\S+\\s+', '')
       |    FROM documents WHERE doc_id % 97 = 0
       |  UNION ALL
       |  SELECT -doc_id - 1, text FROM documents WHERE doc_id % 97 = 0),
       |${tokenChain("corpus")},
       |${doubling(kLev)},
       |ky AS (SELECT doc_id, pos, len_rem, r$kLev AS k1,
       |    lead(r$kLev, ${window - (1 << kLev)})
       |      OVER (PARTITION BY doc_id ORDER BY pos) AS k2
       |  FROM lv$kLev),
       |win AS MATERIALIZED (SELECT doc_id, pos, k1, k2 FROM ky
       |  WHERE len_rem >= $window),
       |ek AS MATERIALIZED (SELECT DISTINCT k1, k2 FROM win
       |  WHERE doc_id < 0),
       |dirty AS MATERIALIZED (SELECT w.doc_id, w.pos
       |  FROM win w JOIN ek USING (k1, k2) WHERE w.doc_id >= 0),
       |cov AS (SELECT t.doc_id, t.pos, t.term,
       |    max(CASE WHEN d.pos IS NOT NULL THEN t.pos + $window
       |      ELSE -1 END) OVER (PARTITION BY t.doc_id ORDER BY t.pos
       |        ROWS UNBOUNDED PRECEDING) AS rr
       |  FROM tok t LEFT JOIN dirty d
       |    ON d.doc_id = t.doc_id AND d.pos = t.pos
       |  WHERE t.doc_id >= 0),
       |kp AS (SELECT doc_id, pos, term FROM cov WHERE NOT rr > pos),
       |reb AS (SELECT doc_id, string_agg(term, ' ' ORDER BY pos) AS text,
       |    count(*) AS n_after
       |  FROM kp GROUP BY doc_id),
       |nb AS (SELECT doc_id, count(*) AS n_before FROM tok
       |  WHERE doc_id >= 0 GROUP BY doc_id)
       |SELECT c.doc_id, coalesce(reb.text, '') AS text,
       |  CAST(coalesce(nb.n_before, 0) AS BIGINT) AS n_tokens_before,
       |  CAST(coalesce(reb.n_after, 0) AS BIGINT) AS n_tokens_after
       |FROM (SELECT doc_id FROM corpus WHERE doc_id >= 0) c
       |LEFT JOIN nb ON nb.doc_id = c.doc_id
       |LEFT JOIN reb ON reb.doc_id = c.doc_id
       |ORDER BY c.doc_id""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "q96_suffix_lrs" -> lrsSql(Levels),
    "q96b_substring_contamination" -> contamSql(Levels),
    "q101_substring_removal" -> removalSql(MinLen),
    "q109_eval_decontaminated" -> evalRemovalSql(MinLen),
    "q111_incremental_substring_dedup" -> incrementalSql(MinLen),
    // q115 shares q101's from-scratch rank-formulation oracle: the
    // indexed read path must produce the identical deduped corpus
    "q115_substring_dedup_indexed" -> removalSql(MinLen)
  )
}
