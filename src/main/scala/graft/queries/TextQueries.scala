package graft.queries

import graft.operators.{Packing, TextAnalysis}
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Text-analysis + dedup oracle queries over `documents` (SURVEY §2.10 Q18
  * + builder north-star extensions). */
object TextQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Q18: exact-dup groups by content hash + per-language length stats.
    "q18_dedup_exact" -> ((s, d) => par(Tables.documents(s, d))
      .groupBy(md5(col("text").cast("binary")).as("text_hash"))
      .agg(count(lit(1)).as("dup_cnt"), min("doc_id").as("first_doc"))
      .where(col("dup_cnt") > 1)
      .orderBy("text_hash")),

    "q18b_lang_stats" -> ((s, d) => par(Tables.documents(s, d))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        r4(avg(col("n_chars"))).as("avg_chars"),
        min("n_chars").as("min_chars"), max("n_chars").as("max_chars"))
      .orderBy("lang")),

    // Q19: token counting + character-class stats.
    "q19_text_stats" -> ((s, d) =>
      TextAnalysis.textStats(par(Tables.documents(s, d)))
        .withColumn("alpha_ratio", r4(col("alpha_ratio")))
        .orderBy("doc_id")),

    // Q20: quality scoring (length/alpha/stopword-ratio heuristic).
    "q20_quality" -> ((s, d) =>
      TextAnalysis.qualityScore(par(Tables.documents(s, d))).orderBy("doc_id")),

    // Q21: marker-heuristic language ID.
    "q21_langid" -> ((s, d) =>
      TextAnalysis.langId(par(Tables.documents(s, d)))
        .select("doc_id", "en_cnt", "de_cnt", "fr_cnt", "es_cnt", "pred_lang")
        .orderBy("doc_id")),

    // Q21b: character-TRIGRAM-profile language ID — the q21 marker
    // heuristic upgraded to shipped n-gram profiles (frequency-counted
    // occurrences over near-disjoint per-language trigram lists, map-only,
    // same zh rule / tie order). TextAnalysisSpec gates accuracy ≥ the
    // marker heuristic on a real mixed-language fixture; this query pins
    // the scoring bit-for-bit on the corpus table.
    "q21b_langid_ngram" -> ((s, d) =>
      TextAnalysis.langIdNgram(par(Tables.documents(s, d)))
        .orderBy("doc_id")),

    // Q22: rolling-hash document fingerprint (order-sensitive, md5-derived
    // so the oracle can reproduce it bit-for-bit).
    "q22_fingerprint" -> ((s, d) => par(Tables.documents(s, d))
      .select(col("doc_id"),
        TextAnalysis.fingerprint(col("text")).as("fingerprint"))
      .orderBy("doc_id")),

    // Q46: token-budget shard packing (bucketed running sum — the
    // two-stage shape that avoids the global single-task window).
    "q46_token_shards" -> ((s, d) =>
      TextAnalysis.packShards(par(Tables.documents(s, d)), tokenBudget = 512)
        .orderBy("doc_id")),

    // Q102: concat-and-chunk training-sequence manifest at 64 tokens —
    // which within-doc token span lands at which position of which
    // fixed-length sequence (documents cross boundaries; the oracle
    // replays the running sum + boundary arithmetic exactly).
    "q102_pack_sequences" -> ((s, d) =>
      Packing.packSequences(par(Tables.documents(s, d)), seqLen = 64)
        .orderBy("doc_id", "seq_id")),

    // Q102b: the q102 manifest in REAL tokenizer units — packSequences
    // budgeted by the merge-rank BPE counter (q73's compiled kernel)
    // instead of the regex approximation: the combination a lab actually
    // runs (sequence boundaries in the units the model trains on). The
    // oracle composes the q73 merge recursion with the q102 chunk
    // arithmetic, so hash equality checks tokenizer + packing together.
    "q102b_pack_sequences_bpe" -> ((s, d) =>
      Packing.packSequences(par(Tables.documents(s, d)), seqLen = 64,
          counter = c => TextAnalysis.bpeMergeTokenCount(c))
        .orderBy("doc_id", "seq_id")),

    // Q103: boundary-respecting next-fit packing (256-token sequences,
    // 8 shards): docs land whole, over-long docs truncate into a
    // singleton sequence. The oracle replays the per-shard sequential
    // next-fit with a recursive CTE — capacity resets and all.
    "q103_pack_greedy" -> ((s, d) =>
      Packing.packGreedy(par(Tables.documents(s, d)), seqLen = 256,
          shards = 8)
        .orderBy("doc_id")),

    // Q47: overlapping context-window chunking (map-only sequence+slice;
    // one row per ~32-token window, step 24).
    "q47_token_chunks" -> ((s, d) =>
      TextAnalysis.chunkTokens(par(Tables.documents(s, d)),
          chunkSize = 32, overlap = 8)
        .orderBy("doc_id", "chunk_id")),

    // Q48: deterministic stratified sampling — downsample 'en' to 30%,
    // 'de' to 50%, keep everything else; md5-keyed so the oracle keeps
    // the identical rows.
    "q48_stratified_sample" -> ((s, d) =>
      TextAnalysis.stratifiedSample(par(Tables.documents(s, d)),
          "doc_id", "lang", Map("en" -> 0.3, "de" -> 0.5))
        .select("doc_id", "lang")
        .orderBy("doc_id")),

    // Q52: Gopher-style repetition quality filters — chars in the most
    // frequent 2-gram / chars in duplicated 3-grams, per doc.
    "q52_repetition" -> ((s, d) =>
      TextAnalysis.repetitionStats(par(Tables.documents(s, d)))
        .orderBy("doc_id")),

    // Q53: train/test decontamination by 4-gram overlap; the held-out
    // set is the deterministic doc_id % 97 == 0 slice.
    "q53_decontaminate" -> ((s, d) => {
      val docs = par(Tables.documents(s, d))
      val test = docs.where(pmod(col("doc_id"), lit(97)) === 0)
      val train = docs.where(pmod(col("doc_id"), lit(97)) =!= 0)
      TextAnalysis.decontaminate(train, test, n = 4).orderBy("doc_id")
    }),

    // Q89: BPE merge TRAINING — learn 8 merges from the corpus
    // (Sennrich et al. 2016: most frequent adjacent pair, deterministic
    // lexicographic tiebreak, greedy left-to-right application). The
    // oracle unrolls all 8 rounds, applying each learned merge with the
    // q73-style one-occurrence-at-a-time recursion.
    "q89_bpe_train" -> ((s, d) =>
      TextAnalysis.bpeTrainMerges(par(Tables.documents(s, d)),
          nMerges = 8)
        .orderBy("step")),

    // Q85: Duffield–Lund–Thorup priority sampling — deterministic
    // weighted top-k by exact integer priorities (weight = n_chars).
    "q85_priority_sample" -> ((s, d) =>
      TextAnalysis.prioritySample(par(Tables.documents(s, d)), k = 100,
          weightCol = "n_chars")
        .orderBy(desc("priority"), col("doc_id"))),

    // Q84: graded contamination — q53's gram overlap as a per-doc RATIO
    // over EVERY train doc, with the integer-exact >=10% dirty flag
    // (one leaked gram no longer condemns a long document).
    "q84_contamination_ratio" -> ((s, d) => {
      val docs = par(Tables.documents(s, d))
      val test = docs.where(pmod(col("doc_id"), lit(97)) === 0)
      val train = docs.where(pmod(col("doc_id"), lit(97)) =!= 0)
      TextAnalysis.contaminationRatio(train, test, n = 4,
        pctThreshold = 10).orderBy("doc_id")
    }),

    // Q54: greedy per-language corpus selection under a 4000-subtoken
    // budget (quality-ranked prefix; engine uses the two-stage
    // threshold-bucket shape, oracle the one-window form).
    "q54_budget_select" -> ((s, d) =>
      TextAnalysis.selectByTokenBudget(par(Tables.documents(s, d)),
          budget = 4000)
        .orderBy("doc_id")),

    // Q68: REAL-tokenizer accounting — vocab-driven greedy maxmatch BPE
    // counts (compiled map-only kernel) next to the regex approximation;
    // the oracle replays the greedy encode with a recursive CTE over
    // DISTINCT pretokens.
    "q68_bpe_count" -> ((s, d) =>
      par(Tables.documents(s, d))
        .select(col("doc_id"),
          TextAnalysis.bpeTokenCount(col("text")).as("n_bpe"),
          TextAnalysis.subtokenCount(col("text")).as("n_subtokens"))
        .orderBy("doc_id")),

    // Q73: MERGE-RANK BPE accounting — the real tokenizer-application
    // algorithm (lowest-rank merge first) over the shipped merge list,
    // beside the greedy q68 count it corrects; the oracle replays the
    // merge loop with a ONE-MERGE-PER-STEP recursive CTE over DISTINCT
    // pretokens (the one-at-a-time form is provably equivalent for a
    // creation-ordered merge list, and is what SQL can express).
    "q73_bpe_merges" -> ((s, d) =>
      par(Tables.documents(s, d))
        .select(col("doc_id"),
          TextAnalysis.bpeMergeTokenCount(col("text")).as("n_bpe_merge"),
          TextAnalysis.bpeTokenCount(col("text")).as("n_bpe_greedy"))
        .orderBy("doc_id")),

    // Q116: the BPE ENCODING itself — the token sequences q73 only
    // counts (the artifact packing/training consumes). The oracle runs
    // the SAME one-merge-per-step recursion and extracts each
    // pretoken's TERMINAL state (arg_min by length — lengths strictly
    // decrease, so the minimum is the fixpoint), re-assembled in word
    // order; hash equality checks every symbol boundary, not a count.
    "q116_bpe_encode" -> ((s, d) =>
      par(Tables.documents(s, d))
        .select(col("doc_id"),
          TextAnalysis.bpeMergeTokens(col("text")).as("bpe_tokens"),
          TextAnalysis.bpeMergeTokenCount(col("text")).as("n_bpe"))
        .orderBy("doc_id")),

    // Q55: PII scrubbing over a corpus with deterministically injected
    // emails/phones/IPs (the raw corpus is PII-free by construction, so
    // the redaction pass must be exercised on augmented text).
    "q55_pii_scrub" -> ((s, d) => {
      val idS = col("doc_id").cast("string")
      val inj = concat(
        when(pmod(col("doc_id"), lit(7)) === 0,
          concat(lit(" contact user"), idS, lit("@example.com")))
          .otherwise(lit("")),
        when(pmod(col("doc_id"), lit(11)) === 0, lit(" call 555-867-5309"))
          .otherwise(lit("")),
        when(pmod(col("doc_id"), lit(13)) === 0,
          concat(lit(" host 10.0."),
            pmod(col("doc_id"), lit(256)).cast("string"), lit(".7")))
          .otherwise(lit("")))
      val aug = par(Tables.documents(s, d))
        .select(col("doc_id"), concat(col("text"), inj).as("text"))
      TextAnalysis.scrubPii(aug)
        .select(col("doc_id"), col("n_emails"), col("n_phones"),
          col("n_ips"), md5(col("text").cast("binary")).as("scrub_hash"))
        .orderBy("doc_id")
    })
  )

  private val toks = "regexp_split_to_array(trim(text), '\\s+')"

  /** The q89 trainer oracle, unrolled to `n` rounds (the Lloyd-unroll
    * discipline). Each round's recursive apply joins the round's argmax
    * CTE into its iteration — DuckDB permits non-recursive CTE refs
    * inside a recursive member. */
  private def bpeTrainSql(n: Int): String = {
    def filt(m: String) =
      s"list_filter(range(1, len(a.toks)), i -> a.toks[i] = $m.l " +
        s"AND a.toks[i+1] = $m.r)"
    val sb = new StringBuilder
    sb ++= s"""WITH RECURSIVE wd AS (SELECT unnest($toks) AS w
      |  FROM documents),
      |st0 AS MATERIALIZED (SELECT w, count(*) AS c,
      |    list_transform(range(1, len(w) + 1), i -> w[i]) AS toks
      |  FROM wd GROUP BY w),
      |""".stripMargin
    for (k <- 1 to n) {
      val p = s"st${k - 1}"
      sb ++= s"""pc$k AS (SELECT toks[i] AS l, toks[i+1] AS r,
        |    CAST(sum(c) AS BIGINT) AS cnt
        |  FROM $p, UNNEST(range(1, len(toks))) AS u(i)
        |  GROUP BY toks[i], toks[i+1]),
        |m$k AS MATERIALIZED (SELECT l, r, cnt FROM pc$k
        |  ORDER BY cnt DESC, l, r LIMIT 1),
        |a$k(w, c, toks) AS (
        |  SELECT w, c, toks FROM $p
        |  UNION ALL
        |  SELECT a.w, a.c,
        |    a.toks[1:${filt("m")}[1] - 1]
        |      || [a.toks[${filt("m")}[1]] || a.toks[${filt("m")}[1] + 1]]
        |      || a.toks[${filt("m")}[1] + 2:len(a.toks)]
        |  FROM a$k a, m$k m
        |  WHERE len(${filt("m")}) > 0),
        |st$k AS MATERIALIZED (SELECT a.w, a.c, a.toks FROM a$k a, m$k m
        |  WHERE len(${filt("m")}) = 0),
        |""".stripMargin
    }
    // drop the trailing comma-newline of the last CTE
    sb.setLength(sb.length - 2)
    sb ++= "\n"
    sb ++= (1 to n).map(k =>
        s"SELECT $k AS step, l AS lhs, r AS rhs, cnt AS pair_count FROM m$k")
      .mkString("", "\nUNION ALL\n", "\nORDER BY step")
    sb.toString
  }

  val oracle: Map[String, String] = Map(
    "q18_dedup_exact" ->
      """SELECT md5(text) AS text_hash, count(*) AS dup_cnt,
        |  min(doc_id) AS first_doc
        |FROM documents GROUP BY md5(text) HAVING count(*) > 1
        |ORDER BY text_hash""".stripMargin,

    "q18b_lang_stats" ->
      s"""SELECT lang, count(*) AS n_docs, ${r4sql("avg(n_chars)")} AS avg_chars,
        |  min(n_chars) AS min_chars, max(n_chars) AS max_chars
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    "q19_text_stats" ->
      s"""SELECT doc_id, CAST(len($toks) AS BIGINT) AS n_tokens,
        |  CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]')) AS BIGINT) AS n_subtokens,
        |  CAST(length(text) AS BIGINT) AS text_len,
        |  ${r4sql("CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS DOUBLE) / CAST(length(text) AS DOUBLE)")} AS alpha_ratio
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q20_quality" ->
      s"""SELECT doc_id, ${r4sql(s"""0.3 * least(1.0, CAST(length(text) AS DOUBLE) / 500.0) + 0.4 * (CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS DOUBLE) / CAST(length(text) AS DOUBLE)) + 0.3 * (CAST(len(list_filter($toks, t -> t IN ('the','a','and','of','to','in'))) AS DOUBLE) / CAST(len($toks) AS DOUBLE))""")} AS quality
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q21_langid" ->
      s"""WITH c AS (
        |  SELECT doc_id,
        |    CAST(len(list_filter($toks, t -> t IN ('the','and','of','to'))) AS BIGINT) AS en_cnt,
        |    CAST(len(list_filter($toks, t -> t IN ('der','und','die','das'))) AS BIGINT) AS de_cnt,
        |    CAST(len(list_filter($toks, t -> t IN ('le','la','et','les'))) AS BIGINT) AS fr_cnt,
        |    CAST(len(list_filter($toks, t -> t IN ('el','los','que','y'))) AS BIGINT) AS es_cnt,
        |    length(regexp_replace(text, '[\\x00-\\x7f]', '', 'g')) AS non_ascii
        |  FROM documents)
        |SELECT doc_id, en_cnt, de_cnt, fr_cnt, es_cnt,
        |  CASE WHEN non_ascii > 0 THEN 'zh'
        |       WHEN en_cnt >= de_cnt AND en_cnt >= fr_cnt AND en_cnt >= es_cnt THEN 'en'
        |       WHEN de_cnt >= fr_cnt AND de_cnt >= es_cnt THEN 'de'
        |       WHEN fr_cnt >= es_cnt THEN 'fr'
        |       ELSE 'es' END AS pred_lang
        |FROM c ORDER BY doc_id""".stripMargin,

    // q21b: trigram extraction + profile counts replayed with the SAME
    // shipped lists the engine compiles (interpolated from one constant,
    // so they cannot drift)
    "q21b_langid_ngram" -> {
      def inList(lang: String): String =
        graft.operators.TextAnalysis.LangTrigrams.toMap.apply(lang)
          .map(g => s"'$g'").mkString(", ")
      s"""WITH g AS (SELECT doc_id,
        |    list_transform(range(1, length(lower(text)) - 1),
        |      i -> substr(lower(text), i, 3)) AS g3,
        |    length(regexp_replace(text, '[\\x00-\\x7f]', '', 'g'))
        |      AS non_ascii
        |  FROM documents),
        |sc AS (SELECT doc_id,
        |    CAST(len(list_filter(g3, t -> t IN (${inList("en")})))
        |      AS BIGINT) AS en_s,
        |    CAST(len(list_filter(g3, t -> t IN (${inList("de")})))
        |      AS BIGINT) AS de_s,
        |    CAST(len(list_filter(g3, t -> t IN (${inList("fr")})))
        |      AS BIGINT) AS fr_s,
        |    CAST(len(list_filter(g3, t -> t IN (${inList("es")})))
        |      AS BIGINT) AS es_s,
        |    non_ascii
        |  FROM g)
        |SELECT doc_id, en_s, de_s, fr_s, es_s,
        |  CASE WHEN non_ascii > 0 THEN 'zh'
        |       WHEN en_s >= de_s AND en_s >= fr_s AND en_s >= es_s THEN 'en'
        |       WHEN de_s >= fr_s AND de_s >= es_s THEN 'de'
        |       WHEN fr_s >= es_s THEN 'fr'
        |       ELSE 'es' END AS pred_lang
        |FROM sc ORDER BY doc_id""".stripMargin
    },

    // q68: greedy longest-match-first replay — one recursive-CTE step
    // per emitted unit, run over DISTINCT pretokens only (the encode is
    // a pure function of the word); vocab interpolated from the SAME
    // constant the engine's kernel compiles, so they cannot drift
    "q68_bpe_count" ->
      s"""WITH RECURSIVE voc(tok) AS (VALUES ${
            graft.operators.TextAnalysis.BpeVocabDefault
              .map(v => s"('$v')").mkString(", ")}),
        |wd AS (SELECT doc_id, unnest($toks) AS w FROM documents),
        |dw AS (SELECT DISTINCT w FROM wd),
        |enc AS (
        |  SELECT w, w AS rest, 0 AS cnt FROM dw
        |  UNION ALL
        |  SELECT w,
        |    substr(rest, 1 + coalesce((SELECT max(len(v.tok)) FROM voc v
        |      WHERE substr(rest, 1, len(v.tok)) = v.tok), 1)),
        |    cnt + 1
        |  FROM enc WHERE rest <> ''),
        |wc AS (SELECT w, max(cnt) AS units FROM enc
        |  WHERE rest = '' GROUP BY w),
        |b AS (SELECT wd.doc_id, CAST(sum(wc.units) AS BIGINT) AS n_bpe
        |  FROM wd JOIN wc USING (w) GROUP BY wd.doc_id),
        |sub AS (SELECT doc_id,
        |    CAST(len(regexp_extract_all(text,
        |      '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]')) AS BIGINT) AS n_subtokens
        |  FROM documents)
        |SELECT b.doc_id, b.n_bpe, s.n_subtokens
        |FROM b JOIN sub s ON s.doc_id = b.doc_id
        |ORDER BY b.doc_id""".stripMargin,

    // q73: merge-rank BPE replay — ONE MERGE PER recursive step (the
    // lowest-rank pair's leftmost occurrence; rank·2^20 + pos encodes
    // the (rank, pos) lexicographic min in one BIGINT), run over
    // DISTINCT pretokens; terminal count per word = min token-list
    // length over its states (each step shrinks the list by exactly 1).
    // Merge list and greedy vocab both interpolate from the SAME
    // constants the compiled kernels ship, so they cannot drift.
    "q73_bpe_merges" ->
      s"""WITH RECURSIVE rk AS (SELECT MAP(
        |    [${graft.operators.TextAnalysis.BpeMergesDefault
                 .map { case (a, b) => s"'$a $b'" }.mkString(", ")}],
        |    [${graft.operators.TextAnalysis.BpeMergesDefault.indices
                 .map(_.toString).mkString(", ")}]) AS m),
        |voc(tok) AS (VALUES ${
            graft.operators.TextAnalysis.BpeVocabDefault
              .map(v => s"('$v')").mkString(", ")}),
        |wd AS (SELECT doc_id, unnest($toks) AS w FROM documents),
        |dw AS (SELECT DISTINCT w FROM wd),
        |st AS (
        |  SELECT w,
        |    list_transform(range(1, len(w) + 1), i -> w[i]) AS toks
        |  FROM dw
        |  UNION ALL
        |  SELECT w,
        |    toks[1:CAST(bk % 1048576 AS BIGINT) - 1]
        |      || [toks[CAST(bk % 1048576 AS BIGINT)]
        |          || toks[CAST(bk % 1048576 AS BIGINT) + 1]]
        |      || toks[CAST(bk % 1048576 AS BIGINT) + 2:len(toks)] AS toks
        |  FROM (
        |    SELECT w, toks,
        |      list_aggregate(list_transform(range(1, len(toks)), i ->
        |        CASE WHEN len(map_extract(rk.m,
        |            toks[i] || ' ' || toks[i + 1])) > 0
        |          THEN CAST(map_extract(rk.m,
        |            toks[i] || ' ' || toks[i + 1])[1] AS BIGINT)
        |            * 1048576 + i
        |          ELSE NULL END), 'min') AS bk
        |    FROM st, rk) x
        |  WHERE bk IS NOT NULL),
        |mwc AS (SELECT w, min(len(toks)) AS units FROM st GROUP BY w),
        |mb AS (SELECT wd.doc_id,
        |    CAST(sum(mwc.units) AS BIGINT) AS n_bpe_merge
        |  FROM wd JOIN mwc USING (w) GROUP BY wd.doc_id),
        |genc AS (
        |  SELECT w, w AS rest, 0 AS cnt FROM dw
        |  UNION ALL
        |  SELECT w,
        |    substr(rest, 1 + coalesce((SELECT max(len(v.tok)) FROM voc v
        |      WHERE substr(rest, 1, len(v.tok)) = v.tok), 1)),
        |    cnt + 1
        |  FROM genc WHERE rest <> ''),
        |gwc AS (SELECT w, max(cnt) AS units FROM genc
        |  WHERE rest = '' GROUP BY w),
        |gb AS (SELECT wd.doc_id,
        |    CAST(sum(gwc.units) AS BIGINT) AS n_bpe_greedy
        |  FROM wd JOIN gwc USING (w) GROUP BY wd.doc_id)
        |SELECT mb.doc_id, mb.n_bpe_merge, gb.n_bpe_greedy
        |FROM mb JOIN gb ON gb.doc_id = mb.doc_id
        |ORDER BY mb.doc_id""".stripMargin,

    // q116: the q73 merge recursion with the terminal state EXTRACTED
    // (arg_min toks by length — lengths strictly decrease, so the
    // minimum is the fixpoint) and re-joined to word positions
    "q116_bpe_encode" ->
      s"""WITH RECURSIVE rk AS (SELECT MAP(
        |    [${graft.operators.TextAnalysis.BpeMergesDefault
                 .map { case (a, b) => s"'$a $b'" }.mkString(", ")}],
        |    [${graft.operators.TextAnalysis.BpeMergesDefault.indices
                 .map(_.toString).mkString(", ")}]) AS m),
        |wd AS (SELECT doc_id, unnest($toks) AS w,
        |    unnest(range(1, len($toks) + 1)) AS pos FROM documents),
        |dw AS (SELECT DISTINCT w FROM wd),
        |st AS (
        |  SELECT w,
        |    list_transform(range(1, len(w) + 1), i -> w[i]) AS toks
        |  FROM dw
        |  UNION ALL
        |  SELECT w,
        |    toks[1:CAST(bk % 1048576 AS BIGINT) - 1]
        |      || [toks[CAST(bk % 1048576 AS BIGINT)]
        |          || toks[CAST(bk % 1048576 AS BIGINT) + 1]]
        |      || toks[CAST(bk % 1048576 AS BIGINT) + 2:len(toks)] AS toks
        |  FROM (
        |    SELECT w, toks,
        |      list_aggregate(list_transform(range(1, len(toks)), i ->
        |        CASE WHEN len(map_extract(rk.m,
        |            toks[i] || ' ' || toks[i + 1])) > 0
        |          THEN CAST(map_extract(rk.m,
        |            toks[i] || ' ' || toks[i + 1])[1] AS BIGINT)
        |            * 1048576 + i
        |          ELSE NULL END), 'min') AS bk
        |    FROM st, rk) x
        |  WHERE bk IS NOT NULL),
        |fin AS (SELECT w, arg_min(toks, len(toks)) AS toks
        |  FROM st GROUP BY w),
        |enc AS (SELECT wd.doc_id,
        |    string_agg(array_to_string(fin.toks, ' '), ' '
        |      ORDER BY wd.pos) AS bpe_tokens,
        |    CAST(sum(len(fin.toks)) AS BIGINT) AS n_bpe
        |  FROM wd JOIN fin USING (w) GROUP BY wd.doc_id)
        |SELECT doc_id, bpe_tokens, n_bpe FROM enc
        |ORDER BY doc_id""".stripMargin,

    "q22_fingerprint" ->
      s"""WITH tk AS (SELECT doc_id, $toks AS toks FROM documents)
        |SELECT doc_id,
        |  CAST(list_sum(list_transform(range(1, len(toks) + 1), i ->
        |    (CAST(concat('0x', substr(md5(toks[i]), 1, 14)) AS BIGINT)
        |      % 1000000007) * i)) % 1000000007 AS BIGINT) AS fingerprint
        |FROM tk ORDER BY doc_id""".stripMargin,

    // the oracle computes the SAME running total with one global window
    // (oracle scale) — the engine's bucketed two-stage sum must agree
    // exactly (integer arithmetic)
    "q46_token_shards" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_extract_all(text,
        |      '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')) AS BIGINT) AS n_subtokens
        |  FROM documents),
        |c AS (SELECT doc_id, n_subtokens,
        |        sum(n_subtokens) OVER (ORDER BY doc_id) AS cum
        |      FROM t)
        |SELECT doc_id, n_subtokens, CAST(cum AS BIGINT) AS cum_subtokens,
        |  CAST((cum - n_subtokens) // 512 AS BIGINT) AS shard_id
        |FROM c ORDER BY doc_id""".stripMargin,

    "q102_pack_sequences" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_extract_all(text,
        |      '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')) AS BIGINT) AS n
        |  FROM documents),
        |c AS (SELECT doc_id, n, sum(n) OVER (ORDER BY doc_id) AS cum
        |      FROM t),
        |s AS (SELECT doc_id, n, CAST(cum AS BIGINT) AS cum,
        |        CAST(cum - n AS BIGINT) AS start FROM c WHERE n > 0),
        |e AS (SELECT doc_id, n, start,
        |        unnest(range(start // 64, (cum - 1) // 64 + 1)) AS seq_id
        |      FROM s)
        |SELECT doc_id, CAST(seq_id AS BIGINT) AS seq_id,
        |  CAST(greatest(0, seq_id * 64 - start) AS BIGINT) AS tok_from,
        |  CAST(least(n, (seq_id + 1) * 64 - start) AS BIGINT) AS tok_to,
        |  CAST(greatest(0, start - seq_id * 64) AS BIGINT) AS pos_in_seq
        |FROM e ORDER BY doc_id, seq_id""".stripMargin,

    // q102b: the q73 merge-rank recursion (DISTINCT pretokens, one merge
    // per step) supplies per-doc counts; the q102 running-sum + chunk
    // arithmetic packs them. Same constants as the compiled kernel.
    "q102b_pack_sequences_bpe" ->
      s"""WITH RECURSIVE rk AS (SELECT MAP(
        |    [${graft.operators.TextAnalysis.BpeMergesDefault
                 .map { case (a, b) => s"'$a $b'" }.mkString(", ")}],
        |    [${graft.operators.TextAnalysis.BpeMergesDefault.indices
                 .map(_.toString).mkString(", ")}]) AS m),
        |wd AS (SELECT doc_id, unnest($toks) AS w FROM documents),
        |dw AS (SELECT DISTINCT w FROM wd),
        |st AS (
        |  SELECT w,
        |    list_transform(range(1, len(w) + 1), i -> w[i]) AS toks
        |  FROM dw
        |  UNION ALL
        |  SELECT w,
        |    toks[1:CAST(bk % 1048576 AS BIGINT) - 1]
        |      || [toks[CAST(bk % 1048576 AS BIGINT)]
        |          || toks[CAST(bk % 1048576 AS BIGINT) + 1]]
        |      || toks[CAST(bk % 1048576 AS BIGINT) + 2:len(toks)] AS toks
        |  FROM (
        |    SELECT w, toks,
        |      list_aggregate(list_transform(range(1, len(toks)), i ->
        |        CASE WHEN len(map_extract(rk.m,
        |            toks[i] || ' ' || toks[i + 1])) > 0
        |          THEN CAST(map_extract(rk.m,
        |            toks[i] || ' ' || toks[i + 1])[1] AS BIGINT)
        |            * 1048576 + i
        |          ELSE NULL END), 'min') AS bk
        |    FROM st, rk) x
        |  WHERE bk IS NOT NULL),
        |mwc AS MATERIALIZED (SELECT w, min(len(toks)) AS units FROM st
        |  GROUP BY w),
        |t AS (SELECT wd.doc_id, CAST(sum(mwc.units) AS BIGINT) AS n
        |  FROM wd JOIN mwc USING (w) GROUP BY wd.doc_id),
        |c AS (SELECT doc_id, n, sum(n) OVER (ORDER BY doc_id) AS cum
        |      FROM t),
        |s AS (SELECT doc_id, n, CAST(cum AS BIGINT) AS cum,
        |        CAST(cum - n AS BIGINT) AS start FROM c WHERE n > 0),
        |e AS (SELECT doc_id, n, start,
        |        unnest(range(start // 64, (cum - 1) // 64 + 1)) AS seq_id
        |      FROM s)
        |SELECT doc_id, CAST(seq_id AS BIGINT) AS seq_id,
        |  CAST(greatest(0, seq_id * 64 - start) AS BIGINT) AS tok_from,
        |  CAST(least(n, (seq_id + 1) * 64 - start) AS BIGINT) AS tok_to,
        |  CAST(greatest(0, start - seq_id * 64) AS BIGINT) AS pos_in_seq
        |FROM e ORDER BY doc_id, seq_id""".stripMargin,

    "q103_pack_greedy" ->
      """WITH RECURSIVE t AS MATERIALIZED (
        |  SELECT doc_id, CAST(doc_id % 8 AS BIGINT) AS shard,
        |    CAST(least(n, 256) AS BIGINT) AS len_eff,
        |    n > 256 AS truncated,
        |    row_number() OVER (PARTITION BY doc_id % 8 ORDER BY doc_id)
        |      AS idx
        |  FROM (SELECT doc_id,
        |      CAST(len(regexp_extract_all(text,
        |        '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')) AS BIGINT) AS n
        |    FROM documents) WHERE n > 0),
        |st AS (
        |  SELECT shard, idx, doc_id, len_eff, truncated,
        |    CAST(1 AS BIGINT) AS seq_in_shard,
        |    CAST(0 AS BIGINT) AS offset_in_seq,
        |    len_eff AS running
        |  FROM t WHERE idx = 1
        |  UNION ALL
        |  SELECT b.shard, b.idx, b.doc_id, b.len_eff, b.truncated,
        |    CASE WHEN st.running + b.len_eff > 256
        |      THEN st.seq_in_shard + 1 ELSE st.seq_in_shard END,
        |    CASE WHEN st.running + b.len_eff > 256
        |      THEN CAST(0 AS BIGINT) ELSE st.running END,
        |    CASE WHEN st.running + b.len_eff > 256
        |      THEN b.len_eff ELSE st.running + b.len_eff END
        |  FROM st JOIN t b ON b.shard = st.shard AND b.idx = st.idx + 1)
        |SELECT doc_id, shard, seq_in_shard, offset_in_seq, len_eff,
        |  truncated
        |FROM st ORDER BY doc_id""".stripMargin,

    "q47_token_chunks" ->
      s"""WITH tk AS (SELECT doc_id, $toks AS toks FROM documents),
        |st AS (SELECT doc_id, toks,
        |         unnest(range(1, len(toks) + 1, 24)) AS start
        |       FROM tk WHERE len(toks) > 0)
        |SELECT doc_id, CAST((start - 1) // 24 AS INTEGER) AS chunk_id,
        |  md5(array_to_string(list_slice(toks, start, start + 31), ' '))
        |    AS chunk_hash,
        |  CAST(least(32, len(toks) - start + 1) AS BIGINT) AS n_chunk_tokens
        |FROM st ORDER BY doc_id, chunk_id""".stripMargin,

    "q48_stratified_sample" ->
      """SELECT doc_id, lang FROM documents
        |WHERE CAST(concat('0x', substr(md5(
        |    concat(CAST(doc_id AS VARCHAR), ':0')), 1, 14)) AS BIGINT)
        |  % 1000000
        |  < (CASE WHEN lang = 'en' THEN 300000
        |          WHEN lang = 'de' THEN 500000
        |          ELSE 1000000 END)
        |ORDER BY doc_id""".stripMargin,

    "q52_repetition" ->
      s"""WITH tk AS (SELECT doc_id, CAST(length(text) AS BIGINT) AS text_len,
        |  $toks AS toks FROM documents),
        |g AS (
        |  SELECT doc_id, 2 AS n,
        |    list_aggregate(toks[i:i+1], 'string_agg', ' ') AS gram
        |  FROM tk, UNNEST(range(1, len(toks))) AS t(i)
        |  UNION ALL
        |  SELECT doc_id, 3 AS n,
        |    list_aggregate(toks[i:i+2], 'string_agg', ' ') AS gram
        |  FROM tk, UNNEST(range(1, len(toks) - 1)) AS t(i)),
        |gc AS (SELECT doc_id, n,
        |    CAST(concat('0x', substr(md5(gram), 1, 14)) AS BIGINT) AS gk,
        |    length(gram) AS glen, count(*) AS cnt,
        |    count(*) * length(gram) AS chars
        |  FROM g GROUP BY doc_id, n, gk, glen),
        |t2 AS (SELECT doc_id, chars, row_number() OVER (
        |    PARTITION BY doc_id ORDER BY cnt DESC, chars DESC) AS rn
        |  FROM gc WHERE n = 2),
        |d3 AS (SELECT doc_id, sum(chars) AS dup3
        |  FROM gc WHERE n = 3 AND cnt > 1 GROUP BY doc_id)
        |SELECT tk.doc_id,
        |  ${r4sql("coalesce(t2.chars, 0) / CAST(text_len AS DOUBLE)")}
        |    AS top_bigram_frac,
        |  ${r4sql("coalesce(d3.dup3, 0) / CAST(text_len AS DOUBLE)")}
        |    AS dup_trigram_frac
        |FROM tk
        |LEFT JOIN (SELECT doc_id, chars FROM t2 WHERE rn = 1) t2 USING (doc_id)
        |LEFT JOIN d3 USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    // grams travel as the engine's md5-derived 56-bit keys (replayed
    // here), exactly as the operator ships them at scale
    "q53_decontaminate" ->
      s"""WITH tk AS (SELECT doc_id, $toks AS toks FROM documents),
        |g AS (SELECT doc_id,
        |    CAST(concat('0x', substr(md5(
        |      list_aggregate(toks[i:i+3], 'string_agg', ' ')), 1, 14))
        |      AS BIGINT) AS gk
        |  FROM tk, UNNEST(range(1, len(toks) - 2)) AS t(i)),
        |test AS (SELECT DISTINCT gk FROM g WHERE doc_id % 97 = 0)
        |SELECT g.doc_id, count(DISTINCT g.gk) AS n_shared_ngrams
        |FROM g JOIN test USING (gk)
        |WHERE g.doc_id % 97 <> 0
        |GROUP BY g.doc_id ORDER BY doc_id""".stripMargin,

    // q89: the trainer unrolled — per round: pair counts over the
    // current segmentations, argmax with the (cnt DESC, l, r) tiebreak,
    // then a one-occurrence-at-a-time recursive apply (≡ the greedy
    // left-to-right pass — replacing the FIRST occurrence repeatedly IS
    // that scan); terminal states carry no occurrence of the round's
    // pair. Single-char words ride through every round untouched.
    "q89_bpe_train" -> bpeTrainSql(8),

    // q85: the DLT priority draw replayed verbatim — md5-uniform u,
    // floor-divided integer priority, top-100.
    "q85_priority_sample" ->
      """WITH p AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS weight,
        |    (CAST(concat('0x', substr(md5('ps:0:' ||
        |      CAST(doc_id AS VARCHAR)), 1, 14)) AS BIGINT)
        |      % 1099511627776) + 1 AS u
        |  FROM documents WHERE n_chars > 0)
        |SELECT doc_id, weight,
        |  (weight * 1099511627776) // u AS priority
        |FROM p ORDER BY priority DESC, doc_id LIMIT 100""".stripMargin,

    // q84: the q53 gram chain, kept as a per-doc ratio over ALL train
    // docs; dirty = integer compare n_hit*100 >= 10*n_grams.
    "q84_contamination_ratio" ->
      s"""WITH tk AS (SELECT doc_id, $toks AS toks FROM documents),
        |g AS MATERIALIZED (SELECT doc_id,
        |    CAST(concat('0x', substr(md5(
        |      list_aggregate(toks[i:i+3], 'string_agg', ' ')), 1, 14))
        |      AS BIGINT) AS gk
        |  FROM tk, UNNEST(range(1, len(toks) - 2)) AS t(i)),
        |test AS MATERIALIZED (SELECT DISTINCT gk FROM g WHERE doc_id % 97 = 0),
        |agg AS (SELECT doc_id, count(DISTINCT gk) AS n_grams,
        |    count(DISTINCT CASE WHEN gk IN (SELECT gk FROM test)
        |      THEN gk END) AS n_hit
        |  FROM g WHERE doc_id % 97 <> 0 GROUP BY doc_id)
        |SELECT d.doc_id, coalesce(a.n_grams, 0) AS n_grams,
        |  coalesce(a.n_hit, 0) AS n_hit,
        |  CAST(CASE WHEN coalesce(a.n_grams, 0) > 0
        |    AND coalesce(a.n_hit, 0) * 100 >= 10 * a.n_grams
        |    THEN 1 ELSE 0 END AS INTEGER) AS dirty
        |FROM documents d LEFT JOIN agg a USING (doc_id)
        |WHERE d.doc_id % 97 <> 0 ORDER BY doc_id""".stripMargin,

    "q54_budget_select" ->
      s"""WITH scored AS (SELECT doc_id, lang,
        |  ${r4sql(s"""0.3 * least(1.0, CAST(length(text) AS DOUBLE) / 500.0) + 0.4 * (CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS DOUBLE) / CAST(length(text) AS DOUBLE)) + 0.3 * (CAST(len(list_filter($toks, t -> t IN ('the','a','and','of','to','in'))) AS DOUBLE) / CAST(len($toks) AS DOUBLE))""")} AS quality,
        |  CAST(len(regexp_extract_all(text,
        |    '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]')) AS BIGINT) AS n_subtokens
        |  FROM documents),
        |sel AS (SELECT *, sum(n_subtokens) OVER (
        |    PARTITION BY lang ORDER BY quality DESC, doc_id
        |    ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM scored)
        |SELECT doc_id, lang, quality, n_subtokens
        |FROM sel WHERE cum <= 4000 ORDER BY doc_id""".stripMargin,

    "q55_pii_scrub" ->
      """WITH aug AS (SELECT doc_id, text ||
        |  CASE WHEN doc_id % 7 = 0
        |    THEN ' contact user' || doc_id || '@example.com' ELSE '' END ||
        |  CASE WHEN doc_id % 11 = 0 THEN ' call 555-867-5309' ELSE '' END ||
        |  CASE WHEN doc_id % 13 = 0
        |    THEN ' host 10.0.' || (doc_id % 256) || '.7' ELSE '' END AS text
        |  FROM documents),
        |s1 AS (SELECT doc_id,
        |  CAST(len(regexp_extract_all(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT)
        |    AS n_emails,
        |  regexp_replace(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g')
        |    AS t1 FROM aug),
        |s2 AS (SELECT doc_id, n_emails,
        |  CAST(len(regexp_extract_all(t1,
        |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ips,
        |  regexp_replace(t1,
        |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g') AS t2
        |  FROM s1),
        |s3 AS (SELECT doc_id, n_emails, n_ips,
        |  CAST(len(regexp_extract_all(t2,
        |    '\b\d{3}-\d{3}-\d{4}\b')) AS BIGINT) AS n_phones,
        |  regexp_replace(t2, '\b\d{3}-\d{3}-\d{4}\b', '<PHONE>', 'g') AS t3
        |  FROM s2)
        |SELECT doc_id, n_emails, n_phones, n_ips, md5(t3) AS scrub_hash
        |FROM s3 ORDER BY doc_id""".stripMargin
  )
}
