package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Engine.table
import graft.functions.TextFunctions._
import graft.ops.CorpusStats

/** Text-analysis query surface over `documents` (language-ID, quality
  * scoring, token statistics, fingerprinting). Every query has a DuckDB
  * oracle built from the same primitive functions, so the heuristics are
  * pinned down to exact integer/string semantics.
  */
object TextQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Token statistics (whitespace tokenizer) per document.
    "t01_token_stats" -> ((s, dir) => {
      val d = table(s, dir, "documents")
      d.select(
        col("doc_id"),
        tokenCount(col("text")).as("n_tokens"),
        size(array_distinct(tokens(col("text")))).as("n_uniq_tokens"),
        round(avgTokenLen(col("text")), 6).as("avg_token_len"))
    }),

    // Quality scoring: ratios + composite score.
    "t02_quality" -> ((s, dir) => {
      val d = table(s, dir, "documents")
      d.select(
        col("doc_id"),
        length(col("text")).as("n_chars_text"),
        punctCount(col("text")).as("n_punct"),
        stopwordHits(col("text"), "en").as("n_stopwords"),
        round(stopwordRatio(col("text")), 6).as("stopword_ratio"),
        qualityScore(col("text")).as("quality"))
    }),

    // Language-ID heuristic: stopword-hit argmax with fixed tie-break.
    "t03_langid" -> ((s, dir) => {
      val d = table(s, dir, "documents")
      d.select(
        col("doc_id"),
        col("lang").as("declared_lang"),
        langId(col("text")).as("pred_lang"))
    }),

    // Aggregate: predicted-language distribution (grouped fold on top of a
    // scalar heuristic).
    "t04_langid_dist" -> ((s, dir) => {
      val d = table(s, dir, "documents")
      d.select(langId(col("text")).as("pred_lang"))
        .groupBy("pred_lang")
        .agg(count(lit(1)).as("n_docs"))
    }),

    // Content fingerprint (md5 of normalized text) — content addressing,
    // the analog of the reference's getID (util/id.js:72-78).
    "t05_fingerprint" -> ((s, dir) => {
      val d = table(s, dir, "documents")
      d.select(
        col("doc_id"),
        fingerprint(col("text")).as("fp"))
    }),

    // Subword ("BPE-ish" pre-tokenization) token counts.
    "t06_subword_counts" -> ((s, dir) => {
      val d = table(s, dir, "documents")
      d.select(
        col("doc_id"),
        size(subwordTokens(col("text"))).as("n_subwords"))
    }),

    // Real BPE token counts: iterated merges against the engine's fixed
    // ranked table (graft.expr.BpeOps.Merges), native kernel. The oracle
    // replays the merge loop in a recursive CTE with the table inlined.
    "t13_bpe_tokens" -> ((s, dir) => {
      val d = table(s, dir, "documents")
      d.select(
        col("doc_id"),
        size(bpeTokens(col("text"))).cast("long").as("n_bpe_tokens"))
    }),

    // Tokenizer fertility per language: BPE-tokens-per-word and
    // bytes-per-BPE-token — the readout that decides whether a tokenizer
    // (or a language's share of it) is efficient enough to train with,
    // and the denominator every token-budget plan (p08/p10) quietly
    // depends on. One narrow pass (both tokenizations are per-row
    // kernels), one lang-keyed partial agg; ratios divide the exact
    // integer sums.
    "t18_tokenizer_fertility" -> ((s, dir) => {
      val d = table(s, dir, "documents")
      d.select(col("lang"),
          tokenCount(col("text")).cast("long").as("ws"),
          size(bpeTokens(col("text"))).cast("long").as("bpe"),
          octet_length(col("text")).cast("long").as("b"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("ws")).as("ws_tokens"),
          sum(col("bpe")).as("bpe_tokens"),
          sum(col("b")).as("text_bytes"))
        .withColumn("fertility",
          round(col("bpe_tokens").cast("double")
            / col("ws_tokens").cast("double"), 6))
        .withColumn("bytes_per_token",
          round(col("text_bytes").cast("double")
            / col("bpe_tokens").cast("double"), 6))
    }),

    // Gopher-style within-document repetition signals (top-token share,
    // duplicate-bigram share) — integer-exact counts + rounded ratios.
    "t07_repetition" -> ((s, dir) =>
      CorpusStats.repetitionSignals(
        table(s, dir, "documents"), "text", "doc_id")),

    // Corpus vocabulary (top-100 tokens, count-desc/lexicographic ties)
    // and per-document out-of-vocabulary rate against it — the build-a-
    // small-dim-from-the-big-corpus-then-broadcast-it-back pattern.
    "t08_oov" -> ((s, dir) =>
      CorpusStats.oovStats(
        table(s, dir, "documents"), "text", "doc_id", v = 100)),

    // Context-window chunking: each document cut into 32-token windows
    // (last ragged), chunk identity as an md5 content address — the
    // narrow, shuffle-free pass that feeds sequence packing.
    "t09_chunks" -> ((s, dir) =>
      CorpusStats.chunkByTokens(
        table(s, dir, "documents"), "text", "doc_id", chunkSize = 32)),

    // Per-document top-3 TF-IDF terms — salient-term extraction for
    // topic/domain labeling (rank and score use the same rounded value).
    "t10_tfidf" -> ((s, dir) =>
      CorpusStats.tfidfTopTerms(
        table(s, dir, "documents"), "text", "doc_id", m = 3)),

    // Unigram LM score (mean token nll vs the corpus unigram model) —
    // the CCNet-style statistical quality signal.
    "t11_unigram_nll" -> ((s, dir) =>
      CorpusStats.unigramNll(
        table(s, dir, "documents"), "text", "doc_id")),

    // Bigram conditional-NLL score (mean -ln P(w2|w1) vs the corpus
    // bigram MLE) — the transition-aware quality signal above t11:
    // shuffled/garbled text that a unigram model scores as normal
    // stands out here.
    "t15_bigram_nll" -> ((s, dir) =>
      CorpusStats.bigramNll(
        table(s, dir, "documents"), "text", "doc_id")),

    // Okapi BM25 relevance against a fixed topic probe — the retrieval
    // scorer for RAG-corpus curation (t10's tf/df machinery + document-
    // length normalization + saturating TF, the Lucene idf form).
    "t16_bm25" -> ((s, dir) =>
      CorpusStats.bm25(
        table(s, dir, "documents"), "text", "doc_id",
        queryTerms = Seq("hash", "vector", "slow"))),

    // Lexical diversity: tokens, types, hapax count, type-token ratio —
    // the boilerplate/template-spam signal the per-line repetition rules
    // (t07) can miss (CorpusStats.lexicalDiversity).
    "t17_lexical_diversity" -> ((s, dir) =>
      CorpusStats.lexicalDiversity(
        table(s, dir, "documents"), "text", "doc_id")),

    // Sentence segmentation stats: terminator-run split, blank segments
    // dropped, per-sentence whitespace-token counts folded IN-ROW (array
    // kernels, no explode/shuffle) — mean and max sentence length, the
    // run-on/telegraphic style signal of the Gopher filter family
    // (CorpusStats.sentenceStats).
    "t31_sentence_stats" -> ((s, dir) =>
      CorpusStats.sentenceStats(
        table(s, dir, "documents"), "text", "doc_id")),

    // Extractive summary scoring: per document, the most salient
    // sentence by mean token IDF — the pick-the-least-generic-sentence
    // primitive of summarization/centrality pipelines
    // (CorpusStats.extractiveSummary).
    "t34_extractive_summary" -> ((s, dir) =>
      CorpusStats.extractiveSummary(
        table(s, dir, "documents"), "text", "doc_id")),

    // Source STYLE similarity: pairwise cosine between per-source
    // word-count vectors — the provenance/contamination signal that
    // catches re-labeled crawls exact dedup can't
    // (CorpusStats.sourceStyleCosine).
    "t33_source_style_cosine" -> ((s, dir) =>
      CorpusStats.sourceStyleCosine(
        table(s, dir, "documents"), "source", "text")),

    // Word BURSTINESS (Church & Gale): cf, df, within-doc rate, and
    // observed-vs-Poisson df ratio per word — the corpus-linguistics
    // audit behind TF-IDF's df term: function words spread (ratio ≈ 1),
    // topical words burst (ratio < 1) (CorpusStats.wordBurstiness).
    "t32_word_burstiness" -> ((s, dir) =>
      CorpusStats.wordBurstiness(
        table(s, dir, "documents"), "doc_id", "text", minCf = 50L)),

    // PMI collocation mining: corpus-level top-20 bigrams by pointwise
    // mutual information (min count 5) — multi-word-expression /
    // phrase-vocabulary candidates over the t15 bigram stream
    // (CorpusStats.collocations).
    "t19_collocations" -> ((s, dir) =>
      CorpusStats.collocations(
        table(s, dir, "documents"), "text", "doc_id", k = 20, minCount = 5)),

    // Language confusion matrix: declared × predicted doc counts plus
    // per-declared-language row fractions — the full-matrix readout
    // behind p14's scalar agreement number (which declared languages the
    // n-gram classifier confuses, and with what). One narrow scan + one
    // partially-aggregated groupBy; the fraction window runs over the
    // ≤|langs|² aggregate.
    "t23_lang_confusion" -> ((s, dir) => {
      val g = table(s, dir, "documents")
        .select(col("lang").as("declared_lang"),
          langId(col("text")).as("pred_lang"))
        .groupBy(col("declared_lang"), col("pred_lang"))
        .agg(count(lit(1)).as("n_docs"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("declared_lang"))
      g.withColumn("frac",
        round(col("n_docs").cast("double") /
          sum(col("n_docs")).over(w).cast("double"), 6))
    }),

    // Corpus-saturation novelty curve: per doc, the fraction of its
    // distinct 4-grams first seen (by min doc_id) in the doc itself —
    // the aggregate readout of whether a source still contributes new
    // content. Raw IEEE division of exact integers (d03 discipline).
    "t22_ngram_novelty" -> ((s, dir) =>
      CorpusStats.ngramNovelty(
        table(s, dir, "documents"), "text", "doc_id", k = 4)),

    // Zipf's-law fit: ln(freq) ~ ln(rank) least-squares over the top-200
    // word frequencies — the corpus-health scalar (natural text ≈ −1).
    // Top-K via orderBy+limit (TakeOrderedAndProject), so the ranked set
    // is 200 rows at any vocabulary size; regression sums are the t11
    // accepted round-6 double class.
    "t24_zipf_slope" -> ((s, dir) =>
      CorpusStats.zipfSlope(table(s, dir, "documents"), "text",
        maxRank = 200)),

    // Heaps'-law growth curve: distinct-bigram vocabulary and bigram
    // totals at power-of-two corpus checkpoints, via the first-
    // occurrence bucket trick — one corpus scan for ALL checkpoints,
    // cumsum over a ≤log₂(N)-row bucket aggregate (no prefix scans).
    "t25_heaps_curve" -> ((s, dir) =>
      CorpusStats.heapsCurve(table(s, dir, "documents"), "text",
        "doc_id")),

    // BPE merge TRAINING (the learning side of t13's tokenizer): 8
    // rounds of count-adjacent-pairs → merge-argmax on the aggregated
    // word-frequency vocabulary — corpus pays ONE token groupBy,
    // training cost is then corpus-size-independent (the production
    // trainer shape). Greedy left-to-right merge selection is the
    // run-parity rule, so the 8-round SQL oracle replays training
    // exactly. Output: the learned merge table.
    "t29_bpe_train" -> ((s, dir) =>
      graft.ops.BpeTrain.trainMerges(
        table(s, dir, "documents"), "text", rounds = 8)),

    // TextRank keywords: PageRank over the adjacent-word co-occurrence
    // graph (undirected, distinct edges, self-pairs dropped), top-20
    // words by rank — the graph-centrality complement of RAKE's
    // degree/frequency scores. Reuses the q30 fixed-point BIGINT
    // recurrence (bit-exact on both engines — float PageRank can never
    // hash-match), with words carried as the established 52-bit md5 ids
    // (the q26/q46 idiom — DuckDB replays them exactly; collisions
    // negligible at any vocabulary). Deterministic (r DESC, word ASC)
    // top-K via TakeOrderedAndProject.
    "t28_textrank" -> ((s, dir) => {
      def wid(w: org.apache.spark.sql.Column) =
        conv(substring(md5(w), 1, 13), 16, 10).cast("long")
      // widen the scan (the tokenize+explode kernel otherwise runs at
      // the 2-task scan width), and checkpoint the adjacent-pair frame
      // ONCE: edges and vocab consumed it through four union branches,
      // re-running tokenization per branch (2×0.8 s of the warm profile)
      val toks = graft.ops.widen(
          table(s, dir, "documents").select(col("text")))
        .select(tokens(lower(col("text"))).as("__ts"))
        .filter(size(col("__ts")) >= 2)
      val ap = toks.select(explode(filter(
          transform(sequence(lit(1), size(col("__ts")) - 1),
            i => struct(element_at(col("__ts"), i).as("a"),
              element_at(col("__ts"), i + 1).as("b"))),
          p => p("a") =!= p("b"))).as("__p"))
        .select(col("__p.a").as("a"), col("__p.b").as("b"))
        .localCheckpoint()
      val edges = ap.select(explode(array(
          struct(wid(col("a")).as("src"), wid(col("b")).as("dst")),
          struct(wid(col("b")).as("src"), wid(col("a")).as("dst"))))
          .as("__e"))
        .select(col("__e.src"), col("__e.dst"))
      val vocab = ap
        .select(explode(array(col("a"), col("b"))).as("word")).distinct()
        .select(col("word"), wid(col("word")).as("__wid"))
      graft.ops.PageRank.fixedPointPageRank(edges, iterations = 5)
        .join(vocab, col("vertex") === col("__wid"))
        .orderBy(col("r").desc, col("word").asc).limit(20)
        .select(col("word"), col("r"))
    }),

    // Per-source unigram drift: each source's KL-divergence CONTRIBUTION
    // p·ln(p/q) against the corpus distribution, per top-20 corpus word
    // — the mixture-health report that flags a source whose language no
    // longer looks like the blend (contributions sum to a KL estimate;
    // emitting per-word terms keeps every double a per-row expression on
    // exact integer counts — no cross-row double sums). The top-20 cut
    // is TakeOrderedAndProject; the drift join is |sources|·20 rows.
    // p/q collapses to one division (sc·ct)/(st·cc) — integer products
    // < 2^53, so both engines ln() the identical double.
    // Per-document character-bigram Shannon entropy — the
    // compression-ratio-style quality signal (boilerplate, keyboard
    // mash, and template spam all sit at entropy extremes; Gopher-class
    // filters cut on exactly this). Deterministic double discipline:
    // H = log₂n − (Σ c·log₂c)/n, where each c·log₂c term is round-6 of
    // one libm call and the cross-gram sum runs over DECIMAL(18,6)
    // rounded terms — exact, order-independent — so only the fixed
    // closing epilogue is IEEE (the t27 per-term contract, summed
    // exactly). Gram explosion is linear in text bytes; the histogram
    // groupBy is (doc, gram)-keyed and partially aggregated.
    "t30_char_entropy" -> ((s, dir) => {
      // widen: the per-doc bigram explode is the cost; a single-row-group
      // scan would otherwise run it in one task
      val g = graft.ops.widen(table(s, dir, "documents"))
        .select(col("doc_id"), lower(col("text")).as("__t"))
        .filter(length(col("__t")) >= 2)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(1, length(__t) - 1)," +
            " i -> substring(__t, i, 2))")).as("__g"))
      g.groupBy(col("doc_id"), col("__g")).agg(count(lit(1)).as("__c"))
        .groupBy(col("doc_id"))
        .agg(sum(col("__c")).as("n_grams"),
          count(lit(1)).as("distinct_grams"),
          sum(round(col("__c").cast("double") *
            log2(col("__c").cast("double")), 6)
            .cast(org.apache.spark.sql.types.DataTypes
              .createDecimalType(18, 6)))
            .cast(org.apache.spark.sql.types.DataTypes
              .createDecimalType(38, 6)).as("__s"))
        .select(col("doc_id"), col("n_grams"), col("distinct_grams"),
          round(log2(col("n_grams").cast("double")) -
            col("__s").cast("double") / col("n_grams").cast("double"), 6)
            .as("entropy_bits"))
    }),

    "t27_unigram_drift" -> ((s, dir) => {
      val tok = table(s, dir, "documents")
        .select(col("source"), explode(tokens(lower(col("text")))).as("w"))
      val corpus = tok.groupBy(col("w")).agg(count(lit(1)).as("n_corpus"))
        .orderBy(col("n_corpus").desc, col("w").asc).limit(20)
      val ctot = tok.agg(count(lit(1)).as("__ct"))
      val stot = tok.groupBy(col("source")).agg(count(lit(1)).as("__st"))
      val sw = tok.join(broadcast(corpus.select(col("w"))), Seq("w"))
        .groupBy(col("source"), col("w"))
        .agg(count(lit(1)).as("n_source"))
      val p = col("n_source").cast("double") / col("__st").cast("double")
      val ratio = (col("n_source").cast("double") * col("__ct").cast("double")) /
        (col("__st").cast("double") * col("n_corpus").cast("double"))
      stot.crossJoin(broadcast(corpus))
        .join(sw, Seq("source", "w"), "left")
        .na.fill(0L, Seq("n_source"))
        .crossJoin(broadcast(ctot))
        .select(col("source"), col("w"), col("n_source"), col("n_corpus"),
          when(col("n_source") === 0, lit(0.0))
            .otherwise(round(p * log(ratio), 6)).as("kl_term"))
    }),

    // Flesch reading-ease per language: the curation readability gate.
    // Every per-doc statistic is an integer (syllables = integer fold of
    // vowel-group counts over the token array), so group sums are exact
    // and the single IEEE formula per output row is partitioning-proof.
    "t26_readability" -> ((s, dir) =>
      CorpusStats.fleschReadability(table(s, dir, "documents"), "text",
        "lang").withColumnRenamed("group", "lang")),

    // RAKE keyphrases: top-3 stopword-delimited candidate phrases per
    // document, scored degree/frequency over the corpus-wide phrase
    // word graph (CorpusStats.rakeKeyphrases — ordered-fold doubles,
    // bit-parity with the oracle's list_reduce).
    "t21_rake_keyphrases" -> ((s, dir) =>
      CorpusStats.rakeKeyphrases(
        table(s, dir, "documents"), "text", "doc_id",
        maxPhraseLen = 4, topK = 3)),

    // Document-sharded inverted index (token → per-shard posting
    // segment): the classic build-the-index MR workload in its
    // distributed layout — a stopword's postings split across shards
    // instead of one unbounded cell (CorpusStats.invertedIndex).
    "t14_inverted_index" -> ((s, dir) =>
      CorpusStats.invertedIndex(
        table(s, dir, "documents"), "text", "doc_id", nShards = 4)),

    // PII detection + redaction. The synthetic corpus carries no natural
    // PII, so the query PLANTS deterministic PII per document (the oracle
    // constructs the identical text), then counts and redacts it —
    // non-trivial output, exact parity, and the redacted text rides as a
    // fingerprint so row width stays bounded.
    "t12_pii" -> ((s, dir) => {
      val d = table(s, dir, "documents")
      val plantedText = concat(
        col("text"),
        lit(" contact user"), col("doc_id").cast("string"), lit("@example.com"),
        lit(" or admin@test.org from 10.0.0."),
        pmod(col("doc_id"), lit(256)).cast("string"))
      d.select(
        col("doc_id"),
        piiCount(plantedText, EmailRegex).as("n_emails"),
        piiCount(plantedText, Ipv4Regex).as("n_ips"),
        md5(redactPii(plantedText).cast("binary")).as("redacted_fp"))
    }),

    // Flesch reading-ease readability: vowel-group syllables over
    // alphabetic words, [.!?]-delimited sentences, the classic
    // 206.835 − 1.015·(W/S) − 84.6·(Syl/W) score. All three counts are
    // exact integers computed inside the scan (no shuffle, no UDF); the
    // score follows the round-6 double contract with the formula written
    // in the identical operation order on both sides.
    "t20_readability" -> ((s, dir) => {
      val words = alphaWords(col("text"))
      table(s, dir, "documents")
        .select(
          col("doc_id"),
          sentenceCount(col("text")).cast("long").as("n_sentences"),
          size(words).cast("long").as("n_words"),
          aggregate(words, lit(0L),
            (acc, w) => acc + syllableCount(w).cast("long"))
            .as("n_syllables"))
        .select(
          col("doc_id"), col("n_sentences"), col("n_words"),
          col("n_syllables"),
          round(
            when(col("n_words") > 0,
              lit(206.835)
                - lit(1.015) * (col("n_words").cast("double")
                  / col("n_sentences").cast("double"))
                - lit(84.6) * (col("n_syllables").cast("double")
                  / col("n_words").cast("double")))
              .otherwise(lit(0.0)), 6).as("flesch"))
    })
  )

  // DuckDB-side mirrors of the heuristics. Kept in exact lockstep with
  // TextFunctions — same regexes (RE2-compatible), same tie-break order.
  private[queries] val enHits =
    """len(regexp_extract_all(lower(text), '\b(the|a|and|of|to|in|is|that|it)\b'))"""
  private val deHits =
    """len(regexp_extract_all(lower(text), '\b(der|die|das|und|ist|nicht|ein)\b'))"""
  private val frHits =
    """len(regexp_extract_all(lower(text), '\b(le|la|les|et|est|une|dans)\b'))"""
  private val esHits =
    """len(regexp_extract_all(lower(text), '\b(el|los|las|y|es|una|que)\b'))"""
  private val zhHits =
    """len(regexp_extract_all(lower(text), '(的|是|了|在|我)'))"""

  private[queries] val langCase =
    s"""CASE
        WHEN $enHits > 0 AND $enHits >= greatest($enHits,$deHits,$frHits,$esHits,$zhHits) THEN 'en'
        WHEN $deHits > 0 AND $deHits >= greatest($enHits,$deHits,$frHits,$esHits,$zhHits) THEN 'de'
        WHEN $frHits > 0 AND $frHits >= greatest($enHits,$deHits,$frHits,$esHits,$zhHits) THEN 'fr'
        WHEN $esHits > 0 AND $esHits >= greatest($enHits,$deHits,$frHits,$esHits,$zhHits) THEN 'es'
        WHEN $zhHits > 0 AND $zhHits >= greatest($enHits,$deHits,$frHits,$esHits,$zhHits) THEN 'zh'
        ELSE 'unknown' END"""

  private[queries] val nTokens =
    """len(list_filter(string_split_regex(text, '[ \t\n\u000B\f\r]+'), t -> t <> ''))"""
  private val tokenChars =
    """length(regexp_replace(text, '[ \t\n\u000B\f\r]+', '', 'g'))"""
  private val nPunct =
    """len(regexp_extract_all(text, '[.,;:!?]'))"""

  /** The dedup/corpus-stats family tokenizer (lowercased whitespace split,
    * empties dropped) — keep in lockstep with CorpusStats.lowerTokens and
    * the d05 oracle (byte-identical regex class).
    */
  private[queries] val lowToks =
    """list_filter(string_split_regex(lower(text), '[ \t\n\u000B\f\r]+'), t -> t <> '')"""

  /** TextFunctions.qualityScore mirrored in SQL — shared by t02 and the
    * p01 pipeline oracle (PipelineQueries).
    */
  private[queries] val qualitySql = s"""round(
            least(CAST($nTokens AS DOUBLE) / 50.0, 1.0) * 0.4
            + least((CASE WHEN $nTokens > 0
                     THEN CAST($enHits AS DOUBLE) / CAST($nTokens AS DOUBLE)
                     ELSE 0.0 END) * 4.0, 1.0) * 0.3
            + (1.0 - least((CASE WHEN length(text) > 0
                            THEN CAST($nPunct AS DOUBLE) / CAST(length(text) AS DOUBLE)
                            ELSE 0.0 END) * 10.0, 1.0)) * 0.3, 6)"""

  /** The t13 oracle: the kernel's BPE merge loop replayed in a DuckDB
    * recursive CTE, with the ranked merge table inlined as a CASE from
    * the SAME [[graft.expr.BpeOps.Merges]] the query kernel uses. Each
    * recursion step merges the leftmost occurrence of the lowest-ranked
    * adjacent pair (min over rank·100000 + index — rank-major, then
    * leftmost); a word's terminal row is the one where no table pair
    * remains. Unit split is code-point-based on both sides (DuckDB
    * string indexing = code points; the kernel splits by code point).
    */
  private def t13OracleSql: String =
    s"""WITH RECURSIVE $bpeCtes
        SELECT d.doc_id,
          CAST(coalesce(agg.n_bpe, 0) AS BIGINT) AS n_bpe_tokens
        FROM documents d LEFT JOIN agg USING (doc_id)"""

  /** The shared BPE-replay CTE chain (ends in `agg(doc_id, n_bpe)`) —
    * composed by the t13 and t18 oracles; must sit under WITH RECURSIVE.
    */
  private def bpeCtes: String = {
    val whens = graft.expr.BpeOps.Merges.zipWithIndex
      .map { case ((a, b), r) => s"WHEN '$a|$b' THEN $r" }.mkString(" ")
    def rankOf(pair: String) = s"(CASE $pair $whens ELSE NULL END)"
    val pairAt = "seq[i] || '|' || seq[i+1]"
    s"""pre AS (
          SELECT doc_id, regexp_extract_all(lower(text),
            '[a-z0-9]+|[^a-z0-9 \t\n\u000B\f\r]') AS ws
          FROM documents),
        init AS (
          -- widx only keys a word through the recursion (uniqueness is
          -- all that matters; the final agg groups by doc_id alone)
          SELECT doc_id, row_number() OVER () AS widx,
            list_transform(range(1, length(tok) + 1), i -> tok[i]) AS seq
          FROM (SELECT doc_id, unnest(ws) AS tok FROM pre)),
        bpe AS (
          SELECT doc_id, widx, seq FROM init
          UNION ALL
          SELECT doc_id, widx,
            seq[1:bi-1] || [seq[bi] || seq[bi+1]] || seq[bi+2:] AS seq
          FROM (
            SELECT doc_id, widx, seq, CAST(best % 100000 AS BIGINT) AS bi
            FROM (
              SELECT doc_id, widx, seq,
                list_min(list_transform(range(1, len(seq)),
                  i -> ${rankOf(pairAt)} * 100000 + i)) AS best
              FROM bpe)
            WHERE best IS NOT NULL)),
        fin AS (
          SELECT doc_id, len(seq) AS n
          FROM bpe
          WHERE list_min(list_transform(range(1, len(seq)),
            i -> ${rankOf(pairAt)})) IS NULL),
        agg AS (SELECT doc_id, sum(n) AS n_bpe FROM fin GROUP BY doc_id)"""
  }

  /** The t18 oracle: per-lang fertility from the same BPE replay. Sums
    * CAST to BIGINT (DuckDB HUGEINT — the p08 lesson); the two ratios
    * divide exact-int doubles, so they are correctly rounded identically
    * on both engines.
    */
  private def t18OracleSql: String =
    s"""WITH RECURSIVE $bpeCtes,
        base AS (
          SELECT d.doc_id, d.lang,
            CAST(len($lowToks) AS BIGINT) AS ws,
            CAST(strlen(d.text) AS BIGINT) AS b,
            CAST(coalesce(agg.n_bpe, 0) AS BIGINT) AS bpe
          FROM documents d LEFT JOIN agg USING (doc_id))
        SELECT lang, count(*) AS n_docs,
          CAST(sum(ws) AS BIGINT) AS ws_tokens,
          CAST(sum(bpe) AS BIGINT) AS bpe_tokens,
          CAST(sum(b) AS BIGINT) AS text_bytes,
          round(CAST(sum(bpe) AS DOUBLE) / CAST(sum(ws) AS DOUBLE), 6)
            AS fertility,
          round(CAST(sum(b) AS DOUBLE) / CAST(sum(bpe) AS DOUBLE), 6)
            AS bytes_per_token
        FROM base GROUP BY lang"""

  val oracles: Map[String, String] = Map(
    // Mirrors t23: the shared langCase classifier, BIGINT counts, and
    // the identical integer division (window total is HUGEINT in DuckDB
    // but both engines divide the same exact integers cast DOUBLE).
    "t23_lang_confusion" ->
      s"""WITH d AS (SELECT lang AS declared_lang, $langCase AS pred_lang
            FROM documents),
          g AS (SELECT declared_lang, pred_lang,
                  CAST(count(*) AS BIGINT) AS n_docs
                FROM d GROUP BY 1, 2)
          SELECT declared_lang, pred_lang, n_docs,
            round(CAST(n_docs AS DOUBLE)
              / CAST(sum(n_docs) OVER (PARTITION BY declared_lang)
                  AS DOUBLE), 6) AS frac
          FROM g""",
    // Mirrors t34: same terminator-run sentence split (blank segments
    // dropped BEFORE indexing; generate_subscripts − 1 == posexplode),
    // same round-6 single-ln IDF terms DECIMAL-summed, same
    // (salience DESC, idx ASC) winner.
    "t34_extractive_summary" ->
      s"""WITH base AS (SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[.!?]+'),
               s -> regexp_replace(s, '[ \t\n\u000B\f\r]+', '', 'g')
                 <> '') AS sents
           FROM documents),
          sent AS (SELECT doc_id,
              unnest(sents) AS s,
              generate_subscripts(sents, 1) - 1 AS sidx
            FROM base),
          tok AS (SELECT doc_id, sidx, unnest(list_filter(
              string_split_regex(s, '[ \t\n\u000B\f\r]+'),
              t -> t <> '')) AS w
            FROM sent),
          dfreq AS (SELECT w, CAST(count(*) AS BIGINT) AS df
                    FROM (SELECT DISTINCT doc_id, w FROM tok)
                    GROUP BY 1),
          n AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM base),
          idf AS (SELECT w, CAST(round(ln((CAST(nd AS DOUBLE) + 1.0) /
                    (CAST(df AS DOUBLE) + 1.0)), 6) AS DECIMAL(18,6))
                    AS idf
                  FROM dfreq CROSS JOIN n),
          sc AS (SELECT doc_id, sidx,
                   CAST(count(*) AS BIGINT) AS n_tokens,
                   round(CAST(CAST(sum(idf) AS DECIMAL(38,6)) AS DOUBLE)
                     / CAST(count(*) AS DOUBLE), 6) AS salience
                 FROM tok JOIN idf USING (w)
                 GROUP BY 1, 2),
          r AS (SELECT doc_id, sidx, n_tokens, salience,
                  row_number() OVER (PARTITION BY doc_id
                    ORDER BY salience DESC, sidx ASC) AS rn
                FROM sc)
       SELECT doc_id, CAST(sidx AS INTEGER) AS best_sentence,
         n_tokens, salience
       FROM r WHERE rn = 1""",
    // Mirrors t33: same tokenizer, integer count/product/norm sums,
    // the identical two-sqrt-one-division round-6 epilogue.
    "t33_source_style_cosine" ->
      s"""WITH t AS (SELECT source, $lowToks AS toks FROM documents),
          tok AS (SELECT source AS g, unnest(toks) AS w FROM t),
          wc AS (SELECT g, w, CAST(count(*) AS BIGINT) AS c
                 FROM tok GROUP BY 1, 2),
          norms AS (SELECT g, CAST(sum(c * c) AS BIGINT) AS ss
                    FROM wc GROUP BY 1),
          dots AS (SELECT a.g AS source_a, b.g AS source_b,
                     CAST(sum(a.c * b.c) AS BIGINT) AS dot
                   FROM wc a JOIN wc b
                     ON a.w = b.w AND a.g < b.g
                   GROUP BY 1, 2)
          SELECT source_a, source_b, dot,
            round(CAST(dot AS DOUBLE) /
              (sqrt(CAST(na.ss AS DOUBLE)) * sqrt(CAST(nb.ss AS DOUBLE))),
              6) AS style_cosine
          FROM dots
          JOIN norms na ON na.g = source_a
          JOIN norms nb ON nb.g = source_b""",
    // Mirrors t32: same tokenizer, exact (word, doc) → word rollup
    // integers, one round-6 integer-ratio division and one round-6
    // single-exp Poisson chain in the identical parenthesization.
    "t32_word_burstiness" ->
      s"""WITH t AS (SELECT doc_id, $lowToks AS toks FROM documents),
          tok AS (SELECT doc_id, unnest(toks) AS w FROM t),
          wd AS (SELECT w, doc_id, CAST(count(*) AS BIGINT) AS c
                 FROM tok GROUP BY 1, 2),
          a AS (SELECT w, CAST(sum(c) AS BIGINT) AS cf,
                  CAST(count(*) AS BIGINT) AS df
                FROM wd GROUP BY 1
                HAVING sum(c) >= 50),
          d AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM documents)
          SELECT w AS word, cf, df,
            round(CAST(cf AS DOUBLE) / CAST(df AS DOUBLE), 6)
              AS rate_in_docs,
            round(CAST(df AS DOUBLE) /
              (CAST(nd AS DOUBLE) *
                (1.0 - exp(-CAST(cf AS DOUBLE) / CAST(nd AS DOUBLE)))), 6)
              AS df_vs_poisson
          FROM a CROSS JOIN d""",
    // Mirrors t24: same tokenizer, same (count DESC, word ASC) rank cut
    // at 200, ln on exact integer ratios' doubles, the identical normal-
    // equation form; cross-row double sums are the t11 round-6 class.
    "t24_zipf_slope" ->
      s"""WITH t AS (SELECT $lowToks AS toks FROM documents),
          tok AS (SELECT unnest(toks) AS w FROM t),
          c AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM tok
                GROUP BY w),
          rk AS (SELECT w, c, CAST(row_number() OVER
                   (ORDER BY c DESC, w ASC) AS BIGINT) AS r FROM c),
          xy AS (SELECT ln(CAST(r AS DOUBLE)) AS x,
                   ln(CAST(c AS DOUBLE)) AS y
                 FROM rk WHERE r <= 200),
          s AS (SELECT CAST(count(*) AS BIGINT) AS n, sum(x) AS sx,
                  sum(y) AS sy, sum(x*y) AS sxy, sum(x*x) AS sxx FROM xy)
          SELECT n AS n_ranks,
            round((n*sxy - sx*sy) / (n*sxx - sx*sx), 6) AS slope,
            round((sy - ((n*sxy - sx*sy) / (n*sxx - sx*sx)) * sx) / n, 6)
              AS intercept
          FROM s""",
    // Mirrors t25: bigram strings where the Spark side buckets 8-byte
    // xxhash64 keys (the d07/t22 equivalence), min-doc_id first
    // occurrence, the same integer bit-length checkpoint bucket
    // (1 << length(bin(f)) — no float log2), BIGINT casts around the
    // cumsum windows (DuckDB sums BIGINT into HUGEINT — the p08 lesson).
    "t25_heaps_curve" ->
      s"""WITH t AS (SELECT doc_id, $lowToks AS toks FROM documents),
          b AS (SELECT doc_id,
                  unnest(list_distinct(list_transform(range(1, len(toks)),
                    i -> toks[i] || ' ' || toks[i+1]))) AS w
                FROM t WHERE len(toks) >= 2),
          f AS (SELECT w, min(doc_id) AS fid FROM b GROUP BY w),
          vb AS (SELECT CASE WHEN fid = 0 THEN CAST(1 AS BIGINT)
                     ELSE CAST(1 AS BIGINT) << length(bin(fid)) END AS cp,
                   CAST(count(*) AS BIGINT) AS nv
                 FROM f GROUP BY 1),
          tb AS (SELECT CASE WHEN doc_id = 0 THEN CAST(1 AS BIGINT)
                     ELSE CAST(1 AS BIGINT) << length(bin(doc_id)) END
                     AS cp,
                   CAST(sum(greatest(len(toks) - 1, 0)) AS BIGINT) AS nt
                 FROM t GROUP BY 1),
          m AS (SELECT coalesce(vb.cp, tb.cp) AS cp,
                  coalesce(nv, 0) AS nv, coalesce(nt, 0) AS nt
                FROM vb FULL OUTER JOIN tb ON vb.cp = tb.cp)
          SELECT cp AS checkpoint_docs,
            CAST(sum(nv) OVER (ORDER BY cp ROWS BETWEEN UNBOUNDED
              PRECEDING AND CURRENT ROW) AS BIGINT) AS vocab_size,
            CAST(sum(nt) OVER (ORDER BY cp ROWS BETWEEN UNBOUNDED
              PRECEDING AND CURRENT ROW) AS BIGINT) AS n_bigrams
          FROM m""",
    // Mirrors t29: the identical per-round relational formulation —
    // weighted pair counts from the (word, pos) self-join, the same
    // (pc DESC, l, r) argmax, the same run-parity greedy selection, the
    // same row_number rebuild — so training replays round for round.
    // MATERIALIZED CTEs (the q65 lesson: plain CTEs re-expand per
    // reference and 8 self-referencing rounds would blow up planning).
    "t29_bpe_train" -> {
      val rounds = (1 to 8).map { r =>
        val p = r - 1
        s"""p$r AS (SELECT s1.sym AS l, s2.sym AS r2,
               CAST(sum(s1.c) AS BIGINT) AS pc
             FROM s$p s1 JOIN s$p s2
               ON s1.word = s2.word AND s2.pos = s1.pos + 1
             GROUP BY 1, 2),
           m$r AS MATERIALIZED (SELECT l, r2, pc FROM p$r
             ORDER BY pc DESC, l ASC, r2 ASC LIMIT 1),
           t$r AS (SELECT *,
               CASE WHEN m = 1 AND (row_number() OVER
                   (PARTITION BY word, m, grp ORDER BY pos)) % 2 = 1
                 THEN 1 ELSE 0 END AS take
             FROM (SELECT *,
                 CASE WHEN m = 1 THEN pos - row_number() OVER
                     (PARTITION BY word, m ORDER BY pos) END AS grp
               FROM (SELECT *,
                   CASE WHEN sym = l AND nxt = r2 THEN 1 ELSE 0 END AS m
                 FROM (SELECT s.word, s.c, s.pos, s.sym,
                     lead(s.sym) OVER (PARTITION BY s.word
                       ORDER BY s.pos) AS nxt, mm.l, mm.r2
                   FROM s$p s CROSS JOIN m$r mm)))),
           s$r AS MATERIALIZED (
             SELECT word, c,
               row_number() OVER (PARTITION BY word ORDER BY pos) AS pos,
               CASE WHEN take = 1 THEN sym || nxt ELSE sym END AS sym
             FROM (SELECT *, lag(take, 1, 0) OVER (PARTITION BY word
                 ORDER BY pos) AS dropped FROM t$r)
             WHERE dropped = 0)"""
      }.mkString(",\n           ")
      val sel = (1 to 8).map { r =>
        s"""SELECT $r AS round, l AS l_sym, r2 AS r_sym,
             l || r2 AS merged, pc AS pair_count FROM m$r"""
      }.mkString("\n           UNION ALL\n           ")
      s"""WITH w AS MATERIALIZED (
             SELECT word, CAST(count(*) AS BIGINT) AS c
             FROM (SELECT unnest($lowToks) AS word FROM documents)
             GROUP BY 1),
           s0 AS MATERIALIZED (
             SELECT word, c,
               unnest(range(1, len(word) + 1)) AS pos,
               unnest(list_transform(range(1, len(word) + 1),
                 i -> word[i])) AS sym
             FROM w),
           $rounds
           $sel"""
    },
    // Mirrors t28: same tokenizer, distinct undirected edge set minus
    // self-pairs, identical 52-bit md5 word ids, and the q30 recurrence
    // replayed round for round (// floor == div trunc on all-positive
    // ranks; scaled-BIGINT sums are order-invariant). Same top-20 cut.
    "t28_textrank" -> {
      val rounds = (1 to 5).map { i =>
        s"""r$i AS (SELECT d.dst AS vertex,
             CAST(150000000000 + (85 * sum(r${i - 1}.r // d.outdeg)) // 100
               AS BIGINT) AS r
           FROM d JOIN r${i - 1} ON d.src = r${i - 1}.vertex
           GROUP BY d.dst)"""
      }.mkString(",\n           ")
      s"""WITH t AS (SELECT $lowToks AS toks FROM documents),
           bg AS (SELECT unnest(list_distinct(list_filter(list_transform(
                    range(1, len(toks)),
                    i -> CASE WHEN toks[i] <> toks[i+1]
                      THEN toks[i] || ' ' || toks[i+1] END),
                    x -> x IS NOT NULL))) AS g
                  FROM t WHERE len(toks) >= 2),
           ap AS (SELECT DISTINCT string_split(g, ' ')[1] AS a,
                    string_split(g, ' ')[2] AS b FROM bg),
           e0 AS (SELECT a, b FROM ap UNION SELECT b, a FROM ap),
           id AS (SELECT word, CAST(concat('0x',
                    substring(md5(word), 1, 13)) AS BIGINT) AS wid
                  FROM (SELECT DISTINCT a AS word FROM e0)),
           e AS (SELECT ia.wid AS src, ib.wid AS dst
                 FROM e0
                 JOIN id ia ON e0.a = ia.word
                 JOIN id ib ON e0.b = ib.word),
           d AS (SELECT src, dst,
                   count(*) OVER (PARTITION BY src) AS outdeg
                 FROM e),
           r0 AS (SELECT DISTINCT src AS vertex,
                    CAST(1000000000000 AS BIGINT) AS r FROM e),
           $rounds
         SELECT id.word, r5.r FROM r5 JOIN id ON r5.vertex = id.wid
         QUALIFY row_number() OVER (ORDER BY r5.r DESC, id.word ASC) <= 20"""
    },
    // Mirrors t27: same tokenizer, the same (count DESC, w ASC) top-20
    // cut, BIGINT counts, and the identical single-division p·ln((sc·ct)
    // /(st·cc)) per-row term (integer products < 2^53 — exact doubles).
    // Mirrors t30: identical 1-based bigram slicing (range(1, len) =
    // positions 1..len−1), the same round-6 c·log₂c terms summed as
    // exact DECIMAL(18,6), the same closing epilogue.
    "t30_char_entropy" ->
      """WITH t AS (SELECT doc_id, lower(text) AS t FROM documents
            WHERE length(text) >= 2),
          pos AS (SELECT doc_id, t,
                    unnest(range(1, length(t))) AS i FROM t),
          g AS (SELECT doc_id,
                  substr(t, CAST(i AS INTEGER), 2) AS gr FROM pos),
          h AS (SELECT doc_id, gr, CAST(count(*) AS BIGINT) AS c
                FROM g GROUP BY 1, 2),
          d AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_grams,
                  CAST(count(*) AS BIGINT) AS distinct_grams,
                  sum(CAST(round(CAST(c AS DOUBLE) *
                    log2(CAST(c AS DOUBLE)), 6) AS DECIMAL(18,6))) AS s
                FROM h GROUP BY 1)
        SELECT doc_id, n_grams, distinct_grams,
          round(log2(CAST(n_grams AS DOUBLE)) -
            CAST(s AS DOUBLE) / CAST(n_grams AS DOUBLE), 6)
            AS entropy_bits
        FROM d""",
    "t27_unigram_drift" ->
      s"""WITH tok AS (SELECT source, unnest($lowToks) AS w
            FROM documents),
          corpus AS (SELECT w, CAST(count(*) AS BIGINT) AS n_corpus
                     FROM tok GROUP BY 1
                     ORDER BY n_corpus DESC, w ASC LIMIT 20),
          ctot AS (SELECT CAST(count(*) AS BIGINT) AS ct FROM tok),
          stot AS (SELECT source, CAST(count(*) AS BIGINT) AS st
                   FROM tok GROUP BY 1),
          sw AS (SELECT source, w, CAST(count(*) AS BIGINT) AS n_source
                 FROM tok WHERE w IN (SELECT w FROM corpus)
                 GROUP BY 1, 2)
          SELECT stot.source, c.w,
            coalesce(sw.n_source, 0) AS n_source, c.n_corpus,
            CASE WHEN coalesce(sw.n_source, 0) = 0 THEN CAST(0.0 AS DOUBLE)
              ELSE round(
                (CAST(sw.n_source AS DOUBLE) / CAST(stot.st AS DOUBLE))
                * ln((CAST(sw.n_source AS DOUBLE) * CAST(ctot.ct AS DOUBLE))
                     / (CAST(stot.st AS DOUBLE)
                        * CAST(c.n_corpus AS DOUBLE))), 6) END AS kl_term
          FROM stot CROSS JOIN corpus c CROSS JOIN ctot
          LEFT JOIN sw ON sw.source = stot.source AND sw.w = c.w""",
    // Mirrors t26: same tokenizer, the same max(1, vowel-group-count)
    // syllable heuristic and [.!?]+ sentence runs, BIGINT casts around
    // every sum (DuckDB list_sum/sum widen — the p08 lesson), and the
    // identical double formula over exact group totals (decimal literals
    // cast DOUBLE so both engines round the same constants once).
    "t26_readability" ->
      s"""WITH t AS (SELECT lang, text, $lowToks AS toks FROM documents),
          d AS (SELECT lang, CAST(len(toks) AS BIGINT) AS w,
                  greatest(CAST(1 AS BIGINT),
                    CAST(len(regexp_extract_all(text, '[.!?]+'))
                      AS BIGINT)) AS s,
                  CAST(coalesce(list_sum(list_transform(toks,
                    x -> greatest(1, len(regexp_extract_all(x,
                      '[aeiouy]+'))))), 0) AS BIGINT) AS y
                FROM t),
          g AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
                  CAST(sum(w) AS BIGINT) AS n_words,
                  CAST(sum(s) AS BIGINT) AS n_sentences,
                  CAST(sum(y) AS BIGINT) AS n_syllables
                FROM d GROUP BY 1)
          SELECT lang, n_docs, n_words, n_sentences, n_syllables,
            round(CAST(206.835 AS DOUBLE)
              - CAST(1.015 AS DOUBLE)
                * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
              - CAST(84.6 AS DOUBLE)
                * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE)),
              6) AS flesch
          FROM g""",
    // Mirrors t22: gram STRINGS where the Spark side shuffles 8-byte
    // xxhash64 keys (the d07 hash-vs-string equivalence, collision-
    // negligible), min-doc_id first occurrence, raw IEEE division.
    "t22_ngram_novelty" ->
      """WITH t AS (SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[ \t\n\u000B\f\r]+'),
               x -> x <> '') AS toks
           FROM documents),
         g AS (SELECT doc_id,
                 unnest(list_distinct(list_transform(range(1, len(toks) - 2),
                   i -> array_to_string(toks[i:i+3], ' ')))) AS w
               FROM t WHERE len(toks) >= 4),
         f AS (SELECT w, min(doc_id) AS first_id FROM g GROUP BY w)
         SELECT g.doc_id AS doc_id, CAST(count(*) AS BIGINT) AS n_grams,
           CAST(sum(CASE WHEN f.first_id = g.doc_id THEN 1 ELSE 0 END)
             AS BIGINT) AS n_novel,
           CAST(sum(CASE WHEN f.first_id = g.doc_id THEN 1 ELSE 0 END)
             AS DOUBLE) / CAST(count(*) AS DOUBLE) AS novelty
         FROM g JOIN f USING (w)
         GROUP BY g.doc_id""",
    "t13_bpe_tokens" -> t13OracleSql,
    "t18_tokenizer_fertility" -> t18OracleSql,
    "t01_token_stats" ->
      s"""SELECT doc_id,
          $nTokens AS n_tokens,
          len(list_distinct(list_filter(string_split_regex(text, '[ \t\n\u000B\f\r]+'), t -> t <> ''))) AS n_uniq_tokens,
          round(CASE WHEN $nTokens > 0
                THEN CAST($tokenChars AS DOUBLE) / CAST($nTokens AS DOUBLE)
                ELSE 0.0 END, 6) AS avg_token_len
          FROM documents""",
    "t02_quality" ->
      s"""SELECT doc_id,
          length(text) AS n_chars_text,
          $nPunct AS n_punct,
          $enHits AS n_stopwords,
          round(CASE WHEN $nTokens > 0
                THEN CAST($enHits AS DOUBLE) / CAST($nTokens AS DOUBLE)
                ELSE 0.0 END, 6) AS stopword_ratio,
          $qualitySql AS quality
          FROM documents""",
    "t03_langid" ->
      s"""SELECT doc_id, lang AS declared_lang, $langCase AS pred_lang
          FROM documents""",
    "t04_langid_dist" ->
      s"""SELECT $langCase AS pred_lang, count(*) AS n_docs
          FROM documents GROUP BY 1""",
    "t05_fingerprint" ->
      """SELECT doc_id,
         md5(trim(regexp_replace(lower(text), '[ \t\n\u000B\f\r]+', ' ', 'g'))) AS fp
         FROM documents""",
    "t06_subword_counts" ->
      """SELECT doc_id,
         len(regexp_extract_all(text, '[a-zA-Z0-9]+|[^a-zA-Z0-9 \t\n\u000B\f\r]')) AS n_subwords
         FROM documents""",
    // Mirrors CorpusStats.repetitionSignals: same lowercased-whitespace
    // tokenizer as d05, bigrams as 'tok tok' strings, sums cast to BIGINT
    // for type parity with Spark's LongType aggregates.
    "t07_repetition" ->
      s"""WITH t AS (SELECT doc_id, $lowToks AS toks FROM documents),
          tok AS (SELECT doc_id, unnest(toks) AS w FROM t),
          uc AS (SELECT doc_id, w, count(*) AS c FROM tok GROUP BY 1, 2),
          uni AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
                    count(*) AS n_uniq_tokens, max(c) AS top_tok_n
                  FROM uc GROUP BY doc_id),
          bg AS (SELECT doc_id,
                   unnest(list_transform(range(1, len(toks)),
                     i -> toks[i] || ' ' || toks[i+1])) AS g
                 FROM t WHERE len(toks) >= 2),
          bc AS (SELECT doc_id, g, count(*) AS c FROM bg GROUP BY 1, 2),
          bi AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_2grams,
                   CAST(sum(c) - count(*) AS BIGINT) AS n_dup_2grams
                 FROM bc GROUP BY doc_id)
          SELECT d.doc_id,
            coalesce(uni.n_tokens, 0) AS n_tokens,
            coalesce(uni.n_uniq_tokens, 0) AS n_uniq_tokens,
            coalesce(uni.top_tok_n, 0) AS top_tok_n,
            round(CASE WHEN coalesce(uni.n_tokens, 0) > 0
              THEN CAST(uni.top_tok_n AS DOUBLE) / CAST(uni.n_tokens AS DOUBLE)
              ELSE 0.0 END, 6) AS top_tok_frac,
            coalesce(bi.n_2grams, 0) AS n_2grams,
            coalesce(bi.n_dup_2grams, 0) AS n_dup_2grams,
            round(CASE WHEN coalesce(bi.n_2grams, 0) > 0
              THEN CAST(bi.n_dup_2grams AS DOUBLE) / CAST(bi.n_2grams AS DOUBLE)
              ELSE 0.0 END, 6) AS dup_2gram_frac
          FROM documents d
          LEFT JOIN uni USING (doc_id)
          LEFT JOIN bi USING (doc_id)""",
    // Mirrors CorpusStats.oovStats: vocab = top-100 by (count DESC, token
    // ASC) — the same deterministic tie-break as the Spark orderBy.limit.
    "t08_oov" ->
      s"""WITH t AS (SELECT doc_id, $lowToks AS toks FROM documents),
          tok AS (SELECT doc_id, unnest(toks) AS w FROM t),
          vc AS (SELECT w, count(*) AS c FROM tok GROUP BY w),
          vocab AS (SELECT w FROM vc
                    QUALIFY row_number() OVER (ORDER BY c DESC, w ASC) <= 100),
          st AS (SELECT tok.doc_id, count(*) AS n_tokens,
                   CAST(sum(CASE WHEN vocab.w IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov
                 FROM tok LEFT JOIN vocab ON tok.w = vocab.w
                 GROUP BY tok.doc_id)
          SELECT d.doc_id,
            coalesce(st.n_tokens, 0) AS n_tokens,
            coalesce(st.n_oov, 0) AS n_oov,
            round(CASE WHEN coalesce(st.n_tokens, 0) > 0
              THEN CAST(st.n_oov AS DOUBLE) / CAST(st.n_tokens AS DOUBLE)
              ELSE 0.0 END, 6) AS oov_frac
          FROM documents d LEFT JOIN st USING (doc_id)""",
    // Mirrors CorpusStats.chunkByTokens: DuckDB list slicing clamps the
    // upper bound exactly like Spark's slice(start, length), and md5 of
    // the space-rejoined chunk matches Spark's md5(cast binary).
    "t09_chunks" ->
      s"""WITH t AS (SELECT doc_id, $lowToks AS toks FROM documents),
          c AS (SELECT doc_id,
                  unnest(list_transform(
                    range(1, CAST(ceil(len(toks) / 32.0) AS BIGINT) + 1),
                    i -> struct_pack(idx := i,
                           chunk := toks[(i - 1) * 32 + 1 : i * 32]))) AS s
                FROM t WHERE len(toks) > 0)
          SELECT doc_id, CAST(s.idx AS INTEGER) AS chunk_idx,
            len(s.chunk) AS n_tokens,
            md5(array_to_string(s.chunk, ' ')) AS fp
          FROM c""",
    // Mirrors CorpusStats.tfidfTopTerms: integer tf/df/N on both sides;
    // score = round(tf * ln(N/df), 6) and the rank window orders by the
    // SAME rounded score, so ulp drift in ln cannot flip ranks.
    "t10_tfidf" ->
      s"""WITH t AS (SELECT doc_id, $lowToks AS toks FROM documents),
          tok AS (SELECT doc_id, unnest(toks) AS term FROM t),
          tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
          dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
          n AS (SELECT count(*) AS n FROM documents),
          s AS (SELECT doc_id, tf.term AS term,
                  round(tf * ln(CAST(n.n AS DOUBLE) / df), 6) AS score
                FROM tf JOIN dfq ON tf.term = dfq.term, n)
          SELECT doc_id, term, score, CAST(rank AS INTEGER) AS rank
          FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                  ORDER BY score DESC, term ASC) AS rank FROM s)
          WHERE rank <= 3""",
    // Mirrors CorpusStats.lexicalDiversity: integer counts end to end;
    // ttr is one int/int IEEE division (bit-portable), rounded 6 by the
    // t11 contract.
    "t17_lexical_diversity" ->
      s"""WITH t AS (SELECT doc_id, $lowToks AS toks FROM documents),
          tok AS (SELECT doc_id, unnest(toks) AS w FROM t),
          c AS (SELECT doc_id, w, count(*) AS c FROM tok GROUP BY 1, 2),
          s AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
                  count(*) AS n_types,
                  CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
                    AS hapax_count
                FROM c GROUP BY doc_id)
          SELECT d.doc_id,
            coalesce(s.n_tokens, 0) AS n_tokens,
            coalesce(s.n_types, 0) AS n_types,
            coalesce(s.hapax_count, 0) AS hapax_count,
            round(CASE WHEN coalesce(s.n_tokens, 0) = 0 THEN 0.0
              ELSE CAST(s.n_types AS DOUBLE) / CAST(s.n_tokens AS DOUBLE)
              END, 6) AS ttr
          FROM documents d LEFT JOIN s USING (doc_id)""",

    // Mirrors CorpusStats.sentenceStats: the same terminator-run split
    // and whitespace-blank drop, per-sentence token counts as list
    // kernels, integer sums/max (list_sum's HUGEINT cast back down),
    // one round-6 mean.
    "t31_sentence_stats" ->
      """WITH s AS (SELECT doc_id,
             list_filter(string_split_regex(text, '[.!?]+'),
               x -> regexp_replace(x, '[ \t\n\u000B\f\r]+', '', 'g')
                 <> '') AS sents
           FROM documents),
          t AS (SELECT doc_id,
             CAST(len(sents) AS BIGINT) AS n_sentences,
             list_transform(sents, x ->
               CAST(len(list_filter(
                 string_split_regex(x, '[ \t\n\u000B\f\r]+'),
                 w -> w <> '')) AS BIGINT)) AS stoks
           FROM s)
          SELECT doc_id, n_sentences,
            CAST(coalesce(list_sum(stoks), 0) AS BIGINT)
              AS sentence_tokens,
            CAST(coalesce(list_max(stoks), 0) AS BIGINT)
              AS max_sentence_tokens,
            round(CASE WHEN n_sentences > 0
              THEN CAST(list_sum(stoks) AS DOUBLE) /
                CAST(n_sentences AS DOUBLE)
              ELSE 0.0 END, 6) AS avg_sentence_tokens
          FROM t""",

    // Mirrors CorpusStats.collocations: bigram-stream marginals, PMI as
    // one ln of a ratio of exact int64 products (the t11 single-ln
    // discipline), rank over the ROUNDED score (the t10 rule), minCount
    // filter before the joins.
    "t19_collocations" ->
      s"""WITH t AS (SELECT $lowToks AS toks FROM documents),
          bp AS (SELECT unnest(list_transform(range(1, len(toks)),
                   i -> [toks[i], toks[i + 1]])) AS p
                 FROM t WHERE len(toks) >= 2),
          bg AS (SELECT p[1] AS w1, p[2] AS w2 FROM bp),
          n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM bg),
          cc AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
                 FROM bg GROUP BY 1, 2 HAVING count(*) >= 5),
          c1 AS (SELECT w1, CAST(count(*) AS BIGINT) AS c1 FROM bg GROUP BY 1),
          c2 AS (SELECT w2, CAST(count(*) AS BIGINT) AS c2 FROM bg GROUP BY 1),
          s AS (SELECT cc.w1, cc.w2, cc.c12,
                  round(ln(CAST(cc.c12 * n.n AS DOUBLE)
                    / CAST(c1.c1 * c2.c2 AS DOUBLE)), 6) AS pmi
                FROM cc JOIN c1 USING (w1) JOIN c2 USING (w2), n)
          SELECT w1, w2, c12, pmi, CAST(rank AS INT) AS rank
          FROM (SELECT *, row_number() OVER
                  (ORDER BY pmi DESC, w1 ASC, w2 ASC) AS rank FROM s)
          WHERE rank <= 20""",
    // Mirrors CorpusStats.unigramNll: same single ln form
    // ln(T/c) on both sides; avg-of-doubles summation order may drift
    // ulps between engines, absorbed by round 6 (same accepted class as
    // every rounded-double column in this suite).
    "t11_unigram_nll" ->
      s"""WITH t AS (SELECT doc_id, $lowToks AS toks FROM documents),
          tok AS (SELECT doc_id, unnest(toks) AS w FROM t),
          c AS (SELECT w, count(*) AS c FROM tok GROUP BY w),
          tt AS (SELECT CAST(sum(c) AS BIGINT) AS t FROM c),
          sc AS (SELECT doc_id, ln(CAST(tt.t AS DOUBLE) / c.c) AS nll
                 FROM tok JOIN c USING (w), tt),
          st AS (SELECT doc_id, count(*) AS n_tokens, avg(nll) AS a
                 FROM sc GROUP BY doc_id)
          SELECT d.doc_id,
            coalesce(st.n_tokens, 0) AS n_tokens,
            round(coalesce(st.a, 0.0), 6) AS avg_nll
          FROM documents d LEFT JOIN st USING (doc_id)""",
    // Mirrors CorpusStats.bigramNll: 1-based DuckDB list index i/i+1 ==
    // Spark's 0-based __ws[i]/__ws[i+1] over the identical token list;
    // scalar range(1, len) is empty for len <= 1, matching the
    // size >= 2 filter (lateral generate_series can't take a column
    // parameter in DuckDB — the v09 list_transform(range...) idiom
    // can); ln(c1/c12) single-ln form and round-6 avg as in t11.
    "t15_bigram_nll" ->
      s"""WITH t AS (SELECT doc_id, $lowToks AS toks FROM documents),
          bp AS (SELECT doc_id,
                   unnest(list_transform(range(1, len(toks)),
                     i -> [toks[i], toks[i + 1]])) AS p
                 FROM t),
          bg AS (SELECT doc_id, p[1] AS w1, p[2] AS w2 FROM bp),
          c1 AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY w1),
          c12 AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY w1, w2),
          sc AS (SELECT doc_id, ln(CAST(c1.c1 AS DOUBLE) / c12.c12) AS nll
                 FROM bg JOIN c12 USING (w1, w2) JOIN c1 USING (w1)),
          st AS (SELECT doc_id, count(*) AS n_bigrams, avg(nll) AS a
                 FROM sc GROUP BY doc_id)
          SELECT d.doc_id,
            coalesce(st.n_bigrams, 0) AS n_bigrams,
            round(coalesce(st.a, 0.0), 6) AS avg_nll
          FROM documents d LEFT JOIN st USING (doc_id)""",
    // Mirrors CorpusStats.bm25 operation for operation: compound
    // constants written as their EXPRESSIONS ((1.2 + 1.0), (1.0 - 0.75))
    // so both sides evaluate the same operation tree. NOTE the parity
    // guarantee comes from the round-6 contract (t11), NOT from any
    // literal-vs-expression double identity: DuckDB parses 1.2/1.0 as
    // DECIMAL, so its (1.2 + 1.0) is decimal arithmetic whose double
    // conversion may sit 1 ulp from the Scala double chain — round-6
    // absorbs that, and the <=3-term sum order; same left-associated
    // multiply/divide chains.
    "t16_bm25" ->
      s"""WITH t AS (SELECT doc_id, $lowToks AS toks FROM documents),
          d AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS dl FROM t),
          c AS (SELECT count(*) AS n, CAST(sum(dl) AS BIGINT) AS tl FROM d),
          h AS (SELECT doc_id, dl, unnest(toks) AS w FROM d),
          f AS (SELECT doc_id, dl, w, count(*) AS tf FROM h
                WHERE w IN ('hash', 'vector', 'slow') GROUP BY 1, 2, 3),
          g AS (SELECT w, count(*) AS df FROM f GROUP BY w),
          s AS (SELECT f.doc_id,
                  ln((c.n - g.df + 0.5) / (g.df + 0.5) + 1.0)
                    * (f.tf * (1.2 + 1.0))
                    / (f.tf + 1.2 * ((1.0 - 0.75)
                        + 0.75 * f.dl / (CAST(c.tl AS DOUBLE) / c.n))) AS sc
                FROM f JOIN g USING (w), c),
          p AS (SELECT doc_id, count(*) AS n_hit_terms, sum(sc) AS score
                FROM s GROUP BY doc_id)
          SELECT d.doc_id, coalesce(p.n_hit_terms, 0) AS n_hit_terms,
            round(coalesce(p.score, 0.0), 6) AS score
          FROM documents d LEFT JOIN p USING (doc_id)""",
    // Mirrors CorpusStats.invertedIndex: DISTINCT (doc, token) pairs,
    // shard = doc_id mod 4, postings comma-joined ascending (DuckDB
    // string_agg ORDER BY doc_id == Spark array_sort on longs; integer
    // CAST-to-VARCHAR renders identically on both engines).
    "t14_inverted_index" ->
      s"""WITH t AS (SELECT DISTINCT doc_id, unnest($lowToks) AS token
                     FROM documents)
          SELECT token, CAST(doc_id % 4 AS BIGINT) AS shard,
            count(*) AS df_shard,
            string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id ASC)
              AS postings
          FROM t GROUP BY 1, 2""",
    // Mirrors t12: identical planted construction, Java-regex ∩ RE2
    // patterns, same replacement order (emails before IPs).
    "t12_pii" ->
      """WITH p AS (SELECT doc_id,
           text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
                || ' or admin@test.org from 10.0.0.'
                || CAST(doc_id % 256 AS VARCHAR) AS t
         FROM documents)
         SELECT doc_id,
           CAST(len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(t, '\b\d{1,3}(\.\d{1,3}){3}\b')) AS BIGINT) AS n_ips,
           md5(regexp_replace(
             regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             '\b\d{1,3}(\.\d{1,3}){3}\b', '<IP>', 'g')) AS redacted_fp
         FROM p""",

    // Mirrors t21: same token stream (content [a-z]+ runs vs
    // break runs over the explicit whitespace class), same stopword
    // break set, run ids from the same break-prefix-sum window, word
    // degree/frequency over candidate phrases, and the phrase score as
    // an ordered left fold (list_reduce over the wpos-ordered list ==
    // Spark's aggregate fold starting at 0.0 — IEEE 0.0 + x = x, so
    // the chains are identical). Rank orders on the UNROUNDED score.
    "t21_rake_keyphrases" ->
      """WITH ts AS (SELECT doc_id,
             regexp_extract_all(lower(text),
               '[a-z]+|[^a-z \t\n\u000B\f\r]+') AS ts
           FROM documents),
         tp AS (SELECT doc_id, unnest(list_transform(range(1, len(ts)+1),
             i -> struct_pack(pos := i, tok := ts[i]))) AS s FROM ts),
         tk AS (SELECT doc_id, s.pos AS pos, s.tok AS tok,
             ((NOT regexp_full_match(s.tok, '[a-z]+'))
               OR s.tok IN ('the','a','and','of','to','in','is','that','it'))
               AS is_break
           FROM tp),
         runs AS (SELECT doc_id, pos, tok, is_break,
             sum(CASE WHEN is_break THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY pos) AS run_id
           FROM tk),
         ph AS (SELECT doc_id, run_id, list(tok ORDER BY pos) AS words
           FROM runs WHERE NOT is_break GROUP BY doc_id, run_id
           HAVING count(*) <= 4),
         ph2 AS (SELECT doc_id, run_id,
             array_to_string(words, ' ') AS phrase,
             CAST(len(words) AS BIGINT) AS plen, words FROM ph),
         pw AS (SELECT doc_id, run_id, phrase, plen,
             unnest(list_transform(range(1, len(words)+1),
               i -> struct_pack(wpos := i, w := words[i]))) AS ws
           FROM ph2),
         pw2 AS (SELECT doc_id, run_id, phrase, plen,
             ws.wpos AS wpos, ws.w AS w FROM pw),
         wstats AS (SELECT w, CAST(count(*) AS BIGINT) AS freq,
             CAST(sum(plen) AS BIGINT) AS deg FROM pw2 GROUP BY w),
         sw AS (SELECT pw2.doc_id, pw2.run_id, pw2.phrase, pw2.wpos,
             CAST(deg AS DOUBLE) / CAST(freq AS DOUBLE) AS wscore
           FROM pw2 JOIN wstats USING (w)),
         ps AS (SELECT doc_id, run_id, phrase,
             list_reduce(list(wscore ORDER BY wpos),
               (a, b) -> a + b) AS score
           FROM sw GROUP BY doc_id, run_id, phrase),
         pp AS (SELECT doc_id, phrase, max(score) AS score,
             CAST(count(*) AS BIGINT) AS n_occurrences
           FROM ps GROUP BY doc_id, phrase)
         SELECT doc_id, phrase, round(score, 6) AS score,
           n_occurrences, rank
         FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
             ORDER BY score DESC, phrase ASC) AS rank FROM pp)
         WHERE rank <= 3""",

    // Mirrors t20_readability: same [a-z]+ words, same vowel-group
    // syllables floored at 1, same [.!?]+ sentence segments with blanks
    // dropped and a floor of 1. Doubles are CAST — DuckDB parses bare
    // numeric literals as DECIMAL (the t16 lesson) — and the score is
    // built in the identical a − b·x − c·y operation order as the Spark
    // side, then round-6. list_sum of an empty list is NULL → coalesce.
    "t20_readability" ->
      """WITH w AS (SELECT doc_id,
             regexp_extract_all(lower(text), '[a-z]+') AS words,
             greatest(1, len(list_filter(
               regexp_split_to_array(text, '[.!?]+'),
               s -> trim(s) <> ''))) AS n_sentences
           FROM documents),
         c AS (SELECT doc_id,
             CAST(n_sentences AS BIGINT) AS n_sentences,
             CAST(len(words) AS BIGINT) AS n_words,
             CAST(coalesce(list_sum(list_transform(words,
               x -> greatest(1, len(regexp_extract_all(x, '[aeiouy]+'))))),
               0) AS BIGINT) AS n_syllables
           FROM w)
         SELECT doc_id, n_sentences, n_words, n_syllables,
           round(CASE WHEN n_words > 0 THEN
               CAST(206.835 AS DOUBLE)
                 - CAST(1.015 AS DOUBLE) * (CAST(n_words AS DOUBLE)
                   / CAST(n_sentences AS DOUBLE))
                 - CAST(84.6 AS DOUBLE) * (CAST(n_syllables AS DOUBLE)
                   / CAST(n_words AS DOUBLE))
             ELSE 0.0 END, 6) AS flesch
         FROM c"""
  )

}
