package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.WhitespaceRegex

/** Corpus-level text statistics for training-data curation — the signals a
  * quality-filtering pipeline computes before deciding what to keep:
  *
  *  - [[repetitionSignals]] — within-document repetition (top-token
  *    fraction, duplicate-bigram fraction), the Gopher-rules family of
  *    repetitiousness filters;
  *  - [[dupSpanCoverage]] — cross-document duplicated k-gram span
  *    coverage, the "fraction of tokens inside a span that also occurs in
  *    another document" signal behind exact-substring dedup;
  *  - [[topVocab]] / [[oovStats]] — corpus vocabulary building and
  *    per-document out-of-vocabulary rate against it.
  *
  * All are two-level aggregations (per-(doc, term) partial then per-doc),
  * so map-side combine keeps the shuffle narrow; nothing here is
  * per-document quadratic. The reference's wordcount family
  * (/root/reference/test/mr.test.js:165-204 and its
  * distributed analog) is the degenerate single-level case of the same
  * shape.
  */
object CorpusStats {

  /** Lowercased whitespace tokens, empties dropped — the shared tokenizer
    * of the dedup/corpus-stats family (mirrors d05's oracle exactly).
    */
  private def lowerTokens(text: Column): Column =
    filter(split(lower(text), WhitespaceRegex), t => t =!= "")

  /** Consecutive k-grams of `toks` joined by single spaces; empty array
    * when the document has fewer than k tokens (no partial grams).
    */
  private def kgrams(toks: Column, k: Int): Column =
    when(size(toks) >= k,
      transform(sequence(lit(1), size(toks) - lit(k - 1)),
        i => concat_ws(" ", slice(toks, i, lit(k)))))
      .otherwise(array().cast("array<string>"))

  /** Hashed form of [[kgrams]] (same positions, same empty-under-k rule)
    * via the native `kgram_hashes` kernel: downstream shuffles/joins key
    * on 8-byte longs, and no gram string is ever materialized. Gram
    * equality is exact up to xxhash64 collision — the standard
    * fingerprint-dedup trade every hash-keyed gram pipeline makes.
    */
  private def kgramHashes(toks: Column, k: Int): Column =
    graft.expr.nat(graft.expr.SignatureExpressions
      .KGramHashes(graft.expr.toExpr(toks), k))

  /** Within-document repetition signals (the Gopher-rules shape):
    * most-frequent-token share and duplicate-bigram share, exact integers
    * plus rounded ratios.
    *
    * Output: (id, n_tokens, n_uniq_tokens, top_tok_n, top_tok_frac,
    * n_2grams, n_dup_2grams, dup_2gram_frac).
    *
    * Shape: the signals are intrinsically per-document, so this is ONE
    * narrow projection — no explode, no shuffle, no join. All five
    * counters come from a single pass of the native
    * `repetition_stats` kernel (`graft.expr.SigOps.repetitionStats`):
    * exact token counts via a hash map, bigram distinctness via the
    * space-joined pair string — O(n) per row inside whole-stage codegen.
    * (History: an explode→groupBy draft shuffled the whole token stream
    * — 3.8s at sf0.1; a composed higher-order-function draft was
    * shuffle-free but its interpreted-lambda projection intermittently
    * deopt-stormed 10-70x. The kernel is both narrow AND JIT-stable;
    * ExpressionsSpec pins it against the composed form differentially.)
    */
  def repetitionSignals(
      df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val stats = graft.expr.nat(graft.expr.SignatureExpressions
      .RepetitionStats(graft.expr.toExpr(lowerTokens(col(textCol)))))
    // widen BEFORE the per-row kernel so it runs post-exchange; the
    // stats array materializes once (multi-referenced non-cheap alias —
    // CollapseProject keeps the projections separate)
    widen(df.select(col(idCol), col(textCol)))
      .select(col(idCol), stats.as("__s"))
      .select(
        col(idCol),
        col("__s").getItem(0).as("n_tokens"),
        col("__s").getItem(1).as("n_uniq_tokens"),
        col("__s").getItem(2).as("top_tok_n"),
        round(when(col("__s").getItem(0) > 0,
          col("__s").getItem(2).cast("double")
            / col("__s").getItem(0).cast("double"))
          .otherwise(lit(0.0)), 6).as("top_tok_frac"),
        col("__s").getItem(3).as("n_2grams"),
        col("__s").getItem(4).as("n_dup_2grams"),
        round(when(col("__s").getItem(3) > 0,
          col("__s").getItem(4).cast("double")
            / col("__s").getItem(3).cast("double"))
          .otherwise(lit(0.0)), 6).as("dup_2gram_frac"))
  }

  /** Cross-document duplicated-span coverage: for each document, how many
    * token positions sit inside a k-gram that also occurs in at least one
    * OTHER document — the per-doc signal of exact-substring dedup.
    *
    * Output: (id, n_tokens, n_dup_tokens, dup_tok_frac).
    *
    * Shape: one gram-key shuffle to count distinct docs per gram, one
    * co-partitioned join back (same key — no second repartition of the
    * gram stream), then covered positions explode + per-doc distinct.
    * Gram keys stay strings here for oracle parity; at 100 TB the key
    * would be `xxhash64(gram)` (collision odds are what they are for any
    * fingerprint dedup) — same plan, narrower shuffle.
    */
  /** The shared heart of the exact-substring-dedup family: tokenized docs
    * (`__toks`, widened past single-row-group scans — both consumers
    * explode the gram stream map-side) and the DISTINCT (id, ti) token
    * positions covered by a k-gram shared with at least one OTHER doc.
    * [[dupSpanCoverage]] counts these positions; [[removeDupSpans]] drops
    * them — one definition, so the two can never disagree on coverage.
    */
  private def coveredPositions(
      df: DataFrame, textCol: String, idCol: String, k: Int): (DataFrame, DataFrame) = {
    val base = widen(df.select(col(idCol), col(textCol)))
      .select(col(idCol), lowerTokens(col(textCol)).as("__toks"))
    val grams = base.select(col(idCol),
        posexplode(kgramHashes(col("__toks"), k)).as(Seq("p0", "g")))
      .select(col(idCol), (col("p0") + 1).as("p"), col("g"))
    val shared = grams.groupBy("g")
      .agg(count_distinct(col(idCol)).as("n_docs"))
      .filter(col("n_docs") > 1)
      .select("g")
    val covered = grams.join(shared, Seq("g"))
      .select(col(idCol),
        explode(sequence(col("p"), col("p") + lit(k - 1))).as("ti"))
      .distinct()
    (base, covered)
  }

  def dupSpanCoverage(
      df: DataFrame, textCol: String, idCol: String, k: Int): DataFrame = {
    val (base, coveredPos) = coveredPositions(df, textCol, idCol, k)
    val covered = coveredPos
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_dup_tokens"))
    base.select(col(idCol), size(col("__toks")).cast("long").as("n_tokens"))
      .join(covered, Seq(idCol), "left")
      .select(
        col(idCol),
        col("n_tokens"),
        coalesce(col("n_dup_tokens"), lit(0L)).as("n_dup_tokens"),
        round(when(col("n_tokens") > 0,
          coalesce(col("n_dup_tokens"), lit(0L)).cast("double")
            / col("n_tokens").cast("double"))
          .otherwise(lit(0.0)), 6).as("dup_tok_frac"))
  }

  /** Duplicated-span REMOVAL — the cleaning counterpart of
    * [[dupSpanCoverage]]: tokens inside any k-gram that also occurs in
    * another document are dropped, and the remainder re-joins in original
    * order — the exact-substring-dedup transform itself, not just its
    * statistic.
    *
    * Output: (id, n_tokens, n_kept, clean_text) — every input doc
    * appears; fully-duplicated docs keep an empty string.
    *
    * Shape: the [[dupSpanCoverage]] gram pipeline (hash keys, one gram
    * shuffle + join-back) plus a per-doc ordered reassembly: kept
    * (position, token) pairs collect per doc and sort INSIDE the row
    * (array_sort on position-first structs), so the only added wide op
    * is the per-doc groupBy.
    */
  def removeDupSpans(
      df: DataFrame, textCol: String, idCol: String, k: Int): DataFrame = {
    val (base, covered) = coveredPositions(df, textCol, idCol, k)
    val tokPos = base.select(col(idCol),
        posexplode(col("__toks")).as(Seq("p0", "tk")))
      .select(col(idCol), (col("p0") + 1).as("ti"), col("tk"))
    val kept = tokPos.join(covered, Seq(idCol, "ti"), "left_anti")
    val clean = kept.groupBy(col(idCol)).agg(
      count(lit(1)).as("n_kept"),
      array_join(
        transform(array_sort(collect_list(struct(col("ti"), col("tk")))),
          s => s("tk")), " ").as("clean_text"))
    base.select(col(idCol), size(col("__toks")).cast("long").as("n_tokens"))
      .join(clean, Seq(idCol), "left")
      .select(
        col(idCol),
        col("n_tokens"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  /** Benchmark-decontamination check: for each eval document, how many of
    * its DISTINCT k-grams appear anywhere in the train corpus — the
    * train/test-overlap signal run before an eval set is trusted.
    *
    * Output: (id, n_grams, n_contaminated, contamination_frac), one row
    * per eval document (including gram-less ones).
    *
    * Shape: the eval side is the SMALL side by construction (eval sets
    * are thousands of docs; train is the 100 TB corpus), so its distinct
    * gram set BROADCASTS, and the train gram stream is filtered by a
    * broadcast semi-join BEFORE any wide operator: grams that cannot
    * contaminate anything never reach an exchange. The only train-side
    * shuffle is the distinct over surviving grams — bounded by
    * |eval gram set|, not by the corpus. (An earlier draft collapsed the
    * FULL train gram stream to a distinct set first: one giant shuffle
    * whose volume scales with the corpus — exactly backwards.)
    */
  def contamination(
      train: DataFrame, eval: DataFrame,
      textCol: String, idCol: String, k: Int): DataFrame = {
    def grams(df: DataFrame, cols: Column*): DataFrame =
      df.select(cols :+
        explode(array_distinct(kgramHashes(lowerTokens(col(textCol)), k))).as("g"): _*)
    val evalG = grams(eval, col(idCol))
    val evalGrams = evalG.select("g").distinct()
    val hits = grams(widen(train))
      .join(broadcast(evalGrams), Seq("g"), "leftsemi")
      .distinct()
      .withColumn("__hit", lit(1))
    val stats = evalG.join(broadcast(hits), Seq("g"), "left")
      .groupBy(col(idCol)).agg(
        count(lit(1)).as("n_grams"),
        sum(when(col("__hit").isNotNull, 1L).otherwise(0L))
          .as("n_contaminated"))
    eval.select(col(idCol))
      .join(stats, Seq(idCol), "left")
      .select(
        col(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"),
        round(when(coalesce(col("n_grams"), lit(0L)) > 0,
          col("n_contaminated").cast("double") / col("n_grams").cast("double"))
          .otherwise(lit(0.0)), 6).as("contamination_frac"))
  }

  /** Fixed-size token-window chunking — the context-window packing pass
    * that turns variable-length documents into training-sized pieces.
    * Each document's token stream is cut into consecutive windows of
    * `chunkSize` tokens (last window ragged); empty documents produce no
    * chunks.
    *
    * Output: (id, chunk_idx 1-based, n_tokens, fp) where fp = md5 of the
    * space-rejoined chunk — the chunk's content address (same fingerprint
    * family as [[graft.functions.TextFunctions.fingerprint]]), which is
    * what a downstream pack/shuffle stage keys on.
    *
    * Shape: one narrow projection + explode per document — no shuffle at
    * all; chunk count per doc is ⌈n/chunkSize⌉ so output volume ≈ input
    * token volume. Embarrassingly parallel at any scale.
    */
  /** Per-document k-gram NOVELTY against everything earlier (by id) in
    * the corpus: the fraction of a doc's distinct k-grams whose FIRST
    * corpus occurrence is the doc itself. The saturation readout a
    * curation loop watches — novelty decaying toward 0 as a source is
    * ingested means additional docs stop contributing new content, the
    * aggregate view of what [[dupSpanCoverage]] measures pairwise.
    *
    * Output: (id, n_grams, n_novel, novelty) for every doc with ≥ k
    * tokens; novelty is the RAW IEEE division of the two exact integers
    * (correctly rounded in every engine — the d03 jaccard discipline).
    *
    * Shape: one gram-hash explode (8-byte keys, the [[dupSpanCoverage]]
    * discipline — no gram string ever rides a shuffle), one gram-keyed
    * partial-aggregated min(id), one join-back, one per-doc groupBy.
    * First-occurrence is a pure min — no sort, no window, no iteration;
    * a boilerplate gram's postings collapse map-side to one (gram,
    * min_id) row per partition.
    */
  def ngramNovelty(
      df: DataFrame, textCol: String, idCol: String, k: Int): DataFrame = {
    val grams = df
      .select(col(idCol).as("id"),
        explode(array_distinct(kgramHashes(lowerTokens(col(textCol)), k)))
          .as("g"))
    val first = grams.groupBy(col("g")).agg(min(col("id")).as("__first"))
    grams.join(first, Seq("g"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("__first") === col("id"), 1L).otherwise(0L))
          .as("n_novel"))
      .withColumn("novelty",
        col("n_novel").cast("double") / col("n_grams").cast("double"))
      .select(col("id").as(idCol), col("n_grams"), col("n_novel"),
        col("novelty"))
  }

  def chunkByTokens(
      df: DataFrame, textCol: String, idCol: String, chunkSize: Int): DataFrame = {
    val toks = lowerTokens(col(textCol))
    val nChunks = floor((size(col("__toks")) + lit(chunkSize - 1))
      / lit(chunkSize)).cast("int")
    // sequence(1, 0) would count DOWN — guard the empty-document case
    val chunks = when(size(col("__toks")) > 0,
      transform(sequence(lit(1), nChunks),
        i => slice(col("__toks"), (i - 1) * chunkSize + 1, lit(chunkSize))))
      .otherwise(array().cast("array<array<string>>"))
    widen(df.select(col(idCol), col(textCol)))
      .select(col(idCol), toks.as("__toks"))
      .select(col(idCol), posexplode(chunks).as(Seq("__p", "__chunk")))
      .select(col(idCol), (col("__p") + 1).as("chunk_idx"),
        size(col("__chunk")).cast("long").as("n_tokens"),
        md5(concat_ws(" ", col("__chunk")).cast("binary")).as("fp"))
  }

  /** Top-`v` corpus vocabulary by occurrence count, ties broken
    * lexicographically — the deterministic vocab-building pass. The
    * result is tiny by construction (v rows), so downstream joins against
    * it broadcast.
    */
  def topVocab(df: DataFrame, textCol: String, v: Int): DataFrame =
    widen(df.select(col(textCol)))
      .select(explode(lowerTokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w").asc)
      .limit(v)

  /** Per-document out-of-vocabulary stats against [[topVocab]](v).
    *
    * Output: (id, n_tokens, n_oov, oov_frac). The vocab side is v rows —
    * explicitly broadcast, so the corpus-side token stream never
    * shuffles for the membership test; the only wide ops are the two
    * aggregations.
    */
  def oovStats(
      df: DataFrame, textCol: String, idCol: String, v: Int): DataFrame = {
    val vocab = topVocab(df, textCol, v).select(col("w"), lit(1).as("__iv"))
    val tok = widen(df.select(col(idCol), col(textCol)))
      .select(col(idCol), explode(lowerTokens(col(textCol))).as("w"))
    val flagged = tok.join(broadcast(vocab), Seq("w"), "left")
    val stats = flagged.groupBy(col(idCol)).agg(
      count(lit(1)).as("n_tokens"),
      sum(when(col("__iv").isNull, 1L).otherwise(0L)).as("n_oov"))
    df.select(col(idCol))
      .join(stats, Seq(idCol), "left")
      .select(
        col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_oov"), lit(0L)).as("n_oov"),
        round(when(coalesce(col("n_tokens"), lit(0L)) > 0,
          col("n_oov").cast("double") / col("n_tokens").cast("double"))
          .otherwise(lit(0.0)), 6).as("oov_frac"))
  }

  /** Per-document unigram language-model score — the CCNet-style "does
    * this look like the corpus" quality signal: each token costs
    * nll(w) = ln(T / c_w) (corpus-total tokens over the token's corpus
    * count — the unigram MLE, no smoothing needed since every scored
    * token exists in the corpus it was counted from), and a document's
    * score is its mean token cost. Low = stereotypical corpus text;
    * high = rare-token-heavy (or junk) text.
    *
    * Output: (id, n_tokens, round(avg_nll, 6)); token-less documents
    * score 0.
    *
    * Shape: identical to [[tfidfTopTerms]] — token-count aggregation,
    * count join-back (broadcast under the threshold, term-hash join
    * beyond it), per-doc aggregate; the corpus total rides a 1-row
    * broadcast. Nothing collects to the driver.
    */
  def unigramNll(
      df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val tok = widen(df.select(col(idCol), col(textCol)))
      .select(col(idCol), explode(lowerTokens(col(textCol))).as("w"))
    val counts = tok.groupBy(col("w")).agg(count(lit(1)).as("__c"))
    val total = counts.agg(sum(col("__c")).as("__t"))
    val scored = tok.join(counts, Seq("w"))
      .crossJoin(broadcast(total))
      .withColumn("__nll", log(col("__t").cast("double") / col("__c")))
    val stats = scored.groupBy(col(idCol)).agg(
      count(lit(1)).as("n_tokens"),
      avg(col("__nll")).as("__avg"))
    df.select(col(idCol))
      .join(stats, Seq(idCol), "left")
      .select(
        col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        round(coalesce(col("__avg"), lit(0.0)), 6).as("avg_nll"))
  }

  /** Bigram conditional-NLL score per document — the next-order CCNet
    * quality signal above [[unigramNll]]: mean −ln P(w₂|w₁) under the
    * corpus bigram MLE (P = c(w₁,w₂)/c(w₁·), both counts over bigram
    * positions). Low = phrasing typical of the corpus; high = unusual
    * word TRANSITIONS, which catches shuffled/garbled text a unigram
    * model scores as perfectly normal.
    *
    * Shape: bigrams explode once; the count join-backs are keyed on
    * (w₁,w₂) then w₁ — plain shuffle joins, because at corpus scale the
    * bigram vocabulary is far past any broadcast budget (the t08/t10
    * size-gate reasoning, permanently on the shuffle side); the per-doc
    * aggregate is the third and final exchange. Nothing collects.
    *
    * Documents with fewer than 2 tokens carry 0 bigrams and score 0 —
    * the explicit size filter also keeps Spark's `sequence` from
    * generating a DESCENDING index range on short docs (sequence(0,-1)
    * is [0,-1], not empty).
    */
  def bigramNll(
      df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val tok = widen(df.select(col(idCol), col(textCol)))
      .select(col(idCol), lowerTokens(col(textCol)).as("__ws"))
    val big = tok
      .filter(size(col("__ws")) >= 2)
      .select(col(idCol), explode(expr(
        "transform(sequence(0, size(__ws) - 2), i -> struct(__ws[i] AS w1, __ws[i + 1] AS w2))"))
        .as("__bg"))
      .select(col(idCol), col("__bg.w1").as("w1"), col("__bg.w2").as("w2"))
    val ctx = big.groupBy(col("w1")).agg(count(lit(1)).as("__c1"))
    val bic = big.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("__c12"))
    val scored = big
      .join(bic, Seq("w1", "w2"))
      .join(ctx, Seq("w1"))
      .withColumn("__nll", log(col("__c1").cast("double") / col("__c12")))
    val stats = scored.groupBy(col(idCol)).agg(
      count(lit(1)).as("n_bigrams"),
      avg(col("__nll")).as("__avg"))
    df.select(col(idCol))
      .join(stats, Seq(idCol), "left")
      .select(
        col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        round(coalesce(col("__avg"), lit(0.0)), 6).as("avg_nll"))
  }

  /** Okapi BM25 relevance of every document to a fixed term set — the
    * standard retrieval scorer (the t10 TF-IDF machinery with document-
    * length normalization and saturating TF), the ranking half of a
    * RAG-corpus curation pass: score docs against a topic probe, keep or
    * re-weight by relevance.
    *
    * score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)),
    * idf(t) = ln((N − df + 0.5)/(df + 0.5) + 1) — the Lucene form,
    * positive for every df.
    *
    * Shape: doc length is a NARROW size() over the token array (never an
    * explode-regroup); only query-term hits explode, so the exchanged
    * stream is |Q|-bounded per doc; (N, avgdl, df) ride 1-row/|Q|-row
    * broadcasts. Scores are a ≤|Q|-term double sum — round-6 absorbs
    * summation-order ulps (the t11 contract).
    *
    * Output: (idCol, n_hit_terms, score).
    */
  /** Per-document lexical diversity: token count, type (distinct-token)
    * count, type-token ratio, and hapax count (types occurring exactly
    * once in the doc) — the cheap repetitiveness/quality signals a corpus
    * audit runs next to the Gopher rules (t07). A low TTR or hapax share
    * flags boilerplate and template spam that per-line repetition (t07's
    * dup-line ratios) can miss.
    *
    * Shape: explode → (doc, token) count → per-doc aggregate. Both
    * aggregations are keyed by doc (the explode fan-out is |tokens| and
    * partially aggregated before its shuffle); nothing is corpus-global,
    * so the op scales with the token stream like t01. TTR is a single
    * int/int IEEE division (bit-portable), rounded 6 by the t11 contract.
    *
    * Output: (idCol, n_tokens, n_types, hapax_count, ttr); empty/no-token
    * docs report zeros.
    */
  def lexicalDiversity(
      df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val toks = widen(df.select(col(idCol), col(textCol)))
      .select(col(idCol), explode(lowerTokens(col(textCol))).as("w"))
    val perType = toks.groupBy(col(idCol), col("w"))
      .agg(count(lit(1)).as("__c"))
    val perDoc = perType.groupBy(col(idCol)).agg(
      sum(col("__c")).as("n_tokens"),
      count(lit(1)).as("n_types"),
      sum(when(col("__c") === 1, 1L).otherwise(0L)).as("hapax_count"))
    df.select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_types"), lit(0L)).as("n_types"),
        coalesce(col("hapax_count"), lit(0L)).as("hapax_count"),
        round(when(coalesce(col("n_tokens"), lit(0L)) === 0, 0.0)
          .otherwise(col("n_types").cast("double") /
            col("n_tokens").cast("double")), 6).as("ttr"))
  }

  /** Per-document SENTENCE segmentation stats: segments split on
    * terminator runs (`[.!?]+`), whitespace-only segments dropped, each
    * surviving sentence measured in whitespace tokens — the
    * run-on / telegraphic-style quality signal (mean words-per-sentence
    * is a Gopher-family filter input alongside [[repetitionSignals]]).
    *
    * Scale shape: ONE narrow scan — the per-sentence token counts fold
    * inside the row via array kernels (split / filter / transform /
    * aggregate), so no explode, no shuffle, and codegen keeps the whole
    * row pass fused. Counts are exact int64; the mean is one round-6
    * division.
    *
    * Output: (id, n_sentences, sentence_tokens, max_sentence_tokens,
    * avg_sentence_tokens).
    */
  def sentenceStats(
      df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val sents = filter(split(col(textCol), "[.!?]+"),
      s => regexp_replace(s, WhitespaceRegex, "") =!= "")
    val stoks = transform(sents,
      s => size(filter(split(s, WhitespaceRegex), t => t =!= ""))
        .cast("long"))
    widen(df.select(col(idCol), col(textCol)))
      .select(col(idCol),
        size(sents).cast("long").as("n_sentences"),
        aggregate(stoks, lit(0L), (a, x) => a + x).as("sentence_tokens"),
        coalesce(array_max(stoks), lit(0L)).as("max_sentence_tokens"))
      .withColumn("avg_sentence_tokens",
        round(when(col("n_sentences") === 0L, 0.0)
          .otherwise(col("sentence_tokens").cast("double") /
            col("n_sentences").cast("double")), 6))
  }

  /** Extractive SUMMARY scoring: per document, the most salient sentence
    * by mean token IDF — the summarization/centrality primitive of a
    * curation pipeline (pick the sentence that carries the document's
    * least-generic vocabulary). Sentences by the [[sentenceStats]]
    * terminator-run rule (blank segments dropped, position preserved);
    * IDF = round-6 of ln((N+1)/(df+1)) joined vocab-keyed; per-sentence
    * mean over exact DECIMAL term sums (the t11 discipline); winner by
    * (salience DESC, position ASC) — fully engine-portable. The doc
    * total N rides a 1-row broadcast into the vocab-sized IDF frame
    * (t16 discipline, NLJ-allowlisted).
    *
    * Output: (doc_id, best_sentence, n_tokens, salience); documents with
    * zero non-blank sentences emit nothing.
    */
  def extractiveSummary(
      df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val base = widen(df.select(col(idCol).as("__id"),
      lower(col(textCol)).as("__t")))
    val sents = base.select(col("__id"),
      posexplode(filter(split(col("__t"), "[.!?]+"),
        s => regexp_replace(s, WhitespaceRegex, "") =!= "")))
      .select(col("__id"), col("pos").as("sidx"), col("col").as("__s"))
    val stoks = sents.select(col("__id"), col("sidx"),
      explode(filter(split(col("__s"), WhitespaceRegex),
        t => t =!= "")).as("w"))
    val dfreq = stoks.select(col("__id"), col("w")).distinct()
      .groupBy(col("w")).agg(count(lit(1)).as("__df"))
    val n = base.agg(count(lit(1)).as("__N"))
    val idf = dfreq.crossJoin(broadcast(n))
      .select(col("w"),
        round(log((col("__N").cast("double") + 1.0) /
          (col("__df").cast("double") + 1.0)), 6)
          .cast(org.apache.spark.sql.types.DataTypes
            .createDecimalType(18, 6)).as("__idf"))
    val scored = stoks.join(idf, Seq("w"))
      .groupBy(col("__id"), col("sidx"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("__idf")).cast(org.apache.spark.sql.types.DataTypes
          .createDecimalType(38, 6)).as("__sum"))
      .withColumn("salience",
        round(col("__sum").cast("double") /
          col("n_tokens").cast("double"), 6))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__id"))
      .orderBy(col("salience").desc, col("sidx").asc)
    scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("__id").as("doc_id"), col("sidx").as("best_sentence"),
        col("n_tokens"), col("salience"))
  }

  def bm25(
      df: DataFrame, textCol: String, idCol: String,
      queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "bm25 needs at least one query term")
    val docs = widen(df.select(col(idCol), col(textCol)))
      .select(col(idCol), lowerTokens(col(textCol)).as("__ws"))
      .select(col(idCol), col("__ws"), size(col("__ws")).cast("long").as("__dl"))
    val corpus = docs.agg(
      count(lit(1)).as("__n"),
      sum(col("__dl")).as("__tl"))
    val hits = docs
      .select(col(idCol), col("__dl"), explode(col("__ws")).as("w"))
      .filter(col("w").isin(queryTerms: _*))
    val tf = hits.groupBy(col(idCol), col("__dl"), col("w"))
      .agg(count(lit(1)).as("__tf"))
    val dft = tf.groupBy(col("w")).agg(count(lit(1)).as("__df"))
    val scored = tf
      .join(broadcast(dft), Seq("w"))
      .crossJoin(broadcast(corpus))
      .withColumn("__idf",
        log((col("__n") - col("__df") + 0.5) / (col("__df") + 0.5) + 1.0))
      .withColumn("__avgdl", col("__tl").cast("double") / col("__n"))
      .withColumn("__s",
        col("__idf") * (col("__tf") * (k1 + 1.0)) /
          (col("__tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("__dl") / col("__avgdl"))))
    val perDoc = scored.groupBy(col(idCol)).agg(
      count(lit(1)).as("n_hit_terms"),
      sum(col("__s")).as("__score"))
    df.select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_hit_terms"), lit(0L)).as("n_hit_terms"),
        round(coalesce(col("__score"), lit(0.0)), 6).as("score"))
  }

  /** Document-sharded inverted index: token → per-shard posting segment.
    *
    * The classic MR "build the index" workload (the reference's wordcount
    * family generalized from counts to posting lists), laid out the way a
    * distributed index actually ships: postings are partitioned by
    * DOCUMENT shard (`doc_id mod nShards`, the Lucene/Elasticsearch
    * document-routing shape), so one token's postings live in ≤ nShards
    * bounded segments instead of one unbounded row. A stopword that hits
    * every document of a 100 TB corpus would otherwise produce a single
    * multi-GB posting cell on one task; here its per-segment size is
    * capped by the shard's document count, build parallelism for that
    * token is nShards-way, and a term lookup reads nShards rows and
    * concatenates (segments are disjoint by construction, each internally
    * sorted). Build cost: one explode + distinct + one (token, shard)
    * keyed aggregation — partial-agg combines duplicate (doc, token)
    * pairs map-side before either exchange.
    *
    * Output: (token, shard, df_shard, postings) — df_shard = exact
    * per-shard document frequency (global df = sum over shards);
    * postings = comma-joined doc_ids ascending.
    */
  def invertedIndex(
      df: DataFrame, textCol: String, idCol: String,
      nShards: Int): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    widen(df.select(col(idCol), col(textCol)))
      .select(col(idCol).cast("long").as("__id"),
        explode(lowerTokens(col(textCol))).as("token"))
      .distinct()
      .groupBy(col("token"), pmod(col("__id"), lit(nShards.toLong)).as("shard"))
      .agg(
        count(lit(1)).as("df_shard"),
        array_join(
          transform(array_sort(collect_list(col("__id"))),
            i => i.cast("string")), ",").as("postings"))
  }

  /** Top-`m` TF-IDF terms per document (score DESC, term ASC tie-break) —
    * the per-document salient-term extraction used for topic tagging and
    * domain labeling of a corpus. idf = ln(N / df) with N = total corpus
    * document count and df = documents containing the term; score =
    * tf · idf rounded to 6 (rank and display use the SAME rounded value,
    * so engine-to-engine ulp drift in ln cannot reorder ties).
    *
    * Output: (id, term, score, rank), rank ≤ m.
    *
    * Shape: per-(doc, term) tf and per-term df aggregations, then a term
    * equi-join — Catalyst broadcasts the df side while the vocabulary
    * fits the threshold (the dev-scale plan, zero extra exchange) and
    * falls back to a term-hash join co-partitioned with the df aggregate
    * beyond it. The corpus count rides a 1-row broadcast; the per-doc
    * top-m window shuffles by doc id. Nothing is quadratic; vocabulary-
    * sized frames never collect to the driver.
    */
  def tfidfTopTerms(
      df: DataFrame, textCol: String, idCol: String, m: Int): DataFrame = {
    val tok = widen(df.select(col(idCol), col(textCol)))
      .select(col(idCol), explode(lowerTokens(col(textCol))).as("term"))
    val tf = tok.groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("__tf"))
    val dfreq = tf.groupBy(col("term"))
      .agg(count(lit(1)).as("__df"))
    val n = df.agg(count(lit(1)).as("__n"))
    val scored = tf.join(dfreq, Seq("term"))
      .crossJoin(broadcast(n))
      .withColumn("score",
        round(col("__tf") * log(col("__n").cast("double") / col("__df")), 6))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("score").desc, col("term").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= m)
      .select(col(idCol), col("term"), col("score"), col("rank"))
  }

  /** Corpus-level collocation mining: top-`k` bigrams by pointwise
    * mutual information among bigrams occurring ≥ `minCount` times —
    * the multi-word-expression detector (phrase vocab candidates,
    * tokenizer-merge seeds) over the t15 bigram stream. All marginals
    * come from the bigram stream itself (P(w₁,·), P(·,w₂), N = bigram
    * count), so PMI = ln(c₁₂·N / (c₁·c₂)) is one IEEE division of two
    * exact int64 products and one ln — the t11 single-ln portability
    * discipline; the top-k orders by the ROUNDED score (t10's rule:
    * ulp drift cannot flip ranks).
    *
    * Scale: two partially-aggregated counts on the bigram stream, two
    * co-partitioned join-backs keyed w₁/w₂ (the t15 shape — a bigram
    * vocabulary is assumed past broadcast budget), N on a 1-row
    * broadcast, and the global top-k is `orderBy.limit` —
    * TakeOrderedAndProject, never a full sort. The minCount filter
    * drops the hapax-bigram tail BEFORE the join-backs.
    *
    * Output: (w1, w2, c12, pmi, rank).
    */
  def collocations(df: DataFrame, textCol: String, idCol: String,
      k: Int = 20, minCount: Int = 5): DataFrame = {
    val big = widen(df.select(col(idCol), col(textCol)))
      .select(lowerTokens(col(textCol)).as("__ws"))
      .filter(size(col("__ws")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(__ws) - 2), i -> struct(__ws[i] AS w1, __ws[i + 1] AS w2))"))
        .as("__bg"))
      .select(col("__bg.w1").as("w1"), col("__bg.w2").as("w2"))
    val c12 = big.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c12"))
      .filter(col("c12") >= minCount)
    val c1 = big.groupBy(col("w1")).agg(count(lit(1)).as("__c1"))
    val c2 = big.groupBy(col("w2")).agg(count(lit(1)).as("__c2"))
    val n = big.agg(count(lit(1)).as("__n"))
    val scored = c12
      .join(c1, Seq("w1"))
      .join(c2, Seq("w2"))
      .crossJoin(broadcast(n))
      .withColumn("pmi", round(log(
        (col("c12") * col("__n")).cast("double")
          / (col("__c1") * col("__c2")).cast("double")), 6))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("pmi").desc, col("w1").asc, col("w2").asc)
    scored
      .orderBy(col("pmi").desc, col("w1").asc, col("w2").asc).limit(k)
      .withColumn("rank", row_number().over(w))
      .select(col("w1"), col("w2"), col("c12"), col("pmi"), col("rank"))
  }

  /** RAKE keyphrase extraction (Rose et al. 2010, "Automatic Keyword
    * Extraction from Individual Documents"): candidate phrases are
    * maximal runs of content words between breaks (stopwords,
    * punctuation/digit tokens), each word scores degree/frequency over
    * the candidate-phrase co-occurrence graph (degree = Σ lengths of
    * phrases containing it, frequency = its occurrence count), and a
    * phrase scores the sum of its words' scores. Output: top `topK`
    * phrases per document with occurrence counts.
    *
    * Determinism contract: word scores are exact-int divisions; the
    * phrase score sums them in WORD-POSITION ORDER via an ordered-list
    * fold (a groupBy sum would be partition-order-dependent in the last
    * ulp), so the doubles — and therefore the rank order, tie-broken on
    * phrase — hash-match the oracle bit for bit.
    *
    * Scale shape: one token explode (linear in corpus tokens, the
    * t10/t14 family), per-DOC windows for run grouping (doc-bounded
    * tasks), one word-keyed shuffle for the degree/frequency table and
    * one word-keyed join back — per-word state is two longs, phrase
    * folds are ≤ `maxPhraseLen` elements. No global sort anywhere; the
    * only windows are doc- and doc-phrase-partitioned.
    */
  def rakeKeyphrases(df: DataFrame, textCol: String, idCol: String,
      maxPhraseLen: Int = 4, topK: Int = 3): DataFrame = {
    val stops = graft.functions.TextFunctions.stopwords.toMap.apply("en")
    // token stream keeps punctuation/digit runs — they are phrase breaks
    val toks = widen(df.select(col(idCol), col(textCol)))
      .select(col(idCol).as("doc_id"),
        posexplode(regexp_extract_all(lower(col(textCol)),
          lit("[a-z]+|[^a-z \\t\\n\\u000B\\f\\r]+"), lit(0)))
          .as(Seq("pos", "tok")))
      .withColumn("is_break",
        !col("tok").rlike("^[a-z]+$") || col("tok").isin(stops: _*))
    val wDoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos").asc)
    val runs = toks
      .withColumn("run_id", sum(col("is_break").cast("long")).over(wDoc))
      .filter(!col("is_break"))
    val phrases = runs.groupBy(col("doc_id"), col("run_id"))
      .agg(transform(sort_array(collect_list(struct(col("pos"), col("tok")))),
        s => s("tok")).as("words"))
      .filter(size(col("words")) <= maxPhraseLen)
      .withColumn("phrase", concat_ws(" ", col("words")))
    val pw = phrases.select(col("doc_id"), col("run_id"), col("phrase"),
      size(col("words")).cast("long").as("plen"),
      posexplode(col("words")).as(Seq("wpos", "w")))
    val wstats = pw.groupBy(col("w")).agg(
      count(lit(1)).as("__freq"), sum(col("plen")).as("__deg"))
    val scored = pw.join(wstats, Seq("w"))
      .withColumn("__wscore",
        col("__deg").cast("double") / col("__freq").cast("double"))
      .groupBy(col("doc_id"), col("run_id"), col("phrase"))
      .agg(sort_array(collect_list(struct(col("wpos"), col("__wscore"))))
        .as("__ws"))
      .withColumn("score",
        aggregate(col("__ws"), lit(0.0), (a, s) => a + s("__wscore")))
    // same phrase, same words ⇒ identical score: max is a dedup, not a pick
    val perPhrase = scored.groupBy(col("doc_id"), col("phrase"))
      .agg(max(col("score")).as("__score"),
        count(lit(1)).as("n_occurrences"))
    val wRank = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
      .orderBy(col("__score").desc, col("phrase").asc)
    perPhrase.withColumn("rank", row_number().over(wRank))
      .filter(col("rank") <= topK)
      .select(col("doc_id"), col("phrase"),
        round(col("__score"), 6).as("score"), col("n_occurrences"),
        col("rank"))
  }

  /** Zipf's-law fit: least-squares slope/intercept of ln(freq) against
    * ln(rank) over the top `maxRank` word frequencies — the classic
    * corpus-health scalar (natural language sits near slope −1; heavily
    * templated or deduplicated-to-death corpora drift off it).
    *
    * Scale shape: one token scan to a partially-aggregated word-count
    * table, then the top-`maxRank` cut via orderBy+limit (per-partition
    * top-K + a `maxRank`-row driver merge — TakeOrderedAndProject,
    * never a global sort), so the ranked set entering the window is
    * `maxRank` rows at ANY vocabulary size. The regression runs over
    * those ≤`maxRank` (ln r, ln f) points via the closed normal-
    * equation form; cross-row double sums land in the t11 accepted
    * class (ulp drift absorbed by round-6).
    *
    * Output: one row (n_ranks, slope, intercept).
    */
  /** Word BURSTINESS (Church & Gale): per word above a collection-
    * frequency floor — cf (total occurrences), df (documents containing
    * it), the within-document rate cf/df, and observed df against the
    * Poisson expectation D·(1−e^(−cf/D)). A ratio < 1 says the word
    * "bursts" into few documents (topical/named content); ≈ 1 says it
    * spreads uniformly (function words) — the corpus-linguistics signal
    * behind TF-IDF's df term, exposed as its own audit.
    *
    * Scale shape: two partial-agg'd shuffles — (word, doc) counts, then
    * the word rollup (both bounded by vocabulary, never corpus text);
    * the document total D rides a 1-row broadcast (the t16 discipline).
    * The Poisson term is one libm exp inside a fixed parenthesization,
    * closed round-6 (the t20 chain contract).
    */
  def wordBurstiness(
      df: DataFrame, idCol: String, textCol: String,
      minCf: Long = 50L): DataFrame = {
    val wd = widen(df.select(col(idCol), col(textCol)))
      .select(col(idCol).as("__d"),
        explode(lowerTokens(col(textCol))).as("w"))
      .groupBy(col("w"), col("__d")).agg(count(lit(1)).as("__c"))
    val byWord = wd.groupBy(col("w"))
      .agg(sum(col("__c")).as("cf"), count(lit(1)).as("df"))
      .filter(col("cf") >= minCf)
    val total = df.agg(count(lit(1)).as("__D"))
    byWord.crossJoin(broadcast(total))
      .select(col("w").as("word"), col("cf"), col("df"),
        round(col("cf").cast("double") / col("df").cast("double"), 6)
          .as("rate_in_docs"),
        round(col("df").cast("double") /
          (col("__D").cast("double") *
            (lit(1.0) - exp(-col("cf").cast("double") /
              col("__D").cast("double")))), 6)
          .as("df_vs_poisson"))
  }

  /** Distributional STYLE similarity between corpus slices: cosine
    * between per-group word-count vectors — the provenance signal
    * ("these two sources are the same crawl re-labeled") that catches
    * what exact/near dedup can't: re-templated or shuffled content with
    * the same vocabulary profile. Never a dense matrix: Σ cₐ·c_b rides
    * a vocab-keyed equi-join of the two count streams (a word appearing
    * in both groups meets exactly once), norms are per-group integer
    * sums, and the closing chain is two libm sqrt + one division,
    * round-6. Counts and products stay integer-exact end to end.
    */
  def sourceStyleCosine(
      df: DataFrame, groupCol: String, textCol: String): DataFrame = {
    val wc = widen(df.select(col(groupCol), col(textCol)))
      .select(col(groupCol).as("g"),
        explode(lowerTokens(col(textCol))).as("w"))
      .groupBy(col("g"), col("w")).agg(count(lit(1)).as("c"))
    val norms = wc.groupBy(col("g"))
      .agg(sum(col("c") * col("c")).as("__ss"))
    val dots = wc.select(col("g").as("source_a"), col("w"),
        col("c").as("__ca"))
      .join(wc.select(col("g").as("source_b"), col("w"),
        col("c").as("__cb")), Seq("w"))
      .filter(col("source_a") < col("source_b"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(sum(col("__ca") * col("__cb")).as("dot"))
    dots
      .join(norms.select(col("g").as("source_a"), col("__ss").as("__sa")),
        Seq("source_a"))
      .join(norms.select(col("g").as("source_b"), col("__ss").as("__sb")),
        Seq("source_b"))
      .select(col("source_a"), col("source_b"), col("dot"),
        round(col("dot").cast("double") /
          (sqrt(col("__sa").cast("double")) *
            sqrt(col("__sb").cast("double"))), 6).as("style_cosine"))
  }

  def zipfSlope(
      df: DataFrame, textCol: String, maxRank: Int = 200): DataFrame = {
    require(maxRank >= 2, s"maxRank must be >= 2, got $maxRank")
    val counts = widen(df.select(col(textCol)))
      .select(explode(lowerTokens(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("__c"))
      .orderBy(col("__c").desc, col("w").asc)
      .limit(maxRank)
    val wRank = org.apache.spark.sql.expressions.Window
      .orderBy(col("__c").desc, col("w").asc)
    val pts = counts
      .withColumn("__r", row_number().over(wRank).cast("long"))
      .select(log(col("__r").cast("double")).as("__x"),
        log(col("__c").cast("double")).as("__y"))
    val n = col("__n").cast("double")
    val slope = (n * col("__sxy") - col("__sx") * col("__sy")) /
      (n * col("__sxx") - col("__sx") * col("__sx"))
    pts
      .agg(count(lit(1)).as("__n"), sum(col("__x")).as("__sx"),
        sum(col("__y")).as("__sy"),
        sum(col("__x") * col("__y")).as("__sxy"),
        sum(col("__x") * col("__x")).as("__sxx"))
      .select(col("__n").as("n_ranks"),
        round(slope, 6).as("slope"),
        round((col("__sy") - slope * col("__sx")) / n, 6).as("intercept"))
  }

  /** Heaps'-law vocabulary-growth curve: distinct-BIGRAM vocabulary and
    * total bigram count at power-of-two corpus-size checkpoints — the
    * saturation readout that says whether doubling a source still buys
    * new content (the aggregate companion to [[ngramNovelty]]'s per-doc
    * fractions). Bigrams because this corpus's unigram vocabulary
    * saturates within the first handful of docs.
    *
    * The scalable trick: no checkpoint is ever materialized as a prefix
    * scan. A bigram first seen in doc f enters the vocabulary at the
    * smallest checkpoint 2^⌈log₂(f+1)⌉, so vocab(c) is a running sum
    * over a ≤log₂(N)-row bucket aggregate — one (gram → min doc)
    * aggregation, one bucket rollup, one tiny cumsum window; the corpus
    * is scanned once regardless of how many checkpoints exist. Bigrams
    * ride the shuffle as 8-byte xxhash64 keys (the d07/t22 hash-vs-
    * string equivalence); the bucket index comes from the INTEGER bit
    * length of the doc id (no float log2 edge hazards at exact powers).
    *
    * Requires non-negative ids where id d means "the (d+1)-th document"
    * (the generator's dense 0-based doc_id contract).
    *
    * Output: (checkpoint_docs, vocab_size, n_bigrams), cumulative.
    */
  def heapsCurve(
      df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val docs = widen(df.select(col(idCol).cast("long").as("__id"),
      lowerTokens(col(textCol)).as("__toks")))
    // smallest power-of-two checkpoint covering doc f: 1 for f = 0,
    // else 1 << bitlength(f) (bin() is exact integer work)
    def bucket(name: String): Column =
      when(col(name) === 0, lit(1L))
        .otherwise(expr(s"shiftleft(CAST(1 AS BIGINT), length(bin($name)))"))
    val grams = docs.filter(size(col("__toks")) >= 2)
      .select(col("__id"),
        explode(array_distinct(transform(
          sequence(lit(1), size(col("__toks")) - 1),
          i => xxhash64(concat_ws(" ",
            element_at(col("__toks"), i),
            element_at(col("__toks"), i + 1)))))).as("__g"))
    val vocabBuckets = grams
      .groupBy(col("__g")).agg(min(col("__id")).as("__fid"))
      .groupBy(bucket("__fid").as("__cp"))
      .agg(count(lit(1)).as("__nv"))
    val tokenBuckets = docs
      .groupBy(bucket("__id").as("__cp"))
      .agg(sum(greatest(size(col("__toks")).cast("long") - 1, lit(0L)))
        .as("__nt"))
    val wCum = org.apache.spark.sql.expressions.Window
      .orderBy(col("__cp").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    vocabBuckets
      .join(tokenBuckets, Seq("__cp"), "full_outer")
      .select(col("__cp"),
        coalesce(col("__nv"), lit(0L)).as("__nv"),
        coalesce(col("__nt"), lit(0L)).as("__nt"))
      .select(col("__cp").as("checkpoint_docs"),
        sum(col("__nv")).over(wCum).as("vocab_size"),
        sum(col("__nt")).over(wCum).as("n_bigrams"))
  }

  /** Flesch reading-ease per group (e.g. language): 206.835 −
    * 1.015·(words/sentences) − 84.6·(syllables/words) over GROUP-level
    * integer totals — the corpus-curation readability gate (a filter on
    * "too hard / too templated" sources). Syllables use the standard
    * vowel-group heuristic: max(1, number of maximal `[aeiouy]+` runs)
    * per word; sentences are `[.!?]+` runs with a per-doc floor of 1.
    *
    * Every per-doc statistic is an integer (the syllable fold is an
    * integer `aggregate` over the token array — no doubles until the
    * final formula), so the group sums are exact and the one IEEE
    * expression per output row is bit-deterministic at any partitioning.
    * One scan, one partial-agg groupBy; output is |groups| rows.
    *
    * Output: (group, n_docs, n_words, n_sentences, n_syllables, flesch).
    */
  def fleschReadability(
      df: DataFrame, textCol: String, groupCol: String): DataFrame = {
    val toks = lowerTokens(col(textCol))
    val sylls = aggregate(
      transform(toks, w => greatest(lit(1), regexp_count(w, lit("[aeiouy]+")))),
      lit(0L), (acc, x) => acc + x.cast("long"))
    val perDoc = widen(df.select(col(groupCol).as("group"),
      size(toks).cast("long").as("__w"),
      greatest(lit(1L),
        regexp_count(col(textCol), lit("[.!?]+")).cast("long")).as("__s"),
      sylls.as("__y")))
    val words = col("n_words").cast("double")
    perDoc.groupBy(col("group"))
      .agg(count(lit(1)).as("n_docs"), sum(col("__w")).as("n_words"),
        sum(col("__s")).as("n_sentences"), sum(col("__y")).as("n_syllables"))
      .select(col("group"), col("n_docs"), col("n_words"),
        col("n_sentences"), col("n_syllables"),
        round(lit(206.835) -
          lit(1.015) * (words / col("n_sentences").cast("double")) -
          lit(84.6) * (col("n_syllables").cast("double") / words), 6)
          .as("flesch"))
  }
}
