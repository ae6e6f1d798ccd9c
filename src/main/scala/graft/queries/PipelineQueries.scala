package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Engine.table
import graft.functions.TextFunctions.{langId, qualityScore, tokenCount}
import graft.ops.{Dedup, Sampling}

/** The flagship COMPOSITION query: a whole curation pipeline — quality
  * filter → language filter → exact-dedup survivors → deterministic
  * split — in one declarative plan, the way the engine's operators are
  * meant to be used together. Every stage is individually oracled
  * (t02, t03, d02, q21); p01 proves they compose without seams: one
  * Catalyst plan, filters before the dedup shuffle, split as a pure
  * projection, single final aggregate.
  */
object PipelineQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p01_curation_pipeline" -> ((s, dir) => {
      val d = table(s, dir, "documents").select(col("doc_id"), col("text"))
      // planted corpus (the dedup family's ground truth: one exact dup
      // per doc) so the dedup stage has real work to do
      val planted = d.unionAll(
        d.select((col("doc_id") + 1000000000000L).as("doc_id"), col("text")))
      val filtered = planted
        .filter(qualityScore(col("text")) >= 0.7)
        .filter(langId(col("text")) === "en")
      val survivors = Dedup.exactSurvivors(filtered, "text", "doc_id")
      Sampling.split(survivors, "doc_id")
        .groupBy(col("split"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(tokenCount(col("text")).cast("long")).as("sum_tokens"),
          min(qualityScore(col("text"))).as("min_quality"),
          max(qualityScore(col("text"))).as("max_quality"))
    }),

    // Quality-decile curriculum plan: per language, documents bucketed
    // into quality deciles (ntile over the t02 score, doc_id tie-break)
    // with integer repeat factors that upsample high-quality mass —
    // the "repeat the good data" curriculum readout (the budget side of
    // what p02's temperature mixture does across domains). One
    // lang-partitioned window + one aggregate; all integer after the
    // shared rounded score.
    "p10_quality_deciles" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("lang")).orderBy(col("__q").asc, col("doc_id").asc)
      table(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          qualityScore(col("text")).as("__q"),
          tokenCount(col("text")).cast("long").as("__ntok"))
        .withColumn("decile", ntile(10).over(w))
        .groupBy(col("lang"), col("decile"))
        .agg(count(lit(1)).as("n_docs"), sum(col("__ntok")).as("tokens"))
        .withColumn("repeats", expr("(decile + 1) div 2"))
        .withColumn("effective_tokens", col("tokens") * col("repeats"))
    }),

    // Domain-mixture (temperature) sampling at τ = 0.5: per-language
    // quotas ∝ √n — the multilingual-upsampling pass that rebalances a
    // skewed corpus before training. Integer-exact quota arithmetic
    // (isqrt + integer division), md5-ordered membership — the whole
    // sampled set hash-matches the oracle row for row.
    "p02_domain_mixture" -> ((s, dir) =>
      Sampling.temperatureSample(
        table(s, dir, "documents").select(col("doc_id"), col("lang")),
        stratumCol = "lang", keyCol = "doc_id", target = 200)),

    // Sequence packing: next-fit doc→pack assignment within
    // (lang, shard) cells at 256-token capacity — the padding-free
    // context-window prep step. Deterministic shard (doc_id % 4), id
    // order, pure next-fit recurrence; the oracle replays the recurrence
    // in a recursive CTE.
    "p04_sequence_pack" -> ((s, dir) =>
      graft.ops.Packing.nextFitPack(
        table(s, dir, "documents"),
        tokenCount(col("text")),
        idCol = "doc_id", groupCol = "lang",
        capacity = 256, numShards = 4)),

    // Packing-efficiency CURVE: the p04 next-fit plan replayed at four
    // context lengths, rolled up to (capacity, n_bins, n_docs,
    // n_tokens, padding_frac) — the readout that picks a training
    // sequence length (too short → doc truncation pressure elsewhere;
    // too long → padding waste). The d19/v20 parameter-curve idiom:
    // each capacity is an independent one-shuffle packing whose
    // aggregate is a handful of rows; the union is 4 bounded legs.
    // padding_frac is the one closing division, round-6 over exact
    // integer token/capacity sums.
    "p22_packing_curve" -> ((s, dir) => {
      val legs = Seq(64L, 128L, 256L, 512L).map { cap =>
        graft.ops.Packing.nextFitPack(
            table(s, dir, "documents"), tokenCount(col("text")),
            idCol = "doc_id", groupCol = "lang",
            capacity = cap, numShards = 4)
          .agg(
            countDistinct(struct(col("lang"), col("shard"), col("bin")))
              .as("n_bins"),
            count(lit(1)).as("n_docs"),
            sum(col("n_tokens")).as("n_tokens"))
          .select(lit(cap).as("capacity"), col("n_bins"), col("n_docs"),
            col("n_tokens"),
            round((col("n_bins").cast("double") * lit(cap.toDouble) -
              col("n_tokens").cast("double")) /
              (col("n_bins").cast("double") * lit(cap.toDouble)), 6)
              .as("padding_frac"))
      }
      legs.reduce(_ unionAll _)
    }),

    // Pipeline FUNNEL card: per-stage doc/token attrition through the
    // canonical curation chain (ingest → quality → language → exact
    // dedup → min-length) over the planted corpus — the headline table
    // of every dataset paper, and the at-a-glance answer to "which
    // stage is eating my tokens". Each stage is the composed
    // declarative plan up to that point (the p01 stages, individually
    // oracled as t02/t03/d02/t01) rolled to one (n_docs, n_tokens)
    // row; five bounded aggregate legs union'd.
    "p24_pipeline_funnel" -> ((s, dir) => {
      val d = table(s, dir, "documents").select(col("doc_id"), col("text"))
      val planted = d.unionAll(
        d.select((col("doc_id") + 1000000000000L).as("doc_id"), col("text")))
      val nTok = tokenCount(col("text")).cast("long")
      val s2 = planted.filter(qualityScore(col("text")) >= 0.7)
      val s3 = s2.filter(langId(col("text")) === "en")
      val s4 = Dedup.exactSurvivors(s3, "text", "doc_id")
        .select(col("doc_id"), col("text"))
      val s5 = s4.filter(nTok >= 25L)
      def leg(ord: Long, name: String, df: DataFrame): DataFrame =
        df.agg(count(lit(1)).as("n_docs"),
            coalesce(sum(nTok), lit(0L)).as("n_tokens"))
          .select(lit(ord).as("stage"), lit(name).as("stage_name"),
            col("n_docs"), col("n_tokens"))
      Seq(leg(1L, "ingest", planted), leg(2L, "quality", s2),
        leg(3L, "language", s3), leg(4L, "exact_dedup", s4),
        leg(5L, "min_length", s5)).reduce(_ unionAll _)
    }),

    // Perplexity-gate impact report (the CCNet pipeline's statistical
    // filter as a curation decision): documents whose t11 unigram mean
    // NLL exceeds 3.41 nats are dropped as LM-implausible; the readout
    // is the per-source doc/token impact — what a mixture owner checks
    // before enabling the gate. Composes the already-oracled t11 score
    // (the verdict compares its ROUND-6 value, so both engines gate
    // identical doubles); one id equi-join + one source groupBy on top.
    "p23_perplexity_gate" -> ((s, dir) => {
      val nll = graft.ops.CorpusStats.unigramNll(
        table(s, dir, "documents"), "text", "doc_id")
      table(s, dir, "documents").select(col("doc_id"), col("source"))
        .join(nll, Seq("doc_id"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("avg_nll") <= 3.41, 1L).otherwise(0L)).as("n_kept"),
          sum(col("n_tokens")).as("tokens_total"),
          sum(when(col("avg_nll") <= 3.41, col("n_tokens")).otherwise(0L))
            .as("tokens_kept"))
        .withColumn("kept_frac",
          round(col("n_kept").cast("double") / col("n_docs").cast("double"),
            6))
    }),

    // Composite quality gate with per-rule verdicts: every document
    // scored against the rule set (too_short / low_stopword /
    // non_english) in one narrow pass, keeping WHY a document fails —
    // the auditable form of a filter (p01 only keeps the survivors;
    // curation debugging needs the reject reasons). reasons is a
    // fixed-order comma join, so downstream per-rule counts are plain
    // string filters; no shuffle anywhere.
    "p06_quality_gate" -> ((s, dir) => {
      val nTok = tokenCount(col("text"))
      val reasons = concat_ws(",",
        when(nTok < 25, lit("too_short")),
        when(graft.functions.TextFunctions.stopwordRatio(col("text")) < 0.01,
          lit("low_stopword")),
        when(langId(col("text")) =!= "en", lit("non_english")))
      table(s, dir, "documents")
        .select(col("doc_id"), reasons.as("drop_reasons"),
          (reasons === "").as("keep"))
    }),

    // Token-BUDGET mixture sampling: per language, admit docs in md5
    // order until the running TOKEN total passes 5000 — epoch planning
    // counts tokens, not documents (p02 fixes doc quotas; a mixture
    // spec is "N tokens of code, M of web"). Integer cumsum over a
    // per-stratum window; strata are the parallel unit.
    "p08_token_budget" -> ((s, dir) =>
      Sampling.tokenBudgetSample(
        table(s, dir, "documents"),
        stratumCol = "lang", keyCol = "doc_id",
        tokens = tokenCount(col("text")), budget = 5000L)),

    // Systematic probability-proportional-to-size sampling: one sampled
    // doc per 1000-token stride of the per-source cumulative token
    // stream — the deterministic PPS design (every doc's selection
    // probability ∝ its token count, heavy docs count once per stride
    // crossed). ALL-integer: cumsum + integer-division boundary test, no
    // RNG, no transcendental keys — bit-portable to any engine. One
    // per-source sort window; sources are the parallel unit (the p08
    // stratum discipline), never a global sort.
    "p16_systematic_sample" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source")).orderBy(col("doc_id").asc)
      table(s, dir, "documents")
        .select(col("source"), col("doc_id"),
          tokenCount(col("text")).cast("long").as("ntok"))
        .withColumn("cum", sum(col("ntok")).over(w))
        .withColumn("picks",
          expr("cum div 1000 - (cum - ntok) div 1000"))
        .filter(col("picks") > 0)
        .select(col("source"), col("doc_id"), col("ntok"), col("cum"),
          col("picks"))
    }),

    // Shard-balance report over the p07 seeded permutation: per-shard
    // doc/token counts and each shard's token share — the skew audit an
    // export runs before shipping (a shard 2× its peers doubles some
    // trainer's step time). Key join + one 8-key groupBy; the share
    // window runs over the 8-row aggregate.
    "p18_shard_balance" -> ((s, dir) => {
      val sh = graft.ops.Sharding.shuffleShards(
        table(s, dir, "documents"), nShards = 8, seed = 42L)
        .select(col("doc_id"), col("shard"))
      val nt = table(s, dir, "documents")
        .select(col("doc_id"), tokenCount(col("text")).cast("long").as("__nt"))
      val g = sh.join(nt, "doc_id")
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"), sum(col("__nt")).as("n_tokens"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(lit(1))
      g.withColumn("token_share",
        round(col("n_tokens").cast("double") /
          sum(col("n_tokens")).over(w).cast("double"), 6))
    }),

    // Temperature-weighted language mixture (T = 0.5): per-language
    // quotas ∝ sqrt(token count), the standard up-weighting of low-
    // resource languages in multilingual pretraining. sqrt is the ONE
    // IEEE-exact transcendental-free temperature (correctly rounded in
    // every engine — pow(x, 0.7) would not be bit-portable), and the
    // weight normalizer is an ORDERED fold over the lang-sorted list
    // (the t21 discipline: Spark's aggregate from 0.0 == DuckDB's
    // list_reduce, since 0.0 + x = x exactly). Per-lang partial agg +
    // a 1-row broadcast of the normalizer (t16 discipline).
    "p17_temperature_mixture" -> ((s, dir) => {
      val g = table(s, dir, "documents")
        .select(col("lang"), tokenCount(col("text")).cast("long").as("__nt"))
        .groupBy(col("lang")).agg(sum(col("__nt")).as("n_tokens"))
        .withColumn("w", sqrt(col("n_tokens").cast("double")))
      val tot = g.agg(aggregate(
        sort_array(collect_list(struct(col("lang"), col("w")))),
        lit(0.0), (acc, x) => acc + x("w")).as("__tot"))
      g.crossJoin(broadcast(tot))
        .select(col("lang"), col("n_tokens"),
          round(col("w") / col("__tot"), 6).as("share"),
          floor(lit(100000.0) * (col("w") / col("__tot"))).cast("long")
            .as("quota_tokens"))
    }),

    // Temperature-mixture SWEEP — p17's single sqrt point widened to the
    // tuning curve τ ∈ {0.25, 0.5, 0.75, 1.0} (the d19/v20 curve
    // discipline): how much each temperature flattens the language mix.
    // Only sqrt COMPOSITIONS appear (x^.25 = √√x, x^.75 = √x·√√x) —
    // sqrt is correctly rounded in every engine where pow(x, τ) is not,
    // so every leg stays bit-portable; per-leg normalizers are the p17
    // ordered fold on a 1-row broadcast.
    "p27_temperature_curve" -> ((s, dir) => {
      val g = table(s, dir, "documents")
        .select(col("lang"), tokenCount(col("text")).cast("long").as("__nt"))
        .groupBy(col("lang")).agg(sum(col("__nt")).as("n_tokens"))
      val x = col("n_tokens").cast("double")
      val taus: Seq[(String, org.apache.spark.sql.Column)] = Seq(
        ("0.25", sqrt(sqrt(x))),
        ("0.50", sqrt(x)),
        ("0.75", sqrt(x) * sqrt(sqrt(x))),
        ("1.00", x))
      taus.map { case (t, wc) =>
        val gw = g.withColumn("w", wc)
        val tot = gw.agg(aggregate(
          sort_array(collect_list(struct(col("lang"), col("w")))),
          lit(0.0), (acc, r) => acc + r("w")).as("__tot"))
        gw.crossJoin(broadcast(tot))
          .select(lit(t).as("tau"), col("lang"), col("n_tokens"),
            round(col("w") / col("__tot"), 6).as("share"))
      }.reduce(_ unionAll _)
    }),

    // Length-bucketed batch plan: docs binned to power-of-two token
    // capacities (16..2048, longer docs truncate to the 2048 cap), and
    // per bucket the padding economics a sequence-packing trainer needs:
    // batch count at B=16, kept tokens, padding tokens (every doc pads
    // to its bucket cap), padding fraction. Pure map + one partially
    // aggregated groupBy on an 8-value key — no sort, no window, no
    // shuffle beyond the 8-row aggregate at ANY corpus size (contrast
    // p04, which packs greedily and must order within bins).
    "p15_length_buckets" -> ((s, dir) => {
      val nt = tokenCount(col("text")).cast("long")
      val cap = when(nt <= 16, 16L).when(nt <= 32, 32L)
        .when(nt <= 64, 64L).when(nt <= 128, 128L)
        .when(nt <= 256, 256L).when(nt <= 512, 512L)
        .when(nt <= 1024, 1024L).otherwise(2048L)
      table(s, dir, "documents")
        .select(cap.as("bucket_cap"), least(nt, cap).as("__kept"))
        .groupBy(col("bucket_cap"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("__kept")).as("tokens_kept"))
        .select(col("bucket_cap"), col("n_docs"),
          expr("(n_docs + 15) div 16").as("n_batches"),
          col("tokens_kept"),
          (col("bucket_cap") * col("n_docs") - col("tokens_kept"))
            .as("padding_tokens"),
          round((col("bucket_cap") * col("n_docs") - col("tokens_kept"))
            .cast("double")
            / (col("bucket_cap") * col("n_docs")).cast("double"), 6)
            .as("padding_frac"))
    }),

    // Deterministic seeded global shuffle + shard export plan: every doc
    // gets (shard, pos, rank_key) from a two-round integer LCG on its id
    // — the data-order-reproducibility step a training export needs
    // (order is a hyperparameter; it must derive from (corpus, seed),
    // never from physical row order). One narrow pass + one shard-keyed
    // window; no global sort exists at any scale.
    "p07_shuffle_shards" -> ((s, dir) =>
      graft.ops.Sharding.shuffleShards(
        table(s, dir, "documents"), nShards = 8, seed = 42L)),

    // Multi-source ingestion merge with source precedence: the corpus is
    // re-ingested through a planted lower-priority 'mirror' feed (every
    // 3rd doc duplicated, every 7th contributing a mirror-ONLY doc — the
    // p01/t12 planted-construction idiom), and the merge must keep the
    // primary copy of every duplicated fingerprint while still admitting
    // mirror-only content (Dedup.precedenceSurvivors).
    "p05_source_precedence" -> ((s, dir) => {
      val d = table(s, dir, "documents")
        .select(col("doc_id"), col("text"), col("source"))
      val mirrorDup = d.filter(pmod(col("doc_id"), lit(3)) === 0)
        .select((col("doc_id") + 1000000000000L).as("doc_id"), col("text"),
          lit("mirror").as("source"))
      val mirrorOnly = d.filter(pmod(col("doc_id"), lit(7)) === 0)
        .select((col("doc_id") + 2000000000000L).as("doc_id"),
          concat(col("text"), lit(" mirror only")).as("text"),
          lit("mirror").as("source"))
      Dedup.precedenceSurvivors(
        d.unionAll(mirrorDup).unionAll(mirrorOnly),
        "text", "doc_id",
        priority = when(col("source") === "mirror", 1).otherwise(0))
        .select(col("doc_id"), col("source"), col("n_copies"))
    }),

    // Snapshot change-data-capture: the refreshed crawl is the corpus
    // with every 17th doc dropped (deletes), every 13th doc's text
    // revised (updates), and a planted insert feed in the disjoint
    // negative-id space (the d10 idiom). Only (key, md5 digest) rides
    // the one full-outer shuffle; unchanged rows never materialize.
    // CDC APPLY — the merge direction p12's diff extracts: a planted
    // changelog (updates, deletes, a seq-ordered update-then-delete
    // conflict, and new-key inserts) merged into the documents base
    // under last-write-wins (Snapshot.applyChangelog). The base never
    // sorts or re-shuffles past its key; the winner window runs over
    // the delta only.
    "p26_cdc_apply" -> ((s, dir) => {
      val d = table(s, dir, "documents")
        .select(col("doc_id"), col("text"), col("lang"))
      val ch = d.filter(pmod(col("doc_id"), lit(13)) === 0)
        .select(col("doc_id"),
          concat(col("text"), lit(" v2")).as("text"), col("lang"),
          lit("U").as("op"), lit(1L).as("seq"))
        .unionAll(d.filter(pmod(col("doc_id"), lit(19)) === 0)
          .select(col("doc_id"), lit(null).cast("string"),
            lit(null).cast("string"), lit("D"), lit(2L)))
        .unionAll(d.filter(pmod(col("doc_id"), lit(26)) === 0)
          .select(col("doc_id"), lit(null).cast("string"),
            lit(null).cast("string"), lit("D"), lit(3L)))
        .unionAll(d.filter(pmod(col("doc_id"), lit(23)) === 0)
          .select((-col("doc_id") - 1).as("doc_id"),
            concat(col("text"), lit(" new")), col("lang"),
            lit("U"), lit(1L)))
      graft.ops.Snapshot.applyChangelog(d, ch, "doc_id")
    }),

    "p12_snapshot_cdc" -> ((s, dir) => {
      val d = table(s, dir, "documents")
        .select(col("doc_id"), col("text"), col("lang"))
      val refreshed = d.filter(pmod(col("doc_id"), lit(17)) =!= 0)
        .withColumn("text",
          when(pmod(col("doc_id"), lit(13)) === 0,
            concat(col("text"), lit(" v2"))).otherwise(col("text")))
        .unionAll(d.filter(pmod(col("doc_id"), lit(19)) === 0)
          .select((-col("doc_id") - 1).as("doc_id"), col("text"),
            col("lang")))
      graft.ops.Snapshot.diff(d, refreshed, "doc_id", Seq("text", "lang"))
    }),

    // Data-constrained epoch planning: per-language token totals →
    // sqrt-temperature quotas under a 200k global budget → whole-epoch
    // repeat counts capped at 4. Integer arithmetic end to end; the
    // corpus is scanned once, everything after is |strata|-sized.
    "p13_epoch_plan" -> ((s, dir) =>
      Sampling.epochPlan(
        table(s, dir, "documents"), stratumCol = "lang",
        tokens = tokenCount(col("text")), budget = 200000L, maxEpochs = 4)),

    // Temporal holdout with a 7-day embargo: the leakage-safe split for
    // time-ordered data (p11 guards CONTENT leakage, this guards TIME
    // leakage) — cutoff = the exact 80th-percentile event day via the
    // q73 histogram-pick rule, embargo band dropped so no training row
    // sits within 7 days of any test row. Integer end to end.
    "p19_temporal_split" -> ((s, dir) =>
      Sampling.temporalHoldout(
        table(s, dir, "events"), tsCol = "ts", keyCol = "user_id",
        trainPct = 80, embargoDays = 7)),

    // Dataset card: the per-(source, lang) ingest report — doc/token
    // counts, token range, mean quality, and declared-vs-predicted
    // language agreement — in ONE narrow scan + one partially-aggregated
    // groupBy. The readout a curation review starts from.
    "p14_dataset_card" -> ((s, dir) => {
      val nTok = tokenCount(col("text")).cast("long")
      table(s, dir, "documents")
        .select(col("source"), col("lang"), nTok.as("__nt"),
          qualityScore(col("text")).as("__q"),
          (langId(col("text")) === col("lang")).cast("long").as("__agree"))
        .groupBy(col("source"), col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("__nt")).as("n_tokens"),
          min(col("__nt")).as("min_tokens"),
          max(col("__nt")).as("max_tokens"),
          round(avg(col("__q")), 6).as("mean_quality"),
          round(sum(col("__agree")).cast("double") / count(lit(1)), 6)
            .as("lang_agree_frac"))
    }),

    // Seeded weighted sample WITHOUT replacement (Efraimidis–Spirakis
    // A-Res): per source, the top-50 documents by priority ln(u)/w with
    // u = (lcg_rank+1)/2³¹ and w = token count — longer documents
    // proportionally more likely, yet the pick is a pure deterministic
    // function of (doc_id, seed) the oracle replays. The priority is
    // round-6 (the established double class; ln of an identical dyadic
    // rational both sides) and the rank orders by (rounded priority,
    // doc_id), so selection is engine-portable. One narrow scan, one
    // source-keyed window — per-source sorts are the parallel unit, no
    // global order exists (the p07 export discipline).
    "p20_weighted_sample" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source"))
        .orderBy(col("priority").desc, col("doc_id").asc)
      table(s, dir, "documents")
        .select(col("source"), col("doc_id"),
          tokenCount(col("text")).cast("long").as("ntok"),
          graft.ops.Sharding.lcgRank(col("doc_id"), seed = 7L).as("__rk"))
        .withColumn("priority",
          round(log((col("__rk").cast("double") + 1.0d) / 2147483648.0d)
            / col("ntok").cast("double"), 6))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 50)
        .select(col("source"), col("doc_id"), col("ntok"), col("priority"),
          col("rk"))
    }),

    // Upsampling-cap audit: to hit a uniform per-source share of a 10M
    // token budget, how many EPOCHS of each source would be replayed —
    // and which sources blow past the 4-epoch repetition cap the
    // memorization literature warns about. Pure integer target/cap
    // arithmetic (one round-6 epochs readout); the source table is the
    // aggregate, the source count rides a 1-row broadcast (t16
    // discipline, NLJ-allowlisted). The curation complement of p02's
    // mixture weights and p13's epoch plan.
    "p21_upsampling_caps" -> ((s, dir) => {
      val src = table(s, dir, "documents")
        .groupBy(col("source"))
        .agg(sum(tokenCount(col("text")).cast("long")).as("n_tokens"))
      val n = src.agg(count(lit(1)).as("__ns"))
      src.crossJoin(broadcast(n))
        .select(col("source"), col("n_tokens"),
          expr("10000000L div __ns").as("target_tokens"))
        .select(col("source"), col("n_tokens"), col("target_tokens"),
          round(col("target_tokens").cast("double") /
            col("n_tokens").cast("double"), 6).as("epochs"),
          least(col("target_tokens"), col("n_tokens") * 4L)
            .as("capped_tokens"),
          (col("target_tokens") > col("n_tokens") * 4L).as("truncated"))
    })
  )

  // Stage mirrors come from the same shared snippets the per-stage
  // oracles use (TextQueries.qualitySql/langCase/nTokens), so the
  // pipeline oracle cannot drift from the stage oracles.
  val oracles: Map[String, String] = Map(
    // Mirrors p20: the p07/p18 LCG replayed verbatim (seed 7 ⇒ first
    // increment 7+12345), the identical ln((rk+1)/2³¹)/ntok priority
    // round-6 both sides, rank over (rounded priority, doc_id).
    "p20_weighted_sample" -> {
      import TextQueries.nTokens
      s"""WITH h AS (
            SELECT source, doc_id, CAST($nTokens AS BIGINT) AS ntok,
              ((((doc_id % 2147483648) * 1103515245 + 12352)
                % 2147483648) * 1103515245 + 12345) % 2147483648 AS rk
            FROM documents),
          p AS (SELECT source, doc_id, ntok,
                  round(ln((CAST(rk AS DOUBLE) + 1.0) / 2147483648.0)
                    / CAST(ntok AS DOUBLE), 6) AS priority
                FROM h),
          r AS (SELECT source, doc_id, ntok, priority,
                  row_number() OVER (PARTITION BY source
                    ORDER BY priority DESC, doc_id ASC) AS rk
                FROM p)
          SELECT source, doc_id, ntok, priority, CAST(rk AS BIGINT) AS rk
          FROM r WHERE rk <= 50"""
    },
    // Mirrors p21: the same nTokens source aggregate, integer
    // target/cap arithmetic, one round-6 division.
    "p21_upsampling_caps" -> {
      import TextQueries.nTokens
      s"""WITH src AS (
            SELECT source, CAST(sum(CAST($nTokens AS BIGINT)) AS BIGINT)
              AS n_tokens
            FROM documents GROUP BY 1),
          n AS (SELECT CAST(count(*) AS BIGINT) AS ns FROM src)
          SELECT source, n_tokens,
            CAST(10000000 // ns AS BIGINT) AS target_tokens,
            round(CAST(10000000 // ns AS DOUBLE) /
              CAST(n_tokens AS DOUBLE), 6) AS epochs,
            CAST(least(10000000 // ns, n_tokens * 4) AS BIGINT)
              AS capped_tokens,
            (10000000 // ns) > n_tokens * 4 AS truncated
          FROM src, n"""
    },
    // Mirrors p19: the q73 integer epoch-day + histogram-pick cutoff,
    // identical split predicate, BIGINT casts around the windowed sums.
    "p19_temporal_split" ->
      """WITH d AS (SELECT user_id AS k,
             epoch_us(ts) // 1000000 // 86400 AS day FROM events),
         h AS (SELECT day, CAST(count(*) AS BIGINT) AS c
               FROM d GROUP BY 1),
         cw AS (SELECT day, c,
                  CAST(sum(c) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED
                    PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
                  CAST(sum(c) OVER () AS BIGINT) AS n
                FROM h),
         cut AS (SELECT min(CASE WHEN cum * 100 >= n * 80 THEN day END)
                   AS cutd FROM cw),
         a AS (SELECT k, day,
                 CASE WHEN day <= cutd - 7 THEN 'train'
                      WHEN day > cutd THEN 'test'
                      ELSE 'embargo' END AS split
               FROM d CROSS JOIN cut)
         SELECT split, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(DISTINCT k) AS BIGINT) AS n_keys,
           min(day) AS day_min, max(day) AS day_max
         FROM a GROUP BY 1""",
    // Mirrors p16: same per-source doc_id-ordered BIGINT cumsum (HUGEINT
    // lesson: both sum and the // quotients cast), same stride-crossing
    // integer test.
    "p16_systematic_sample" -> {
      import TextQueries.nTokens
      s"""WITH d AS (SELECT source, doc_id,
              CAST($nTokens AS BIGINT) AS ntok FROM documents),
          c AS (SELECT source, doc_id, ntok,
                  CAST(sum(ntok) OVER (PARTITION BY source
                    ORDER BY doc_id ASC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS cum
                FROM d)
          SELECT source, doc_id, ntok, cum,
            CAST(cum // 1000 - (cum - ntok) // 1000 AS BIGINT) AS picks
          FROM c
          WHERE cum // 1000 - (cum - ntok) // 1000 > 0"""
    },
    // Mirrors p18: the p07 LCG shard key, BIGINT counts/sums, identical
    // exact-integer division for the share.
    "p18_shard_balance" -> {
      import TextQueries.nTokens
      val seedC = 42L + 12345L
      s"""WITH h AS (
            SELECT doc_id,
              CAST(((((doc_id % 2147483648) * 1103515245 + $seedC)
                % 2147483648) * 1103515245 + 12345) % 2147483648 % 8
                AS INTEGER) AS shard,
              CAST($nTokens AS BIGINT) AS nt
            FROM documents),
          g AS (SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
                  CAST(sum(nt) AS BIGINT) AS n_tokens
                FROM h GROUP BY shard)
          SELECT shard, n_docs, n_tokens,
            round(CAST(n_tokens AS DOUBLE)
              / CAST(sum(n_tokens) OVER () AS DOUBLE), 6) AS token_share
          FROM g"""
    },
    // Mirrors p17: BIGINT token sums, IEEE-exact sqrt, the lang-ordered
    // list_reduce fold (== Spark's aggregate from 0.0), the same
    // divide-then-scale chain with the 100000 literal CAST to DOUBLE
    // (t16 lesson), floor quota.
    "p17_temperature_mixture" -> {
      import TextQueries.nTokens
      s"""WITH d AS (SELECT lang,
              CAST(sum(CAST($nTokens AS BIGINT)) AS BIGINT) AS n_tokens
            FROM documents GROUP BY lang),
          w AS (SELECT lang, n_tokens,
                  sqrt(CAST(n_tokens AS DOUBLE)) AS w FROM d),
          t AS (SELECT list_reduce(list(w ORDER BY lang), (a, b) -> a + b)
                  AS tot FROM w)
          SELECT lang, n_tokens, round(w / t.tot, 6) AS share,
            CAST(floor(CAST(100000 AS DOUBLE) * (w / t.tot)) AS BIGINT)
              AS quota_tokens
          FROM w CROSS JOIN t"""
    },
    // Mirrors p27: the p17 fold per temperature leg, weights as the
    // identical sqrt compositions, four UNION ALL legs.
    "p27_temperature_curve" -> {
      import TextQueries.nTokens
      def leg(tau: String, w: String) =
        s"""SELECT '$tau' AS tau, lang, n_tokens,
              round(w / (SELECT list_reduce(list(w ORDER BY lang),
                (a, b) -> a + b) FROM
                (SELECT lang, $w AS w FROM d)), 6) AS share
            FROM (SELECT lang, n_tokens, $w AS w FROM d)"""
      val x = "CAST(n_tokens AS DOUBLE)"
      s"""WITH d AS (SELECT lang,
              CAST(sum(CAST($nTokens AS BIGINT)) AS BIGINT) AS n_tokens
            FROM documents GROUP BY lang)
          ${leg("0.25", s"sqrt(sqrt($x))")}
          UNION ALL ${leg("0.50", s"sqrt($x)")}
          UNION ALL ${leg("0.75", s"sqrt($x) * sqrt(sqrt($x))")}
          UNION ALL ${leg("1.00", x)}"""
    },
    // Mirrors p15: same power-of-two CASE ladder, same least(nt, cap)
    // truncation, integer // batch count, round-6 padding ratio over
    // the identical BIGINT products.
    "p15_length_buckets" -> {
      import TextQueries.nTokens
      s"""WITH d AS (SELECT CAST($nTokens AS BIGINT) AS nt FROM documents),
          b AS (SELECT nt, CAST(CASE WHEN nt <= 16 THEN 16
                  WHEN nt <= 32 THEN 32 WHEN nt <= 64 THEN 64
                  WHEN nt <= 128 THEN 128 WHEN nt <= 256 THEN 256
                  WHEN nt <= 512 THEN 512 WHEN nt <= 1024 THEN 1024
                  ELSE 2048 END AS BIGINT) AS bucket_cap
                FROM d),
          g AS (SELECT bucket_cap, CAST(count(*) AS BIGINT) AS n_docs,
                  CAST(sum(least(nt, bucket_cap)) AS BIGINT) AS tokens_kept
                FROM b GROUP BY bucket_cap)
          SELECT bucket_cap, n_docs, (n_docs + 15) // 16 AS n_batches,
            tokens_kept,
            bucket_cap * n_docs - tokens_kept AS padding_tokens,
            round(CAST(bucket_cap * n_docs - tokens_kept AS DOUBLE)
              / CAST(bucket_cap * n_docs AS DOUBLE), 6) AS padding_frac
          FROM g"""
    },
    // Mirrors p12: same refresh derivation, same chr(1)-joined md5
    // digest, full outer join on the key, same three-way op verdict.
    // Mirrors p26: identical planted changelog, the same seq-DESC
    // last-write-wins winner per key, anti join + U-upsert union.
    "p26_cdc_apply" ->
      """WITH ch AS (
           SELECT doc_id, text || ' v2' AS text, lang,
             'U' AS op, CAST(1 AS BIGINT) AS seq
           FROM documents WHERE doc_id % 13 = 0
           UNION ALL
           SELECT doc_id, NULL, NULL, 'D', 2
           FROM documents WHERE doc_id % 19 = 0
           UNION ALL
           SELECT doc_id, NULL, NULL, 'D', 3
           FROM documents WHERE doc_id % 26 = 0
           UNION ALL
           SELECT -doc_id - 1, text || ' new', lang, 'U', 1
           FROM documents WHERE doc_id % 23 = 0),
         w AS (SELECT *, row_number() OVER (PARTITION BY doc_id
                 ORDER BY seq DESC) AS rn
               FROM ch),
         latest AS (SELECT doc_id, text, lang, op FROM w WHERE rn = 1),
         untouched AS (SELECT d.doc_id, d.text, d.lang
                       FROM documents d
                       ANTI JOIN latest l ON d.doc_id = l.doc_id)
       SELECT doc_id, text, lang FROM untouched
       UNION ALL
       SELECT doc_id, text, lang FROM latest WHERE op = 'U'""",

    "p12_snapshot_cdc" ->
      """WITH o AS (SELECT doc_id,
              md5(concat_ws(chr(1), text, lang)) AS fp FROM documents),
          n0 AS (SELECT doc_id,
                   CASE WHEN doc_id % 13 = 0 THEN text || ' v2'
                        ELSE text END AS text, lang
                 FROM documents WHERE doc_id % 17 <> 0),
          n1 AS (SELECT -doc_id - 1 AS doc_id, text, lang
                 FROM documents WHERE doc_id % 19 = 0),
          n AS (SELECT doc_id, md5(concat_ws(chr(1), text, lang)) AS fp
                FROM (SELECT * FROM n0 UNION ALL SELECT * FROM n1)),
          j AS (SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
                  o.fp AS ofp, n.fp AS nfp
                FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id)
          SELECT doc_id,
            CASE WHEN ofp IS NULL THEN 'insert'
                 WHEN nfp IS NULL THEN 'delete'
                 WHEN ofp <> nfp THEN 'update' END AS op
          FROM j
          WHERE ofp IS NULL OR nfp IS NULL OR ofp <> nfp""",
    // Mirrors p14 from the shared stage fragments (nTokens / qualitySql /
    // langCase); mean_quality rides the t11 avg+round-6 contract, the
    // agreement fraction is one exact int/int division.
    "p14_dataset_card" -> {
      import TextQueries.{langCase, nTokens, qualitySql}
      s"""SELECT source, lang, count(*) AS n_docs,
            CAST(sum($nTokens) AS BIGINT) AS n_tokens,
            CAST(min($nTokens) AS BIGINT) AS min_tokens,
            CAST(max($nTokens) AS BIGINT) AS max_tokens,
            round(avg($qualitySql), 6) AS mean_quality,
            round(CAST(sum(CASE WHEN ($langCase) = lang THEN 1 ELSE 0 END)
              AS DOUBLE) / count(*), 6) AS lang_agree_frac
          FROM documents GROUP BY source, lang"""
    },
    // Mirrors p13: floor(sqrt) weights, integer // quotas against the
    // whole-frame weight sum, ceil as (q+T-1)//T capped at 4. Every
    // output CAST to BIGINT (the p08 HUGEINT lesson).
    "p13_epoch_plan" -> {
      import TextQueries.nTokens
      s"""WITH d AS (SELECT lang, CAST($nTokens AS BIGINT) AS nt
                     FROM documents),
          g AS (SELECT lang, CAST(sum(nt) AS BIGINT) AS n_tokens,
                  CAST(floor(sqrt(CAST(sum(nt) AS BIGINT))) AS BIGINT) AS s
                FROM d GROUP BY lang),
          q AS (SELECT lang, n_tokens,
                  CAST((200000 * s) // (SELECT CAST(sum(s) AS BIGINT) FROM g)
                    AS BIGINT) AS quota
                FROM g WHERE n_tokens > 0),
          e AS (SELECT lang, n_tokens, quota,
                  CAST(least(4, (quota + n_tokens - 1) // n_tokens)
                    AS BIGINT) AS epochs
                FROM q)
          SELECT lang, n_tokens, quota, epochs,
            CAST(least(quota, epochs * n_tokens) AS BIGINT) AS planned_tokens
          FROM e"""
    },
    "p01_curation_pipeline" -> {
      import TextQueries.{langCase, nTokens, qualitySql}
      s"""WITH u AS (SELECT doc_id, text FROM documents
              UNION ALL SELECT doc_id + 1000000000000 AS doc_id, text FROM documents),
          q AS (SELECT doc_id, text, $qualitySql AS quality,
                  CAST($nTokens AS BIGINT) AS n_toks,
                  $langCase AS pred_lang
                FROM u),
          f AS (SELECT * FROM q WHERE quality >= 0.7 AND pred_lang = 'en'),
          s AS (SELECT min(doc_id) AS doc_id FROM f
                GROUP BY md5(trim(regexp_replace(lower(text), '[ \t\n\u000B\f\r]+', ' ', 'g')))),
          j AS (SELECT f.* FROM f JOIN s USING (doc_id)),
          b AS (SELECT *, CAST(CAST(concat('0x',
                  substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
                % 100 AS INT) AS bucket FROM j)
          SELECT CASE WHEN bucket < 80 THEN 'train'
                      WHEN bucket < 90 THEN 'val'
                      ELSE 'test' END AS split,
            count(*) AS n_docs,
            CAST(sum(n_toks) AS BIGINT) AS sum_tokens,
            min(quality) AS min_quality,
            max(quality) AS max_quality
          FROM b GROUP BY 1"""
    },
    // Mirrors p10: the shared rounded quality score, the same
    // (score, doc_id) ntile order (both engines distribute remainder
    // rows to the leading buckets — the q41 ntile contract), integer
    // repeat/token arithmetic.
    "p10_quality_deciles" -> {
      import TextQueries.{nTokens, qualitySql}
      s"""WITH q AS (SELECT doc_id, lang, $qualitySql AS q,
                  CAST($nTokens AS BIGINT) AS ntok
                FROM documents),
          t AS (SELECT lang, ntok,
                  ntile(10) OVER (PARTITION BY lang
                    ORDER BY q, doc_id) AS decile
                FROM q)
          SELECT lang, CAST(decile AS INTEGER) AS decile,
            count(*) AS n_docs,
            CAST(sum(ntok) AS BIGINT) AS tokens,
            (decile + 1) // 2 AS repeats,
            CAST(sum(ntok) * ((decile + 1) // 2) AS BIGINT)
              AS effective_tokens
          FROM t GROUP BY lang, decile"""
    },
    // Mirrors Sampling.temperatureSample: isqrt = floor(sqrt(n)) — IEEE
    // sqrt is correctly rounded in every engine, so the integer quota
    // arithmetic ((200 * s) // ss) is bit-exact; membership is the q22
    // md5-order rank.
    "p02_domain_mixture" ->
      """WITH d AS (SELECT doc_id, lang FROM documents),
          g AS (SELECT lang, count(*) AS n,
                  CAST(floor(sqrt(count(*))) AS BIGINT) AS s
                FROM d GROUP BY lang),
          q AS (SELECT lang, (200 * s) // (SELECT sum(s) FROM g) AS quota
                FROM g),
          r AS (SELECT d.doc_id, d.lang, q.quota,
                  row_number() OVER (PARTITION BY d.lang
                    ORDER BY md5(CAST(d.doc_id AS VARCHAR)) ASC,
                             d.doc_id ASC) AS rn
                FROM d JOIN q USING (lang))
          SELECT doc_id, lang FROM r WHERE rn <= quota"""
,
    // Mirrors Packing.nextFitPack: same shard (doc_id % 4), same id
    // order, and the next-fit recurrence replayed per (lang, shard) cell
    // in a recursive CTE — state (bin, acc) carried row to row exactly
    // as the kernel's single pass does.
    "p04_sequence_pack" -> {
      import TextQueries.nTokens
      s"""WITH RECURSIVE
          d AS (SELECT doc_id, lang, doc_id % 4 AS shard,
                  CAST($nTokens AS BIGINT) AS n_tokens
                FROM documents),
          o AS (SELECT *, row_number() OVER (PARTITION BY lang, shard
                  ORDER BY doc_id ASC) AS rn
                FROM d),
          pack(lang, shard, rn, doc_id, n_tokens, bin, acc) AS (
            SELECT lang, shard, rn, doc_id, n_tokens,
              CAST(0 AS BIGINT), n_tokens
            FROM o WHERE rn = 1
            UNION ALL
            SELECT o.lang, o.shard, o.rn, o.doc_id, o.n_tokens,
              CASE WHEN p.acc + o.n_tokens > 256 THEN p.bin + 1 ELSE p.bin END,
              CASE WHEN p.acc + o.n_tokens > 256 THEN o.n_tokens
                   ELSE p.acc + o.n_tokens END
            FROM pack p JOIN o
              ON o.lang = p.lang AND o.shard = p.shard AND o.rn = p.rn + 1)
          SELECT doc_id, lang, shard, bin, n_tokens FROM pack"""
    },
    // Mirrors p24: the p01 stage fragments verbatim (shared
    // quality/langid/token SQL, the same normalized-md5 min-id dedup),
    // each stage rolled to one integer row.
    "p24_pipeline_funnel" -> {
      import TextQueries.{langCase, nTokens, qualitySql}
      s"""WITH u AS (SELECT doc_id, text FROM documents
              UNION ALL SELECT doc_id + 1000000000000 AS doc_id, text
              FROM documents),
          q AS (SELECT doc_id, text, $qualitySql AS quality,
                  CAST($nTokens AS BIGINT) AS n_toks,
                  $langCase AS pred_lang
                FROM u),
          s2 AS (SELECT * FROM q WHERE quality >= 0.7),
          s3 AS (SELECT * FROM s2 WHERE pred_lang = 'en'),
          k AS (SELECT min(doc_id) AS doc_id FROM s3
                GROUP BY md5(trim(regexp_replace(lower(text),
                  '[ \t\n\u000B\f\r]+', ' ', 'g')))),
          s4 AS (SELECT s3.* FROM s3 JOIN k USING (doc_id)),
          s5 AS (SELECT * FROM s4 WHERE n_toks >= 25)
          SELECT CAST(1 AS BIGINT) AS stage, 'ingest' AS stage_name,
            CAST(count(*) AS BIGINT) AS n_docs,
            CAST(coalesce(sum(n_toks), 0) AS BIGINT) AS n_tokens FROM q
          UNION ALL SELECT 2, 'quality', count(*),
            CAST(coalesce(sum(n_toks), 0) AS BIGINT) FROM s2
          UNION ALL SELECT 3, 'language', count(*),
            CAST(coalesce(sum(n_toks), 0) AS BIGINT) FROM s3
          UNION ALL SELECT 4, 'exact_dedup', count(*),
            CAST(coalesce(sum(n_toks), 0) AS BIGINT) FROM s4
          UNION ALL SELECT 5, 'min_length', count(*),
            CAST(coalesce(sum(n_toks), 0) AS BIGINT) FROM s5"""
    },
    // Mirrors p23: the t11 NLL chain verbatim (same single-ln form,
    // same round-6 score), then the identical <= 3.41 verdict on the
    // rounded value — both engines gate the same doubles — and the
    // per-source integer rollup.
    "p23_perplexity_gate" -> {
      import TextQueries.lowToks
      s"""WITH t AS (SELECT doc_id, $lowToks AS toks FROM documents),
          tok AS (SELECT doc_id, unnest(toks) AS w FROM t),
          c AS (SELECT w, count(*) AS c FROM tok GROUP BY w),
          tt AS (SELECT CAST(sum(c) AS BIGINT) AS t FROM c),
          sc AS (SELECT doc_id, ln(CAST(tt.t AS DOUBLE) / c.c) AS nll
                 FROM tok JOIN c USING (w), tt),
          st AS (SELECT doc_id, count(*) AS n_tokens, avg(nll) AS a
                 FROM sc GROUP BY doc_id),
          sd AS (SELECT d.doc_id, d.source,
                   CAST(coalesce(st.n_tokens, 0) AS BIGINT) AS n_tokens,
                   round(coalesce(st.a, 0.0), 6) AS avg_nll
                 FROM documents d LEFT JOIN st USING (doc_id))
          SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
            CAST(sum(CASE WHEN avg_nll <= 3.41 THEN 1 ELSE 0 END)
              AS BIGINT) AS n_kept,
            CAST(sum(n_tokens) AS BIGINT) AS tokens_total,
            CAST(sum(CASE WHEN avg_nll <= 3.41 THEN n_tokens ELSE 0 END)
              AS BIGINT) AS tokens_kept,
            round(CAST(sum(CASE WHEN avg_nll <= 3.41 THEN 1 ELSE 0 END)
              AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS kept_frac
          FROM sd GROUP BY 1"""
    },
    // Mirrors p22: the p04 next-fit recurrence replayed once per
    // capacity (four recursive CTEs over the shared ordered doc
    // stream), each rolled up to the same integer aggregate; the
    // padding fraction repeats Spark's exact double chain.
    "p22_packing_curve" -> {
      import TextQueries.nTokens
      val caps = Seq(64L, 128L, 256L, 512L)
      def leg(cap: Long) =
        s"""pack$cap(lang, shard, rn, n_tokens, bin, acc) AS (
            SELECT lang, shard, rn, n_tokens, CAST(0 AS BIGINT), n_tokens
            FROM o WHERE rn = 1
            UNION ALL
            SELECT o.lang, o.shard, o.rn, o.n_tokens,
              CASE WHEN p.acc + o.n_tokens > $cap THEN p.bin + 1
                   ELSE p.bin END,
              CASE WHEN p.acc + o.n_tokens > $cap THEN o.n_tokens
                   ELSE p.acc + o.n_tokens END
            FROM pack$cap p JOIN o
              ON o.lang = p.lang AND o.shard = p.shard
             AND o.rn = p.rn + 1)"""
      def agg(cap: Long) =
        s"""SELECT CAST($cap AS BIGINT) AS capacity,
              (SELECT CAST(count(*) AS BIGINT) FROM
                (SELECT DISTINCT lang, shard, bin FROM pack$cap))
                AS n_bins,
              CAST(count(*) AS BIGINT) AS n_docs,
              CAST(sum(n_tokens) AS BIGINT) AS n_tokens
            FROM pack$cap"""
      s"""WITH RECURSIVE
          d AS (SELECT doc_id, lang, doc_id % 4 AS shard,
                  CAST($nTokens AS BIGINT) AS n_tokens
                FROM documents),
          o AS (SELECT *, row_number() OVER (PARTITION BY lang, shard
                  ORDER BY doc_id ASC) AS rn
                FROM d),
          ${caps.map(leg).mkString(",\n          ")},
          a AS (${caps.map(agg).mkString("\n            UNION ALL\n            ")})
          SELECT capacity, n_bins, n_docs, n_tokens,
            round((CAST(n_bins AS DOUBLE) * CAST(capacity AS DOUBLE) -
              CAST(n_tokens AS DOUBLE)) /
              (CAST(n_bins AS DOUBLE) * CAST(capacity AS DOUBLE)), 6)
              AS padding_frac
          FROM a"""
    },
    // Mirrors p06 from the same shared fragments (nTokens/enHits/
    // langCase): identical rule predicates, identical fixed reason
    // order; concat_ws skips NULL branches on both engines.
    "p06_quality_gate" -> {
      import TextQueries.{enHits, langCase, nTokens}
      val reasons = s"""concat_ws(',',
             CASE WHEN n_toks < 25 THEN 'too_short' END,
             CASE WHEN ratio < 0.01 THEN 'low_stopword' END,
             CASE WHEN pred_lang <> 'en' THEN 'non_english' END)"""
      s"""WITH q AS (SELECT doc_id,
                 CAST($nTokens AS BIGINT) AS n_toks,
                 CASE WHEN $nTokens > 0
                   THEN CAST($enHits AS DOUBLE) / CAST($nTokens AS DOUBLE)
                   ELSE 0.0 END AS ratio,
                 $langCase AS pred_lang
               FROM documents)
          SELECT doc_id, $reasons AS drop_reasons,
            ($reasons = '') AS keep
          FROM q"""
    },

    // Mirrors Sampling.tokenBudgetSample: same md5-rank order (the
    // q22/p02 idiom), same integer cumulative sum, same prefix rule
    // (cum <= budget).
    "p08_token_budget" -> {
      import TextQueries.nTokens
      s"""WITH d AS (SELECT doc_id, lang,
                CAST($nTokens AS BIGINT) AS n_tokens
              FROM documents),
          r AS (SELECT doc_id, lang, n_tokens,
                  CAST(sum(n_tokens) OVER (PARTITION BY lang
                    ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
                FROM d)
          SELECT doc_id, lang, n_tokens, cum_tokens
          FROM r WHERE cum_tokens <= 5000"""
    },

    // Mirrors Sharding.shuffleShards: the identical two-round LCG
    // recurrence (glibc constants, seed 42 folded into the first
    // increment), same mod-2^31 reduction so no intermediate exceeds
    // int64, same (rank_key, doc_id) within-shard order.
    "p07_shuffle_shards" -> {
      val seedC = 42L + 12345L
      s"""WITH h AS (
           SELECT doc_id,
             ((((doc_id % 2147483648) * 1103515245 + $seedC) % 2147483648)
               * 1103515245 + 12345) % 2147483648 AS rank_key
           FROM documents)
         SELECT doc_id, CAST(rank_key % 8 AS INTEGER) AS shard,
           row_number() OVER (PARTITION BY rank_key % 8
             ORDER BY rank_key ASC, doc_id ASC) AS pos,
           rank_key
         FROM h"""
    },

    // Mirrors p05: identical planted mirror feed, the d01/d02 normalized
    // fingerprint, and the same (priority, id) keeper total order.
    "p05_source_precedence" ->
      """WITH u AS (
           SELECT doc_id, text, source FROM documents
           UNION ALL
           SELECT doc_id + 1000000000000, text, 'mirror' FROM documents
           WHERE doc_id % 3 = 0
           UNION ALL
           SELECT doc_id + 2000000000000, text || ' mirror only', 'mirror'
           FROM documents WHERE doc_id % 7 = 0),
         f AS (SELECT doc_id, source,
                 CASE WHEN source = 'mirror' THEN 1 ELSE 0 END AS pri,
                 md5(trim(regexp_replace(lower(text), '[ \t\n\u000B\f\r]+', ' ', 'g'))) AS fp
               FROM u),
         r AS (SELECT doc_id, source,
                 row_number() OVER (PARTITION BY fp
                   ORDER BY pri ASC, doc_id ASC) AS rn,
                 count(*) OVER (PARTITION BY fp) AS n_copies
               FROM f)
         SELECT doc_id, source, n_copies FROM r WHERE rn = 1"""
  )
}
