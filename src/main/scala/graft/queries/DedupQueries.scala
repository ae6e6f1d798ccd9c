package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Engine.table
import graft.ops.{CorpusStats, Dedup, Similarity}

/** Dedup query surface.
  *
  * The driver corpus contains no duplicates (verified: 0 exact-dup groups,
  * max pairwise embedding cosine 0.51), so dup-finding queries run over a
  * planted corpus: `documents UNION ALL documents with doc_id+1000000000000` —
  * fully SQL-expressible, so the DuckDB oracle sees the same dups.
  */
object DedupQueries {

  /** documents ∪ (documents ⊕ id+1000000000000): every doc has exactly one exact
    * duplicate — deterministic ground truth for dup queries.
    */
  private def planted(s: SparkSession, dir: String): DataFrame = {
    val d = table(s, dir, "documents").select(col("doc_id"), col("text"))
    d.unionAll(d.select((col("doc_id") + 1000000000000L).as("doc_id"), col("text")))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Exact dedup: content-hash groups (reference getID content addressing,
    // util/id.js:72-78, generalized to normalized-text md5).
    "d01_exact_groups" -> ((s, dir) =>
      Dedup.exactGroups(planted(s, dir), "text", "doc_id")),

    // Exact dedup: surviving ids (keeper = min doc_id per content group).
    "d02_exact_survivors" -> ((s, dir) =>
      Dedup.exactSurvivors(planted(s, dir), "text", "doc_id")
        .select(col("doc_id"))),

    // MinHash + LSH near-dup pairs on 3-token shingles. The planted exact
    // dups (jaccard 1.0) MUST all surface — banding guarantees identical
    // signatures collide. The OUTPUT is exact shingle-set Jaccard (the LSH
    // candidates are verified), so the oracle is plain SQL: hashing only
    // affects recall, which is total on this corpus (16 bands × 2 rows at
    // j ≥ 0.8 ⇒ miss probability (1−j²)^16 ≤ 4e-8 per pair; DedupSpec
    // additionally pins exact recall of the planted pairs).
    "d03_minhash_pairs" -> ((s, dir) =>
      Dedup.minhashPairs(planted(s, dir), "text", "doc_id",
        k = 3, bands = 16, rowsPerBand = 2, threshold = 0.8)),

    // SimHash near-dup pairs, Hamming ≤ 3 over 64-bit token sketches.
    // The md5 hash family (two 32-bit words from the digest's hex prefix)
    // is exactly reproducible in DuckDB, so the full pair set has a SQL
    // oracle; the xxhash64-family simhashPairs is the same machinery
    // (DedupSpec pins the two kernels' shared semantics differentially).
    "d04_simhash_pairs" -> ((s, dir) =>
      Dedup.simhashPairsMd5(planted(s, dir), "text", "doc_id", maxDist = 3)),

    // Exact n-gram (token-set) Jaccard ≥ 19/20 via inverted-index join —
    // integer-exact filter, full DuckDB oracle.
    "d05_ngram_jaccard" -> ((s, dir) =>
      Dedup.ngramJaccardPairs(
        table(s, dir, "documents"), "text", "doc_id", num = 19, den = 20)),

    // Transitive dup clusters: connected components over the exact-dup
    // pair graph (jaccard = 1 minhash pairs). On the planted corpus the
    // clusters are the content groups, so the oracle is SQL-expressible
    // even though the pair generation isn't.
    "d06_dup_clusters" -> ((s, dir) => {
      val p = planted(s, dir)
      val pairs = Dedup.minhashPairs(p, "text", "doc_id", threshold = 1.0)
      Dedup.components(pairs)
    }),

    // Duplication-severity histogram: dup-cluster sizes → cluster counts
    // (the "how bad is it" readout a dedup review starts from). A
    // variable-multiplicity plant (every doc mirrored once; every 3rd doc
    // twice) gives the histogram real shape: sizes {2, 3}. Two
    // partially-aggregated groupBys on top of the d06 component chain.
    "d15_cluster_sizes" -> ((s, dir) => {
      val d = table(s, dir, "documents").select(col("doc_id"), col("text"))
      val planted3 = d
        .unionAll(d.select((col("doc_id") + 1000000000000L).as("doc_id"), col("text")))
        .unionAll(d.filter(pmod(col("doc_id"), lit(3)) === 0)
          .select((col("doc_id") + 2000000000000L).as("doc_id"), col("text")))
      val pairs = Dedup.minhashPairs(planted3, "text", "doc_id", threshold = 1.0)
      Dedup.components(pairs)
        .groupBy(col("cluster_id")).agg(count(lit(1)).as("cluster_size"))
        .groupBy(col("cluster_size")).agg(count(lit(1)).as("n_clusters"))
    }),

    // Dedup threshold-sensitivity curve: pair counts at Jaccard ≥
    // {0.7, 0.8, 0.9, 1.0} from ONE prefix-filtered pair computation at
    // the loosest threshold (the d14/v20 tuning-report discipline applied
    // to d05 — what picks the production cut before committing to a
    // corpus-wide dedup). The pair set is checkpointed once; each
    // threshold is an integer-exact filter + count over it.
    "d19_threshold_curve" -> ((s, dir) => {
      // ONE pass over the loosest-cut pair set: the four thresholds are
      // conditional sums inside a single aggregation, so the pair set is
      // never materialized and never re-scanned (the checkpoint + 4-pass
      // form this replaces cost ~2.5s of d19's ~5s at sf0.1)
      val pairs = Dedup.ngramJaccardPairs(
        table(s, dir, "documents"), "text", "doc_id", num = 7, den = 10)
      val cuts = Seq((7, 10), (4, 5), (9, 10), (1, 1))
      val agged = pairs.agg(
        sum(when(col("inter") * cuts.head._2 >= col("uni") * cuts.head._1,
          1L).otherwise(0L)).as("__c0"),
        cuts.tail.zipWithIndex.map { case ((nu, de), i) =>
          sum(when(col("inter") * de >= col("uni") * nu, 1L)
            .otherwise(0L)).as(s"__c${i + 1}")
        }: _*)
      agged.select(explode(array(cuts.zipWithIndex.map { case ((nu, de), i) =>
        struct(lit(nu).as("num"), lit(de).as("den"),
          col(s"__c$i").as("n_pairs"))
      }: _*)).as("__r")).select(col("__r.num"), col("__r.den"),
        col("__r.n_pairs"))
    }),

    // NEAR-dup decontamination: minhash LSH candidates strictly BETWEEN
    // eval (doc_id < 50) and train — the fuzzy complement of d08's exact
    // 8-gram contamination. The plant: every eval doc re-enters train
    // with its first character replaced ('x' || rest) — a one-token edit
    // d08's exact grams mostly keep but shingle Jaccard ≈ (n−3)/(n−1)
    // ≈ 0.95 catches. Output is exact verified Jaccard, so the oracle is
    // the all-pairs cross filter; LSH gates only recall (miss ≈ 3e-12
    // at j = 0.9 with 16 bands × 2 rows).
    "d18_near_decontamination" -> ((s, dir) => {
      val d = table(s, dir, "documents").select(col("doc_id"), col("text"))
      val ev = d.filter(col("doc_id") < 50)
      val train = d.filter(col("doc_id") >= 50)
        .unionAll(ev.select((col("doc_id") + 1000000000000L).as("doc_id"),
          concat(lit("x"), expr("substr(text, 2)")).as("text")))
      Dedup.crossMinhashPairs(ev, train, "text", "doc_id",
        k = 3, bands = 16, rowsPerBand = 2, threshold = 0.8)
    }),

    // Directed 4-gram containment ≥ 9/10 — the truncated-mirror catcher
    // symmetric Jaccard dilutes away. The plant: every 3rd doc mirrored
    // as its first ⌊n/2⌋ TOKENS (word-boundary cut, so every half-gram
    // is a full-doc gram and containment is exactly 1); organic ≥0.9
    // whole-set containment is absent from this corpus, so the output is
    // precisely the plant echoes plus their (failing) reverses.
    "d16_containment" -> ((s, dir) => {
      val d = table(s, dir, "documents").select(col("doc_id"), col("text"))
      val toks = graft.functions.TextFunctions.tokens(col("text"))
      val planted = d.unionAll(
        d.filter(pmod(col("doc_id"), lit(3)) === 0)
          .select((col("doc_id") + 1000000000000L).as("doc_id"),
            array_join(slice(toks, lit(1), (size(toks) / 2).cast("int")), " ")
              .as("text")))
      Dedup.containmentPairs(planted, "text", "doc_id",
        num = 9, den = 10, gramK = 4)
    }),

    // Edit-distance-1 prefix-key pairs by symmetric-delete (SymSpell)
    // blocking: one-character typos token-set methods can't see. The
    // plant: every 5th doc mirrored with its first character replaced by
    // 'x' — a substitution the 24-char key catches at distance 1; the 23
    // organic shared-prefix clusters surface at distance 0.
    "d17_edit1_pairs" -> ((s, dir) => {
      val d = table(s, dir, "documents").select(col("doc_id"), col("text"))
      val planted = d.unionAll(
        d.filter(pmod(col("doc_id"), lit(5)) === 0)
          .select((col("doc_id") + 1000000000000L).as("doc_id"),
            concat(lit("x"), expr("substr(text, 2)")).as("text")))
      Dedup.symDeletePairs(planted, "text", "doc_id", keyLen = 24)
    }),

    // Cross-document duplicated-span coverage (the exact-substring-dedup
    // signal): per doc, token positions inside an 8-gram shared with at
    // least one other document. Natural corpus — the shared spans are
    // organic, no planting needed (~1000 shared 8-grams at sf0.01).
    "d07_dup_spans" -> ((s, dir) =>
      CorpusStats.dupSpanCoverage(
        table(s, dir, "documents"), "text", "doc_id", k = 8)),

    // Duplicated-span REMOVAL (the cleaning transform d07 only measures):
    // tokens inside any cross-document-shared 8-gram are dropped and the
    // remainder reassembles in order.
    "d09_despan" -> ((s, dir) =>
      CorpusStats.removeDupSpans(
        table(s, dir, "documents"), "text", "doc_id", k = 8)),

    // Benchmark decontamination: eval = doc_id < 50, train = the rest;
    // per eval doc, the fraction of its distinct 8-grams found anywhere
    // in the train corpus.
    "d08_contamination" -> ((s, dir) => {
      val d = table(s, dir, "documents")
      CorpusStats.contamination(
        train = d.filter(col("doc_id") >= 50),
        eval = d.filter(col("doc_id") < 50),
        "text", "doc_id", k = 8)
    }),

    // Time-windowed event dedup: one survivor per (user, event_type) per
    // hour bucket — the at-least-once delivery cleaner whose state stays
    // bucket-bounded at any stream length (see Dedup.windowedSurvivors;
    // the cross-batch unbounded variant is d02's incremental index).
    "d11_windowed_dedup" -> ((s, dir) =>
      graft.ops.Dedup.windowedSurvivors(
        table(s, dir, "events")
          .select(col("event_id"), col("user_id"), col("event_type"),
            col("ts")),
        keyCols = Seq("user_id", "event_type"), tsCol = "ts",
        tieCol = "event_id", bucketSeconds = 3600L)
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("bucket"), col("n_copies"))),

    // Quality-aware dedup: the keeper of each exact-duplicate group is
    // chosen by (quality DESC, raw length ASC, priority, id) rather than
    // d02's min-id rule — "keep the best, cleanest copy": the t02 score
    // ranks content quality, raw length breaks content-identical ties
    // toward the minimal-noise extraction (the copy without padding /
    // whitespace bloat). The planted variant doubles every space — same
    // normalized fingerprint, longer raw form — so the cleanliness
    // ordering has real work to do on any corpus; mirrors live in the
    // disjoint negative-id space (the d10 rule).
    "d12_quality_survivors" -> ((s, dir) => {
      val d = table(s, dir, "documents").select(col("doc_id"), col("text"))
      val planted = d
        .select(col("doc_id"), col("text"), lit(0).as("__prio"))
        .unionAll(d.select((-col("doc_id") - 1).as("doc_id"),
          regexp_replace(col("text"), " ", "  ").as("text"),
          lit(1).as("__prio")))
      val slim = planted.select(col("doc_id"), col("__prio"),
        graft.functions.TextFunctions.qualityScore(col("text"))
          .as("quality"),
        length(col("text")).cast("long").as("__len"),
        graft.functions.TextFunctions.fingerprint(col("text")).as("fp"))
      val byFp = org.apache.spark.sql.expressions.Window
        .partitionBy(col("fp"))
      slim
        .withColumn("__rn", row_number().over(byFp.orderBy(
          col("quality").desc, col("__len").asc,
          col("__prio").asc, col("doc_id").asc)))
        .withColumn("n_copies", count(lit(1)).over(byFp))
        .filter(col("__rn") === 1)
        .select(col("fp"), col("doc_id").as("keeper_id"),
          col("n_copies"), col("quality").as("keeper_quality"),
          col("__len").as("keeper_len"))
    }),

    // Dedup IMPACT report — what a dedup pass would save, by source:
    // doc and token counts of non-keeper copies (keeper = min doc_id
    // per normalized fingerprint, the d02 rule), over a corpus
    // re-ingested through a duplicating 'mirror' feed. The readout that
    // justifies/budgets dedup before training. Slim (fp, id, source,
    // ntok) rows ride the fp shuffle — full text never moves.
    "d10_dedup_impact" -> ((s, dir) => {
      val d = table(s, dir, "documents")
        .select(col("doc_id"), col("text"), col("source"))
      // planted mirror rows live in a DISJOINT id space (negative ids:
      // -id-1), so no corpus size can alias them onto genuine doc_ids.
      // The keeper is therefore rank-based, not min-id: originals beat
      // mirrors by priority, then min id — same verdicts, scale-proof.
      val withMirror = d
        .select(col("doc_id"), col("text"), col("source"), lit(0).as("__prio"))
        .unionAll(d.select((-col("doc_id") - 1).as("doc_id"), col("text"),
          lit("mirror").as("source"), lit(1).as("__prio")))
      val slim = withMirror.select(col("doc_id"), col("source"), col("__prio"),
        graft.functions.TextFunctions.tokenCount(col("text"))
          .cast("long").as("__ntok"),
        graft.functions.TextFunctions.fingerprint(col("text")).as("__fp"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("__fp"))
        .orderBy(col("__prio").asc, col("doc_id").asc)
      slim.withColumn("__rn", row_number().over(w))
        .groupBy(col("source"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(when(col("__rn") > 1, 1L).otherwise(0L)).as("n_dup_docs"),
          sum(col("__ntok")).as("tokens_total"),
          sum(when(col("__rn") > 1, col("__ntok"))
            .otherwise(lit(0L))).as("tokens_removed"))
    }),

    // Leakage-safe split: every copy of the same content lands on the
    // same side of the train/val/test boundary (split keyed on the
    // content group's min-id representative, not the row's own id —
    // q21's naive per-id split puts dup pairs on opposite sides, the
    // exact train→test contamination d08 measures after the fact). The
    // mirror feed plants a dup group per doc in the disjoint negative-id
    // space (the d10 rule), so the co-side guarantee has real work to do
    // on any corpus.
    "p11_leak_safe_split" -> ((s, dir) => {
      val d = table(s, dir, "documents").select(col("doc_id"), col("text"))
      val planted = d.unionAll(
        d.select((-col("doc_id") - 1).as("doc_id"), col("text")))
      Dedup.leakSafeSplit(planted, "text", "doc_id")
        .select(col("id").as("doc_id"), col("rep_id"), col("split"))
    }),

    // PARAPHRASE candidates — the cross-modal audit exact dedup cannot
    // do: embedding-near pairs (hyperplane-blocked cosine ≥ 0.99) whose
    // TEXT fingerprints DIFFER — same meaning, different words, the set
    // a curation pipeline sends to semantic review. Planted feed (the
    // d10/p11 discipline): every 5th vector mirrored at exactly ×2
    // magnitude with a " (mirror)" text variant (cosine 1, fp differs →
    // must surface), every 7th mirrored verbatim (fp equal → must be
    // filtered as an exact dup, not a paraphrase). Output is SCOPED to
    // same-base-id pairs (a vector with its own planted mirror): those
    // are identical-direction by construction, so hyperplane blocking
    // provably never splits them and blocked==full holds EXACTLY — a
    // natural (non-planted) pair at cosine ≥ 0.99 with distinct
    // directions has a ~(1−θ/π)^8 ≈ 69% bucket-agreement rate and
    // would make the blocked set data-dependent, so it is excluded from
    // the audit's contract rather than silently assumed absent.
    "d20_paraphrase_candidates" -> ((s, dir) => {
      val emb = table(s, dir, "embeddings")
      val corpus = emb
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
        .unionAll(emb.filter(pmod(col("vec_id"), lit(5)) === 0)
          .select((col("vec_id") + 1000000000000L).as("id"),
            transform(col("embedding"), x => x * lit(2.0f)).as("vec")))
        .unionAll(emb.filter(pmod(col("vec_id"), lit(7)) === 0)
          .select((col("vec_id") + 2000000000000L).as("id"),
            col("embedding").as("vec")))
      val pairs = Similarity.cosineNearDupPairs(corpus, threshold = 0.99)
      val d = table(s, dir, "documents")
      import graft.functions.TextFunctions.fingerprint
      val fps = d.select(col("doc_id").as("id"),
          fingerprint(col("text")).as("fp"))
        .unionAll(d.filter(pmod(col("doc_id"), lit(5)) === 0)
          .select((col("doc_id") + 1000000000000L).as("id"),
            fingerprint(concat(col("text"), lit(" (mirror)"))).as("fp")))
        .unionAll(d.filter(pmod(col("doc_id"), lit(7)) === 0)
          .select((col("doc_id") + 2000000000000L).as("id"),
            fingerprint(col("text")).as("fp")))
      pairs
        .filter(pmod(col("id_a"), lit(1000000000000L)) ===
          pmod(col("id_b"), lit(1000000000000L)))
        .join(fps.select(col("id").as("id_a"), col("fp").as("__fa")),
          Seq("id_a"))
        .join(fps.select(col("id").as("id_b"), col("fp").as("__fb")),
          Seq("id_b"))
        .filter(col("__fa") =!= col("__fb"))
        .select(col("id_a"), col("id_b"), col("sim"))
    }),

    // Leak-safe K-FOLD cross-validation assignment: p11's rep-keyed
    // co-assignment guarantee generalized from one train/val/test cut
    // to 5 rotating folds (Dedup.kFold) — same planted dup-pair feed,
    // so the guarantee is exercised, not vacuous.
    "p25_kfold_assign" -> ((s, dir) => {
      val d = table(s, dir, "documents").select(col("doc_id"), col("text"))
      val planted = d.unionAll(
        d.select((-col("doc_id") - 1).as("doc_id"), col("text")))
      Dedup.kFold(planted, "text", "doc_id", k = 5)
        .select(col("id").as("doc_id"), col("rep_id"), col("fold"))
    }),

    // LSH parameter-tuning report: candidate count + recall vs exact
    // Jaccard >= 0.5 for three (bands, rows) cuts of one 16-hash md5
    // signature. The mirror feed plants a ~0.6-Jaccard near-dup per doc
    // (its first 3/5 tokens, negative-id space) so the configs' recall
    // genuinely separates — (16,1) catches nearly all, (4,4) misses most
    // — instead of saturating at 1.0 on exact dups.
    "d14_lsh_tuning" -> ((s, dir) => {
      // ONE scan + one exchange for the planted feed: each doc explodes
      // into itself and its truncated mirror (a UNION of scan branches
      // reads the parquet twice and tokenizes on the single-row-group
      // scan task)
      val planted = table(s, dir, "documents")
        .select(col("doc_id"), col("text"))
        .repartition(s.sparkContext.defaultParallelism)
        .withColumn("toks",
          graft.functions.TextFunctions.tokens(lower(col("text"))))
        .select(explode(array(
          struct(col("doc_id").as("doc_id"), col("text").as("text")),
          struct((-col("doc_id") - 1).as("doc_id"),
            expr("array_join(slice(toks, 1, greatest((size(toks) * 3) div 5, 1)), ' ')")
              .as("text")))).as("r"))
        .select(col("r.doc_id").as("doc_id"), col("r.text").as("text"))
      Dedup.lshTuningReport(planted, "text", "doc_id")
    }),

    // Cross-source exact-duplication matrix: distinct (fingerprint,
    // source) pairs self-joined on fingerprint — per-fp cell bounded by
    // |sources|, so no group size can go quadratic. The 'mirror' feed
    // plants every document into a second source, giving each real
    // source a known full-overlap row against 'mirror' on top of any
    // genuine cross-source duplication in the corpus.
    "d13_source_overlap" -> ((s, dir) => {
      val d = table(s, dir, "documents").select(col("text"), col("source"))
      val withMirror = d.unionAll(
        d.select(col("text"), lit("mirror").as("source")))
      Dedup.sourceOverlap(withMirror, "text", "source")
    })
  )

  private val plantedSql =
    """(SELECT doc_id, text FROM documents
        UNION ALL SELECT doc_id + 1000000000000 AS doc_id, text FROM documents)"""

  private val normFp = """md5(trim(regexp_replace(lower(text), '[ \t\n\u000B\f\r]+', ' ', 'g')))"""

  val oracles: Map[String, String] = Map(
    // Mirrors d13: same mirror feed, same normalized fingerprint,
    // distinct (fp, source) before the self-join, lexicographic pair
    // orientation. count(*) is already distinct-fp per pair.
    "d13_source_overlap" ->
      s"""WITH u AS (SELECT text, source FROM documents
                     UNION ALL SELECT text, 'mirror' AS source FROM documents),
          f AS (SELECT DISTINCT $normFp AS fp, source FROM u),
          p AS (SELECT a.source AS source_a, b.source AS source_b
                FROM f a JOIN f b ON a.fp = b.fp AND a.source < b.source)
          SELECT source_a, source_b, CAST(count(*) AS BIGINT) AS n_shared_fps
          FROM p GROUP BY source_a, source_b""",
    // Mirrors d14 end-to-end: truncated-prefix mirror feed, trigram
    // shingles, the 16-hash md5 family (15 hex chars -> 60-bit ints, the
    // p07/q21 hex-parse idiom), band keys as 'b|v1,v2', exact-Jaccard
    // truth at inter*2 >= union, per-config candidate/detected counts.
    "d14_lsh_tuning" -> {
      val lowTk =
        """list_filter(string_split_regex(lower(text), '[ \t\n\u000B\f\r]+'), t -> t <> '')"""
      s"""WITH u AS (
            SELECT doc_id, text FROM documents
            UNION ALL
            SELECT -doc_id - 1,
              array_to_string(tk[1:greatest((len(tk) * 3) // 5, 1)], ' ')
            FROM (SELECT doc_id, $lowTk AS tk FROM documents)),
          toks AS (SELECT doc_id, $lowTk AS tk FROM u),
          sh AS (
            SELECT doc_id,
              list_distinct(list_transform(range(1, len(tk) - 1),
                i -> array_to_string(tk[i:i+2], ' '))) AS shingles
            FROM toks WHERE len(tk) >= 3),
          hh AS (
            SELECT doc_id,
              list_transform(shingles, s -> struct_pack(
                h0 := CAST(concat('0x', substring(md5(s), 1, 15)) AS BIGINT),
                h1 := CAST(concat('0x', substring(md5(s), 17, 15)) AS BIGINT)
                      % 1000000007)) AS hs
            FROM sh),
          sig AS (
            SELECT doc_id,
              list_sort(list_distinct(list_transform(hs, h -> h.h0))) AS hset,
              list_transform(range(0, 16),
                j -> list_min(list_transform(hs,
                  h -> h.h0 + j * h.h1))) AS mh
            FROM hh),
          ex AS (SELECT doc_id, unnest(
              hset[1 : len(hset) - ((len(hset) * 1 + 1) // 2) + 1]) AS h
            FROM sig),
          shared AS (
            SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
            FROM ex a JOIN ex b ON a.h = b.h AND a.doc_id < b.doc_id),
          truth AS (
            SELECT id_a, id_b FROM (
              SELECT id_a, id_b,
                len(list_intersect(sa.hset, sb.hset)) AS inter,
                len(sa.hset) + len(sb.hset)
                  - len(list_intersect(sa.hset, sb.hset)) AS uni
              FROM shared
              JOIN sig sa ON id_a = sa.doc_id
              JOIN sig sb ON id_b = sb.doc_id)
            WHERE inter * 2 >= uni),
          cfg AS (SELECT * FROM (VALUES (16, 1), (8, 2), (4, 4)) c(bands, rpb)),
          keys AS (
            SELECT cfg.bands, cfg.rpb, sig.doc_id,
              unnest(list_transform(range(0, cfg.bands),
                b -> concat(CAST(b AS VARCHAR), '|',
                  array_to_string(mh[b * cfg.rpb + 1 : (b + 1) * cfg.rpb], ',')))) AS k
            FROM sig CROSS JOIN cfg),
          cand AS (
            SELECT DISTINCT a.bands AS bands, a.rpb AS rpb,
              a.doc_id AS id_a, b.doc_id AS id_b
            FROM keys a JOIN keys b
              ON a.bands = b.bands AND a.rpb = b.rpb AND a.k = b.k
                AND a.doc_id < b.doc_id),
          nc AS (SELECT bands, rpb, count(*) AS n_candidates
                 FROM cand GROUP BY 1, 2),
          nd AS (SELECT bands, rpb, count(*) AS n_detected
                 FROM cand JOIN truth USING (id_a, id_b) GROUP BY 1, 2),
          nt AS (SELECT count(*) AS n_true FROM truth)
          SELECT cfg.bands, cfg.rpb AS rows_per_band,
            coalesce(nc.n_candidates, 0) AS n_candidates,
            nt.n_true,
            coalesce(nd.n_detected, 0) AS n_detected,
            round(CASE WHEN nt.n_true > 0
              THEN CAST(coalesce(nd.n_detected, 0) AS DOUBLE) / CAST(nt.n_true AS DOUBLE)
              ELSE 1.0 END, 6) AS recall
          FROM cfg LEFT JOIN nc USING (bands, rpb)
          LEFT JOIN nd USING (bands, rpb)
          CROSS JOIN nt"""
    },
    // Mirrors p11: same negative-id mirror feed, window-min
    // representative per normalized fingerprint, q21's md5 split-band
    // arithmetic keyed on rep_id.
    "p11_leak_safe_split" ->
      s"""WITH u AS (SELECT doc_id, text FROM documents
              UNION ALL SELECT -doc_id - 1, text FROM documents),
          f AS (SELECT doc_id, $normFp AS fp FROM u),
          r AS (SELECT doc_id,
                  min(doc_id) OVER (PARTITION BY fp) AS rep_id FROM f),
          b AS (SELECT doc_id, rep_id,
                  CAST(CAST(concat('0x',
                    substring(md5(CAST(rep_id AS VARCHAR)), 1, 8)) AS BIGINT)
                  % 100 AS INT) AS bucket FROM r)
          SELECT doc_id, rep_id,
            CASE WHEN bucket < 80 THEN 'train'
                 WHEN bucket < 90 THEN 'val'
                 ELSE 'test' END AS split
          FROM b""",
    // Mirrors d20: identical planted corpus (×2 float scaling is an
    // exact exponent bump, so directions are identical), FULL pairwise
    // ≥ 0.99 restricted — like the Spark side — to same-base-id pairs
    // (id_a ≡ id_b mod 1e12): those are a vector with its own mirror,
    // identical-direction, so they always share their exact hyperplane
    // bucket and blocked==full holds exactly (the v03 equality
    // argument, now scoped to where it is actually a theorem). Same
    // mirrored fingerprints, same fp-differs filter.
    "d20_paraphrase_candidates" ->
      s"""WITH c AS (
            SELECT vec_id AS id, embedding AS vec FROM embeddings
            UNION ALL
            SELECT vec_id + 1000000000000,
              list_transform(embedding, x -> x * CAST(2.0 AS FLOAT))
            FROM embeddings WHERE vec_id % 5 = 0
            UNION ALL
            SELECT vec_id + 2000000000000, embedding
            FROM embeddings WHERE vec_id % 7 = 0),
          p AS (SELECT a.id AS id_a, b.id AS id_b,
                  round(list_cosine_similarity(
                    a.vec::DOUBLE[], b.vec::DOUBLE[]), 6) AS sim
                FROM c a JOIN c b
                  ON a.id < b.id
                  AND a.id % 1000000000000 = b.id % 1000000000000
                WHERE list_cosine_similarity(
                  a.vec::DOUBLE[], b.vec::DOUBLE[]) >= 0.99),
          f AS (
            SELECT doc_id AS id, $normFp AS fp FROM documents
            UNION ALL
            SELECT doc_id + 1000000000000,
              md5(trim(regexp_replace(lower(text || ' (mirror)'),
                '[ \t\n\u000B\f\r]+', ' ', 'g')))
            FROM documents WHERE doc_id % 5 = 0
            UNION ALL
            SELECT doc_id + 2000000000000, $normFp
            FROM documents WHERE doc_id % 7 = 0)
        SELECT p.id_a, p.id_b, p.sim
        FROM p
        JOIN f fa ON fa.id = p.id_a
        JOIN f fb ON fb.id = p.id_b
        WHERE fa.fp <> fb.fp""",
    // Mirrors p25: the p11 fingerprint/rep/bucket replay with the
    // bucket folded mod 5 instead of banded.
    "p25_kfold_assign" ->
      s"""WITH u AS (SELECT doc_id, text FROM documents
              UNION ALL SELECT -doc_id - 1, text FROM documents),
          f AS (SELECT doc_id, $normFp AS fp FROM u),
          r AS (SELECT doc_id,
                  min(doc_id) OVER (PARTITION BY fp) AS rep_id FROM f),
          b AS (SELECT doc_id, rep_id,
                  CAST(CAST(concat('0x',
                    substring(md5(CAST(rep_id AS VARCHAR)), 1, 8)) AS BIGINT)
                  % 100 AS INT) AS bucket FROM r)
          SELECT doc_id, rep_id, CAST(bucket % 5 AS INT) AS fold
          FROM b""",
    // Mirrors d12: the shared rounded quality score over the same padded
    // feed ('g' flag = Spark's replace-all), same (quality DESC, length
    // ASC, prio, id) keeper order — quality is round-6 identical on both
    // engines and length/prio/id are integers, so the ordering cannot
    // diverge.
    "d12_quality_survivors" -> {
      import TextQueries.qualitySql
      s"""WITH u AS (SELECT doc_id, text, 0 AS prio FROM documents
              UNION ALL
              SELECT -doc_id - 1, regexp_replace(text, ' ', '  ', 'g'), 1
              FROM documents),
          q AS (SELECT doc_id, prio, $qualitySql AS quality,
                  CAST(length(text) AS BIGINT) AS len,
                  $normFp AS fp FROM u),
          r AS (SELECT *,
                  row_number() OVER (PARTITION BY fp
                    ORDER BY quality DESC, len, prio, doc_id) AS rn,
                  count(*) OVER (PARTITION BY fp) AS n_copies FROM q)
          SELECT fp, doc_id AS keeper_id, n_copies,
            quality AS keeper_quality, len AS keeper_len
          FROM r WHERE rn = 1"""
    },

    // Mirrors d11: same integer epoch-second bucketing (`//` == `div` on
    // positive epochs), same (es, event_id) keeper order.
    "d11_windowed_dedup" ->
      """WITH e AS (SELECT event_id, user_id, event_type,
              epoch_us(ts) // 1000000 AS es FROM events),
          b AS (SELECT *, es // 3600 AS bucket FROM e),
          r AS (SELECT *,
                  row_number() OVER (PARTITION BY user_id, event_type, bucket
                    ORDER BY es, event_id) AS rn,
                  count(*) OVER (PARTITION BY user_id, event_type, bucket)
                    AS n_copies
                FROM b)
          SELECT event_id, user_id, event_type, bucket, n_copies
          FROM r WHERE rn = 1""",

    // Mirrors d10: same disjoint-id mirror feed (-id-1), d01/d02
    // normalized fingerprint, (priority, id) rank-based keeper, integer
    // token sums (nTokens = t01's shared token fragment).
    "d10_dedup_impact" -> {
      s"""WITH u AS (SELECT doc_id, text, source, 0 AS prio FROM documents
              UNION ALL
              SELECT -doc_id - 1, text, 'mirror', 1 FROM documents),
          f AS (SELECT doc_id, source, prio,
                  CAST(${TextQueries.nTokens} AS BIGINT) AS ntok,
                  $normFp AS fp
                FROM u),
          k AS (SELECT *, row_number() OVER (PARTITION BY fp
                  ORDER BY prio ASC, doc_id ASC) AS rn FROM f)
          SELECT source, count(*) AS n_docs,
            CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_docs,
            CAST(sum(ntok) AS BIGINT) AS tokens_total,
            CAST(sum(CASE WHEN rn > 1 THEN ntok ELSE 0 END) AS BIGINT) AS tokens_removed
          FROM k GROUP BY source"""
    },
    // Exact 3-token-shingle Jaccard ≥ 0.8 — the same set d03's verified
    // LSH candidates produce (xxhash64 only drives candidate generation;
    // verification is over the shingle sets themselves, and jaccard is a
    // raw IEEE division of the same integers → bit-identical doubles).
    "d03_minhash_pairs" ->
      s"""WITH t AS (
            SELECT doc_id AS id,
              trim(regexp_replace(lower(text), '[ \t\n\u000B\f\r]+', ' ', 'g')) AS norm
            FROM $plantedSql d),
          tk AS (
            SELECT id, norm,
              list_filter(string_split(norm, ' '), x -> x <> '') AS toks
            FROM t),
          sh AS (
            SELECT id, unnest(CASE WHEN len(toks) >= 3
              THEN list_distinct(list_transform(range(1, len(toks) - 1),
                     i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
              ELSE [norm] END) AS s
            FROM tk),
          sizes AS (SELECT id, count(*) AS sz FROM sh GROUP BY id),
          inter AS (
            SELECT a.id AS id_a, b.id AS id_b, count(*) AS inter
            FROM sh a JOIN sh b ON a.s = b.s AND a.id < b.id
            GROUP BY 1, 2),
          j AS (
            SELECT id_a, id_b,
              CAST(inter AS DOUBLE) / CAST(sa.sz + sb.sz - inter AS DOUBLE) AS jaccard
            FROM inter
            JOIN sizes sa ON id_a = sa.id
            JOIN sizes sb ON id_b = sb.id)
          SELECT id_a, id_b, jaccard FROM j WHERE jaccard >= 0.8""",
    // Recomputes the md5-word simhash bit-for-bit: per (doc, bit) majority
    // vote over the token multiset, then popcount of the xor. The chunked
    // LSH on the Spark side only affects candidate generation — pigeonhole
    // guarantees total recall at dist ≤ 3 — so the verified pair set is
    // exactly this all-pairs filter.
    "d04_simhash_pairs" ->
      s"""WITH t AS (
            SELECT doc_id AS id,
              list_filter(string_split_regex(lower(text), '[ \t\n\u000B\f\r]+'),
                x -> x <> '') AS toks
            FROM $plantedSql d),
          tok AS (SELECT id, unnest(toks) AS w FROM t),
          bits AS (
            SELECT id, j,
              sum(CASE WHEN j < 32
                  THEN (CAST(concat('0x', substring(md5(w), 1, 8)) AS BIGINT) >> j) & 1
                  ELSE (CAST(concat('0x', substring(md5(w), 9, 8)) AS BIGINT) >> (j - 32)) & 1 END) AS c,
              count(*) AS n
            FROM tok CROSS JOIN (SELECT unnest(range(0, 64)) AS j) js
            GROUP BY id, j),
          sh AS (
            SELECT id,
              CAST(sum(CASE WHEN j < 32 AND c * 2 > n THEN CAST(1 AS BIGINT) << j ELSE 0 END) AS BIGINT) AS hi,
              CAST(sum(CASE WHEN j >= 32 AND c * 2 > n THEN CAST(1 AS BIGINT) << (j - 32) ELSE 0 END) AS BIGINT) AS lo
            FROM bits GROUP BY id)
          SELECT a.id AS id_a, b.id AS id_b,
            CAST(bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) AS INTEGER) AS dist
          FROM sh a JOIN sh b ON a.id < b.id
          WHERE bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) <= 3""",
    "d01_exact_groups" ->
      s"""SELECT $normFp AS fp, min(doc_id) AS keeper_id, count(*) AS n_copies
          FROM $plantedSql d GROUP BY 1""",
    "d02_exact_survivors" ->
      s"""SELECT min(doc_id) AS doc_id FROM $plantedSql d GROUP BY $normFp""",
    "d05_ngram_jaccard" ->
      """WITH tok AS (
           SELECT DISTINCT doc_id AS id,
             unnest(list_distinct(list_filter(string_split_regex(lower(text), '[ \t\n\u000B\f\r]+'), t -> t <> ''))) AS w
           FROM documents),
         sizes AS (SELECT id, count(*) AS sz FROM tok GROUP BY id),
         inter AS (
           SELECT a.id AS id_a, b.id AS id_b, count(*) AS inter
           FROM tok a JOIN tok b ON a.w = b.w AND a.id < b.id
           GROUP BY 1, 2)
         SELECT id_a, id_b, inter, (sa.sz + sb.sz - inter) AS uni
         FROM inter
         JOIN sizes sa ON id_a = sa.id
         JOIN sizes sb ON id_b = sb.id
         WHERE inter * 20 >= (sa.sz + sb.sz - inter) * 19""",
    "d06_dup_clusters" ->
      s"""SELECT min(doc_id) OVER (PARTITION BY fp) AS cluster_id, doc_id AS id
          FROM (SELECT doc_id, $normFp AS fp FROM $plantedSql d)
          QUALIFY count(*) OVER (PARTITION BY fp) > 1"""
    ,
    // Mirrors d19: the d05 all-pairs token-set machinery once, then the
    // four integer threshold counts (BIGINT).
    "d19_threshold_curve" ->
      """WITH tok AS (
           SELECT DISTINCT doc_id AS id,
             unnest(list_distinct(list_filter(string_split_regex(lower(text), '[ \t\n\u000B\f\r]+'), t -> t <> ''))) AS w
           FROM documents),
         sizes AS (SELECT id, count(*) AS sz FROM tok GROUP BY id),
         inter AS (
           SELECT a.id AS id_a, b.id AS id_b, count(*) AS inter
           FROM tok a JOIN tok b ON a.w = b.w AND a.id < b.id
           GROUP BY 1, 2),
         jj AS (SELECT inter, (sa.sz + sb.sz - inter) AS uni
                FROM inter
                JOIN sizes sa ON id_a = sa.id
                JOIN sizes sb ON id_b = sb.id)
         SELECT 7 AS num, 10 AS den, CAST(count(*) AS BIGINT) AS n_pairs
         FROM jj WHERE inter * 10 >= uni * 7
         UNION ALL
         SELECT 4, 5, CAST(count(*) AS BIGINT)
         FROM jj WHERE inter * 5 >= uni * 4
         UNION ALL
         SELECT 9, 10, CAST(count(*) AS BIGINT)
         FROM jj WHERE inter * 10 >= uni * 9
         UNION ALL
         SELECT 1, 1, CAST(count(*) AS BIGINT)
         FROM jj WHERE inter >= uni""",
    // Mirrors d18: the d03 shingle construction on each side, the same
    // first-char plant into train, all-pairs CROSS join (no a.id < b.id
    // — sides are disjoint), identical integer-division Jaccard.
    "d18_near_decontamination" ->
      """WITH ev AS (SELECT doc_id, text FROM documents WHERE doc_id < 50),
         tr AS (SELECT doc_id, text FROM documents WHERE doc_id >= 50
                UNION ALL
                SELECT doc_id + 1000000000000, 'x' || substr(text, 2)
                FROM documents WHERE doc_id < 50),
         t1 AS (SELECT doc_id AS id,
                  trim(regexp_replace(lower(text), '[ \t\n\u000B\f\r]+', ' ', 'g'))
                    AS norm
                FROM ev),
         t2 AS (SELECT doc_id AS id,
                  trim(regexp_replace(lower(text), '[ \t\n\u000B\f\r]+', ' ', 'g'))
                    AS norm
                FROM tr),
         s1 AS (SELECT id, unnest(CASE WHEN len(toks) >= 3
                  THEN list_distinct(list_transform(range(1, len(toks) - 1),
                         i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
                  ELSE [norm] END) AS s
                FROM (SELECT id, norm,
                        list_filter(string_split(norm, ' '), x -> x <> '')
                          AS toks FROM t1)),
         s2 AS (SELECT id, unnest(CASE WHEN len(toks) >= 3
                  THEN list_distinct(list_transform(range(1, len(toks) - 1),
                         i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
                  ELSE [norm] END) AS s
                FROM (SELECT id, norm,
                        list_filter(string_split(norm, ' '), x -> x <> '')
                          AS toks FROM t2)),
         z1 AS (SELECT id, count(*) AS sz FROM s1 GROUP BY id),
         z2 AS (SELECT id, count(*) AS sz FROM s2 GROUP BY id),
         inter AS (SELECT a.id AS id_a, b.id AS id_b, count(*) AS inter
                   FROM s1 a JOIN s2 b ON a.s = b.s GROUP BY 1, 2),
         j AS (SELECT id_a, id_b,
                 CAST(inter AS DOUBLE)
                   / CAST(za.sz + zb.sz - inter AS DOUBLE) AS jaccard
               FROM inter
               JOIN z1 za ON id_a = za.id
               JOIN z2 zb ON id_b = zb.id)
         SELECT id_a, id_b, jaccard FROM j WHERE jaccard >= 0.8""",
    // Mirrors d16: same half-token plant (word-boundary cut), same
    // distinct-4-gram sets, ALL-PAIRS gram join + integer containment
    // filter — naive where the Spark side prefix-filters, identical
    // verdicts.
    "d16_containment" ->
      """WITH u AS (SELECT doc_id, text FROM documents
           UNION ALL
           SELECT doc_id + 1000000000000,
             array_to_string(toks[1:len(toks)//2], ' ')
           FROM (SELECT doc_id,
                   list_filter(string_split_regex(text, '[ \t\n\u000B\f\r]+'),
                     t -> t <> '') AS toks
                 FROM documents)
           WHERE doc_id % 3 = 0),
         t AS (SELECT doc_id,
                 list_filter(string_split_regex(lower(text), '[ \t\n\u000B\f\r]+'),
                   x -> x <> '') AS toks
               FROM u),
         g AS (SELECT doc_id,
                 unnest(list_distinct(list_transform(range(1, len(toks) - 2),
                   i -> array_to_string(toks[i:i+3], ' ')))) AS w
               FROM t WHERE len(toks) >= 4),
         sizes AS (SELECT doc_id AS id, count(*) AS sz FROM g GROUP BY 1),
         inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                     count(*) AS inter
                   FROM g a JOIN g b ON a.w = b.w AND a.doc_id <> b.doc_id
                   GROUP BY 1, 2)
         SELECT id_a, id_b, inter, sa.sz AS sz_a, sb.sz AS sz_b
         FROM inter
         JOIN sizes sa ON id_a = sa.id
         JOIN sizes sb ON id_b = sb.id
         WHERE inter * 10 >= sa.sz * 9""",
    // Mirrors d17: same first-char-substitution plant, naive all-pairs
    // levenshtein over the 24-char lowercase keys where the Spark side
    // blocks by symmetric deletes — identical pair set (blocking is
    // exact at distance 1).
    "d17_edit1_pairs" ->
      """WITH u AS (SELECT doc_id, text FROM documents
           UNION ALL
           SELECT doc_id + 1000000000000, 'x' || substr(text, 2)
           FROM documents WHERE doc_id % 5 = 0),
         k AS (SELECT doc_id AS id, lower(substr(text, 1, 24)) AS k FROM u)
         SELECT a.id AS id_a, b.id AS id_b,
           CAST(levenshtein(a.k, b.k) AS INTEGER) AS dist
         FROM k a JOIN k b ON a.id < b.id
         WHERE levenshtein(a.k, b.k) <= 1""",
    // Mirrors d15: the d06 exact-cluster oracle over the
    // variable-multiplicity plant, then size → count histogram. On this
    // corpus signature equality ⟺ normalized-text equality (the d06
    // argument), so minhash components == fp clusters.
    "d15_cluster_sizes" ->
      s"""WITH u AS (SELECT doc_id, text FROM documents
                     UNION ALL SELECT doc_id + 1000000000000, text FROM documents
                     UNION ALL SELECT doc_id + 2000000000000, text FROM documents
                     WHERE doc_id % 3 = 0),
          c AS (SELECT min(doc_id) OVER (PARTITION BY fp) AS cluster_id
                FROM (SELECT doc_id, $normFp AS fp FROM u)
                QUALIFY count(*) OVER (PARTITION BY fp) > 1),
          s AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size
                FROM c GROUP BY cluster_id)
          SELECT cluster_size, CAST(count(*) AS BIGINT) AS n_clusters
          FROM s GROUP BY cluster_size""",
    // Mirrors CorpusStats.dupSpanCoverage (k=8): 1-based gram positions,
    // covered token indices p..p+7 de-duplicated per doc, BIGINT parity.
    "d07_dup_spans" ->
      """WITH t AS (SELECT doc_id,
            list_filter(string_split_regex(lower(text), '[ \t\n\u000B\f\r]+'), x -> x <> '') AS toks
          FROM documents),
          g AS (SELECT doc_id,
                  unnest(list_transform(range(1, len(toks) - 6),
                    i -> struct_pack(p := i, s := array_to_string(toks[i:i+7], ' ')))) AS gs
                FROM t WHERE len(toks) >= 8),
          grams AS (SELECT doc_id, gs.p AS p, gs.s AS s FROM g),
          shared AS (SELECT s FROM grams GROUP BY s HAVING count(DISTINCT doc_id) > 1),
          cov AS (SELECT DISTINCT doc_id, ti FROM (
                    SELECT grams.doc_id, unnest(range(p, p + 8)) AS ti
                    FROM grams JOIN shared USING (s))),
          cnt AS (SELECT doc_id, count(*) AS n_dup_tokens FROM cov GROUP BY doc_id)
          SELECT t.doc_id,
            CAST(len(t.toks) AS BIGINT) AS n_tokens,
            coalesce(cnt.n_dup_tokens, 0) AS n_dup_tokens,
            round(CASE WHEN len(t.toks) > 0
              THEN CAST(coalesce(cnt.n_dup_tokens, 0) AS DOUBLE) / CAST(len(t.toks) AS DOUBLE)
              ELSE 0.0 END, 6) AS dup_tok_frac
          FROM t LEFT JOIN cnt USING (doc_id)""",
    // Mirrors CorpusStats.removeDupSpans: the d07 covered-position CTEs,
    // then ordered reassembly of the uncovered tokens (list ORDER BY ti).
    "d09_despan" ->
      """WITH t AS (SELECT doc_id,
            list_filter(string_split_regex(lower(text), '[ \t\n\u000B\f\r]+'), x -> x <> '') AS toks
          FROM documents),
          g AS (SELECT doc_id,
                  unnest(list_transform(range(1, len(toks) - 6),
                    i -> struct_pack(p := i, s := array_to_string(toks[i:i+7], ' ')))) AS gs
                FROM t WHERE len(toks) >= 8),
          grams AS (SELECT doc_id, gs.p AS p, gs.s AS s FROM g),
          shared AS (SELECT s FROM grams GROUP BY s HAVING count(DISTINCT doc_id) > 1),
          cov AS (SELECT DISTINCT doc_id, ti FROM (
                    SELECT grams.doc_id, unnest(range(p, p + 8)) AS ti
                    FROM grams JOIN shared USING (s))),
          tokpos AS (SELECT doc_id,
                  unnest(list_transform(range(1, len(toks) + 1),
                    i -> struct_pack(ti := i, tk := toks[i]))) AS s
                FROM t),
          tp AS (SELECT doc_id, s.ti AS ti, s.tk AS tk FROM tokpos),
          kept AS (SELECT tp.doc_id, tp.ti, tp.tk
                   FROM tp LEFT JOIN cov
                     ON tp.doc_id = cov.doc_id AND tp.ti = cov.ti
                   WHERE cov.ti IS NULL),
          cl AS (SELECT doc_id, count(*) AS n_kept,
                   array_to_string(list(tk ORDER BY ti), ' ') AS clean_text
                 FROM kept GROUP BY doc_id)
          SELECT t.doc_id,
            CAST(len(t.toks) AS BIGINT) AS n_tokens,
            coalesce(cl.n_kept, 0) AS n_kept,
            coalesce(cl.clean_text, '') AS clean_text
          FROM t LEFT JOIN cl USING (doc_id)""",
    // Mirrors CorpusStats.contamination (k=8): distinct grams per eval
    // doc, train side collapsed to a distinct gram set, BIGINT parity.
    "d08_contamination" ->
      """WITH t AS (SELECT doc_id,
            list_filter(string_split_regex(lower(text), '[ \t\n\u000B\f\r]+'), x -> x <> '') AS toks
          FROM documents),
          eg AS (SELECT doc_id, unnest(list_distinct(
                   list_transform(range(1, len(toks) - 6),
                     i -> array_to_string(toks[i:i+7], ' ')))) AS g
                 FROM t WHERE doc_id < 50 AND len(toks) >= 8),
          tg AS (SELECT DISTINCT unnest(list_distinct(
                   list_transform(range(1, len(toks) - 6),
                     i -> array_to_string(toks[i:i+7], ' ')))) AS g
                 FROM t WHERE doc_id >= 50 AND len(toks) >= 8),
          hit AS (SELECT eg.doc_id, count(*) AS n_grams,
                    CAST(sum(CASE WHEN tg.g IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS n_contaminated
                  FROM eg LEFT JOIN tg USING (g)
                  GROUP BY eg.doc_id)
          SELECT d.doc_id,
            coalesce(hit.n_grams, 0) AS n_grams,
            coalesce(hit.n_contaminated, 0) AS n_contaminated,
            round(CASE WHEN coalesce(hit.n_grams, 0) > 0
              THEN CAST(hit.n_contaminated AS DOUBLE) / CAST(hit.n_grams AS DOUBLE)
              ELSE 0.0 END, 6) AS contamination_frac
          FROM (SELECT doc_id FROM documents WHERE doc_id < 50) d
          LEFT JOIN hit USING (doc_id)"""
  )
}
