package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import graft.ops.CorpusStats

/** Hand-computed ground truth for the corpus-stats operators
  * (repetition signals, duplicated-span coverage, vocab/OOV).
  */
class CorpusStatsSpec extends SparkSessionSpec {
  import spark.implicits._

  test("repetitionSignals: hand-computed counts, ratios, and edge docs") {
    val df = Seq(
      (1L, "a b a b a"),         // 5 toks, 2 uniq, top a=3; bigrams: ab,ba,ab,ba → 4 total, 2 dup
      (2L, "x"),                 // 1 tok: no bigrams
      (3L, "  "),                // whitespace-only: zero everything
      (4L, "T t T")              // lowercased: t=3
    ).toDF("doc_id", "text")
    val got = CorpusStats.repetitionSignals(df, "text", "doc_id")
      .orderBy("doc_id").collect()
    assert(got(0) === Row(1L, 5L, 2L, 3L, 0.6, 4L, 2L, 0.5))
    assert(got(1) === Row(2L, 1L, 1L, 1L, 1.0, 0L, 0L, 0.0))
    assert(got(2) === Row(3L, 0L, 0L, 0L, 0.0, 0L, 0L, 0.0))
    assert(got(3) === Row(4L, 3L, 1L, 3L, 1.0, 2L, 1L, 0.5))
  }

  test("dupSpanCoverage: shared k-grams cover merged positions, once") {
    // docs 1 and 2 share the 3-gram "p q r" twice over (positions overlap
    // in doc 1: "p q r q r" has grams [p q r, q r q, r q r] — only
    // "p q r" is shared); doc 3 is disjoint.
    val df = Seq(
      (1L, "p q r q r"),
      (2L, "z p q r z"),
      (3L, "m n o m n")
    ).toDF("doc_id", "text")
    val got = CorpusStats.dupSpanCoverage(df, "text", "doc_id", k = 3)
      .orderBy("doc_id").collect()
    // doc 1: "p q r" at pos 1 covers tokens 1..3 of 5
    assert(got(0) === Row(1L, 5L, 3L, 0.6))
    // doc 2: "p q r" at pos 2 covers tokens 2..4 of 5
    assert(got(1) === Row(2L, 5L, 3L, 0.6))
    // doc 3: nothing shared
    assert(got(2) === Row(3L, 5L, 0L, 0.0))
  }

  test("ngramNovelty: first occurrence novel, repeats stale, short docs absent") {
    val df = Seq(
      (1L, "a b c d e"),   // grams "a b c d","b c d e" — both first here
      (2L, "a b c d e"),   // exact repeat: 0 novel
      (3L, "a b c d x"),   // "a b c d" seen, "b c d x" new: 1/2
      (4L, "a b c")        // < 4 tokens: no grams, absent
    ).toDF("doc_id", "text")
    val got = CorpusStats.ngramNovelty(df, "text", "doc_id", k = 4)
      .orderBy("doc_id").collect()
    assert(got.length === 3)
    assert(got(0) === Row(1L, 2L, 2L, 1.0))
    assert(got(1) === Row(2L, 2L, 0L, 0.0))
    assert(got(2) === Row(3L, 2L, 1L, 0.5))
  }

  test("dupSpanCoverage: overlapping shared grams merge their coverage") {
    // both docs contain "a b c d" AND "b c d e": spans [1..4] and [2..5]
    // merge to 5 covered tokens, not 8
    val df = Seq(
      (1L, "a b c d e"),
      (2L, "a b c d e x")
    ).toDF("doc_id", "text")
    val got = CorpusStats.dupSpanCoverage(df, "text", "doc_id", k = 4)
      .orderBy("doc_id").collect()
    assert(got(0) === Row(1L, 5L, 5L, 1.0))
    assert(got(1) === Row(2L, 6L, 5L, round6(5.0 / 6.0)))
  }

  test("topVocab: count-desc with lexicographic tie-break, exact cut") {
    val df = Seq((1L, "b b b a a c c d")).toDF("doc_id", "text")
    val vocab = CorpusStats.topVocab(df, "text", v = 3).collect()
    // b=3, then a=2 and c=2 tie → 'a' before 'c'; d cut
    assert(vocab.map(r => (r.getString(0), r.getLong(1))).toSeq ===
      Seq(("b", 3L), ("a", 2L), ("c", 2L)))
  }

  test("oovStats: membership against the top-v vocab, empty doc kept") {
    val df = Seq(
      (1L, "b b b a a c"),   // corpus: b=3, c=3, a=2 → vocab v=2 = {b, c}
      (2L, "c c"),           // all in-vocab
      (3L, "")
    ).toDF("doc_id", "text")
    val got = CorpusStats.oovStats(df, "text", "doc_id", v = 2)
      .orderBy("doc_id").collect()
    assert(got(0) === Row(1L, 6L, 2L, round6(2.0 / 6.0)))
    assert(got(1) === Row(2L, 2L, 0L, 0.0))
    assert(got(2) === Row(3L, 0L, 0L, 0.0))
  }

  test("contamination: distinct eval grams vs train gram set") {
    val train = Seq(
      (100L, "a b c x y z"),
      (101L, "q r s t u v")
    ).toDF("doc_id", "text")
    val eval = Seq(
      (1L, "a b c a b c"),  // distinct 3-grams: "a b c","b c a","c a b" — 1 of 3 in train
      (2L, "m n o p q r"),  // none of its grams in train
      (3L, "x y")           // < k tokens: zero grams
    ).toDF("doc_id", "text")
    val got = graft.ops.CorpusStats
      .contamination(train, eval, "text", "doc_id", k = 3)
      .orderBy("doc_id").collect()
    assert(got(0) === Row(1L, 3L, 1L, round6(1.0 / 3.0)))
    assert(got(1) === Row(2L, 4L, 0L, 0.0))
    assert(got(2) === Row(3L, 0L, 0L, 0.0))
  }

  test("p01 pipeline: splits partition the filtered survivor set exactly") {
    import graft.functions.TextFunctions.{langId, qualityScore}
    val d = graft.Engine.table(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    // survivors of the planted corpus == originals passing the filters
    // (each planted copy has identical text → identical filter verdicts
    // → always loses to its original under the min-id keeper)
    val expected = d
      .filter(qualityScore(col("text")) >= 0.7 && langId(col("text")) === "en")
      .count()
    val splits = graft.SparkEntry.queries("p01_curation_pipeline")(spark, sfDir)
      .select(col("split"), col("n_docs")).as[(String, Long)].collect().toMap
    assert(splits.values.sum === expected)
    assert(splits.keySet.subsetOf(Set("train", "val", "test")))
  }

  test("chunkByTokens: ragged tail, empty doc dropped, md5 content address") {
    val df = Seq(
      (1L, "a b c d e"), // chunkSize 2 → [a b][c d][e]
      (2L, "x y"),       // exactly one full chunk
      (3L, " ")          // no tokens → no chunks
    ).toDF("doc_id", "text")
    val got = CorpusStats.chunkByTokens(df, "text", "doc_id", chunkSize = 2)
      .orderBy("doc_id", "chunk_idx").collect()
    assert(got.map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq ===
      Seq((1L, 1, 2L), (1L, 2, 2L), (1L, 3, 1L), (2L, 1, 2L)))
    // fingerprint is the md5 of the space-rejoined chunk
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5(s: String): String =
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(got(0).getString(3) === md5("a b"))
    assert(got(2).getString(3) === md5("e"))
  }

  test("chunkByTokens: chunks reassemble the document exactly") {
    val d = graft.Engine.table(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val total = CorpusStats.chunkByTokens(d, "text", "doc_id", chunkSize = 32)
      .groupBy("doc_id").sum("n_tokens")
      .withColumnRenamed("sum(n_tokens)", "n")
    val direct = d.select(col("doc_id"),
      graft.functions.TextFunctions.tokenCount(col("text")).as("n0"))
    val joined = total.join(direct, "doc_id")
      .filter(col("n") =!= col("n0"))
    assert(joined.count() === 0)
  }

  test("tfidfTopTerms: rare term outranks common term; tie-break lexicographic") {
    val df = Seq(
      (1L, "rare common common"),  // rare: tf=1 df=1; common: tf=2 df=3
      (2L, "common only here"),
      (3L, "common again")
    ).toDF("doc_id", "text")
    val got = CorpusStats.tfidfTopTerms(df, "text", "doc_id", m = 2)
      .filter(col("doc_id") === 1L).orderBy("rank").collect()
    // idf(common) = ln(3/3) = 0 → score 0; idf(rare) = ln 3 → top
    assert(got(0).getString(1) === "rare")
    assert(got(0).getDouble(2) === round6(math.log(3.0)))
    assert(got(1).getString(1) === "common")
    assert(got(1).getDouble(2) === 0.0)
  }

  test("removeDupSpans: shared spans drop, order survives, disjoint docs intact") {
    // docs 1 and 2 share the 3-gram "p q r"; doc 3 shares nothing
    val df = Seq(
      (1L, "a p q r b"),
      (2L, "z p q r z"),
      (3L, "m n o m n")
    ).toDF("doc_id", "text")
    val got = CorpusStats.removeDupSpans(df, "text", "doc_id", k = 3)
      .orderBy("doc_id").collect()
    assert(got(0) === Row(1L, 5L, 2L, "a b"))
    assert(got(1) === Row(2L, 5L, 2L, "z z"))
    assert(got(2) === Row(3L, 5L, 5L, "m n o m n"))
  }

  test("removeDupSpans: fully-duplicated doc keeps an empty string") {
    val df = Seq(
      (1L, "x y z w"),
      (2L, "x y z w")
    ).toDF("doc_id", "text")
    val got = CorpusStats.removeDupSpans(df, "text", "doc_id", k = 4)
      .orderBy("doc_id").collect()
    assert(got(0) === Row(1L, 4L, 0L, ""))
    assert(got(1) === Row(2L, 4L, 0L, ""))
  }

  test("removeDupSpans is consistent with dupSpanCoverage counts") {
    val d = graft.Engine.table(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val cov = CorpusStats.dupSpanCoverage(d, "text", "doc_id", k = 8)
      .select(col("doc_id"), col("n_tokens"), col("n_dup_tokens"))
    val cln = CorpusStats.removeDupSpans(d, "text", "doc_id", k = 8)
      .select(col("doc_id"), col("n_kept"))
    val bad = cov.join(cln, "doc_id")
      .filter(col("n_kept") =!= col("n_tokens") - col("n_dup_tokens"))
    assert(bad.count() === 0)
  }

  test("invertedIndex: hand-built postings, set semantics, shard routing") {
    val df = Seq(
      (0L, "alpha beta alpha"), // duplicate token in one doc counts once
      (1L, "beta gamma"),
      (2L, "Alpha beta"),       // case folds into 'alpha'
      (5L, "beta")              // doc 5 → shard 1 under mod 4
    ).toDF("doc_id", "text")
    val got = CorpusStats.invertedIndex(df, "text", "doc_id", nShards = 4)
      .orderBy("token", "shard").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(got === Array(
      ("alpha", 0L, 1L, "0"),
      ("alpha", 2L, 1L, "2"),
      ("beta", 0L, 1L, "0"),
      ("beta", 1L, 2L, "1,5"),
      ("beta", 2L, 1L, "2"),
      ("gamma", 1L, 1L, "1")))
  }

  test("invertedIndex: sharded segments reassemble the unsharded index exactly") {
    val d = graft.Engine.table(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val sharded = CorpusStats.invertedIndex(d, "text", "doc_id", nShards = 4)
    val global = CorpusStats.invertedIndex(d, "text", "doc_id", nShards = 1)
      .collect().map(r => r.getString(0) -> (r.getLong(2), r.getString(3))).toMap
    // per-token: shard dfs sum to the global df, and the shard segments
    // (each internally ascending) merge to the global posting list
    val merged = sharded.collect()
      .map(r => (r.getString(0), r.getLong(2), r.getString(3)))
      .groupBy(_._1).map { case (tok, segs) =>
        val ids = segs.flatMap(_._3.split(',')).map(_.toLong).sorted
        tok -> (segs.map(_._2).sum, ids.mkString(","))
      }
    assert(merged === global)
    // segments are disjoint: total postings == distinct postings
    val all = sharded.collect().flatMap(r =>
      r.getString(3).split(',').map(id => (r.getString(0), id)))
    assert(all.length === all.distinct.length)
  }

  test("unigramNll: hand-computed corpus model, rare tokens cost more") {
    // corpus: a a a b  → T=4, c(a)=3, c(b)=1
    val df = Seq(
      (1L, "a a"),   // nll = ln(4/3) each → avg = ln(4/3)
      (2L, "a b"),   // avg = (ln(4/3) + ln(4)) / 2
      (3L, " ")      // token-less → 0
    ).toDF("doc_id", "text")
    val got = CorpusStats.unigramNll(df, "text", "doc_id")
      .orderBy("doc_id").collect()
    assert(got(0) === Row(1L, 2L, round6(math.log(4.0 / 3.0))))
    assert(got(1) === Row(2L, 2L, round6((math.log(4.0 / 3.0) + math.log(4.0)) / 2.0)))
    assert(got(2) === Row(3L, 0L, 0.0))
  }

  test("bigramNll: hand-computed transitions; garbled order costs more") {
    // corpus bigrams: doc1 "a b a b" → (a,b) (b,a) (a,b)
    //                 doc2 "b b"     → (b,b)
    //                 doc3 "a"       → none (size < 2)
    // c1(a)=2, c1(b)=2; c12(a,b)=2, c12(b,a)=1, c12(b,b)=1
    val df = Seq(
      (1L, "a b a b"), // nlls: ln(2/2), ln(2/1), ln(2/2) → avg = ln(2)/3
      (2L, "b b"),     // avg = ln(2/1) = ln 2
      (3L, "a")        // no bigrams → 0
    ).toDF("doc_id", "text")
    val got = CorpusStats.bigramNll(df, "text", "doc_id")
      .orderBy("doc_id").collect()
    assert(got(0) === Row(1L, 3L, round6(math.log(2.0) / 3.0)))
    assert(got(1) === Row(2L, 1L, round6(math.log(2.0))))
    assert(got(2) === Row(3L, 0L, 0.0))
  }

  test("bigramNll: shuffling words raises the score while unigramNll is blind") {
    // natural corpus: many docs share the transition "the cat"; one doc
    // carries the same WORDS in a garbled order — identical unigram
    // profile, never-seen transitions
    val natural = (1L to 20L).map(i => (i, "the cat sat on the mat"))
    val garbled = Seq((99L, "cat the on sat mat the"))
    val df = (natural ++ garbled).toDF("doc_id", "text")
    val uni = CorpusStats.unigramNll(df, "text", "doc_id")
      .select("doc_id", "avg_nll").as[(Long, Double)].collect().toMap
    val bi = CorpusStats.bigramNll(df, "text", "doc_id")
      .select("doc_id", "avg_nll").as[(Long, Double)].collect().toMap
    assert(uni(99L) === uni(1L)) // same bag of words → unigram can't tell
    assert(bi(99L) > bi(1L))     // transitions expose the garble
  }

  test("bm25: hand-computed Lucene-form scores with length normalization") {
    // corpus: doc1 "a a b" (dl 3), doc2 "b b" (dl 2), doc3 "a" (dl 1)
    // query {a}: N=3, avgdl=2, df(a)=2
    val df = Seq((1L, "a a b"), (2L, "b b"), (3L, "a")).toDF("doc_id", "text")
    val got = CorpusStats.bm25(df, "text", "doc_id", Seq("a"))
      .orderBy("doc_id").collect()
    val idf = math.log((3 - 2 + 0.5) / (2 + 0.5) + 1.0)
    def s(tf: Long, dl: Long): Double =
      idf * (tf * (1.2 + 1.0)) /
        (tf + 1.2 * ((1.0 - 0.75) + 0.75 * dl / (6.0 / 3)))
    assert(got(0) === Row(1L, 1L, round6(s(2, 3))))
    assert(got(1) === Row(2L, 0L, 0.0))
    assert(got(2) === Row(3L, 1L, round6(s(1, 1))))
    // the normalization property BM25 adds over TF-IDF: same tf in a
    // SHORTER doc scores higher
    assert(s(1, 1) > s(1, 3))
  }

  test("lexical diversity: hand-computed counts, empty doc reports zeros") {
    val df = Seq(
      (1L, "a b a c"), // 4 tokens, 3 types, hapax {b, c}, ttr 0.75
      (2L, ""),        // no tokens at all
      (3L, "X x")      // case-folds to {x: 2}: 2 tokens, 1 type, 0 hapax
    ).toDF("doc_id", "text")
    val got = CorpusStats.lexicalDiversity(df, "text", "doc_id")
      .as[(Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(1L) === ((1L, 4L, 3L, 2L, 0.75)))
    assert(got(2L) === ((2L, 0L, 0L, 0L, 0.0)))
    assert(got(3L) === ((3L, 2L, 1L, 0L, 0.5)))
  }

  test("sentence stats: terminator runs, blank segments, empty doc") {
    val df = Seq(
      // "Hi there. Go now! Ok?" → 3 sentences of 2/2/1 tokens
      (1L, "Hi there. Go now! Ok?"),
      // "Wait... what" → terminator RUN is one split: ["Wait", " what"]
      (2L, "Wait... what"),
      // trailing terminator + whitespace-only tail segment dropped
      (3L, "One two three. "),
      (4L, ""),       // no sentences at all
      (5L, "...")     // terminators only → zero sentences
    ).toDF("doc_id", "text")
    val got = CorpusStats.sentenceStats(df, "text", "doc_id")
      .as[(Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(1L) === ((1L, 3L, 5L, 2L, round6(5.0 / 3.0))))
    assert(got(2L) === ((2L, 2L, 2L, 1L, 1.0)))
    assert(got(3L) === ((3L, 1L, 3L, 3L, 3.0)))
    assert(got(4L) === ((4L, 0L, 0L, 0L, 0.0)))
    assert(got(5L) === ((5L, 0L, 0L, 0L, 0.0)))
  }

  private def round6(d: Double): Double =
    BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("collocations: hand-computed PMI, minCount cut, rank tie-break") {
    // bigram stream: "x y" ×3 (docs 1-3), "x z" ×2, "z z" ×2 (doc 4:
    // z z z → (z,z),(z,z); doc 5: x z x z → (x,z),(z,x),(x,z))
    val df = Seq(
      (1L, "x y"), (2L, "x y"), (3L, "x y"),
      (4L, "z z z"), (5L, "x z x z"))
      .toDF("doc_id", "text")
    // N = 8 bigrams: xy,xy,xy,zz,zz,xz,zx,xz
    // c1: x→5, z→3; c2: y→3, z→5 (zz,zz,xz,xz,zx→x... recount:)
    //   firsts: x,x,x,z,z,x,z,x → x=5, z=3
    //   seconds: y,y,y,z,z,z,x,z → y=3, z=4, x=1
    // (x,y): c12=3, pmi=ln(3·8/(5·3))=ln(1.6)
    // (x,z): c12=2, pmi=ln(2·8/(5·4))=ln(0.8)
    // minCount=2 keeps (x,y),(x,z),(z,z); (z,z): ln(2·8/(3·4))=ln(4/3)
    val got = CorpusStats.collocations(df, "text", "doc_id",
        k = 10, minCount = 2)
      .as[(String, String, Long, Double, Int)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    assert(got.keySet === Set(("x", "y"), ("x", "z"), ("z", "z")))
    assert(got(("x", "y")) === ((3L, round6(math.log(1.6)), 1)))
    assert(got(("z", "z")) === ((2L, round6(math.log(4.0 / 3.0)), 2)))
    assert(got(("x", "z")) === ((2L, round6(math.log(0.8)), 3)))
    // minCount=4 cuts everything below (x,y)... which is 3 → empty
    assert(CorpusStats.collocations(df, "text", "doc_id",
      k = 10, minCount = 4).count() === 0)
  }

  test("zipfSlope: exact −1 slope on a hand-built power-law, rank cut") {
    // counts a=4, b=2 → (x,y) = (0, ln4), (ln2, ln2):
    // slope = (2·ln2² − ln2·ln8)/(2·ln2² − ln2²) = −1 exactly;
    // intercept = (ln8 + ln2)/2 = 2·ln2. "c"×1 must fall to the cut.
    val df = Seq((1L, "a a a a b b c")).toDF("doc_id", "text")
    val got = CorpusStats.zipfSlope(df, "text", maxRank = 2)
      .as[(Long, Double, Double)].collect()
    assert(got.length === 1)
    assert(got(0)._1 === 2L)
    assert(got(0)._2 === -1.0)
    assert(got(0)._3 === round6(2.0 * math.log(2.0)))
    // vocabulary smaller than maxRank: regression over what exists
    val tiny = CorpusStats.zipfSlope(df, "text", maxRank = 200)
      .as[(Long, Double, Double)].collect()
    assert(tiny(0)._1 === 3L)
  }

  test("heapsCurve: power-of-two checkpoints, sub-bigram doc, cumsum") {
    // doc0 "x y" → gram (x y) first at 0 → cp 1; doc1 "q" contributes
    // no bigrams (nt 0) but owns checkpoint 2; docs 2/3 add one new
    // gram each at cp 4; doc4 repeats old grams (nt 2, vocab +0, cp 8)
    val df = Seq((0L, "x y"), (1L, "q"), (2L, "y z"), (3L, "z w"),
      (4L, "x y z")).toDF("doc_id", "text")
    val got = CorpusStats.heapsCurve(df, "text", "doc_id")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq === Seq((1L, 1L, 1L), (2L, 1L, 1L),
      (4L, 3L, 3L), (8L, 3L, 5L)))
  }

  test("fleschReadability: integer syllable/sentence floors, formula") {
    // en: "Hello world." (2 words, 1 sentence run, syllables 2+1) +
    // "Go!" (1, 1, 1) → W=3 S=2 Y=4 →
    // 206.835 − 1.015·(3/2) − 84.6·(4/3); xx: vowel-less "zzz" floors
    // syllables at 1 and the missing terminator floors sentences at 1
    val df = Seq(("en", "Hello world."), ("en", "Go!"), ("xx", "zzz"))
      .toDF("lang", "text")
    val got = CorpusStats.fleschReadability(df, "text", "lang")
      .as[(String, Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("en") === (("en", 2L, 3L, 2L, 4L,
      round6(206.835 - 1.015 * (3.0 / 2.0) - 84.6 * (4.0 / 3.0)))))
    assert(got("xx") === (("xx", 1L, 1L, 1L, 1L,
      round6(206.835 - 1.015 - 84.6))))
  }
}
