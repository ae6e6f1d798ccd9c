package graft

import org.apache.spark.sql.functions.{aggregate, col, lit, size}
import graft.functions.TextFunctions._

/** Hand-planted ground truth for the PII family (the oracled t-queries
  * cover the rest of TextFunctions).
  */
class TextFunctionsSpec extends SparkSessionSpec {
  import spark.implicits._

  test("piiCount finds emails and IPv4s; redactPii replaces all of them") {
    val df = Seq(
      (1L, "write to alice.smith+x@corp.example.com or bob@x.io today"),
      (2L, "servers 10.0.0.1 and 192.168.1.255 are up; 999.1.2.3 is odd too"),
      (3L, "no pii here at all"),
      (4L, "mixed: carol@a.bc from 172.16.0.9")
    ).toDF("id", "text")
    val got = df.select(
      col("id"),
      piiCount(col("text"), EmailRegex).as("e"),
      piiCount(col("text"), Ipv4Regex).as("i"),
      redactPii(col("text")).as("r"))
      .orderBy("id").collect()
    assert(got(0).getLong(1) === 2 && got(0).getLong(2) === 0)
    // the \d{1,3} shape intentionally matches 999.1.2.3 — PII detection
    // over-matches rather than leaks
    assert(got(1).getLong(1) === 0 && got(1).getLong(2) === 3)
    assert(got(2).getLong(1) === 0 && got(2).getLong(2) === 0)
    assert(got(3).getString(3) === "mixed: <EMAIL> from <IP>")
    assert(!got.exists(r => r.getString(3).contains("@")
      && r.getLong(1) > 0))
  }

  test("redaction is idempotent and leaves clean text untouched") {
    val df = Seq((1L, "clean text"), (2L, "x@y.zz")).toDF("id", "text")
    val once = df.select(redactPii(col("text")).as("r"))
    val twice = once.select(redactPii(col("r")).as("r"))
    assert(once.collect().map(_.getString(0)).toSeq ===
      twice.collect().map(_.getString(0)).toSeq)
    assert(once.collect()(0).getString(0) === "clean text")
  }

  test("bpeTokens iterates ranked merges, not just pre-tokenization") {
    def run(s: String): Seq[String] = {
      val df = Seq((1L, s)).toDF("id", "text")
      df.select(bpeTokens(col("text")).as("t"))
        .collect()(0).getSeq[String](0)
    }
    // "the": t+h (rank 0) -> th, th+e (rank 1) -> the — full word rebuilt
    assert(run("the") === Seq("the"))
    // case folds before merging
    assert(run("The") === Seq("the"))
    // "and": a+n (rank 3) -> an, an+d (rank 4) -> and
    assert(run("and") === Seq("and"))
    // rank order beats position order: in "ath", (t,h) rank 0 wins over
    // the EARLIER (a,t) rank 8 — a leftmost-only loop would emit [at, h]
    assert(run("ath") === Seq("a", "th"))
    // multi-word + punctuation: words segment independently, punct chars
    // are single pre-tokens no rule touches
    assert(run("the and!") === Seq("the", "and", "!"))
    // no applicable rule: stays character-split
    assert(run("xq") === Seq("x", "q"))
  }

  test("bpeTokens merge loop terminates with partial merges mid-word") {
    val df = Seq((1L, "that testing")).toDF("id", "text")
    val out = df.select(bpeTokens(col("text")).as("t"))
      .collect()(0).getSeq[String](0)
    // "that": t+h->th, a+t (rank 8)->at, (th,at) not in table -> [th, at]
    // "testing": t+e? no; e+s (11)? t+es... trace: pairs (t,e),(e,s),(s,t),
    // (t,i),(i,n),(n,g): best is i+n (rank 2) -> in; then e+s (11) -> es;
    // then in+g (12) -> ing; remaining t,es,t,ing has (s,t)? no — "es","t"
    // pair is (es,t) not in table -> [t, es, t, ing]
    assert(out === Seq("th", "at", "t", "es", "t", "ing"))
  }

  test("quality gate composes rule verdicts with fixed reason order (p06)") {
    val gate = graft.queries.PipelineQueries
      .queries("p06_quality_gate")(spark, sfDir)
    val rows = gate.as[(Long, String, Boolean)].collect()
    assert(rows.nonEmpty)
    // keep iff no reason fired; reasons appear only in the fixed order
    val order = Seq("too_short", "low_stopword", "non_english")
    rows.foreach { case (_, reasons, keep) =>
      assert(keep === reasons.isEmpty)
      if (reasons.nonEmpty) {
        val parts = reasons.split(",").toSeq
        assert(parts.forall(order.contains))
        assert(parts === order.filter(parts.contains), s"order drifted: $reasons")
      }
    }
    // the gate must actually split the corpus (keeps AND multi-rule drops)
    assert(rows.exists(_._3))
    assert(rows.exists(r => r._2.contains(",")))
  }

  test("readability counts: words, vowel-group syllables, sentences (t20)") {
    import graft.functions.TextFunctions._
    val df = Seq(
      (1L, "The queue data. Is it real? Yes!"),
      (2L, "no enders here"),
      (3L, "3.5% !!!"), // zero words; "3" / "5% " segments -> 2 sentences
      (4L, "Rhythm.")
    ).toDF("doc_id", "text")
    val words = alphaWords(col("text"))
    val m = df.select(col("doc_id"),
      size(words).as("w"),
      aggregate(words, lit(0L), (a, x) => a + syllableCount(x).cast("long"))
        .as("syl"),
      sentenceCount(col("text")).as("s"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2), r.getInt(3))))
      .toMap
    // the(1) queue(1: "ueue") data(2) is(1) it(1) real(1: "ea") yes(1) = 8
    assert(m(1L) === ((7, 8L, 3)))
    // no(1) enders(2) here(2); no [.!?] -> one whole-text segment
    assert(m(2L) === ((3, 5L, 1)))
    assert(m(3L) === ((0, 0L, 2))) // decimal point splits; word count floors
    // rhythm: the y group -> 1 syllable
    assert(m(4L) === ((1, 1L, 1)))
  }
}
