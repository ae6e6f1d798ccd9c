package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Deduplication operators for training-data pipelines.
  *
  * All variants are pure Column/DataFrame compositions (whole-stage
  * codegen, no UDFs) and follow the same scale shape:
  *
  *   per-row signature (narrow, inside the scan stage)
  *     → explode small constant-width band/bucket keys
  *     → shuffle ONCE on bucket key
  *     → pair generation inside buckets
  *     → exact verification on the candidate pairs only.
  *
  * At 100 TB the only heavy exchange is the bucket-key shuffle, whose
  * width we control (bands × docs), and candidate verification touches a
  * vanishing fraction of the N² pair space. The reference engine has no
  * dedup operator; its closest primitive is content-addressed keys
  * (util/id.js:72-78 — sha256 of the serialized value), which our
  * [[exact]] generalizes.
  */
object Dedup {

  // ---------------------------------------------------------------- exact

  /** Exact duplicate groups by normalized-content fingerprint.
    * Output: (fp, keeper_id, n_copies) for every content group.
    */
  def exactGroups(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(fingerprint(col(textCol)).as("fp"), col(idCol))
      .groupBy("fp")
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("n_copies"))

  /** Surviving rows after exact dedup (deterministic keeper = min id). */
  def exactSurvivors(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val keep = exactGroups(df, textCol, idCol)
      .select(col("keeper_id").as(idCol))
    df.join(keep, Seq(idCol), "left_semi")
  }

  // -------------------------------------------------------------- MinHash

  /** MinHash signature as `numHashes` columns folded into one array:
    * sig[i] = min over hashed shingles of xxhash64(shingleHash, i).
    * Re-hashing with the index as salt gives a deterministic independent
    * hash family with no multiply-add (which would overflow under ANSI
    * mode). Pure Column arithmetic over the hashed-shingle array →
    * codegen'd, no shuffle.
    */
  def minhashSignature(text: Column, k: Int, numHashes: Int): Column = {
    val hs = hashedShingles(text, k)
    val mins = (0 until numHashes).map { i =>
      array_min(transform(hs, h => xxhash64(h, lit(i))))
    }
    array(mins: _*)
  }

  /** LSH band keys: signature split into `bands` bands of `rowsPerBand`
    * minhashes; band key = hash of the band's values (+ band index so
    * buckets from different bands never collide).
    */
  def lshBandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)), b =>
      xxhash64(b, concat_ws(",",
        transform(slice(sig, b * rowsPerBand + 1, lit(rowsPerBand)),
          v => v.cast("string")))))

  /** Candidate near-dup pairs via MinHash+LSH, verified with exact Jaccard
    * over hashed shingle sets.
    *
    * @param threshold Jaccard similarity cutoff, e.g. 0.8
    * @return (id_a, id_b, jaccard) with id_a < id_b
    */
  def minhashPairs(
      df: DataFrame, textCol: String, idCol: String,
      k: Int = 3, bands: Int = 16, rowsPerBand: Int = 2,
      threshold: Double = 0.8): DataFrame = {
    val numHashes = bands * rowsPerBand
    val sigs = df.select(
      col(idCol).as("id"),
      hashedShingles(col(textCol), k).as("shingles"),
      minhashSignature(col(textCol), k, numHashes).as("sig"))
    val banded = sigs
      .select(col("id"), col("shingles"),
        explode(lshBandKeys(col("sig"), bands, rowsPerBand)).as("bucket"))
    // pairs within a bucket; dedupe pairs that collide in several bands
    val cand = banded.as("a").join(banded.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .select(
        col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.shingles").as("sh_a"), col("b.shingles").as("sh_b"))
      .dropDuplicates("id_a", "id_b")
    cand
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("uni",
        size(col("sh_a")) + size(col("sh_b")) - col("inter"))
      .withColumn("jaccard",
        col("inter").cast("double") / col("uni").cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  // -------------------------------------------------------------- SimHash

  /** 64-bit SimHash of the token multiset: bit j of the result is 1 iff
    * the sum over tokens of ±1 (sign = bit j of xxhash64(token)) is
    * positive. Expressed with aggregate() over a 64-long counter array —
    * per-row compute inside the scan stage.
    */
  def simhash(text: Column): Column = {
    val toks = tokens(normalized(text))
    // shiftright/shiftleft in the Scala API only take Int amounts; the SQL
    // functions accept column amounts — call them by name.
    def shr(v: Column, n: Column): Column = call_function("shiftright", v, n)
    def shl(v: Column, n: Column): Column = call_function("shiftleft", v, n)
    // counts[j] = number of tokens with bit j set
    val counts = aggregate(
      toks,
      array_repeat(lit(0L), 64),
      (acc, t) =>
        zip_with(acc, sequence(lit(0), lit(63)),
          (c, j) => c + shr(xxhash64(t), j).bitwiseAND(lit(1L))))
    val n = size(toks).cast("long")
    // bit j set iff counts[j]*2 > n (strict majority of +1 over -1)
    aggregate(
      zip_with(counts, sequence(lit(0), lit(63)),
        (c, j) => when(c * 2 > n, shl(lit(1L), j)).otherwise(lit(0L))),
      lit(0L),
      (acc, b) => acc.bitwiseOR(b))
  }

  /** Near-dup pairs by SimHash Hamming distance ≤ maxDist (≤ 3 with the
    * default 4 chunks): pigeonhole — any pair within distance 3 shares at
    * least one identical 16-bit chunk, so chunk-equality is the LSH
    * bucket, then popcount(xor) verifies exactly.
    */
  def simhashPairs(
      df: DataFrame, textCol: String, idCol: String,
      maxDist: Int = 3): DataFrame = {
    val sh = df.select(col(idCol).as("id"), simhash(col(textCol)).as("sh"))
    val chunked = sh.select(col("id"), col("sh"),
      explode(transform(sequence(lit(0), lit(3)), c =>
        concat_ws(":", c.cast("string"),
          call_function("shiftright", col("sh"), c * 16).bitwiseAND(lit(0xffffL)).cast("string"))))
        .as("chunk"))
    chunked.as("a").join(chunked.as("b"),
        col("a.chunk") === col("b.chunk") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.sh").as("sh_a"), col("b.sh").as("sh_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("dist", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
      .filter(col("dist") <= maxDist)
      .select(col("id_a"), col("id_b"), col("dist"))
  }

  // ------------------------------------------------------ n-gram Jaccard

  /** Exact token-set Jaccard pairs via inverted-index join: explode
    * distinct tokens, self-join on token, count intersections, filter with
    * INTEGER arithmetic (inter/union never materialized as a float until
    * the output column) — engine-exact and oracle-friendly.
    *
    * Scale note: the token join is the classic skew hazard ("the" joins
    * everything). At 100 TB, drop the top-percentile document-frequency
    * tokens first (they carry no discriminative signal); here df sizes are
    * tiny, and AQE skew-join handles moderate skew.
    */
  def ngramJaccardPairs(
      df: DataFrame, textCol: String, idCol: String,
      num: Int, den: Int): DataFrame = {
    val tok = df.select(col(idCol).as("id"),
        explode(array_distinct(tokens(lower(col(textCol))))).as("w"))
    val sizes = tok.groupBy("id").agg(count(lit(1)).as("sz"))
    val inter = tok.as("a").join(tok.as("b"),
        col("a.w") === col("b.w") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.as("sa"), col("id_a") === col("sa.id"))
      .join(sizes.as("sb"), col("id_b") === col("sb.id"))
      .withColumn("uni", col("sa.sz") + col("sb.sz") - col("inter"))
      // jaccard >= num/den  ⇔  inter*den >= uni*num   (integer-exact)
      .filter(col("inter") * den >= col("uni") * lit(num))
      .select(col("id_a"), col("id_b"), col("inter"), col("uni"))
  }
}
