package graft.expr

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Static per-row kernels for the text-signature expressions. Kept as
  * plain JVM methods so generated code calls straight into them with
  * unboxed `ArrayData` in / `ArrayData` out — the expression classes stay
  * inside whole-stage codegen, and the loops JIT like hand-written Java.
  *
  * Hash identities reuse Spark's XXH64 with the engine-default seed 42 in
  * exactly the order the equivalent `xxhash64(...)` Column chains fold, so
  * swapping a composed pipeline for a kernel never changes results.
  */
object SigOps {

  private final val Seed = 42L

  /** Sorted distinct 64-bit hashes of the k-token shingles of `toks`.
    * Shingle hash folds the per-token hashes (XXH64 over UTF-8 bytes,
    * seed 42), so each token's bytes are hashed once, not k times.
    * Fewer than k tokens → one shingle over all tokens.
    */
  def hashedShingleSet(toks: ArrayData, k: Int): ArrayData = {
    val n = toks.numElements()
    val th = new Array[Long](n)
    var i = 0
    while (i < n) {
      val s = toks.getUTF8String(i)
      th(i) = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, Seed)
      i += 1
    }
    val m = if (n >= k) n - k + 1 else 1
    val out = new Array[Long](m)
    if (n >= k) {
      i = 0
      while (i < m) {
        var h = Seed
        var j = 0
        while (j < k) { h = XXH64.hashLong(th(i + j), h); j += 1 }
        out(i) = h
        i += 1
      }
    } else {
      var h = Seed
      i = 0
      while (i < n) { h = XXH64.hashLong(th(i), h); i += 1 }
      out(0) = h
    }
    java.util.Arrays.sort(out)
    // in-place dedupe of the sorted array
    var w = 0
    i = 0
    while (i < m) {
      if (w == 0 || out(i) != out(w - 1)) { out(w) = out(i); w += 1 }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(
      if (w == m) out else java.util.Arrays.copyOf(out, w))
  }

  /** MinHash signature over a hashed-shingle array: sig(i) = min over
    * shingles h of xxhash64(h, i) — bit-identical to the Column chain
    * `array_min(transform(hs, h => xxhash64(h, lit(i))))`, one pass.
    */
  def minhashSig(hs: ArrayData, numHashes: Int): ArrayData = {
    val n = hs.numElements()
    val sig = new Array[Long](numHashes)
    java.util.Arrays.fill(sig, Long.MaxValue)
    var j = 0
    while (j < n) {
      val base = XXH64.hashLong(hs.getLong(j), Seed)
      var i = 0
      while (i < numHashes) {
        val v = XXH64.hashInt(i, base)
        if (v < sig(i)) sig(i) = v
        i += 1
      }
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(sig)
  }

  /** LSH band keys from a minhash signature: key(b) folds XXH64 over the
    * band's rows, seeded with the band index so buckets from different
    * bands never collide.
    */
  def bandKeys(sig: ArrayData, bands: Int, rowsPerBand: Int): ArrayData = {
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = XXH64.hashInt(b, Seed)
      var r = 0
      while (r < rowsPerBand) {
        h = XXH64.hashLong(sig.getLong(b * rowsPerBand + r), h)
        r += 1
      }
      out(b) = h
      b += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** 64-bit SimHash of a token array: bit j is set iff a strict majority
    * of tokens have bit j set in their xxhash64 — identical output to the
    * `aggregate(...zip_with...)` Column formulation, in one pass with a
    * stack counter array.
    */
  def simhash64(toks: ArrayData): Long = {
    val n = toks.numElements()
    val counts = new Array[Int](64)
    var i = 0
    while (i < n) {
      val s = toks.getUTF8String(i)
      val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, Seed)
      var j = 0
      while (j < 64) {
        counts(j) += ((h >>> j) & 1L).toInt
        j += 1
      }
      i += 1
    }
    var r = 0L
    var j = 0
    while (j < 64) {
      if (counts(j) * 2 > n) r |= (1L << j)
      j += 1
    }
    r
  }

  /** All per-document repetition signals in one pass over the token
    * array: [n_tokens, n_uniq_tokens, top_tok_n, n_2grams, n_dup_2grams].
    * Token counts via an exact hash map on the token bytes; bigram
    * distinctness via the space-joined pair string (tokens are
    * whitespace-split, so the join is unambiguous — identical to the
    * `concat_ws(' ', slice(toks, i, 2))` composed form and the SQL
    * oracle's `toks[i] || ' ' || toks[i+1]`). Replaces a pile of
    * interpreted higher-order functions whose projection fell out of
    * codegen (and intermittently deopt-stormed 10-70x).
    */
  def repetitionStats(toks: ArrayData): ArrayData = {
    val n = toks.numElements()
    val counts = new java.util.HashMap[UTF8String, Integer](math.max(16, n * 2))
    var top = 0
    var i = 0
    while (i < n) {
      val t = toks.getUTF8String(i)
      val prev = counts.get(t)
      val c = if (prev == null) 1 else prev + 1
      counts.put(t, c)
      if (c > top) top = c
      i += 1
    }
    val space = UTF8String.fromString(" ")
    val bigrams = new java.util.HashSet[UTF8String](math.max(16, n * 2))
    i = 1
    while (i < n) {
      bigrams.add(UTF8String.concat(
        toks.getUTF8String(i - 1), space, toks.getUTF8String(i)))
      i += 1
    }
    val n2 = if (n >= 2) n - 1 else 0
    UnsafeArrayData.fromPrimitiveArray(Array[Long](
      n, counts.size(), top, n2, n2 - bigrams.size()))
  }

  /** Ordered 64-bit hashes of the consecutive k-grams of `toks` — one
    * hash per gram position, NOT deduped (positional consumers like
    * dup-span coverage need position i ↔ hash i), empty when the
    * document has fewer than k tokens (no partial grams — mirrors the
    * composed `kgrams` Column form). Gram identity is the XXH64 fold of
    * the per-token hashes, so two grams collide only on hash collision:
    * downstream gram JOINS/COUNTS key on 8-byte longs instead of
    * k-token strings — no gram-string allocation on the hot path and a
    * fraction of the shuffle width.
    */
  def kgramHashes(toks: ArrayData, k: Int): ArrayData = {
    val n = toks.numElements()
    if (n < k) return UnsafeArrayData.fromPrimitiveArray(new Array[Long](0))
    val th = new Array[Long](n)
    var i = 0
    while (i < n) {
      val s = toks.getUTF8String(i)
      th(i) = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, Seed)
      i += 1
    }
    val m = n - k + 1
    val out = new Array[Long](m)
    i = 0
    while (i < m) {
      var h = Seed
      var j = 0
      while (j < k) { h = XXH64.hashLong(th(i + j), h); j += 1 }
      out(i) = h
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Portable 64-bit SimHash: per-token bits come from the first 8 bytes
    * of md5(token) read as two big-endian unsigned 32-bit words (= the
    * first/second 8 hex chars of the digest string), packed lo<<32|hi.
    * Same majority rule as [[simhash64]], but every bit is reproducible in
    * any engine with an md5 function — SQL oracles can recompute the
    * signature exactly (see DedupQueries d04). Bit-identical to the
    * composed `conv(substring(md5(t),…),16,10)` Column form.
    */
  def simhashMd5(toks: ArrayData): Long = {
    val n = toks.numElements()
    val counts = new Array[Int](64)
    val md = md5Local.get()
    var i = 0
    while (i < n) {
      md.reset()
      val d = md.digest(toks.getUTF8String(i).getBytes)
      val hi = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      val lo = ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
        ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
      val h = (lo << 32) | hi
      var j = 0
      while (j < 64) {
        counts(j) += ((h >>> j) & 1L).toInt
        j += 1
      }
      i += 1
    }
    var r = 0L
    var j = 0
    while (j < 64) {
      if (counts(j) * 2 > n) r |= (1L << j)
      j += 1
    }
    r
  }
}

/** Unary wrappers exposing the [[SigOps]] kernels as Catalyst expressions.
  * All are codegen'd via a single static call — no boxing, stages keep
  * whole-stage codegen.
  */
object SignatureExpressions {

  case class HashedShingleSet(child: Expression, k: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "hashed_shingle_set"
    override protected def withNewChildInternal(newChild: Expression): HashedShingleSet =
      copy(child = newChild)
    override def nullSafeEval(in: Any): Any =
      SigOps.hashedShingleSet(in.asInstanceOf[ArrayData], k)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.expr.SigOps.hashedShingleSet($c, $k)")
  }

  case class MinHashSig(child: Expression, numHashes: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "minhash_sig"
    override protected def withNewChildInternal(newChild: Expression): MinHashSig =
      copy(child = newChild)
    override def nullSafeEval(in: Any): Any =
      SigOps.minhashSig(in.asInstanceOf[ArrayData], numHashes)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.expr.SigOps.minhashSig($c, $numHashes)")
  }

  case class BandKeys(child: Expression, bands: Int, rowsPerBand: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "band_keys"
    override protected def withNewChildInternal(newChild: Expression): BandKeys =
      copy(child = newChild)
    override def nullSafeEval(in: Any): Any =
      SigOps.bandKeys(in.asInstanceOf[ArrayData], bands, rowsPerBand)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        c => s"graft.expr.SigOps.bandKeys($c, $bands, $rowsPerBand)")
  }

  case class KGramHashes(child: Expression, k: Int) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "kgram_hashes"
    override protected def withNewChildInternal(newChild: Expression): KGramHashes =
      copy(child = newChild)
    override def nullSafeEval(in: Any): Any =
      SigOps.kgramHashes(in.asInstanceOf[ArrayData], k)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.expr.SigOps.kgramHashes($c, $k)")
  }

  case class SimHashMd5(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "simhash_md5"
    override protected def withNewChildInternal(newChild: Expression): SimHashMd5 =
      copy(child = newChild)
    override def nullSafeEval(in: Any): Any =
      SigOps.simhashMd5(in.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.expr.SigOps.simhashMd5($c)")
  }

  case class RepetitionStats(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "repetition_stats"
    override protected def withNewChildInternal(newChild: Expression): RepetitionStats =
      copy(child = newChild)
    override def nullSafeEval(in: Any): Any =
      SigOps.repetitionStats(in.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.expr.SigOps.repetitionStats($c)")
  }

  case class SimHash64(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "simhash64"
    override protected def withNewChildInternal(newChild: Expression): SimHash64 =
      copy(child = newChild)
    override def nullSafeEval(in: Any): Any =
      SigOps.simhash64(in.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.expr.SigOps.simhash64($c)")
  }
}
