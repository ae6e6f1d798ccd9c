package graft.mm

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video ride as opaque `binary`
  * columns with typed metadata structs; decode/feature-extract runs as
  * batched per-partition transforms.
  *
  * The decode itself is STUBBED (no image/audio codecs in this
  * container): [[StubDecoder]] produces deterministic fake
  * width/height/frames from the byte content. Everything around it — the
  * schema contract, the mapPartitions batch shape (the Scala analog of
  * `mapInPandas`), partition sizing — is real and tested, so swapping a
  * real codec in changes one function.
  *
  * Scale notes: binary payloads dominate row size, so media tables should
  * be written with small `maxPartitionBytes`-friendly row groups and the
  * metadata columns FIRST (parquet column pruning lets metadata-only
  * queries skip the blobs entirely — that's the difference between a 100
  * GB and a 100 TB scan).
  */
object Multimodal {

  /** Metadata struct carried alongside each media blob. */
  val mediaMetaType: StructType = StructType(Seq(
    StructField("media_type", StringType),
    StructField("n_bytes", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType)))

  /** A decoded batch row: doc id + extracted features. */
  case class MediaFeatures(
      doc_id: Long, media_type: String, n_bytes: Long,
      width: Int, height: Int, n_frames: Int, brightness: Double)

  /** The seam where a real codec plugs in. Deterministic stub: derives
    * fake dimensions from the payload length and a byte checksum —
    * stable across runs, machines, and partitionings.
    */
  trait Decoder extends Serializable {
    def decode(mediaType: String, bytes: Array[Byte]): MediaFeaturesRaw
  }

  case class MediaFeaturesRaw(width: Int, height: Int, nFrames: Int, brightness: Double)

  object StubDecoder extends Decoder {
    def decode(mediaType: String, bytes: Array[Byte]): MediaFeaturesRaw = {
      val n = bytes.length
      var sum = 0L
      var i = 0
      while (i < n) { sum += (bytes(i) & 0xff); i += 1 }
      MediaFeaturesRaw(
        width = (n % 640) + 16,
        height = ((n * 7) % 480) + 16,
        nFrames = (n % 16) + 1,
        brightness = if (n == 0) 0.0 else sum.toDouble / n)
    }
  }

  /** Attach media columns to documents: the text bytes stand in for a
    * payload; `media_type` fans out deterministically. This is the
    * ingest-side shape of a media table: (id, media_type, media binary).
    */
  def asMediaTable(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      element_at(
        array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("media_type"),
      col("text").cast("binary").as("media"))

  /** Exact media dedup groups by byte-content fingerprint — the
    * [[graft.ops.Dedup.exactGroups]] shape lifted to the BINARY payload,
    * run BEFORE any decode so duplicate media never reach the expensive
    * codec stage. One fingerprint groupBy; keeper = min id.
    * Output: (fp, keeper_id, n_copies).
    */
  def mediaDedupGroups(media: DataFrame): DataFrame =
    media.select(md5(col("media")).as("fp"), col("doc_id"))
      .groupBy("fp")
      .agg(min(col("doc_id")).as("keeper_id"),
        count(lit(1)).as("n_copies"))

  /** Batched decode via mapPartitions — the Scala analog of mapInPandas:
    * one decoder instance per partition, rows streamed through it, output
    * a typed Dataset. No shuffle; runs inside the scan stage.
    */
  def decodeFeatures(
      spark: SparkSession, media: DataFrame,
      decoder: Decoder = StubDecoder): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(col("doc_id"), col("media_type"), col("media"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, mt, bytes) =>
          val f = decoder.decode(mt, bytes)
          MediaFeatures(id, mt, bytes.length.toLong,
            f.width, f.height, f.nFrames, f.brightness)
        }
      }
  }

  /** Resize planning: compute the target geometry for every image/video
    * (fit-within maxDim preserving aspect ratio, never upscale). The
    * pixel transform itself is the stubbed codec seam; the geometry
    * arithmetic, schema, and partition shape are the real pipeline
    * plumbing — a codec plugs into [[decodeFeatures]]' Decoder and reads
    * (target_w, target_h) from here.
    */
  def resizePlan(media: DataFrame, maxDim: Int = 224): DataFrame = {
    // stub dimensions derived exactly as StubDecoder does
    val w = (octet_length(col("media")) % 640 + 16).cast("int")
    val h = ((octet_length(col("media")) * 7) % 480 + 16).cast("int")
    media
      .filter(col("media_type").isin("image", "video"))
      .withColumn("width", w)
      .withColumn("height", h)
      .withColumn("scale",
        least(lit(1.0), lit(maxDim) / greatest(col("width"), col("height"))
          .cast("double")))
      .withColumn("target_w", floor(col("width") * col("scale")).cast("int"))
      .withColumn("target_h", floor(col("height") * col("scale")).cast("int"))
      .select(col("doc_id"), col("media_type"), col("width"), col("height"),
        col("target_w"), col("target_h"))
  }

  /** Frame sampling plumbing: for video rows, emit one row per sampled
    * frame index (stride sampling) — the explode-shaped half of a
    * frame-extraction pipeline, with the actual pixel decode stubbed.
    */
  def sampleFrames(media: DataFrame, stride: Int = 4): DataFrame =
    media
      .filter(col("media_type") === "video")
      .withColumn("n_frames", (octet_length(col("media")) % 16 + 1).cast("int"))
      .withColumn("frame_idx",
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride))))
      .select(col("doc_id"), col("frame_idx"), col("n_frames"))

  /** Media quality gate with per-rule verdicts — the p06 auditable-filter
    * idiom lifted to media. Consumes the [[decodeFeatures]] output (or
    * any frame with the same metadata columns), so the rules run on
    * already-extracted METADATA: per-modality dimension/aspect/frame
    * checks are pure column logic, and a rejected file never reaches the
    * expensive full-decode/resize stages downstream. `reasons` keeps WHY
    * (fixed rule order, comma-joined), `kept` is the gate verdict —
    * per-rule reject counts downstream are plain string filters, no
    * re-decode. Narrow projection, no shuffle.
    */
  def qualityGate(features: DataFrame, minBytes: Long = 64,
      minDim: Int = 32, maxAspect: Int = 8, minFrames: Int = 2): DataFrame = {
    val visual = col("media_type").isin("image", "video")
    val reasons = concat_ws(",",
      when(col("n_bytes") < minBytes, lit("tiny_payload")),
      when(visual && least(col("width"), col("height")) < minDim,
        lit("tiny_dims")),
      when(visual && greatest(col("width"), col("height"))
        > lit(maxAspect) * least(col("width"), col("height")),
        lit("extreme_aspect")),
      when(col("media_type") === "video" && col("n_frames") < minFrames,
        lit("too_few_frames")))
    features.select(col("doc_id"), col("media_type"), col("n_bytes"),
      reasons.as("reasons"), (reasons === "").as("kept"))
  }

  /** Perceptual near-dup candidates over BINARY media payloads — the
    * pHash-shaped complement of [[mediaDedupGroups]]' exact fingerprints
    * (catches re-encoded / truncated / suffix-mutated copies an exact
    * hash never groups). The signature is a `nBlocks`-bit block-parity
    * code: bit i = high bit of md5(payload bytes [i·blockLen,
    * (i+1)·blockLen)), so a local edit flips only the touched blocks'
    * bits and near-copies land at small Hamming distance. A REAL
    * perceptual hash (DCT over decoded pixels) plugs into the same seam
    * by replacing the bit function; the banding/verification plumbing —
    * the part that matters at 100 TB — is unchanged.
    *
    * Candidates come from LSH banding (`nBands` bands of nBlocks/nBands
    * bits; equal band value → candidate), NEVER all pairs. Bands whose
    * first block starts beyond the payload are skipped — otherwise every
    * short payload shares identical all-padding trailing bands and the
    * bucket join degenerates quadratic. Buckets run through
    * [[graft.ops.Similarity.saltedBlockPairs]], so a hot bucket's
    * quadratic work is tiled across tasks with a hard per-task bound.
    * Verification (exact Hamming over the full code) happens inside the
    * pair stage; only pairs ≤ `maxHamming` reach the output exchange.
    *
    * Output: (id_a, id_b, hamming), id_a < id_b, distinct.
    */
  def perceptualHashPairs(media: DataFrame, nBlocks: Int = 64,
      blockLen: Int = 32, nBands: Int = 8, maxHamming: Int = 6,
      maxBucketRows: Int = 4096): DataFrame = {
    require(nBlocks % nBands == 0, "nBands must divide nBlocks")
    val bandBits = nBlocks / nBands
    require(bandBits <= 30, "band value must fit an int")
    val hexHigh = Seq("8", "9", "a", "b", "c", "d", "e", "f")
    val bits = transform(sequence(lit(0), lit(nBlocks - 1)), i =>
      when(md5(col("media").substr(i * lit(blockLen) + lit(1),
        lit(blockLen))).substr(lit(1), lit(1)).isin(hexHigh: _*), lit(1))
        .otherwise(lit(0)))
    val sig = media.select(col("doc_id").as("id"), bits.as("vec"),
      length(col("media")).as("__len"))
    val bandStructs = array((0 until nBands).map { b =>
      val bv = (0 until bandBits).map { j =>
        element_at(col("vec"), b * bandBits + j + 1) * lit(1 << j)
      }.reduce(_ + _)
      struct(lit(b).as("bi"), bv.as("bv"))
    }: _*)
    val banded = sig.withColumn("__band", explode(bandStructs))
      .filter(col("__band.bi") * lit(bandBits * blockLen) < col("__len"))
      .select(col("id"), col("vec"),
        (col("__band.bi") * lit(1 << bandBits) + col("__band.bv"))
          .as("bucket"))
    val ham = aggregate(
      zip_with(col("a_vec"), col("b_vec"), (x, y) => abs(x - y)),
      lit(0), (acc, x) => acc + x)
    graft.ops.Similarity.saltedBlockPairs(banded, "bucket", maxBucketRows)
      .withColumn("hamming", ham)
      .filter(col("hamming") <= maxHamming && col("a_id") =!= col("b_id"))
      .select(least(col("a_id"), col("b_id")).as("id_a"),
        greatest(col("a_id"), col("b_id")).as("id_b"), col("hamming"))
      .distinct()
  }
}
