package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Engine.table
import graft.mm.Multimodal

/** Multimodal query surface. The decode is the deterministic
  * [[Multimodal.StubDecoder]] (no codecs in this container); dimensions
  * are integer functions of the payload size, so the DuckDB oracle can
  * reproduce them from octet_length. `brightness` (byte-content checksum)
  * is not SQL-reproducible and is covered by MultimodalSpec instead.
  */
object MMQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Full plumbing path: documents → media table (binary payloads) →
    // batched mapPartitions decode → typed features, minus brightness.
    "m01_media_meta" -> ((s, dir) => {
      val media = Multimodal.asMediaTable(table(s, dir, "documents"))
      Multimodal.decodeFeatures(s, media).toDF()
        .select("doc_id", "media_type", "n_bytes", "width", "height", "n_frames")
    }),

    // Frame-stride sampling (explode-shaped; video rows only).
    "m02_frame_samples" -> ((s, dir) =>
      Multimodal.sampleFrames(
        Multimodal.asMediaTable(table(s, dir, "documents")), stride = 4)),

    // Resize planning (fit-within 224, aspect-preserving, no upscale).
    "m03_resize_plan" -> ((s, dir) =>
      Multimodal.resizePlan(
        Multimodal.asMediaTable(table(s, dir, "documents")), maxDim = 224)),

    // Exact media dedup: byte-content fingerprint over the BINARY payload
    // (the d01 shape lifted to the media table — dedup before any decode
    // spends compute on a duplicate). Planted corpus gives real groups.
    "m04_media_dedup" -> ((s, dir) => {
      val d = table(s, dir, "documents")
      val planted = d.unionAll(
        d.select((col("doc_id") + 1000000000000L).as("doc_id"), col("text"),
          col("lang"), col("source"), col("n_chars")))
      Multimodal.mediaDedupGroups(Multimodal.asMediaTable(planted))
    }),

    // Preprocessing export manifest: the cross-family composition a
    // multimodal decode fleet consumes — per visual doc, its resize
    // target (m03) joined to its seeded shard/position (p07), so a
    // worker claims shard k and processes its rows in pos order. One
    // id equi-join between two already-oracled plans.
    "m05_export_manifest" -> ((s, dir) => {
      val plan = Multimodal.resizePlan(
        Multimodal.asMediaTable(table(s, dir, "documents")), maxDim = 224)
      val shards = graft.ops.Sharding.shuffleShards(
        table(s, dir, "documents"), nShards = 8, seed = 42L)
      plan.join(shards, Seq("doc_id"))
        .select(col("doc_id"), col("media_type"),
          col("target_w"), col("target_h"), col("shard"), col("pos"))
    }),

    // Byte-budget shard packing (webdataset/tar-shard export plan):
    // seeded LCG layout order per media type, running byte total, 4 KiB
    // shard ranges — all integer (Sharding.byteBudgetShards).
    "m06_byte_shards" -> byteShardsQuery,

    // Byte-budget EVAL SAMPLE per modality: the first 8 KiB of each
    // media type in an independently-seeded LCG order (seed 7, disjoint
    // from m06's export layout) — the balanced "small but
    // representative" eval set every multimodal pipeline carves out.
    // Selection = shard 0 of the byteBudgetShards layout: membership is
    // a pure function of (corpus, seed, budget), stable under
    // repartitioning and appends below the cut.
    "m12_eval_byte_sample" -> ((s, dir) => {
      val media = Multimodal.asMediaTable(table(s, dir, "documents"))
        .withColumn("n_bytes", length(col("media")).cast("long"))
      graft.ops.Sharding.byteBudgetShards(media, byteCol = "n_bytes",
        budgetBytes = 8192L, groupCol = "media_type", seed = 7L,
        idCol = "doc_id")
        .filter(col("shard") === 0)
        .select(col("doc_id"), col("media_type"), col("n_bytes"),
          col("offset_bytes"))
    }),

    // Modality-balanced interleave: round-robin image/audio/video
    // positions (pos = (rn-1)*3 + modality index, rn the seeded LCG
    // order within the modality) — the batch-composition order a
    // multimodal trainer reads so every consecutive triple spans the
    // three modalities. Per-modality windows only (the p07 scale shape);
    // when a modality exhausts, its residues simply go unused — the
    // standard tail behavior.
    "m07_modality_interleave" -> ((s, dir) => {
      val media = Multimodal.asMediaTable(table(s, dir, "documents"))
      val typeIdx = when(col("media_type") === "image", 0)
        .when(col("media_type") === "audio", 1).otherwise(2)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("media_type"))
        .orderBy(col("rank_key").asc, col("doc_id").asc)
      media.select(col("doc_id"), col("media_type"),
          graft.ops.Sharding.lcgRank(col("doc_id")).as("rank_key"))
        .withColumn("rn", row_number().over(w))
        .select(col("doc_id"), col("media_type"), col("rn"),
          ((col("rn") - 1) * 3 + typeIdx).as("pos"))
    }),

    // Media quality gate: per-rule verdicts (tiny_payload / tiny_dims /
    // extreme_aspect / too_few_frames) over the decode-features output —
    // metadata-only rules that reject a file BEFORE the expensive decode
    // stages. The p06 auditable-filter idiom on the media table.
    "m08_media_gate" -> ((s, dir) =>
      Multimodal.qualityGate(
        Multimodal.decodeFeatures(
          s, Multimodal.asMediaTable(table(s, dir, "documents"))).toDF())),

    // Perceptual media near-dup: block-parity signature + LSH banding +
    // exact-Hamming verify over the binary payloads — what exact m04
    // fingerprints can't catch (suffix-mutated copies). The plant:
    // every 7th doc re-enters with 'xx' appended — only the blocks at
    // the old tail change, so the mirror lands at Hamming ≤ 2 while
    // unrelated payloads scatter. (m09 in the family map.)
    "m09_perceptual_dedup" -> ((s, dir) => {
      val d = table(s, dir, "documents").select(col("doc_id"), col("text"))
      val planted = d.unionAll(
        d.filter(pmod(col("doc_id"), lit(7)) === 0)
          .select((col("doc_id") + 1000000000000L).as("doc_id"),
            concat(col("text"), lit("xx")).as("text")))
      Multimodal.perceptualHashPairs(Multimodal.asMediaTable(planted))
    }),

    // Byte-entropy audit of the binary payload — the pre-decode health
    // check: constant-fill or truncated media sit at near-zero entropy,
    // encrypted/compressed payloads near 8 bits, so the readout flags
    // both corrupt uploads and double-compressed inputs BEFORE the
    // expensive codec stage (the m04 dedup-before-decode discipline).
    // Bytes come off the payload via hex slicing (works for ANY binary,
    // no charset assumption); entropy uses t30's exact-sum contract —
    // round-6 c·log₂c terms summed as DECIMAL, one closing epilogue.
    "m10_byte_entropy" -> ((s, dir) => {
      // widen: the per-payload hex-gram kernel is the cost; a
      // single-row-group scan would otherwise run it in one task
      val m = graft.ops.widen(Multimodal.asMediaTable(table(s, dir, "documents")))
        .select(col("doc_id"), hex(col("media")).as("__h"))
        .filter(length(col("__h")) >= 2)
      m.select(col("doc_id"), explode(expr(
          "transform(sequence(1, length(__h) div 2)," +
            " i -> substring(__h, 2*i - 1, 2))")).as("__b"))
        .groupBy(col("doc_id"), col("__b")).agg(count(lit(1)).as("__c"))
        .groupBy(col("doc_id"))
        .agg(sum(col("__c")).as("n_bytes"),
          count(lit(1)).as("distinct_bytes"),
          sum(round(col("__c").cast("double") *
            log2(col("__c").cast("double")), 6)
            .cast(org.apache.spark.sql.types.DataTypes
              .createDecimalType(18, 6)))
            .cast(org.apache.spark.sql.types.DataTypes
              .createDecimalType(38, 6)).as("__s"))
        .select(col("doc_id"), col("n_bytes"), col("distinct_bytes"),
          round(log2(col("n_bytes").cast("double")) -
            col("__s").cast("double") / col("n_bytes").cast("double"), 6)
            .as("entropy_bits"))
    }),

    // Caption↔embedding PAIR-COVERAGE audit: the backfill planner of a
    // multimodal pipeline — per source, how many documents still lack
    // an embedding row and how many embeddings lost their document
    // (a full-outer id join; orphans roll up under '__orphan__'). The
    // planted feed drops every 7th embedding and forges orphans from
    // every 11th (the d10/p11 discipline), so both defect classes are
    // exercised, not vacuous.
    "m11_pair_coverage" -> ((s, dir) => {
      val d = table(s, dir, "documents")
        .select(col("doc_id"), col("source"))
      val em = table(s, dir, "embeddings")
      val e = em.filter(pmod(col("vec_id"), lit(7)) =!= 3)
        .select(col("vec_id"))
        .unionAll(em.filter(pmod(col("vec_id"), lit(11)) === 5)
          .select((col("vec_id") + 1000000L).as("vec_id")))
      d.join(e, col("doc_id") === col("vec_id"), "full_outer")
        .select(coalesce(col("source"), lit("__orphan__")).as("source"),
          col("doc_id"), col("vec_id"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_rows"),
          sum(when(col("doc_id").isNotNull && col("vec_id").isNotNull,
            1L).otherwise(0L)).as("n_paired"),
          sum(when(col("vec_id").isNull, 1L).otherwise(0L))
            .as("n_missing_embedding"),
          sum(when(col("doc_id").isNull, 1L).otherwise(0L))
            .as("n_orphan_embeddings"))
        .withColumn("coverage",
          when(col("n_paired") + col("n_missing_embedding") > 0,
            round(col("n_paired").cast("double") /
              (col("n_paired") + col("n_missing_embedding"))
                .cast("double"), 6)))
    }))

  // a def, not a val: the queries map above initializes first, and a
  // forward val reference would be null at object-init time
  private def byteShardsQuery: (SparkSession, String) => DataFrame =
    (s, dir) => {
      val media = Multimodal.asMediaTable(table(s, dir, "documents"))
        .withColumn("n_bytes", length(col("media")).cast("long"))
      graft.ops.Sharding.byteBudgetShards(
        media, byteCol = "n_bytes", budgetBytes = 4096L,
        groupCol = "media_type", seed = 42L, idCol = "doc_id")
    }

  private val nBytes = "octet_length(encode(text))"

  val oracles: Map[String, String] = Map(
    // Mirrors m11: same planted drop/forge rules, same full-outer id
    // join with orphan rollup, BIGINT counts, one guarded round-6
    // coverage division (NULL for the orphan bucket, matching Spark's
    // unmatched-when null).
    "m11_pair_coverage" ->
      """WITH e AS (SELECT vec_id FROM embeddings WHERE vec_id % 7 <> 3
               UNION ALL
               SELECT vec_id + 1000000 FROM embeddings
               WHERE vec_id % 11 = 5),
         j AS (SELECT coalesce(d.source, '__orphan__') AS source,
                 d.doc_id, e.vec_id
               FROM documents d FULL OUTER JOIN e ON d.doc_id = e.vec_id),
         a AS (SELECT source, CAST(count(*) AS BIGINT) AS n_rows,
                 CAST(sum(CASE WHEN doc_id IS NOT NULL
                   AND vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_paired,
                 CAST(sum(CASE WHEN vec_id IS NULL THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_missing_embedding,
                 CAST(sum(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_orphan_embeddings
               FROM j GROUP BY 1)
       SELECT source, n_rows, n_paired, n_missing_embedding,
         n_orphan_embeddings,
         CASE WHEN n_paired + n_missing_embedding > 0
              THEN round(CAST(n_paired AS DOUBLE)
                / CAST(n_paired + n_missing_embedding AS DOUBLE), 6)
         END AS coverage
       FROM a""",
    // Mirrors m10: the same hex-pair byte slicing (hex CASE differs per
    // engine but bytes are only GROUP KEYS, never emitted — counts are
    // case-blind), the same round-6 exact-DECIMAL entropy sum as t30.
    "m10_byte_entropy" ->
      """WITH m AS (SELECT doc_id, hex(encode(text)) AS h FROM documents
            WHERE length(text) >= 1),
          pos AS (SELECT doc_id, h,
                    unnest(range(1, length(h) // 2 + 1)) AS i FROM m),
          b AS (SELECT doc_id,
                  substr(h, CAST(2 * i - 1 AS INTEGER), 2) AS byte
                FROM pos),
          hh AS (SELECT doc_id, byte, CAST(count(*) AS BIGINT) AS c
                 FROM b GROUP BY 1, 2),
          d AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bytes,
                  CAST(count(*) AS BIGINT) AS distinct_bytes,
                  sum(CAST(round(CAST(c AS DOUBLE) *
                    log2(CAST(c AS DOUBLE)), 6) AS DECIMAL(18,6))) AS s
                FROM hh GROUP BY 1)
        SELECT doc_id, n_bytes, distinct_bytes,
          round(log2(CAST(n_bytes AS DOUBLE)) -
            CAST(s AS DOUBLE) / CAST(n_bytes AS DOUBLE), 6)
            AS entropy_bits
        FROM d""",
    // Mirrors m09: the corpus is pure ASCII (verified: octet_length ==
    // length at every sf), so VARCHAR substr/md5 here equals the Spark
    // side's BYTE slicing of the text-cast payload — the d07/t22
    // hash-vs-string equivalence extended to block content. Same plant,
    // same covered-band rule (first block offset < length), same band
    // values, all-pairs over band collisions, exact Hamming ≤ 6.
    "m09_perceptual_dedup" ->
      """WITH m AS (SELECT doc_id, text FROM documents
             UNION ALL
             SELECT doc_id + 1000000000000, text || 'xx'
             FROM documents WHERE doc_id % 7 = 0),
         sig AS (SELECT doc_id, length(text) AS len,
                   list_transform(range(0, 64), i ->
                     CASE WHEN substr(md5(substr(text, i*32 + 1, 32)),
                         1, 1) IN ('8','9','a','b','c','d','e','f')
                       THEN 1 ELSE 0 END) AS bits
                 FROM m),
         band AS (SELECT doc_id, b,
                    list_sum(list_transform(range(0, 8),
                      j -> bits[b*8 + j + 1] * (1 << j))) AS bv
                  FROM sig, range(0, 8) t(b)
                  WHERE b * 256 < len),
         cand AS (SELECT DISTINCT x.doc_id AS ia, y.doc_id AS ib
                  FROM band x JOIN band y
                    ON x.b = y.b AND x.bv = y.bv
                   AND x.doc_id < y.doc_id),
         h AS (SELECT ia AS id_a, ib AS id_b,
                 CAST(list_sum(list_transform(range(1, 65),
                   i -> abs(sa.bits[i] - sb.bits[i]))) AS INTEGER)
                   AS hamming
               FROM cand
               JOIN sig sa ON ia = sa.doc_id
               JOIN sig sb ON ib = sb.doc_id)
         SELECT id_a, id_b, hamming FROM h WHERE hamming <= 6""",
    // Mirrors m08: the m01 stub-dimension fragments feeding the same
    // fixed-order rule set; concat_ws skips NULL branches identically on
    // both engines (the p06 contract), and kept is '' equality on the
    // same joined string.
    "m08_media_gate" ->
      s"""WITH f AS (
            SELECT doc_id,
              CASE (doc_id % 3) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
              CAST($nBytes AS BIGINT) AS n_bytes,
              CAST(($nBytes % 640) + 16 AS INT) AS width,
              CAST((($nBytes * 7) % 480) + 16 AS INT) AS height,
              CAST(($nBytes % 16) + 1 AS INT) AS n_frames
            FROM documents),
          r AS (
            SELECT doc_id, media_type, n_bytes,
              concat_ws(',',
                CASE WHEN n_bytes < 64 THEN 'tiny_payload' END,
                CASE WHEN media_type IN ('image', 'video')
                     AND least(width, height) < 32 THEN 'tiny_dims' END,
                CASE WHEN media_type IN ('image', 'video')
                     AND greatest(width, height) > 8 * least(width, height)
                     THEN 'extreme_aspect' END,
                CASE WHEN media_type = 'video' AND n_frames < 2
                     THEN 'too_few_frames' END) AS reasons
            FROM f)
          SELECT doc_id, media_type, n_bytes, reasons,
            (reasons = '') AS kept
          FROM r""",
    "m01_media_meta" ->
      s"""SELECT doc_id,
          CASE (doc_id % 3) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
          CAST($nBytes AS BIGINT) AS n_bytes,
          CAST(($nBytes % 640) + 16 AS INT) AS width,
          CAST((($nBytes * 7) % 480) + 16 AS INT) AS height,
          CAST(($nBytes % 16) + 1 AS INT) AS n_frames
          FROM documents""",
    "m02_frame_samples" ->
      s"""SELECT doc_id, CAST(unnest(range(0, ($nBytes % 16) + 1, 4)) AS INT) AS frame_idx,
          CAST(($nBytes % 16) + 1 AS INT) AS n_frames
          FROM documents
          WHERE (doc_id % 3) = 2""",
    "m03_resize_plan" ->
      s"""WITH m AS (
            SELECT doc_id,
              CASE (doc_id % 3) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
              CAST(($nBytes % 640) + 16 AS INT) AS width,
              CAST((($nBytes * 7) % 480) + 16 AS INT) AS height
            FROM documents)
          SELECT doc_id, media_type, width, height,
            CAST(floor(width * least(1.0, 224.0 / greatest(width, height))) AS INT) AS target_w,
            CAST(floor(height * least(1.0, 224.0 / greatest(width, height))) AS INT) AS target_h
          FROM m WHERE media_type IN ('image', 'video')""",
    // Composes the m03 and p07 oracle fragments verbatim; the join adds
    // no arithmetic, so each leg's exactness argument carries over.
    "m05_export_manifest" ->
      s"""WITH m AS (
            SELECT doc_id,
              CASE (doc_id % 3) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
              CAST(($nBytes % 640) + 16 AS INT) AS width,
              CAST((($nBytes * 7) % 480) + 16 AS INT) AS height
            FROM documents),
          plan AS (
            SELECT doc_id, media_type,
              CAST(floor(width * least(1.0, 224.0 / greatest(width, height))) AS INT) AS target_w,
              CAST(floor(height * least(1.0, 224.0 / greatest(width, height))) AS INT) AS target_h
            FROM m WHERE media_type IN ('image', 'video')),
          h AS (
            SELECT doc_id,
              ((((doc_id % 2147483648) * 1103515245 + ${42L + 12345L}) % 2147483648)
                * 1103515245 + 12345) % 2147483648 AS rank_key
            FROM documents),
          s AS (
            SELECT doc_id, CAST(rank_key % 8 AS INTEGER) AS shard,
              row_number() OVER (PARTITION BY rank_key % 8
                ORDER BY rank_key ASC, doc_id ASC) AS pos
            FROM h)
          SELECT plan.doc_id, plan.media_type, plan.target_w, plan.target_h,
            s.shard, s.pos
          FROM plan JOIN s USING (doc_id)""",
    // Replays byteBudgetShards: the p07 LCG rank (seed 42 → +12387
    // first-round increment), per-media-type exclusive byte prefix sum,
    // integer shard/offset arithmetic.
    "m06_byte_shards" ->
      s"""WITH m AS (SELECT doc_id,
              CASE (doc_id % 3) WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                ELSE 'video' END AS media_type,
              CAST($nBytes AS BIGINT) AS n_bytes
            FROM documents),
          h AS (SELECT *,
              ((((doc_id % 2147483648) * 1103515245 + ${42L + 12345L})
                % 2147483648) * 1103515245 + 12345) % 2147483648 AS rank_key
            FROM m),
          c AS (SELECT *,
              CAST(coalesce(sum(n_bytes) OVER (PARTITION BY media_type
                ORDER BY rank_key, doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                AS BIGINT) AS cum_before
            FROM h)
          SELECT doc_id, media_type, n_bytes,
            CAST(cum_before // 4096 AS INTEGER) AS shard,
            cum_before - (cum_before // 4096) * 4096 AS offset_bytes
          FROM c""",
    // Replays m12: the m06 machinery at seed 7 (→ +12352 first-round
    // increment), exclusive prefix sum < 8192 ⇔ shard 0.
    "m12_eval_byte_sample" ->
      s"""WITH m AS (SELECT doc_id,
              CASE (doc_id % 3) WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                ELSE 'video' END AS media_type,
              CAST($nBytes AS BIGINT) AS n_bytes
            FROM documents),
          h AS (SELECT *,
              ((((doc_id % 2147483648) * 1103515245 + ${7L + 12345L})
                % 2147483648) * 1103515245 + 12345) % 2147483648 AS rank_key
            FROM m),
          c AS (SELECT *,
              CAST(coalesce(sum(n_bytes) OVER (PARTITION BY media_type
                ORDER BY rank_key, doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                AS BIGINT) AS cum_before
            FROM h)
          SELECT doc_id, media_type, n_bytes,
            cum_before AS offset_bytes
          FROM c WHERE cum_before < 8192""",
    // Replays m07: same LCG rank, same per-modality row_number order,
    // same (rn-1)*3 + modality-index position arithmetic. All integer.
    "m07_modality_interleave" ->
      s"""WITH m AS (SELECT doc_id,
              CASE (doc_id % 3) WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                ELSE 'video' END AS media_type
            FROM documents),
          h AS (SELECT *,
              ((((doc_id % 2147483648) * 1103515245 + ${42L + 12345L})
                % 2147483648) * 1103515245 + 12345) % 2147483648 AS rank_key
            FROM m),
          r AS (SELECT *,
              row_number() OVER (PARTITION BY media_type
                ORDER BY rank_key, doc_id) AS rn
            FROM h)
          SELECT doc_id, media_type, rn,
            (rn - 1) * 3 + (CASE media_type WHEN 'image' THEN 0
              WHEN 'audio' THEN 1 ELSE 2 END) AS pos
          FROM r""",
    // The media payload is the UTF-8 text bytes (asMediaTable), so
    // md5(BINARY) on the Spark side == md5(text VARCHAR) here.
    "m04_media_dedup" ->
      """WITH u AS (SELECT doc_id, text FROM documents
              UNION ALL SELECT doc_id + 1000000000000 AS doc_id, text FROM documents)
         SELECT md5(text) AS fp, min(doc_id) AS keeper_id,
                count(*) AS n_copies
         FROM u GROUP BY 1"""
  )
}
