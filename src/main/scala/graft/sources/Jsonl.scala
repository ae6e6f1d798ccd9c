package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** JSON-Lines source/sink — the interchange format next to parquet (the
  * reference engine's values are JS objects; JSONL is their on-disk
  * lingua franca, and every ingest pipeline meets it at the boundary).
  * Parquet stays the performance format: JSONL here is for moving data
  * in and out, schema-checked, not for analytics scans.
  *
  * Scale discipline:
  *  - `read` REQUIRES an explicit schema. Schema inference is a full
  *    extra pass over the data before the real one — acceptable on a
  *    laptop, catastrophic at 100 TB — and silently widens types on
  *    dirty rows. Corrupt lines land in `_corrupt_record` when the
  *    schema declares it (PERMISSIVE), or fail fast under FAILFAST.
  *  - Files stay uncompressed (or should use a splittable codec) so one
  *    shard never becomes one task; JSONL is line-splittable as-is.
  *  - Timestamps round-trip as ISO-8601 strings at MICROSECOND
  *    precision (Spark's default JSON timestampFormat silently
  *    truncates to millis — the format is pinned on both sides);
  *    binary rides as base64 (JsonlSpec pins the round-trip).
  *  - SCHEMA EVOLUTION is by NAME (JSON fields are named): a new
  *    nullable column may sit anywhere in the evolved schema and reads
  *    as null over old shards; a removed column is just a narrower
  *    schema (extra fields in newer shards are skipped). Both
  *    directions pinned by JsonlSpec. Contrast [[Csv]], whose
  *    positional mapping only permits TRAILING additions.
  */
object Jsonl {

  private val TsFormat = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"

  /** Write `df` as line-delimited JSON under `path` (one file per
    * partition — pass `repartition` upstream to control shard count).
    *
    * `codec`: "uncompressed" (default) or a Hadoop codec name. gzip
    * shards read transparently but are NOT SPLITTABLE — every gzip
    * file is exactly one task regardless of size, so a 50 GB .json.gz
    * shard serializes into one core (CompressedSpec gates this). At
    * scale either keep shards small enough that file count ≈ desired
    * parallelism, or re-shard to uncompressed/splittable on ingest.
    */
  def write(df: DataFrame, path: String,
      codec: String = "uncompressed"): Unit =
    df.write.mode("overwrite")
      .option("timestampFormat", TsFormat)
      .option("compression", codec)
      .json(path)

  /** Read line-delimited JSON with a REQUIRED schema (see scaladoc);
    * `failFast = true` turns dirty lines into job failures instead of
    * nulls.
    */
  def read(
      spark: SparkSession, path: String, schema: StructType,
      failFast: Boolean = false): DataFrame =
    spark.read
      .schema(schema)
      .option("timestampFormat", TsFormat)
      .option("mode", if (failFast) "FAILFAST" else "PERMISSIVE")
      .json(path)
}
