package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** CSV/TSV source/sink — the other interchange boundary next to
  * [[Jsonl]] (the reference engine's store is format-free KV blobs,
  * `distribution/local/store.js:86-130`; delimited text is what real
  * corpus pipelines actually receive). Parquet stays the performance
  * format: CSV here is for moving data in and out, schema-checked.
  *
  * Same scale discipline as [[Jsonl]]:
  *  - `read` REQUIRES an explicit schema. Inference is a full extra
  *    pass before the real one and silently widens types on dirty rows.
  *  - `multiLine` stays FALSE so a 100 GB shard splits by line into
  *    many tasks. Consequence: fields must not carry literal newlines —
  *    a quoted embedded newline needs multiLine=true, which makes one
  *    file one task. Normalize text upstream (the corpus fingerprint
  *    pipeline does anyway) or use JSONL for newline-bearing payloads.
  *  - Quoting is RFC 4180: fields containing the delimiter or quotes
  *    are double-quoted with `""` escapes (escape pinned to `"` —
  *    Spark's default `\` escape round-trips against itself but not
  *    against standard CSV emitters).
  *  - Timestamps round-trip as ISO-8601 at MICROSECOND precision (the
  *    Jsonl pin; Spark's default truncates to millis).
  *  - Known lossy corner, pinned by CsvSpec: CSV cannot distinguish a
  *    NULL string from an empty one — both read back as null. Columns
  *    where that distinction matters need JSONL or parquet.
  *
  * Dirty-line modes mirror [[Jsonl.read]]: PERMISSIVE nulls unparsable
  * fields; FAILFAST turns them into job failures.
  *
  * SCHEMA EVOLUTION is by POSITION (Spark's enforceSchema default maps
  * schema to fields positionally; header names are not consulted), so
  * the contract is narrower than [[Jsonl]]'s:
  *  - a new nullable column is legal only at the TAIL — old rows run
  *    out of fields and PERMISSIVE nulls the remainder;
  *  - never drop a column from the READ schema: a mid-schema removal
  *    shifts every later field one position left and values land under
  *    the wrong names, silently. Project instead: read with the
  *    shard's full schema, then `.drop`/`.select` (CSV has no column
  *    pruning to lose). Both behaviors pinned by CsvSpec.
  */
object Csv {

  private val TsFormat = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"

  val Tab = "\t"

  /** Write `df` as delimited text under `path` (one file per partition —
    * repartition upstream to control shard count). Header on: shards
    * stay self-describing for humans and non-Spark readers; the read
    * side skips it by name, not position.
    */
  def write(df: DataFrame, path: String, delimiter: String = ",",
      codec: String = "uncompressed"): Unit =
    df.write.mode("overwrite")
      .option("header", "true")
      .option("delimiter", delimiter)
      .option("quote", "\"")
      .option("escape", "\"")
      .option("timestampFormat", TsFormat)
      .option("compression", codec)
      .csv(path)

  /** Read delimited text with a REQUIRED schema (see scaladoc);
    * `failFast = true` turns dirty lines into job failures instead of
    * nulled fields.
    */
  def read(
      spark: SparkSession, path: String, schema: StructType,
      failFast: Boolean = false, delimiter: String = ","): DataFrame =
    spark.read
      .schema(schema)
      .option("header", "true")
      .option("delimiter", delimiter)
      .option("quote", "\"")
      .option("escape", "\"")
      .option("timestampFormat", TsFormat)
      .option("multiLine", "false")
      .option("mode", if (failFast) "FAILFAST" else "PERMISSIVE")
      .csv(path)
}
