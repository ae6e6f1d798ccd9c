package graft.kv

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** KV storage layer — Spark realization of the reference's `mem`/`store`
  * services.
  *
  * Reference semantics being preserved:
  *  - record = gid-scoped key→opaque-value (distribution/local/mem.js:24-43,
  *    local/store.js:86-130 — one serialized blob per key);
  *  - default key is content-addressed: sha256 of the serialized value
  *    (distribution/util/id.js:72-78, used at all/store.js:183);
  *  - duplicate key ⇒ last write wins (local/store.js:129-130 overwrites the
  *    same file; asserted by test/all.student.test.js:230-293);
  *  - `get(null)` enumerates all keys of a gid (local/store.js:155-172);
  *  - `reconf` re-shards only the keys whose placement changed
  *    (all/store.js:217-285) — in Spark, placement is the shuffle's job, so
  *    reconf degenerates to an explicit repartition-by-key rewrite.
  *
  * Spark-first mapping: `store` = a parquet directory per gid (vectorized
  * scan, predicate pushdown for point lookups); `mem` = cached DataFrames.
  * Values ride as JSON strings — the reference's values are schemaless JS
  * blobs (SURVEY §1.2), so an opaque string column IS the faithful data
  * model; schema-on-read (`from_json`) recovers structure when the caller
  * knows it.
  *
  * NOT ported: HTTP-RPC transport, gossip, node spawn — Spark's control
  * plane owns those (SURVEY §2.4).
  */
class Store(spark: SparkSession, root: String) {
  import Store._

  private def path(gid: String) = s"$root/$gid"

  private def exists(gid: String): Boolean =
    new java.io.File(path(gid)).exists()

  /** Upsert a batch of rows into `gid` as (key, value-JSON) pairs.
    *
    * @param keyCol column to use as the key; None ⇒ content-addressed
    *               sha256(to_json(row)) like the reference's getID.
    */
  def put(df: DataFrame, gid: String, keyCol: Option[String] = None): Unit = {
    val batch = toKV(df, keyCol)
      // last-write-wins within the batch, made deterministic by keeping the
      // lexicographically greatest value per key (the reference's "last" is
      // arrival order; any deterministic winner satisfies the stored-set
      // semantics the tests assert).
      .groupBy("key").agg(max("value").as("value"))
    val merged =
      if (exists(gid)) {
        val old = spark.read.parquet(path(gid))
        // new batch wins over existing keys
        old.join(batch.select("key"), Seq("key"), "left_anti").union(batch)
      } else batch
    // Write via a temp dir then swap, since `merged` reads the live dir.
    val tmp = path(gid) + "__tmp"
    merged.write.mode("overwrite").parquet(tmp)
    swapIn(tmp, path(gid))
  }

  /** Point lookup — a pushed-down filter on the key column, not a scan. */
  def get(gid: String, key: String): DataFrame =
    spark.read.parquet(path(gid)).filter(col("key") === key)

  /** `get(null)` — enumerate all keys of a gid (reference
    * all/store.js:150-163 broadcast-concat).
    */
  def keys(gid: String): DataFrame =
    spark.read.parquet(path(gid)).select("key")

  /** Full scan of a gid. */
  def scan(gid: String): DataFrame =
    spark.read.parquet(path(gid))

  /** Delete one key (rewrite-minus-key; at production scale this is a
    * Delta/Iceberg delete — out of scope offline).
    */
  def del(gid: String, key: String): Unit = {
    val rest = spark.read.parquet(path(gid)).filter(col("key") =!= key)
    val tmp = path(gid) + "__tmp"
    rest.write.mode("overwrite").parquet(tmp)
    swapIn(tmp, path(gid))
  }

  /** Re-shard a gid into `numBuckets` hash partitions of the key — the
    * reference's `reconf` (all/store.js:217-285). Spark moves all data on
    * rewrite; minimal-movement is an implementation detail of the
    * reference's placement model, not of the query surface.
    */
  def reconf(gid: String, numBuckets: Int): Unit = {
    val df = spark.read.parquet(path(gid)).repartition(numBuckets, col("key"))
    val tmp = path(gid) + "__tmp"
    df.write.mode("overwrite").parquet(tmp)
    swapIn(tmp, path(gid))
  }

  /** Replace the live dir with the freshly-written tmp dir, failing
    * loudly: an unchecked delete+rename that half-fails would leave the
    * gid missing or truncated while put() reports success.
    */
  private def swapIn(tmp: String, live: String): Unit = {
    val dir = new java.io.File(live)
    if (dir.exists()) delete(dir)
    if (dir.exists())
      throw new java.io.IOException(s"store: could not clear $live")
    if (!new java.io.File(tmp).renameTo(dir))
      throw new java.io.IOException(
        s"store: rename $tmp -> $live failed; data preserved at $tmp")
  }
}

object Store {
  /** Project an arbitrary DataFrame to the KV (key, value) shape.
    * value = canonical JSON of the full row; key = given column or
    * content-addressed sha256 of the value (id.js:72-78 analog).
    */
  def toKV(df: DataFrame, keyCol: Option[String] = None): DataFrame = {
    val json = to_json(struct(df.columns.map(col): _*))
    keyCol match {
      case Some(k) =>
        df.select(col(k).cast("string").as("key"), json.as("value"))
      case None =>
        df.select(sha2(json, 256).as("key"), json.as("value"))
    }
  }

  private def delete(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(delete)
    f.delete(): Unit
  }
}

/** `mem` — ephemeral node-local KV (distribution/local/mem.js). In Spark:
  * a named registry of cached DataFrames; Spark's unified memory manager
  * replaces the reference's per-node JS Maps.
  */
class Mem {
  private val groups = scala.collection.concurrent.TrieMap[String, DataFrame]()

  def put(df: DataFrame, gid: String, keyCol: Option[String] = None): Unit = {
    val kv = Store.toKV(df, keyCol).groupBy("key").agg(max("value").as("value"))
    val merged = groups.get(gid) match {
      case Some(old) =>
        old.join(kv.select("key"), Seq("key"), "left_anti").union(kv)
      case None => kv
    }
    // materialize (localCheckpoint is eager) BEFORE dropping the old
    // cache: unpersist-then-lazy-cache would rebuild the whole put chain
    // from source on next read, and lineage would grow per put — the
    // iterative-DataFrame trap (see Dedup.components).
    val next = merged.localCheckpoint()
    groups.get(gid).foreach(_.unpersist())
    groups(gid) = next
  }

  def get(gid: String, key: String): DataFrame =
    groups(gid).filter(col("key") === key)

  def keys(gid: String): DataFrame = groups(gid).select("key")

  def scan(gid: String): DataFrame = groups(gid)

  def del(gid: String, key: String): Unit = {
    val rest = groups(gid).filter(col("key") =!= key).localCheckpoint()
    groups(gid).unpersist()
    groups(gid) = rest
  }
}
