package graft

/** Contract checks the driver relies on. */
class EntrySpec extends SparkSessionSpec {

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query") {
    val dangling = (SparkEntry.oracleSql.keySet ++
      SparkEntry.dynamicOracleSql.keySet) -- SparkEntry.queries.keySet
    assert(dangling.isEmpty, s"oracles without queries: $dangling")
  }

  test("no query has both a static and a dynamic oracle") {
    val both = SparkEntry.oracleSql.keySet & SparkEntry.dynamicOracleSql.keySet
    assert(both.isEmpty, s"conflicting oracle definitions: $both")
  }

  test("dynamic oracles build against a real dir and embed literal centroids") {
    val sql = SparkEntry.dynamicOracleSql("v04_ann_ivf")(spark, sfDir)
    assert(sql.contains("list_cosine_similarity"))
    // 16 cells × 64 dims of exact-decimal literals: the SQL must be
    // self-contained (no Scala-side state left behind)
    assert(sql.length > 10000)
    // deterministic: same dir ⇒ byte-identical SQL
    assert(sql === SparkEntry.dynamicOracleSql("v04_ann_ivf")(spark, sfDir))
  }

  test("all queries run and are non-empty at sf0.001") {
    val empty = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val n = fn(spark, sfDir).count()
      if (n == 0) Some(name) else None
    }
    assert(empty.isEmpty, s"queries with 0 rows at sf0.001: $empty")
  }

  test("post-load schema of every table matches the pinned contract (drift tripwire)") {
    // The r5 datagen silently changed events.ts from INT64(nanos) to
    // TIMESTAMP_NTZ(micros) and took down 22 queries as 22 separate
    // analysis errors. This pins what Engine.table must HAND DOWNSTREAM
    // per table, so the next drift fails here as one named assertion.
    val expected = Map(
      "region"     -> "r_regionkey:int, r_name:string",
      "nation"     -> "n_nationkey:int, n_name:string, n_regionkey:int",
      "customer"   -> "c_custkey:bigint, c_name:string, c_nationkey:int, c_acctbal:double, c_mktsegment:string",
      "supplier"   -> "s_suppkey:bigint, s_name:string, s_nationkey:int, s_acctbal:double",
      "part"       -> "p_partkey:bigint, p_name:string, p_brand:string, p_type:string, p_size:int, p_retailprice:double",
      "orders"     -> "o_orderkey:bigint, o_custkey:bigint, o_orderstatus:string, o_totalprice:double, o_orderdate:timestamp_ntz, o_orderpriority:string",
      "lineitem"   -> ("l_orderkey:bigint, l_partkey:bigint, l_suppkey:bigint, l_linenumber:int, " +
        "l_quantity:double, l_extendedprice:double, l_discount:double, l_tax:double, " +
        "l_returnflag:string, l_linestatus:string, l_shipdate:timestamp_ntz"),
      "events"     -> "event_id:bigint, ts:timestamp, user_id:bigint, event_type:string, value:double, props:string",
      "documents"  -> "doc_id:bigint, text:string, lang:string, source:string, n_chars:bigint",
      "embeddings" -> "vec_id:bigint, embedding:array<float>, label:int")
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1");
         name <- Engine.tableNames) {
      val got = Engine.table(spark, dir, name).schema.fields
        .map(f => s"${f.name}:${f.dataType.simpleString}").mkString(", ")
      assert(got === expected(name), s"schema drift in $dir/$name.parquet")
    }
  }

  test("query column names are stable across sf dirs") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val a = fn(spark, "/root/testdata/sf0.001").columns.toSeq
      val b = fn(spark, "/root/testdata/sf0.01").columns.toSeq
      assert(a === b, s"$name schema differs between SFs")
    }
  }
}
