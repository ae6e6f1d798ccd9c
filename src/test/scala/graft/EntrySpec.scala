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

  test("query column names are stable across sf dirs") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val a = fn(spark, "/root/testdata/sf0.001").columns.toSeq
      val b = fn(spark, "/root/testdata/sf0.01").columns.toSeq
      assert(a === b, s"$name schema differs between SFs")
    }
  }
}
