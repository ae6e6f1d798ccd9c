package graft

import graft.mr.MapReduce

/** MR-parity semantics from the reference test suite
  * (test/mr.test.js, test/all.student.test.js) on the same fixtures.
  */
class MapReduceSpec extends SparkSessionSpec {
  import spark.implicits._

  // NCDC-style fixture (reference test/mr.test.js:115-121)
  val ncdc = Seq(
    "006701199099999 1950 0515070049999999N9 +0000 1+9999",
    "004301199099999 1950 0515120049999999N9 +0022 1+9999",
    "004301199099999 1950 0515180049999999N9 -0011 1+9999",
    "004301265099999 1949 0324120040500001N9 +0111 1+9999",
    "004301265099999 1949 0324180040500001N9 +0078 1+9999")

  test("max temperature per year (mr.test.js:100-126)") {
    val lines = spark.createDataset(ncdc)
    val out = MapReduce.execFold(lines) { line =>
      val w = line.split("\\s+")
      Iterator((w(1), w(3).toInt)) // parseInt handles +0000 / -0011
    }(math.max).collect().toMap
    assert(out === Map("1950" -> 22, "1949" -> 111))
  }

  test("min temperature per year (all.student.test.js:100-126)") {
    val lines = spark.createDataset(ncdc)
    val out = MapReduce.execFold(lines) { line =>
      val w = line.split("\\s+")
      Iterator((w(1), w(3).toInt))
    }(math.min).collect().toMap
    assert(out === Map("1950" -> -11, "1949" -> 78))
  }

  // word count fixture (reference test/mr.test.js:184-190)
  val dlib = Seq(
    "It is a blessed thing that in every age someone has had the",
    "individuality enough and courage enough to stand by his own",
    "convictions")

  test("word count, flatMap-shaped map (mr.test.js:165-204)") {
    val lines = spark.createDataset(dlib)
    val out = MapReduce.exec(lines) { line =>
      line.split("\\s+").filter(_.nonEmpty).map(w => (w, 1))
    } { (w, vs) => (w, vs.size.toLong) }.collect().toMap
    assert(out("enough") === 2L)
    assert(out("It") === 1L)
    assert(out.values.sum === 24L)
    // case-insensitive variant (all.student.test.js:376-416)
    val ci = MapReduce.wordCount(lines, caseInsensitive = true)(spark)
      .collect().toMap
    assert(ci("it") === 1L)
    assert(ci("enough") === 2L)
    assert(!ci.contains("It"))
  }

  test("min with ties emits one result per key (all.student.test.js:165-228)") {
    val lines = spark.createDataset(ncdc ++ Seq(
      "004301199099999 1950 0515180049999999N9 -0011 1+9999")) // tie: -11 twice
    val out = MapReduce.execFold(lines) { line =>
      val w = line.split("\\s+")
      Iterator((w(1), w(3).toInt))
    }(math.min).collect().toMap
    assert(out === Map("1950" -> -11, "1949" -> 78))
  }

  test("MR over store computes on the stored (last-write-wins) set " +
      "(all.student.test.js:230-293)") {
    // the reference's dup-key semantics live at the storage layer: a
    // repeated put overwrites, and MR then computes over the stored set
    val root = java.nio.file.Files.createTempDirectory("graft-mr-kv").toString
    val store = new graft.kv.Store(spark, root)
    store.put(Seq(("a", 5)).toDF("k", "v"), "g", keyCol = Some("k"))
    store.put(Seq(("a", 9), ("b", 2)).toDF("k", "v"), "g", keyCol = Some("k"))
    val stored = store.scan("g")
      .select(org.apache.spark.sql.functions.col("value")).as[String]
    val out = MapReduce.execFold(stored) { json =>
      val v = """"v":(-?\d+)""".r.findFirstMatchIn(json).get.group(1).toInt
      Iterator(("min", v))
    }(math.min).collect().toMap
    assert(out === Map("min" -> 2)) // 5 was overwritten by 9; {9, 2} → 2
  }

  test("reduce sees all values for a key across partitions") {
    val data = spark.createDataset(1 to 1000).repartition(4)
    val out = MapReduce.exec(data) { i =>
      Iterator((i % 7, i.toLong))
    } { (k, vs) => (k, vs.sum) }.collect().toMap
    assert(out.values.sum === (1 to 1000).map(_.toLong).sum)
    assert(out.keySet === (0 to 6).toSet)
  }

  test("execAgg partial aggregation path") {
    import org.apache.spark.sql.expressions.Aggregator
    import org.apache.spark.sql.Encoder
    import org.apache.spark.sql.Encoders
    val sumAgg = new Aggregator[Long, Long, Long] {
      def zero = 0L
      def reduce(b: Long, a: Long) = b + a
      def merge(a: Long, b: Long) = a + b
      def finish(r: Long) = r
      def bufferEncoder: Encoder[Long] = Encoders.scalaLong
      def outputEncoder: Encoder[Long] = Encoders.scalaLong
    }
    val data = spark.createDataset(1 to 100)
    val out = MapReduce.execAgg(data)(i => Iterator(((i % 2).toString, i.toLong)))(sumAgg)
      .collect().toMap
    assert(out("0") === (2 to 100 by 2).map(_.toLong).sum)
    assert(out("1") === (1 to 99 by 2).map(_.toLong).sum)
  }
}
