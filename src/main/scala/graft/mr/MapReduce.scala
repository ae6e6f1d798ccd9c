package graft.mr

import org.apache.spark.sql.{Dataset, Encoder, SparkSession}
import org.apache.spark.sql.expressions.Aggregator

/** MR-parity operator layer.
  *
  * The reference's whole query surface is `mr.exec({keys, map, reduce})`
  * (reference: distribution/all/mr.js:6-32): broadcast a user `map` closure
  * to the group, barrier, shuffle map output by key, barrier, apply a user
  * `reduce(key, values[])` per key, flatten results
  * (distribution/local/mapperReducer.js:9-146).
  *
  * Spark realization: `flatMap → groupByKey → mapGroups/reduceGroups`.
  * Phases/barriers are Spark stages; the shuffle is Spark's shuffle; closure
  * shipping is the JVM closure serializer (the reference serializes JS
  * function source text, distribution/util/serialization.js:294-308).
  *
  * Scale notes:
  *  - `reduceGroups`/`agg(Aggregator)` get map-side partial aggregation —
  *    the analog of the reference's `compact`/`compactV2` combiners
  *    (mapperReducer.js:39-68) — so prefer [[execFold]]/[[execAgg]] for
  *    fold-shaped reducers.
  *  - [[exec]] streams each group through an `Iterator`; it never
  *    materializes the value bag (the reference bags all values per key in
  *    memory, mapperReducer.js:108-121 — that dies at 100 TB; this doesn't).
  */
object MapReduce {

  /** General MR job: map may emit 0..n pairs per input (both `map` and
    * `flatMap` shapes, reference test/mr.test.js:101-107 vs :166-176);
    * reduce sees ALL values for a key across the cluster, order
    * unspecified (reference barrier semantics, all/mr.js:15-19).
    */
  def exec[I, K2, V2, OUT](input: Dataset[I])(
      map: I => IterableOnce[(K2, V2)])(
      reduce: (K2, Iterator[V2]) => OUT)(implicit
      epair: Encoder[(K2, V2)],
      ek: Encoder[K2],
      eout: Encoder[OUT]): Dataset[OUT] =
    input
      .flatMap(map)
      .groupByKey(_._1)
      .mapGroups((k, it) => reduce(k, it.map(_._2)))

  /** Fold-shaped reduce (max/min/count/sum...). Uses `reduceGroups`, which
    * Spark plans with a partial (map-side) aggregate — the reference's
    * combiner, but actually combining instead of just bagging values.
    */
  def execFold[I, K2, V2](input: Dataset[I])(
      map: I => IterableOnce[(K2, V2)])(
      fold: (V2, V2) => V2)(implicit
      epair: Encoder[(K2, V2)],
      ek: Encoder[K2]): Dataset[(K2, V2)] =
    input
      .flatMap(map)
      .groupByKey(_._1)
      .reduceGroups((a, b) => (a._1, fold(a._2, b._2)))
      .map { case (k, (_, v)) => (k, v) }

  /** Typed Aggregator path: full partial+final protocol, codegen-friendly
    * buffer. For reducers that are true monoids with a distinct zero.
    */
  def execAgg[I, K2, V2, BUF, OUT](input: Dataset[I])(
      map: I => IterableOnce[(K2, V2)])(
      agg: Aggregator[V2, BUF, OUT])(implicit
      epair: Encoder[(K2, V2)],
      ek: Encoder[K2],
      ev: Encoder[V2],
      eres: Encoder[(K2, OUT)]): Dataset[(K2, OUT)] =
    input
      .flatMap(map)
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(agg.toColumn)

  /** Convenience: run an MR word-count-shaped job over a text Dataset.
    * Mirrors the reference's canonical workload (test/mr.test.js:165-204).
    */
  def wordCount(lines: Dataset[String], caseInsensitive: Boolean = false)(
      implicit spark: SparkSession): Dataset[(String, Long)] = {
    import spark.implicits._
    execFold(lines) { line =>
      val l = if (caseInsensitive) line.toLowerCase else line
      l.split("\\s+").iterator.filter(_.nonEmpty).map(w => (w, 1L))
    }(_ + _)
  }
}
