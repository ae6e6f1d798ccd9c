package graft

/** Driver-run benchmark: times every SparkEntry query at the sf dir given
  * by SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * Methodology:
  *  - `Engine.session` config (AQE, Kryo, broadcast threshold) — the same
  *    session shape Verify and production use;
  *  - a warmup pass at sf0.001 first, so whole-stage codegen compilation
  *    and JIT warmup are not billed to whichever query runs first;
  *  - timed via `queryExecution.toRdd.count()`, which materializes every
  *    output row of the final physical plan — `df.count()` would let
  *    Catalyst prune the measured projections out of scan-shaped queries;
  *  - MEDIAN of 5 runs per query (SPARK_GRAFT_BENCH_RUNS to override):
  *    a single GC pause / page-cache miss / compilation hiccup on one run
  *    must not dominate the reported number;
  *  - contention guard: two rounds of driver benches carried phantom
  *    numbers from whole-window environment contention (r1 q14 "44s",
  *    r2 text queries at 4–6× — both adjudicated noise; see BASELINE.md).
  *    If the median sits > 3× the fastest run, the query is re-measured
  *    once and the median of the POOLED (first + fresh) runs is
  *    reported — the wider sample dilutes a contended window;
  *  - per-query MIN is emitted alongside the median ("queries_min"), so a
  *    contended window is visible IN the record: median >> min flags
  *    noise without a rerun.
  *  - QUICK mode (SPARK_GRAFT_BENCH_QUICK=1): family-stratified run
  *    counts for cheap full-registry trending — every query runs once,
  *    and only queries whose first run clears 1s (the heavy head, where
  *    a defended median matters) get the remaining runs. The sub-second
  *    tail is where run count is pure cost: a 0.3s query's 5 runs buy
  *    precision nobody reads, while the head's medians are the numbers
  *    BASELINE.md defends. Quick totals sit within ~5% of the full
  *    record's total_min on a quiet window (BASELINE.md r8 addendum).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "5").toInt)
    // targeted adjudication: SPARK_GRAFT_BENCH_ONLY=q30,q28 benches just
    // those queries (comma-separated name prefixes); default all
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    val selected = only match {
      case Some(ps) => SparkEntry.queries.filter { case (n, _) =>
        ps.exists(n.startsWith) }
      case None => SparkEntry.queries
    }
    val warmDir = "/root/testdata/sf0.001"
    val spark = Engine.session(master = s"local[$cpus]")
    // the dimension-level sorts (q58-class: windows over ≤2k-row
    // aggregates, never data) flood the tail with "No Partition Defined"
    // warnings — silence that one logger so REAL warnings stay visible
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window.WindowExec",
      org.apache.logging.log4j.Level.ERROR)
    // localCheckpoint blocks (the iterative-graph/walk queries) register
    // as persistent RDDs and NOTHING evicts them between queries — by
    // the registry's tail, hundreds of dead blocks crowd the block
    // manager and inflate later measurements. Drop them off-clock after
    // every run.
    def dropDeadBlocks(): Unit =
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    if (new java.io.File(warmDir).isDirectory)
      selected.foreach { case (_, fn) =>
        try fn(spark, warmDir).queryExecution.toRdd.count()
        catch { case _: Throwable => () }
        finally dropDeadBlocks()
      }
    val quick = sys.env.get("SPARK_GRAFT_BENCH_QUICK")
      .exists(v => v == "1" || v.equalsIgnoreCase("true"))
    val quickHeadSec = 1.0
    def measure(name: String, n: Int,
        fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Seq[Double] =
      (0 until n).map { _ =>
        val t0 = System.nanoTime()
        // a failing query must surface as -1, not as a plausible timing —
        // otherwise a query that breaks reads as a speedup in the bench line
        try { fn(spark, sfDir).queryExecution.toRdd.count()
          (System.nanoTime() - t0) / 1e9 }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          -1.0
        }
        finally dropDeadBlocks()
      }
    // LOWER median: for even-length samples take the smaller middle
    // element. Quick mode's sub-second tail gets exactly 2 samples, and
    // the upper middle there is systematically the warm-up-laden first
    // run — upper-median would bias every tail entry high AND let the
    // 3x-min contention recheck fire on warm-up skew alone (for a
    // 2-sample pair the lower median equals the min, so the recheck can
    // never trigger off the probe pair and the defended number IS the
    // min, which is what BASELINE.md compares anyway). Odd lengths (the
    // full record's 5 runs) are unchanged.
    def median(ts: Seq[Double]): Double = ts.sorted.apply((ts.length - 1) / 2)
    // wall-clock budget for contention re-measures: the defense designed
    // for hot windows must not itself overrun the driver wrapper's
    // timeout and cost the round its record (r10: rc 124 mid-re-measure).
    // Past the budget, contended queries keep their first-pass numbers
    // and are NAMED in the record so the reader knows they stood
    // unchallenged.
    val benchStart = System.nanoTime()
    val remeasureBudgetSec = sys.env
      .getOrElse("SPARK_GRAFT_BENCH_BUDGET_SEC", "1800").toDouble
    def elapsedSec: Double = (System.nanoTime() - benchStart) / 1e9
    val remeasureSkipped = scala.collection.mutable.Buffer[String]()
    // The record is JSON-LINES, appended as each query completes, with
    // the full summary line written LAST: two consecutive rounds the
    // driver wrapper killed the bench mid-registry (rc 124) and the
    // round's official record was unparsable — an incremental record
    // means a kill at ANY point leaves every finished query's med/min
    // (anchors included, they are queries themselves) on disk. Path is
    // per-sf; a BENCH_ONLY-filtered run writes a "_only" sidecar so a
    // targeted adjudication can never overwrite the full-registry record.
    val suffix = if (sys.env.contains("SPARK_GRAFT_BENCH_ONLY")) "_only" else ""
    val persistPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      s"/tmp/graft_bench_${new java.io.File(sfDir).getName}$suffix.json")
    def persistLine(s: String): Unit =
      try {
        val w = new java.io.FileWriter(persistPath, true)
        try { w.write(s); w.write('\n') } finally w.close()
      } catch { case e: Throwable =>
        System.err.println(s"[bench] persist to $persistPath failed: ${e.getMessage}")
      }
    try new java.io.PrintWriter(persistPath).close() // fresh run, fresh record
    catch { case _: Throwable => () }
    val results = selected.map { case (name, fn) =>
      // quick mode: probe once; only the >1s head earns its full run
      // count (stratification decided per query off its own first run).
      // The tail still gets ONE more run: a single sample carries the
      // first-run cache/scheduler cost the full record's min-of-5
      // discards (measured +0.3-0.4s per sub-second query — a +12%
      // phantom total), while min-of-2 lands within the quiet-window
      // envelope at ~2.5x less wall than the full record.
      val first =
        if (!quick) measure(name, runs, fn)
        else {
          val probe = measure(name, 1, fn)
          if (probe.contains(-1.0)) probe
          else if (probe.head >= quickHeadSec && runs > 1)
            probe ++ measure(name, runs - 1, fn)
          else probe ++ measure(name, math.min(1, runs - 1), fn)
        }
      val pair = (if (first.contains(-1.0)) (-1.0, -1.0)
      else {
        // contention trigger: odd samples on the lower median; EVEN
        // samples on max > 3x min — for a 2-sample quick-mode pair the
        // lower median EQUALS the min, so the median form could never
        // fire there and a contended pair stood unchallenged (r9 ADVICE)
        val contended = first.length > 1 && {
          if (first.length % 2 == 0) first.max > 3.0 * first.min
          else median(first) > 3.0 * first.min
        }
        val all =
          if (contended && elapsedSec <= remeasureBudgetSec) {
            System.err.println(
              s"[bench] $name spread ${first.max}/${first.min} flags contention; re-measuring")
            first ++ measure(name, runs, fn) // contended window: widen the sample
          } else {
            if (contended) {
              System.err.println(s"[bench] $name flags contention but the " +
                s"re-measure budget (${remeasureBudgetSec}s) is spent; keeping first pass")
              remeasureSkipped += name
            }
            first
          }
        if (all.contains(-1.0)) (-1.0, -1.0) else (median(all), all.min)
      })
      persistLine(s"""{"q":"$name","med":${pair._1},"min":${pair._2},"elapsed_sec":$elapsedSec}""")
      name -> pair
    }
    def jmap(f: ((String, (Double, Double))) => Double): String =
      results.map { case (k, v) => s"\"" + k + "\":" + f((k, v)) }
        .mkString("{", ",", "}")
    val total = results.values.map(_._1).sum
    val totalMin = results.values.map(_._2).sum
    // Window self-adjudication: the q35 anchor's min against its pinned
    // quiet-window envelope (BASELINE.md "bench window signatures" —
    // iterative-graph anchors track machine load, not code changes).
    // ratio ≤ ~1.25 reads quiet; above it the whole record is hot and
    // per-query regressions in it should not be trusted without a
    // targeted re-run. -1 when the anchor didn't run (BENCH_ONLY subset).
    val anchorQuietMin = 2.45 // sf0.1 local[32] quiet envelope, r7-r9
    val anchorRatio = results.get("q35_triangles")
      .map(_._2).filter(_ > 0).map(_ / anchorQuietMin).getOrElse(-1.0)
    // Second anchor for the WRITE-heavy family (lake lifecycle queries):
    // q35 is CPU/shuffle-bound and cannot adjudicate write-path I/O
    // variance (r10: q137 swung 2.78→8.28 beside near-identical q35
    // anchors). q114's per-run dt-tree write + read is the registry's
    // steadiest write-shaped query; its quiet envelope is the r9 quiet
    // record's min (BASELINE.md). Grade lake-family readings against
    // THIS ratio, CPU-family against anchor_ratio.
    val anchorQuietIoMin = 0.62 // q114 sf0.1 local[32] quiet envelope, r9
    val anchorRatioIo = results.get("q114_partitioned_scan")
      .map(_._2).filter(_ > 0).map(_ / anchorQuietIoMin).getOrElse(-1.0)
    val skippedJson = remeasureSkipped
      .map("\"" + _ + "\"").mkString("[", ",", "]")
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":${jmap(_._2._1)},"queries_min":${jmap(_._2._2)},"total_min":$totalMin,"anchor_ratio":$anchorRatio,"anchor_ratio_io":$anchorRatioIo,"remeasure_skipped":$skippedJson,"sf":"$sfDir"}"""
    println(line)
    // The driver's stdout capture has twice head-truncated this line
    // (BASELINE.md:81-83); the summary also lands as the record's LAST
    // line — a complete record ends in the full-registry summary, a
    // killed one ends in its last finished query's line.
    persistLine(line)
    spark.stop()
  }
}
