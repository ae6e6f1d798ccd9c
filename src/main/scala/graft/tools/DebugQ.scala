package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

import graft.Engine

/** Dev tool: run one named SparkEntry query and print per-stage task
  * counts / durations / record counts — for diagnosing parallelism
  * collapse and skew without the Spark UI.
  *
  * Usage: runMain graft.tools.DebugQ <queryName> <sfDir> [nRuns]
  * (nRuns > 1 re-times warm runs — codegen/JIT excluded, like Bench.)
  */
object DebugQ {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val nRuns = if (args.length > 2) args(2).toInt else 1
    val spark = Engine.session()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val in = si.taskMetrics.inputMetrics.recordsRead
        val sr = si.taskMetrics.shuffleReadMetrics.recordsRead
        val sw = si.taskMetrics.shuffleWriteMetrics.recordsWritten
        val out = si.taskMetrics.outputMetrics.recordsWritten
        val ms = (for (c <- si.completionTime; s <- si.submissionTime)
          yield c - s).getOrElse(0L)
        println(f"[stage ${si.stageId}%3d] tasks=${si.numTasks}%4d " +
          f"wall=${ms / 1000.0}%8.1fs in=$in%12d shufR=$sr%12d " +
          f"shufW=$sw%12d out=$out%10d  ${si.name.takeWhile(_ != '\n')}")
      }
    })
    // timer starts BEFORE construction: operators with driver-side loops
    // (components) or sampling (ivf) do real work while building the plan
    val t0 = System.nanoTime()
    val df = graft.SparkEntry.queries(name)(spark, dir)
    if (sys.env.contains("SPARK_GRAFT_EXPLAIN"))
      println(df.queryExecution.executedPlan.toString)
    val n = df.count()
    println(f"[debugq] $name rows=$n wall=${(System.nanoTime() - t0) / 1e9}%.1fs")
    for (r <- 2 to nRuns) {
      val t = System.nanoTime()
      val df2 = graft.SparkEntry.queries(name)(spark, dir)
      df2.queryExecution.toRdd.count()
      println(f"[debugq] $name run#$r wall=${(System.nanoTime() - t) / 1e9}%.1fs")
    }
    Thread.sleep(1500) // let async stage-completed events drain before stop
    spark.stop()
  }
}
