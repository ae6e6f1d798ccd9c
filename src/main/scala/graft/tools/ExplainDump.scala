package graft.tools

import java.io.{File, PrintWriter}

import graft.Engine

/** Dev tool: dump `.explain("formatted")` for named SparkEntry queries to
  * files — the optimization-round evidence trail (plans/rNN/<q>_before.txt
  * and _after.txt are committed so plan claims are checkable offline).
  *
  * Usage: runMain graft.tools.ExplainDump <outDir> <suffix> <q1,q2,...|all> [sfDir]
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names: Seq[String] =
      if (args(2) == "all") graft.SparkEntry.queries.keys.toSeq.sorted
      else args(2).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val dir = if (args.length > 3) args(3) else "/root/testdata/sf0.1"
    val spark = Engine.session()
    new File(outDir).mkdirs()
    names.foreach { name =>
      val out = new File(outDir, s"${name}_$suffix.txt")
      val w = new PrintWriter(out)
      try {
        val df = graft.SparkEntry.queries(name)(spark, dir)
        // formatted mode: numbered operators + details (PushedFilters,
        // ReadSchema, join build sides, exchange partitioning)
        w.println(df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
        println(s"[explain] wrote $out")
      } catch {
        case e: Throwable =>
          w.println(s"EXPLAIN FAILED: ${e.getMessage}")
          System.err.println(s"[explain] $name failed: ${e.getMessage}")
      } finally w.close()
    }
    spark.stop()
  }
}
