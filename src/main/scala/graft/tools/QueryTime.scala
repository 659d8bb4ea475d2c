package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc single-query timer: `runMain graft.tools.QueryTime <sfDir> <q1> [q2 ...]`.
  * Same session shape as Bench's per-query section (local[32], AQE on). */
object QueryTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val builder = SparkSession.builder()
      .master("local[32]")
      .appName("graft-querytime")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // mirror Bench's AQE initial-partition setting on demand, to
    // attribute in-suite-only slowness (QT_INITIAL_PARTITIONS=128)
    sys.env.get("QT_INITIAL_PARTITIONS").foreach(n =>
      builder.config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", n))
    sys.env.get("QT_CACHE_ADAPTIVE").foreach(v =>
      builder.config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", v))
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.tail.foreach { q =>
      val fn = graft.SparkEntry.queries(q)
      fn(spark, sfDir).count() // warm-up
      val secs = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }.min
      println(f"QT $q $secs%.3f")
    }
    spark.stop()
  }
}
