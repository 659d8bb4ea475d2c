package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc single-query timer: `runMain graft.tools.QueryTime <sfDir> <q1> [q2 ...]`.
  * Same session shape as Bench's per-query section (local[32], AQE on). */
object QueryTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-querytime")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
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
