package graft

import org.apache.spark.sql.SparkSession

/** Dev-only profiling entry: times individual hot queries at a given SF with
  * a cold cache per query group, mirroring Bench's session config.
  * Run: sbt 'Test/runMain graft.ProfileMain /root/testdata/sf0.1 q...'
  */
object ProfileMain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val qs = SparkEntry.queries
    val order = if (names.nonEmpty) names.toSeq else qs.keys.toSeq.sorted
    order.foreach { name =>
      val t0 = System.nanoTime()
      val n = qs(name)(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"PROFILE $name%-28s $dt%8.2f s  rows=$n")
    }
    spark.stop()
  }
}
