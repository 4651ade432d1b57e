package graft
import org.apache.spark.sql.SparkSession

/** Optimization-round instrumentation: time named queries in isolation,
  * several repetitions each, under the same session config as [[Bench]].
  * Reveals what fraction of a bench line is steady-state compute versus
  * first-run cost (codegen compile, scan warmup, shared-memo builds).
  *
  * Usage: `QueryProbe <sfDir> <reps> <name> [name ...]`.
  * `GRAFT_PROBE_NOOP=1` times a noop-sink write (guide §1.4: computes
  * every column) instead of the bench's `count()` action.
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val noop = sys.env.get("GRAFT_PROBE_NOOP").contains("1")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      (1 to reps).foreach { i =>
        spark.sparkContext.setJobDescription(s"probe:$name#$i")
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        if (noop) df.write.format("noop").mode("overwrite").save()
        else df.count()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"PROBE $name rep=$i $sec%.3f s")
      }
    }
    spark.stop()
  }
}
