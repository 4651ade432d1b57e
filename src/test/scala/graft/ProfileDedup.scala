package graft

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import graft.ops.Dedup
import graft.testdata.{TestFixtures => T}

/** Dev-only: stage-by-stage timing of the minhash dedup pipeline, with a
  * listener attributing wall-clock to Spark stages.
  */
object ProfileDedup {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // listener-bus thread appends while the main thread clears/sorts —
    // synchronize every access on the buffer itself
    val stages = mutable.ArrayBuffer.empty[(String, Long, Int)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val ms = (for {s <- si.submissionTime; c <- si.completionTime} yield c - s).getOrElse(-1L)
        stages.synchronized { stages += ((si.name.take(80), ms, si.numTasks)) }
      }
    })
    val docs = T.table(spark, sfDir, "documents")
    def time(name: String)(f: => Long): Unit = {
      stages.synchronized { stages.clear() }
      val t0 = System.nanoTime()
      val n = f
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"PROFILE $name%-24s $dt%8.2f s  rows=$n")
      stages.synchronized { stages.sortBy(-_._2).take(6) }.foreach { case (nm, ms, nt) =>
        println(f"    stage ${ms}%6d ms  tasks=$nt%-4d $nm")
      }
    }
    time("docs.count")(docs.count())
    time("pairs")(Dedup.minhashPairs(docs).count())
    time("pairs2")(Dedup.minhashPairs(docs).count())
    time("clusters")(Dedup.minhashDupClusters(docs).count())
    spark.stop()
  }
}
