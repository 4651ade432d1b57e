package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.{Pq, Similarity}
import graft.testdata.{TestFixtures => T}

/** Scratch profiling main (dev-only): where do the recall gate's 2.5 s/rep
  * go — cache lookup per action, job overhead, or the gate's joins?
  * Usage: Test/runMain graft.ProfileGate <sfDir> <cpus>
  */
object ProfileGate {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = if (args.length > 1) args(1) else "32"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = T.table(spark, sfDir, "embeddings")
    def timed(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"PROFILE $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val brute = Similarity.bruteTopK(emb).persist()
    timed("brute.build")(brute.count())
    val adc = Pq.adcTopK(emb).persist()
    timed("adc.build")(adc.count())
    val ivfpq = Pq.ivfpqTopK(emb).persist()
    timed("ivfpq.build")(ivfpq.count())
    (1 to 3).foreach { i =>
      timed(s"adc.maxrank#$i")(adc.agg(max("rank")).head())
      timed(s"ivfpq.maxrank#$i")(ivfpq.agg(max("rank")).head())
      timed(s"brute.count#$i")(brute.count())
      timed(s"overlap#$i")(
        brute.select("query_id", "neighbor_id")
          .join(adc.select("query_id", "neighbor_id"),
            Seq("query_id", "neighbor_id")).count())
      timed(s"gate#$i")(Pq.adcRecallGateWith(emb, brute,
        adcApprox = Some(adc), ivfpqApprox = Some(ivfpq)).count())
      val adcFlat = adc.localCheckpoint()
      val ivfpqFlat = ivfpq.localCheckpoint()
      val bruteFlat = brute.localCheckpoint()
      timed(s"gateFlat#$i")(Pq.adcRecallGateWith(emb, bruteFlat,
        adcApprox = Some(adcFlat), ivfpqApprox = Some(ivfpqFlat)).count())
    }
    spark.stop()
  }
}
