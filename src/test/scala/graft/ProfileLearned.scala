package graft

import org.apache.spark.sql.SparkSession

import graft.ops.{Curation, Dsir, LmPerplexity, QualityClassifier}
import graft.testdata.{TestFixtures => T}

/** Scratch profiling main (dev-only, like ProfileMarts): where does the
  * one-scan ensemble pass spend vs the three family passes?
  * Usage: Test/runMain graft.ProfileLearned <sfDir> <cpus>
  */
object ProfileLearned {
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
    val docs = T.table(spark, sfDir, "documents")
    def timed(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROFILE $name ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    docs.count() // warm scan
    val nbM = QualityClassifier.modelTable(docs).localCheckpoint()
    val nbP = QualityClassifier.priorRow(docs).localCheckpoint()
    val counts = LmPerplexity.seedBigramCounts(docs).localCheckpoint()
    val lmM = LmPerplexity.modelOf(counts).localCheckpoint()
    val lmC = LmPerplexity.contextsOf(counts).localCheckpoint()
    val lr = Dsir.trainedRatioTable(docs).localCheckpoint()
    (1 to 2).foreach { i =>
      timed(s"tokenPairs#$i")(Curation.tokenPairs(docs).count())
      timed(s"nb.scoreWith#$i")(
        QualityClassifier.scoreWith(docs, nbM, nbP).count())
      timed(s"lm.scoreWith#$i")(LmPerplexity.scoreWith(docs, lmM, lmC).count())
      timed(s"dsir.weightsWith#$i")(Dsir.weightsWith(docs, lr).count())
      timed(s"learnedAuditWith#$i")(
        Curation.learnedAuditWith(docs, nbM, nbP, lmM, lmC, lr).count())
    }
    spark.stop()
  }
}
