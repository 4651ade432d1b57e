package graft

import org.apache.spark.sql.SparkSession
import graft.models._
import graft.testdata.{TestFixtures => T}

/** Dev-only: cold timing of each stock mart layer. */
object ProfileMarts {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROFILE $name%-20s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    time("raw.count")(T.rawDaily(spark, sfDir).count())
    time("staged")(T.stagedBars(spark, sfDir).count())
    val intD = IntRussellDaily.buildFull(
      T.stagedBars(spark, sfDir), T.constituents(spark, sfDir)).persist()
    time("int")(intD.count())
    val fct = FctTradingMomentum.buildFull(intD).persist()
    time("fct")(fct.count())
    time("dim")(DimSecuritiesCurrent.build(fct).count())
    time("dim2")(DimSecuritiesCurrent.build(fct).count())
    spark.stop()
  }
}
