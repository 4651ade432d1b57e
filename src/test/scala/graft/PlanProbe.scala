package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.api.Queries
import graft.models._
import graft.ops._
import graft.testdata.{TestFixtures => T}

/** Dev-only: dump executed plans of scale-critical operators. */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def dump(name: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      println(s"===== $name =====")
      println(df.queryExecution.executedPlan.toString.take(4000))
    }
    dump("text_tokens(scan pruning)")(TextAnalysis.tokenStats(T.table(spark, sfDir, "documents")))
    dump("int_daily(J1 broadcast)")(IntRussellDaily.buildFull(
      T.stagedBars(spark, sfDir), T.constituents(spark, sfDir)))
    dump("brand_volume(broadcast)")(Relational.brandVolume(
      T.table(spark, sfDir, "lineitem"), T.table(spark, sfDir, "part")))
    val fct = FctTradingMomentum.buildFull(IntRussellDaily.buildFull(
      T.stagedBars(spark, sfDir), T.constituents(spark, sfDir)))
    dump("ticker_history(topk)")(Queries.tickerHistory(fct, "S07",
      java.sql.Date.valueOf("1995-01-01"), java.sql.Date.valueOf("1998-12-31")))
    dump("brute_topk(query-side broadcast)")(
      Similarity.bruteTopK(T.table(spark, sfDir, "embeddings")))
    dump("asof(single shuffle)")(
      AsOfJoin.asofJoin(
        T.events(spark, sfDir).filter(col("event_type") === "purchase")
          .select("event_id", "ts", "user_id", "value"),
        T.events(spark, sfDir).filter(col("event_type") === "view")
          .groupBy("user_id", "ts").agg(max("event_id").as("view_event_id")),
        Seq("user_id"), "ts", "ts", Seq("view_event_id")))
    spark.stop()
  }
}
