package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Similarity}
import graft.testdata.{TestFixtures => T}

/** Dev-only stage timing for Similarity.semDedup at a given SF.
  * Run: sbt 'Test/runMain graft.ProfileSemDedup /root/testdata/sf0.1'
  */
object ProfileSemDedup {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"STAGE $label%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    val emb = T.table(spark, sfDir, "embeddings")
    val e = Similarity.withNorms(emb)
    val cents = Similarity.trainLeaders(emb)
    timed("leaders")(cents.count())
    val assign = Similarity.assignWithLeadersRetaining(emb, cents).persist()
    timed("assignFull+persist")(assign.count())
    val head = assign
      .withColumn("lrnk", row_number().over(Window.partitionBy("list_id")
        .orderBy("vec_id")))
      .filter(col("lrnk") <= Similarity.MaxListOccupancy)
      .select(col("list_id"), col("vec_id").as("h_id"),
        col("embedding").as("h_emb"), col("norm").as("h_norm"))
    timed("head")(head.count())
    val joined = assign.as("a")
      .join(head.as("h"),
        col("a.list_id") === col("h.list_id") &&
          col("h.h_id") < col("a.vec_id") &&
          (expr(Dedup.dot("a.embedding", "h.h_emb")) /
            (col("a.norm") * col("h.h_norm"))) >= Similarity.NearDupCosine)
    timed("join")(joined.count())
    val dupOf = joined
      .groupBy(col("a.vec_id").as("vec_id"))
      .agg(min(col("h.h_id")).as("dup_of"))
    timed("dupOf")(dupOf.count())
    timed("full semDedup")(Similarity.semDedup(emb).count())
    joined.explain("formatted")
    assign.unpersist()
    spark.stop()
  }
}
