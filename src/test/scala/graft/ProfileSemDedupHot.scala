package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Similarity}

/** Dev-only stage timing for the semdedup_hotlist soak shape: a planted
  * one-list corpus (every vector near one axis) at n and 10n.
  * Run: sbt 'Test/runMain graft.ProfileSemDedupHot 9000'
  */
object ProfileSemDedupHot {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(9000L)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      println(f"STAGE $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$rows")
    }
    def hotListVecs(m: Long): DataFrame =
      spark.range(m).select(col("id").as("vec_id"),
        array(lit(1.0f),
          ((col("id") % 97).cast("float") / lit(1000f)),
          ((col("id") % 89).cast("float") / lit(1000f)),
          lit(0.0f)).as("embedding"))
    Similarity.semDedup(hotListVecs(500L)).count() // warm
    for (m <- Seq(n, n * 10)) {
      val vecs = hotListVecs(m).cache()
      vecs.count()
      val e = Similarity.withNorms(vecs)
      val cents = Similarity.trainLeaders(vecs)
      timed(s"n=$m leaders")(cents.count())
      val assign = Similarity.assignWithLeadersRetaining(vecs, cents).persist()
      timed(s"n=$m assignFull+persist")(assign.count())
      val headIds = assign.select("list_id", "vec_id")
        .withColumn("lrnk", row_number().over(Window.partitionBy("list_id")
          .orderBy("vec_id")))
        .filter(col("lrnk") <= Similarity.MaxListOccupancy)
        .select("list_id", "vec_id")
      val head = assign.join(broadcast(headIds), Seq("list_id", "vec_id"))
        .select(col("list_id"), col("vec_id").as("h_id"),
          col("embedding").as("h_emb"), col("norm").as("h_norm"))
      timed(s"n=$m head")(head.count())
      val dupOf = assign.as("a")
        .join(broadcast(head.as("h")),
          col("a.list_id") === col("h.list_id") &&
            col("h.h_id") < col("a.vec_id") &&
            (expr(Dedup.dot("a.embedding", "h.h_emb")) /
              (col("a.norm") * col("h.h_norm"))) >= Similarity.NearDupCosine)
        .groupBy(col("a.vec_id").as("vec_id"))
        .agg(min(col("h.h_id")).as("dup_of"))
      timed(s"n=$m dupJoin+agg")(dupOf.count())
      assign.unpersist(blocking = false)
      timed(s"n=$m FULL semDedup")(Similarity.semDedup(vecs).count())
      vecs.unpersist(blocking = false)
    }
    spark.stop()
  }
}
