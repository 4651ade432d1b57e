package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only variance check for the reader_feed_scaled soak leg shape.
  * Run: sbt 'Test/runMain graft.ProfileReaderFeed 30000'
  */
object ProfileReaderFeed {
  def main(args: Array[String]): Unit = {
    val base = args.headOption.map(_.toLong).getOrElse(30000L)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def feedPayloads(bins: Long, shards: Long): DataFrame =
      spark.range(bins).select(
        (col("id") % shards).as("shard"), (col("id") / shards).as("bin"),
        lit(3L).as("n_docs"), lit(64L).as("bin_tokens"),
        expr("transform(sequence(0, 63), i -> id * 64 + CAST(i AS BIGINT))")
          .as("input_ids"))
    def feedSec(bins: Long, shards: Long, readers: Int): Double = {
      val pay = feedPayloads(bins, shards).cache()
      pay.count()
      val t0 = System.nanoTime()
      graft.ops.Packing.readerFeedFrom(pay, 1, readers).count()
      val sec = (System.nanoTime() - t0) / 1e9
      pay.unpersist(blocking = false)
      sec
    }
    feedSec(500L, 4, 4) // warm
    for (_ <- 1 to 4) {
      val b = feedSec(base, 8L, 8)
      val x = feedSec(base * 10, 80L, 80)
      println(f"READERFEED base=$b%.2f x10=$x%.2f growth=${x / b}%.1f")
    }
    spark.stop()
  }
}
