package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.streaming.{IncrementalAnnIndex, StoreMaintenance}

/** Atomic store-generation swap: readers resolve a pointer file and then
  * read an immutable directory, so a compaction in flight — or crashed —
  * can never change what a concurrent reader sees, and a crashed attempt
  * needs no cleanup before retrying.
  */
class StoreGenerationsSpec extends SparkSpec {

  private def docs(n: Long) = spark.range(n)
    .select(col("id").as("vec_id"), (col("id") % 4).as("list_id"))

  test("readers stay on the old generation through a crashed compaction") {
    val root = Files.createTempDirectory("gen-root").toString + "/store"
    docs(20).write.parquet(s"$root/gen-00000/batch=0")
    StoreMaintenance.publishGeneration(spark, root, "gen-00000")
    assert(StoreMaintenance.resolveCurrent(spark, root) == s"$root/gen-00000")

    // a compaction IN FLIGHT: the next generation dir holds partial files,
    // the pointer is untouched — a concurrent reader resolves the old
    // generation and sees every row
    docs(7).write.parquet(s"$root/gen-00001/batch=-1")
    assert(StoreMaintenance.resolveCurrent(spark, root) == s"$root/gen-00000")
    assert(spark.read.parquet(
      StoreMaintenance.resolveCurrent(spark, root)).count() == 20)

    // the compaction CRASHES, abandoning gen-00001. Retry without any
    // cleanup: the partial is skipped, never reused
    val dest = StoreMaintenance.compactCurrent(spark, root, numFiles = 1)
    assert(dest == s"$root/gen-00002")
    assert(StoreMaintenance.resolveCurrent(spark, root) == dest)
    assert(spark.read.parquet(dest).count() == 20)
    // the superseded generation is intact for readers still draining it,
    // and the vacuum list names exactly the non-published generations
    assert(spark.read.parquet(s"$root/gen-00000").count() == 20)
    assert(StoreMaintenance.staleGenerations(spark, root) ==
      Seq("gen-00000", "gen-00001"))
  }

  test("publish refuses a generation that does not exist") {
    val root = Files.createTempDirectory("gen-root2").toString + "/store"
    docs(5).write.parquet(s"$root/gen-00000/batch=0")
    intercept[IllegalArgumentException] {
      StoreMaintenance.publishGeneration(spark, root, "gen-00042")
    }
    intercept[IllegalStateException] {
      StoreMaintenance.resolveCurrent(spark, root)
    }
  }

  test("an ANN store cycles generations with re-bucketing intact") {
    val root = Files.createTempDirectory("gen-root3").toString + "/store"
    val rows = spark.range(200).select(col("id").as("vec_id"),
      (col("id") % 4).as("list_id"), lit(1.0).as("list_cos"),
      array(lit(0.5f)).as("embedding"), lit(1.0).as("norm"))
    rows.write.parquet(s"$root/gen-00000/batch=0")
    StoreMaintenance.publishGeneration(spark, root, "gen-00000")
    val dest = StoreMaintenance.compactCurrent(
      spark, root, numFiles = 1, bucketBy = Some(("vec_id", 8)))
    // the published generation carries its own bucket marker: a probe
    // against the resolved path prunes with the NEW modulus
    assert(IncrementalAnnIndex.bucketCount(spark, dest).contains(8))
    val batch = spark.range(3).select((col("id") * 61 + 2).as("vec_id"))
    val prior = IncrementalAnnIndex.priorIds(spark, dest, batch, -999L)
      .collect().map(_.getLong(0)).toSet
    assert(Set(2L, 63L, 124L).subsetOf(prior))
  }
}
