package graft

import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._

import graft.ops.Similarity
import graft.streaming.IncrementalAnnIndex
import graft.testdata.{TestFixtures => T}

/** Incremental IVF maintenance: leaders train once on the bootstrap batch,
  * later batches are pure index adds, and the accumulated store probes
  * identically to a batch index over the union.
  */
class IncrementalAnnIndexSpec extends SparkSpec {

  private lazy val emb = T.table(spark, sf, "embeddings").cache()

  private def land(landing: Path, name: String,
      df: org.apache.spark.sql.DataFrame): Unit =
    landParquet(landing, name, df)

  test("two-batch index add matches the batch assignment and probe") {
    val landing = Files.createTempDirectory("ann-landing")
    val ckpt = Files.createTempDirectory("ann-ckpt").toString + "/c"
    val leaders = Files.createTempDirectory("ann-l").toString + "/leaders"
    val lists = Files.createTempDirectory("ann-lists").toString + "/lists"
    val schema = emb.schema

    // bootstrap batch contains the deterministic seed ids (vec_id < 16),
    // so the frozen leaders equal the batch path's over the union
    val cut = 300L
    land(landing, "b1.parquet", emb.filter(col("vec_id") < cut))
    IncrementalAnnIndex.run(
      spark, landing.toString, ckpt, leaders, lists, schema)
    land(landing, "b2.parquet", emb.filter(col("vec_id") >= cut))
    IncrementalAnnIndex.run(
      spark, landing.toString, ckpt, leaders, lists, schema)
    // a re-crawl batch re-lands already-indexed vec_ids: first write wins,
    // the store must not grow duplicate rows
    land(landing, "b3.parquet", emb.filter(col("vec_id") < 50L))
    val store = IncrementalAnnIndex.run(
      spark, landing.toString, ckpt, leaders, lists, schema)
    assert(store.groupBy("vec_id").count().filter(col("count") > 1)
      .count() == 0, "re-landed vec_ids must not duplicate list rows")
    // a FRESH checkpoint over the live batch>=0 store is refused (the
    // shared era guard): its ids would restart at 0 and overwrite
    val ckptF = Files.createTempDirectory("ann-ckptf").toString + "/c"
    val err = intercept[IllegalArgumentException] {
      IncrementalAnnIndex.run(
        spark, landing.toString, ckptF, leaders, lists, schema)
    }
    assert(err.getMessage.contains("compact first"), err.getMessage)

    // every vector is in exactly one list, assigned as the batch path would
    assert(store.count() == emb.count())
    val batchAssign = Similarity.ivfAssignments(emb)
    val diff = store.select("vec_id", "list_id")
      .exceptAll(batchAssign.select("vec_id", "list_id")).count()
    assert(diff == 0, s"$diff incremental assignments diverge from batch")

    // probing the accumulated store == the batch ivfTopK over the union
    val queries = emb.filter(col("vec_id") % Similarity.QueryStride === 0)
    val incTopK = IncrementalAnnIndex.topKFromStore(
      spark, leaders, lists, queries)
    val batchTopK = Similarity.ivfTopK(emb)
    val sym = incTopK.select("query_id", "neighbor_id", "rank")
      .exceptAll(batchTopK.select("query_id", "neighbor_id", "rank")).count() +
      batchTopK.select("query_id", "neighbor_id", "rank")
        .exceptAll(incTopK.select("query_id", "neighbor_id", "rank")).count()
    assert(sym == 0, s"store probe diverges from batch probe by $sym rows")
  }

  test("membership probe reads only the batch's touched id buckets") {
    val landing = Files.createTempDirectory("annp-landing")
    val ckpt = Files.createTempDirectory("annp-ckpt").toString + "/c"
    val leaders = Files.createTempDirectory("annp-l").toString + "/leaders"
    val lists = Files.createTempDirectory("annp-lists").toString + "/lists"
    land(landing, "b1.parquet", emb.filter(col("vec_id") < 300L))
    IncrementalAnnIndex.run(
      spark, landing.toString, ckpt, leaders, lists, emb.schema)
    land(landing, "b2.parquet",
      emb.filter(col("vec_id") >= 300L && col("vec_id") < 400L))
    IncrementalAnnIndex.run(
      spark, landing.toString, ckpt, leaders, lists, emb.schema)

    // a small maintenance batch: three already-stored ids
    val batchIds = spark.range(3)
      .select((col("id") * 111 + 5).as("vec_id")) // 5, 116, 227
    val probe = IncrementalAnnIndex.priorIds(
      spark, lists, batchIds, excludeBatchId = 99L)
    val got = probe.collect().map(_.getLong(0)).toSet
    assert(Set(5L, 116L, 227L).subsetOf(got),
      "the pruned probe must still surface every stored batch id")

    val n = IncrementalAnnIndex.bucketCount(spark, lists).get
    val touched = batchIds
      .select(IncrementalAnnIndex.idBucket(col("vec_id"), n).as("b"))
      .distinct().collect().map(_.getInt(0)).toSet
    import scala.jdk.CollectionConverters._
    val allFiles = TempDirs.walkFiles(java.nio.file.Paths.get(lists))
      .filter(java.nio.file.Files.isRegularFile(_))
      .map(_.toString).filter(_.endsWith(".parquet"))
    val expected =
      allFiles.count(f => touched.exists(b => f.contains(s"/id_bucket=$b/")))
    assert(expected < allFiles.size,
      "fixture too narrow: the touched slice must be a strict subset")
    // the IO contract itself: the scan touches exactly the touched-bucket
    // files — static partition pruning, not a post-scan filter
    val scan = probe.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.head
    assert(scan.metrics("numFiles").value == expected,
      s"scan read ${scan.metrics("numFiles").value} files, " +
        s"expected the $expected touched-bucket files of ${allFiles.size}")
    // and column pruning: only the id column leaves the parquet reader —
    // the vectors riding in the list rows are never materialized
    assert(scan.toString.contains("ReadSchema: struct<vec_id:bigint>"),
      scan.toString.take(1000))
  }

  test("compacted store probes identically, shrinks files, re-enters service") {
    val landing = Files.createTempDirectory("annc-landing")
    val ckpt = Files.createTempDirectory("annc-ckpt").toString + "/c"
    val leaders = Files.createTempDirectory("annc-l").toString + "/leaders"
    val lists = Files.createTempDirectory("annc-lists").toString + "/lists"
    val compacted = Files.createTempDirectory("annc-g1").toString + "/lists"
    val cut = 300L
    land(landing, "b1.parquet", emb.filter(col("vec_id") < cut))
    IncrementalAnnIndex.run(
      spark, landing.toString, ckpt, leaders, lists, emb.schema)
    land(landing, "b2.parquet",
      emb.filter(col("vec_id") >= cut && col("vec_id") < 400L))
    val store = IncrementalAnnIndex.run(
      spark, landing.toString, ckpt, leaders, lists, emb.schema)

    // compaction RE-BUCKETS: the grown store gets a larger id-bucket
    // count (bounding bucket size, the unit a membership probe reads)
    // and its marker must follow, or re-entry probes would use the old
    // modulus and look in the wrong partitions
    val written = graft.streaming.StoreMaintenance.compact(
      spark, lists, compacted, numFiles = 1,
      bucketBy = Some(("vec_id", 16)))
    assert(written == store.count(), "compaction must preserve every row")
    assert(IncrementalAnnIndex.bucketCount(spark, compacted).contains(16),
      "re-bucketing compaction must rewrite the bucket-count marker")
    val (beforeFiles, _) =
      graft.streaming.StoreMaintenance.fileStats(spark, lists)
    val (afterFiles, _) =
      graft.streaming.StoreMaintenance.fileStats(spark, compacted)
    assert(afterFiles < beforeFiles,
      s"compaction must shrink file count ($beforeFiles -> $afterFiles)")

    val queries = emb.filter(col("vec_id") % Similarity.QueryStride === 0)
    val a = IncrementalAnnIndex.topKFromStore(spark, leaders, lists, queries)
      .select("query_id", "neighbor_id", "rank")
    val b = IncrementalAnnIndex.topKFromStore(
      spark, leaders, compacted, queries)
      .select("query_id", "neighbor_id", "rank")
    assert(a.exceptAll(b).count() + b.exceptAll(a).count() == 0,
      "compacted store must probe identically")

    val bal = graft.streaming.StoreMaintenance.listBalance(store).collect()
    assert(bal.map(_.getAs[Long]("n_vectors")).sum == store.count())
    assert(bal.forall(_.getAs[Double]("imbalance_factor") >= 1.0))

    // re-entry: the compacted dir becomes the live store under a FRESH
    // checkpoint — the bootstrap must keep the frozen leaders (not
    // retrain at epoch 0), the batch layout must stay readable, and
    // cross-store dedup must still see the compacted rows
    val landing2 = Files.createTempDirectory("annc-landing2")
    val ckpt2 = Files.createTempDirectory("annc-ckpt2").toString + "/c"
    land(landing2, "b3.parquet", emb.filter(
      col("vec_id") >= 400L || col("vec_id") < 10L)) // 10 re-lands
    val grown = IncrementalAnnIndex.run(
      spark, landing2.toString, ckpt2, leaders, compacted, emb.schema)
    assert(grown.count() == emb.count(),
      "re-entered store must grow by exactly the novel vectors")
    assert(grown.groupBy("vec_id").count().filter(col("count") > 1)
      .count() == 0, "re-landed ids must not duplicate after re-entry")
  }

  test("duplicate vec_ids within one drain produce one list row") {
    val landing = Files.createTempDirectory("annd-landing")
    val ckpt = Files.createTempDirectory("annd-ckpt").toString + "/c"
    val leaders = Files.createTempDirectory("annd-l").toString + "/leaders"
    val lists = Files.createTempDirectory("annd-lists").toString + "/lists"
    val slice = emb.filter(col("vec_id") < 100L)
    // the original and its re-crawl land BEFORE the drain → one batch
    land(landing, "b1.parquet", slice)
    land(landing, "b1dup.parquet", slice)
    val store = IncrementalAnnIndex.run(
      spark, landing.toString, ckpt, leaders, lists, emb.schema)
    assert(store.count() == 100L)
    assert(store.groupBy("vec_id").count().filter(col("count") > 1)
      .count() == 0)
  }

  test("compact refuses an existing destination — no silent clobber") {
    val src = Files.createTempDirectory("cmp-src").toString + "/s"
    val dest = Files.createTempDirectory("cmp-dst").toString + "/d"
    emb.limit(10).write.parquet(s"$src/batch=0")
    assert(graft.streaming.StoreMaintenance.compact(
      spark, src, dest, numFiles = 1) == 10L)
    intercept[Exception] {
      graft.streaming.StoreMaintenance.compact(spark, src, dest, numFiles = 1)
    }
  }

  test("an empty epoch 0 does not brick the stream — bootstrap on first data") {
    val landing = Files.createTempDirectory("ann3-landing")
    val ckpt = Files.createTempDirectory("ann3-ckpt").toString + "/c"
    val leaders = Files.createTempDirectory("ann3-l").toString + "/leaders"
    val lists = Files.createTempDirectory("ann3-lists").toString + "/lists"
    // epoch 0 commits with a zero-row file: no leaders can be trained.
    // The stream must stay recoverable — bootstrap keys on the leader
    // store's absence, not on batchId == 0.
    land(landing, "b0.parquet", emb.limit(0))
    IncrementalAnnIndex.run(
      spark, landing.toString, ckpt, leaders, lists, emb.schema)
    land(landing, "b1.parquet", emb.filter(col("vec_id") < 200L))
    val store = IncrementalAnnIndex.run(
      spark, landing.toString, ckpt, leaders, lists, emb.schema)
    assert(store.count() == 200L,
      "the first non-empty batch must train leaders and index its vectors")
  }

  test("bootstrap without the seed vectors fails loudly, not silently") {
    val landing = Files.createTempDirectory("ann2-landing")
    val ckpt = Files.createTempDirectory("ann2-ckpt").toString + "/c"
    val leaders = Files.createTempDirectory("ann2-l").toString + "/leaders"
    val lists = Files.createTempDirectory("ann2-lists").toString + "/lists"
    land(landing, "b1.parquet", emb.filter(col("vec_id") >= 100))
    val e = intercept[Exception] {
      IncrementalAnnIndex.run(
        spark, landing.toString, ckpt, leaders, lists, emb.schema)
    }
    assert(e.getMessage != null)
  }
}
