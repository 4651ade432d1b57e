package graft

import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.ops.Sampling
import graft.streaming.IncrementalSourceCap

/** Incremental per-source cap against the accumulated budget store: a
  * single drain reproduces the batch operator, the cap binds across
  * batches first-arrival-wins, re-crawls neither re-enter nor re-spend,
  * replays are idempotent, and budget reads prune to touched buckets.
  */
class IncrementalSourceCapSpec extends SparkSpec {

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("source", StringType),
    StructField("text", StringType)))

  private def row(id: Long, src: String): Row = Row(id, src, s"text of $id")

  private def land(landing: Path, name: String, rows: Seq[Row]): Unit =
    landParquet(landing, name, spark.createDataFrame(rows.asJava, docSchema))

  private def dirs(): (Path, String, String) = {
    val landing = Files.createTempDirectory("isc-landing")
    val ckpt = Files.createTempDirectory("isc-ckpt").toString + "/c"
    val root = Files.createTempDirectory("isc-root").toString + "/cap"
    (landing, ckpt, root)
  }

  private def corpusIds(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("doc_id").collect().map(_.getLong(0)).toSet

  test("a single drain over a closed corpus reproduces the batch operator") {
    val (landing, ckpt, root) = dirs()
    val docs = (1L to 6L).map(row(_, "a")) ++ (10L to 15L).map(row(_, "b"))
    land(landing, "b1.parquet", docs)
    val out = IncrementalSourceCap.run(
      spark, landing.toString, ckpt, root, docSchema, cap = 3)
    val want = Sampling.sourceCap(
      spark.createDataFrame(docs.asJava, docSchema), cap = 3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(corpusIds(out) == want,
      s"single-drain admission must equal the batch election: " +
        s"${corpusIds(out)} != $want")
  }

  test("the cap binds across batches, first-arrival-wins") {
    val (landing, ckpt, root) = dirs()
    land(landing, "b1.parquet", (1L to 2L).map(row(_, "a")))
    IncrementalSourceCap.run(
      spark, landing.toString, ckpt, root, docSchema, cap = 3)
    land(landing, "b2.parquet",
      (3L to 9L).map(row(_, "a")) ++ (20L to 21L).map(row(_, "b")))
    val out = IncrementalSourceCap.run(
      spark, landing.toString, ckpt, root, docSchema, cap = 3)
    val ids = corpusIds(out)
    // batch 1's two admissions stand; batch 2 fills the ONE remaining
    // slot for source a (by its salted-hash order) and opens source b
    assert(ids.contains(1L) && ids.contains(2L), s"first arrivals hold: $ids")
    assert(ids.count(_ <= 9L) == 3, s"source a capped at 3 lifetime: $ids")
    assert(ids.count(_ >= 20L) == 2, s"source b under cap keeps all: $ids")
    // a third drain with more of source a admits nothing
    land(landing, "b3.parquet", (30L to 35L).map(row(_, "a")))
    val out3 = IncrementalSourceCap.run(
      spark, landing.toString, ckpt, root, docSchema, cap = 3)
    assert(corpusIds(out3).count(_ >= 30L) == 0, "an exhausted source admits nothing")
  }

  test("re-crawls of admitted AND dropped docs neither re-enter nor re-spend") {
    val (landing, ckpt, root) = dirs()
    land(landing, "b1.parquet", (1L to 5L).map(row(_, "a")))
    val out1 = IncrementalSourceCap.run(
      spark, landing.toString, ckpt, root, docSchema, cap = 2)
    val admitted1 = corpusIds(out1)
    assert(admitted1.size == 2)
    val dropped1 = (1L to 5L).toSet -- admitted1
    // re-land one admitted and one dropped doc, plus a genuinely new one
    land(landing, "b2.parquet", Seq(
      row(admitted1.head, "a"), row(dropped1.head, "a"), row(100L, "b")))
    val out2 = IncrementalSourceCap.run(
      spark, landing.toString, ckpt, root, docSchema, cap = 2)
    // one corpus row per admitted doc — the re-crawl did not duplicate it
    assert(out2.groupBy("doc_id").count()
      .filter(col("count") > 1).count() == 0)
    // the dropped doc stays dropped; the new source enters
    assert(corpusIds(out2) == admitted1 + 100L)
    // and the budget was not re-spent: the counts store says 2 for a
    val spent = IncrementalSourceCap.spentBudget(spark, root,
      spark.createDataFrame(Seq(Row(0L, "a", "x")).asJava, docSchema)
        .select("source"), excludeBatchId = -999L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(spent("a") == 2L, s"budget must not re-spend on re-crawls: $spent")
  }

  test("replay of a committed batch reproduces its admissions (own-partition exclusion)") {
    val (landing, ckpt, root) = dirs()
    land(landing, "b1.parquet", (1L to 4L).map(row(_, "a")))
    IncrementalSourceCap.run(
      spark, landing.toString, ckpt, root, docSchema, cap = 3)
    land(landing, "b2.parquet", (5L to 9L).map(row(_, "a")))
    IncrementalSourceCap.run(
      spark, landing.toString, ckpt, root, docSchema, cap = 3)
    // simulate the at-least-once replay of batch 1 AFTER its writes
    // landed: the guard and the budget read must both exclude batch=1
    val batch = spark.createDataFrame(
      (5L to 9L).map(row(_, "a")).asJava, docSchema)
    val guarded = batch.join(
      IncrementalSourceCap.priorDocIds(spark, root,
        batch.select("doc_id"), excludeBatchId = 1L),
      Seq("doc_id"), "left_anti")
    assert(guarded.count() == 5L, "a replay must see its own docs as novel")
    val spent = IncrementalSourceCap.spentBudget(spark, root,
      guarded.select("source"), excludeBatchId = 1L)
    val r = IncrementalSourceCap.admitBatch(guarded, spent, cap = 3)
    val committed = corpusIds(spark.read.parquet(
      s"${IncrementalSourceCap.corpusPath(root)}/batch=1"))
    assert(corpusIds(r.admitted) == committed,
      s"replay must reproduce the committed admissions")
  }

  test("compaction folds the delta stores; budget reads and replays agree") {
    import graft.streaming.{IncrementalAnnIndex, StoreMaintenance}
    val (landing, ckpt, root) = dirs()
    land(landing, "b1.parquet",
      (1L to 4L).map(row(_, "a")) :+ row(20L, "b"))
    IncrementalSourceCap.run(
      spark, landing.toString, ckpt, root, docSchema, cap = 2)
    land(landing, "b2.parquet",
      Seq(row(5L, "a"), row(21L, "b"), row(30L, "c"), row(31L, "c")))
    val out = IncrementalSourceCap.run(
      spark, landing.toString, ckpt, root, docSchema, cap = 2)
    val beforeIds = corpusIds(out)
    val probe = spark.createDataFrame(
      Seq(row(0L, "a"), row(0L, "b"), row(0L, "c")).asJava, docSchema)
      .select("source")
    val allIds = spark.range(0L, 40L).toDF("doc_id")
    def spentMap(r: String) = IncrementalSourceCap
      .spentBudget(spark, r, probe, excludeBatchId = 99L)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    def priorSet(r: String) = IncrementalSourceCap
      .priorDocIds(spark, r, allIds, excludeBatchId = 99L)
      .collect().map(_.getLong(0)).toSet
    val beforeSpent = spentMap(root)
    val beforePrior = priorSet(root)
    assert(beforeSpent == Map("a" -> 2L, "b" -> 2L, "c" -> 2L))

    // fold every store into a fresh root: counts delta-summed (the
    // store's own double-hash bucket key), decided re-bucketed, corpus
    // plain
    val root2 = Files.createTempDirectory("isc-root2").toString + "/cap"
    val foldedRows = IncrementalSourceCap.compactCounts(spark,
      IncrementalSourceCap.countsPath(root),
      IncrementalSourceCap.countsPath(root2), numFiles = 1)
    assert(foldedRows == 3L, "one summed delta per source ever admitted")
    val db = IncrementalAnnIndex.bucketCount(
      spark, IncrementalSourceCap.decidedPath(root)).get
    StoreMaintenance.compact(spark,
      IncrementalSourceCap.decidedPath(root),
      IncrementalSourceCap.decidedPath(root2), 1,
      bucketBy = Some(("doc_id", db)))
    StoreMaintenance.compact(spark,
      IncrementalSourceCap.corpusPath(root),
      IncrementalSourceCap.corpusPath(root2), 1)

    // the budget and re-crawl reads agree before/after, and the folded
    // batch=-1 rows survive a live batch id's own-partition exclusion
    assert(spentMap(root2) == beforeSpent)
    assert(priorSet(root2) == beforePrior)
    assert(IncrementalSourceCap.spentBudget(spark, root2, probe, 0L)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
      == beforeSpent,
      "excluding a live batch id must never exclude the compacted rows")

    // fresh-checkpoint replay of the full history against the compacted
    // root: first-write-wins holds ACROSS compaction — nothing re-enters,
    // nothing re-spends
    val ckpt2 = Files.createTempDirectory("isc-ckpt2").toString + "/c"
    val replayed = IncrementalSourceCap.run(
      spark, landing.toString, ckpt2, root2, docSchema, cap = 2)
    assert(corpusIds(replayed) == beforeIds)
    assert(replayed.groupBy("doc_id").count()
      .filter(col("count") > 1).count() == 0)
    assert(spentMap(root2) == beforeSpent,
      "a replay across compaction must not re-spend budget")
  }

  test("budget reads prune to the batch's touched source buckets") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val (landing, ckpt, root) = dirs()
    // many sources so the bucket space is well populated
    land(landing, "b1.parquet",
      (1L to 120L).map(i => row(i, s"src${i % 40}")))
    IncrementalSourceCap.run(
      spark, landing.toString, ckpt, root, docSchema, cap = 2)
    def parquetFiles(path: String): Seq[String] =
      TempDirs.walkFiles(java.nio.file.Paths.get(path))
        .filter(java.nio.file.Files.isRegularFile(_))
        .map(_.toString).filter(_.endsWith(".parquet"))
    val counts = IncrementalSourceCap.countsPath(root)
    val n = graft.streaming.IncrementalAnnIndex.bucketCount(spark, counts).get
    val probe = spark.createDataFrame(
      Seq(Row(999L, "src7", "t")).asJava, docSchema).select("source")
    val touched = probe.select(graft.streaming.IncrementalAnnIndex
        .idBucket(xxhash64(col("source")), n).as("b"))
      .distinct().collect().map(_.getInt(0)).toSet
    val files = parquetFiles(counts)
    val expected = files.count(f =>
      touched.exists(b => f.contains(s"/id_bucket=$b/")))
    assert(expected < files.size,
      "fixture too narrow: the touched slice must be a strict subset")
    // AQE would wrap the aggregate's plan in opaque query stages; the
    // pruning property under test is orthogonal to it
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val rel = IncrementalSourceCap.spentBudget(spark, root, probe, -999L)
      rel.collect()
      val scan = rel.queryExecution.executedPlan.collect {
        case s: FileSourceScanExec => s }.head
      assert(scan.metrics("numFiles").value == expected,
        s"scan read ${scan.metrics("numFiles").value} files, " +
          s"expected $expected of ${files.size}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
