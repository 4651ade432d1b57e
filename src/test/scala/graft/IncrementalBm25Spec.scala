package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ops.Retrieval
import graft.streaming.IncrementalBm25

/** Incremental BM25 index: an accumulated inverted index whose
  * store-backed search reproduces the batch operator exactly in any
  * landing order (BM25 is a pure function of final index state),
  * re-crawls are not double-indexed, replays are idempotent, and the
  * posting probe reads only the query vocabulary's term buckets.
  */
class IncrementalBm25Spec extends SparkSpec {

  private def docs = spark.read.parquet(s"$sf/documents.parquet")
  private def docSchema = docs.schema

  private def topk(df: org.apache.spark.sql.DataFrame) = df
    .select("query_id", "doc_id", "n_hit_terms", "score_micro", "rank")
    .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getInt(4))).toSet

  test("an out-of-order two-batch drain reproduces the batch operator") {
    val landing = Files.createTempDirectory("bm25-landing")
    val ckpt = Files.createTempDirectory("bm25-ckpt").toString + "/c"
    val root = Files.createTempDirectory("bm25-root").toString + "/idx"
    // land the HIGH ids first: BM25 equality must not depend on order
    landParquet(landing, "b1.parquet", docs.filter(col("doc_id") % 2 === 1))
    IncrementalBm25.run(spark, landing.toString, ckpt, root, docSchema)
    landParquet(landing, "b2.parquet", docs.filter(col("doc_id") % 2 === 0))
    IncrementalBm25.run(spark, landing.toString, ckpt, root, docSchema)
    val got = topk(IncrementalBm25.searchStore(spark, root))
    val want = topk(Retrieval.bm25TopK(docs))
    assert(want.nonEmpty, "fixture must rank something")
    assert(got == want)
  }

  test("a re-crawled document is not double-indexed") {
    val landing = Files.createTempDirectory("bm252-landing")
    val ckpt = Files.createTempDirectory("bm252-ckpt").toString + "/c"
    val root = Files.createTempDirectory("bm252-root").toString + "/idx"
    val half = docs.filter(col("doc_id") % 2 === 0)
    landParquet(landing, "b1.parquet", half)
    IncrementalBm25.run(spark, landing.toString, ckpt, root, docSchema)
    // the whole corpus lands again — only the NEW half may index
    landParquet(landing, "b2.parquet", docs)
    IncrementalBm25.run(spark, landing.toString, ckpt, root, docSchema)
    val postings = spark.read.parquet(IncrementalBm25.postingsPath(root))
    assert(postings.groupBy("term", "doc_id").count()
      .filter(col("count") > 1).count() == 0,
      "a (term, doc) posting must exist exactly once")
    // stats count every document exactly once → search equals the batch op
    val stats = IncrementalBm25.readStats(spark, root).head()
    assert(stats.getLong(0) == docs.count())
    assert(topk(IncrementalBm25.searchStore(spark, root))
      == topk(Retrieval.bm25TopK(docs)))
  }

  test("crash replay is idempotent: own-partition exclusion") {
    val landing = Files.createTempDirectory("bm253-landing")
    val ckpt = Files.createTempDirectory("bm253-ckpt").toString + "/c"
    val root = Files.createTempDirectory("bm253-root").toString + "/idx"
    landParquet(landing, "b1.parquet", docs)
    IncrementalBm25.run(spark, landing.toString, ckpt, root, docSchema)
    // a replay of batch 0 must not see its own decided ids…
    val own = IncrementalBm25.priorDocIds(
      spark, root, docs.select("doc_id"), excludeBatchId = 0L)
    assert(own.count() == 0, "own partition must be invisible to a replay")
    // …and its re-derived writes are identical (pure function of the batch)
    val (postings, delta) = IncrementalBm25.indexBatch(docs)
    assert(postings.count() ==
      spark.read.parquet(IncrementalBm25.postingsPath(root)).count())
    assert(delta.head().getLong(0) ==
      IncrementalBm25.readStats(spark, root).head().getLong(0))
    // while a LATER batch sees every indexed id
    assert(IncrementalBm25.priorDocIds(
      spark, root, docs.select("doc_id"), excludeBatchId = 1L).count()
      == docs.count())
  }

  test("an arbitrary query batch searches the store ≡ the batch operator") {
    val landing = Files.createTempDirectory("bm256-landing")
    val ckpt = Files.createTempDirectory("bm256-ckpt").toString + "/c"
    val root = Files.createTempDirectory("bm256-root").toString + "/idx"
    landParquet(landing, "b1.parquet", docs)
    IncrementalBm25.run(spark, landing.toString, ckpt, root, docSchema)
    // a user-supplied batch, including a query LONGER than the fixed
    // batch's widest (the pivot width must follow the batch, not the
    // battery constant) and an off-corpus term (zero hits, no crash)
    val batch = Seq(
      10L -> Seq("data", "join", "window", "scan", "merge"),
      11L -> Seq("quetzalcoatl"),
      12L -> Seq("hash"))
    val got = topk(IncrementalBm25.searchStoreWith(spark, root, batch))
    val want = topk(Retrieval.bm25TopKWith(docs, batch))
    assert(want.nonEmpty && want.exists(_._1 == 10L))
    assert(got == want)
    assert(!want.exists(_._1 == 11L), "an off-corpus query scores no rows")
  }

  test("the stop-term guard bounds the probe with the documented divergence") {
    val landing = Files.createTempDirectory("bm255-landing")
    val ckpt = Files.createTempDirectory("bm255-ckpt").toString + "/c"
    val root = Files.createTempDirectory("bm255-root").toString + "/idx"
    // plant the query term "join" in EVERY document: its df equals the
    // corpus size, the exact stop-term shape whose postings an uncapped
    // probe must fetch whole
    val planted = docs.withColumn("text",
      concat_ws(" ", col("text"), lit("join")))
    landParquet(landing, "b1.parquet", planted)
    IncrementalBm25.run(spark, landing.toString, ckpt, root, docSchema)
    val n = docs.count()
    val qTerms = Retrieval.queriesDf(spark).select("term").distinct()
    val dfs = IncrementalBm25.storedDf(spark, root, qTerms)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(dfs("join") == n, "fixture: the planted term must have df = N")
    // the cap sits between the hottest legitimate term and the planted
    // stop term, so exactly "join" is over-cap
    val cap = dfs.filter(_._1 != "join").values.max
    assert(cap < n, s"fixture: every other query term must sit under N: $dfs")
    val uncapped = topk(IncrementalBm25.searchStore(spark, root))
    val capped = topk(IncrementalBm25.searchStore(spark, root,
      maxTermDf = Some(cap)))
    // ground truth for the capped search: the shared scoring seam over a
    // vocabulary with the stop term removed (dl/avgdl still count it —
    // the cap drops the term from the QUERY, not from the index)
    val prunedTf = IncrementalBm25.priorPostings(spark, root,
      qTerms.filter(col("term") =!= "join"))
    val prunedDf = prunedTf.groupBy("term").agg(count(lit(1)).as("df"))
    val want = topk(Retrieval.scoreTf(prunedTf, prunedDf,
      IncrementalBm25.readStats(spark, root),
      Retrieval.queriesDf(spark), graft.ops.Portable.Bm25TopK))
    assert(capped == want,
      "capped search must equal the seam with the stop term dropped")
    // the documented divergence is real: query 0 carries the stop term,
    // so its capped rows hit at most the one remaining term…
    assert(capped != uncapped)
    assert(capped.filter(_._1 == 0L).forall(_._3 <= 1L),
      "a dropped stop term may not count toward n_hit_terms")
    // …while queries without a stop term rank bit-identically
    assert(capped.filter(_._1 != 0L) == uncapped.filter(_._1 != 0L),
      "queries without stop terms must not move under the cap")
  }

  test("posting probes read only the query vocabulary's term buckets") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    val landing = Files.createTempDirectory("bm254-landing")
    val ckpt = Files.createTempDirectory("bm254-ckpt").toString + "/c"
    val root = Files.createTempDirectory("bm254-root").toString + "/idx"
    landParquet(landing, "b1.parquet", docs)
    IncrementalBm25.run(spark, landing.toString, ckpt, root, docSchema)
    val store = IncrementalBm25.postingsPath(root)
    val terms = Retrieval.queriesDf(spark).select("term")
    val n = graft.streaming.IncrementalAnnIndex.bucketCount(spark, store).get
    val touched = terms.select(
      graft.streaming.IncrementalAnnIndex.idBucket(col("term"), n).as("b"))
      .distinct().collect().map(_.getInt(0)).toSet
    import scala.jdk.CollectionConverters._
    val files = TempDirs.walkFiles(java.nio.file.Paths.get(store))
      .filter(java.nio.file.Files.isRegularFile(_))
      .map(_.toString).filter(_.endsWith(".parquet"))
    val expected = files.count(f =>
      touched.exists(b => f.contains(s"/id_bucket=$b/")))
    assert(expected < files.size,
      "fixture too narrow: the touched slice must be a strict subset")
    val rel = IncrementalBm25.priorPostings(spark, root, terms)
    assert(rel.count() > 0)
    rel.collect()
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: QueryStageExec => scans(q.plan)
      case s: FileSourceScanExec => Seq(s)
      case other => other.children.flatMap(scans)
    }
    val scan = scans(rel.queryExecution.executedPlan).head
    assert(scan.metrics("numFiles").value == expected,
      s"scan read ${scan.metrics("numFiles").value} files, " +
        s"expected $expected of ${files.size}")
    assert(scan.toString.contains(
      "ReadSchema: struct<term:string,doc_id:bigint,tf:bigint,dl:bigint>"),
      scan.toString.take(800))
  }
}
