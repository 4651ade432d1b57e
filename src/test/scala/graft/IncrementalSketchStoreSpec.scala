package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ops.Events
import graft.streaming.IncrementalSketchStore
import graft.testdata.{TestFixtures => T}

/** Mergeable-partial aggregate maintenance: additive counters fold
  * exactly across batches, HLL sketch unions stay within the sketch's
  * error envelope of the exact distinct count — no history rescan.
  */
class IncrementalSketchStoreSpec extends SparkSpec {

  private lazy val events = T.events(spark, sf).cache()

  test("an empty first drain reports zero days, not a crash") {
    val landing = Files.createTempDirectory("sk0-landing")
    val ckpt = Files.createTempDirectory("sk0-ckpt").toString + "/c"
    val store = Files.createTempDirectory("sk0-store").toString + "/sketches"
    val out = IncrementalSketchStore.run(
      spark, landing.toString, ckpt, store, events.schema)
    assert(out.count() == 0)
  }

  test("two-batch sketch store merges to the batch aggregates") {
    val landing = Files.createTempDirectory("sk-landing")
    val ckpt = Files.createTempDirectory("sk-ckpt").toString + "/c"
    val store = Files.createTempDirectory("sk-store").toString + "/sketches"

    // split mid-stream so most days span BOTH batches — the merge is
    // genuinely exercised, not a concatenation of disjoint days
    val mid = events.agg(expr("percentile_approx(event_id, 0.5)"))
      .head().getLong(0)
    landParquet(landing, "b1.parquet", events.filter(col("event_id") < mid))
    IncrementalSketchStore.run(
      spark, landing.toString, ckpt, store, events.schema)
    landParquet(landing, "b2.parquet", events.filter(col("event_id") >= mid))
    val report = IncrementalSketchStore.run(
      spark, landing.toString, ckpt, store, events.schema).cache()

    // additive partials merge EXACTLY
    val expected = events.groupBy(col("ts").cast("date").as("day"))
      .agg(count(lit(1)).as("e_events"), sum("value").as("e_sum"))
    val joined = report.join(expected, Seq("day")).cache()
    assert(joined.count() == report.count() &&
      report.count() == expected.count())
    assert(joined.filter(col("n_events") =!= col("e_events")).count() == 0)
    assert(joined.filter(
      abs(col("sum_value") - col("e_sum")) > 1e-6).count() == 0)

    // the unioned sketch estimate stays inside the error envelope of the
    // exact per-day distinct count (lgK 12 ⇒ ~2.5% RSE; allow 5×)
    val exact = Events.dailyUsersExact(events)
    val acc = report.join(exact, Seq("day"))
      .withColumn("rel_err",
        abs(col("n_users_approx") - col("n_users_exact")) /
          col("n_users_exact"))
    assert(acc.filter(col("rel_err") > 0.125).count() == 0,
      "sketch estimate left its error envelope")
  }

  test("two-batch CMS store merges to the one-pass sketch, and folds") {
    val landing = Files.createTempDirectory("cms-landing")
    val ckpt = Files.createTempDirectory("cms-ckpt").toString + "/c"
    val store = Files.createTempDirectory("cms-store").toString + "/cms"
    val mid = events.agg(expr("percentile_approx(event_id, 0.5)"))
      .head().getLong(0)
    landParquet(landing, "b1.parquet", events.filter(col("event_id") < mid))
    IncrementalSketchStore.runCms(
      spark, landing.toString, ckpt, store, events.schema)
    landParquet(landing, "b2.parquet", events.filter(col("event_id") >= mid))
    IncrementalSketchStore.runCms(
      spark, landing.toString, ckpt, store, events.schema)
    // CMS merge is exact counter addition under a pinned hash family, so
    // the merged store answers BIT-IDENTICALLY to the one-pass batch
    // sketch — no arrival-order or batch-boundary divergence at all
    def estimates(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getAs[Long]("n_events_cms"))).toMap
    val want = estimates(Events.userCountsCompared(events))
    assert(want.nonEmpty)
    assert(estimates(IncrementalSketchStore.cmsCompared(
      spark, store, events)) == want)
    val (merged, n) = IncrementalSketchStore.mergedCms(spark, store).get
    assert(n == events.count() && merged.totalCount() == n)
    // the verified fold carries the counters losslessly into one row
    val folded = Files.createTempDirectory("cms-fold").toString + "/cms"
    IncrementalSketchStore.foldCms(spark, store, folded)
    assert(spark.read.parquet(folded).count() == 1)
    assert(estimates(IncrementalSketchStore.cmsCompared(
      spark, folded, events)) == want)
  }

  test("the daily fold carries counters exactly and sketches register-identically") {
    val landing = Files.createTempDirectory("skf-landing")
    val ckpt = Files.createTempDirectory("skf-ckpt").toString + "/c"
    val store = Files.createTempDirectory("skf-store").toString + "/sketches"
    val mid = events.agg(expr("percentile_approx(event_id, 0.5)"))
      .head().getLong(0)
    landParquet(landing, "b1.parquet", events.filter(col("event_id") < mid))
    IncrementalSketchStore.run(
      spark, landing.toString, ckpt, store, events.schema)
    landParquet(landing, "b2.parquet", events.filter(col("event_id") >= mid))
    val before = IncrementalSketchStore.run(
      spark, landing.toString, ckpt, store, events.schema)
      .collect().map(r => (r.getDate(0).toString,
        r.getLong(1), r.getLong(3))).toSet
    // fold into a fresh destination: one row per day, and the REPORT is
    // unchanged — additive counters exactly, sketch estimates
    // identically (a union of unions is the union: same registers)
    val folded = Files.createTempDirectory("skf-fold").toString + "/sketches"
    IncrementalSketchStore.foldDaily(spark, store, folded)
    val days = spark.read.parquet(folded).drop("batch")
    assert(days.groupBy("day").count().filter(col("count") > 1).count() == 0,
      "the folded store must hold one partial row per day")
    val after = IncrementalSketchStore.dailyReport(spark, folded)
      .collect().map(r => (r.getDate(0).toString,
        r.getLong(1), r.getLong(3))).toSet
    assert(after == before,
      "folding must not move a single count or sketch estimate")
    // the fresh-era guard: a new checkpoint over the UNFOLDED store
    // refuses (its batch>=0 partials would be overwritten); the folded
    // store (batch=-1 only) accepts and accumulates beside the carry
    val ckpt2 = Files.createTempDirectory("skf-ckpt2").toString + "/c"
    val err = intercept[IllegalArgumentException] {
      IncrementalSketchStore.run(
        spark, landing.toString, ckpt2, store, events.schema)
    }
    assert(err.getMessage.contains("compact first"), err.getMessage)
    IncrementalSketchStore.run(
      spark, landing.toString, ckpt2, folded, events.schema)
    val doubled = IncrementalSketchStore.dailyReport(spark, folded)
      .agg(sum("n_events")).head().getLong(0)
    assert(doubled == 2L * events.count(),
      "the fresh era must append its partials beside the carried fold")
  }

  test("CMS store tolerates null user_ids: the fold invariant tracks adds") {
    val landing = Files.createTempDirectory("cmsn-landing")
    val ckpt = Files.createTempDirectory("cmsn-ckpt").toString + "/c"
    val store = Files.createTempDirectory("cmsn-store").toString + "/cms"
    // count_min_sketch skips nulls, so n_events must count what the
    // sketch INGESTED — a raw row count would break the totalCount
    // equality gate forever on the first null id
    val keep = events.filter(col("event_id") < 50)
    val withNull = keep.unionByName(events.filter(col("event_id") === 50)
      .withColumn("user_id", lit(null).cast("long")))
    landParquet(landing, "b1.parquet", withNull)
    IncrementalSketchStore.runCms(
      spark, landing.toString, ckpt, store, events.schema)
    val (merged, n) = IncrementalSketchStore.mergedCms(spark, store).get
    assert(n == keep.count(), "n_events must exclude the null id")
    assert(merged.totalCount() == n)
    val folded = Files.createTempDirectory("cmsn-fold").toString + "/cms"
    IncrementalSketchStore.foldCms(spark, store, folded) // must not throw
    assert(spark.read.parquet(folded).count() == 1)
  }
}
