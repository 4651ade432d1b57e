package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.models._
import graft.pipeline.StockPipeline
import graft.testdata.{TestFixtures => T}

/** End-to-end: the real model DAG through the Pipeline runner, against
  * direct model builds.
  */
class StockPipelineSpec extends SparkSpec {

  test("full DAG run materializes marts identical to direct builds") {
    val store = Files.createTempDirectory("stockstore").toString
    // a 180-day window: this spec proves the PIPELINE plumbing (topo
    // order, materializations, partition layout, contracts) equals the
    // direct builds — the full-corpus mart CONTENT is hash-verified
    // against DuckDB by the battery (stock_fct_momentum et al.), so a
    // 500-partition-commit DAG run here re-paid wall-clock for coverage
    // the oracle already owns. The window equality below still exercises
    // every model, both incremental layouts, and the breadth/dim marts
    val stgAll = T.stagedBars(spark, sf)
    val maxD = stgAll.agg(max("trade_date")).head().getDate(0)
    val stg = stgAll.filter(col("trade_date") >= date_sub(lit(maxD), 180))
    val const = T.constituents(spark, sf)
    val out = StockPipeline.run(spark, stg, const, store)

    // fct from the store == fct built directly (partitionBy reorders
    // columns, so compare in a canonical column order)
    val direct = FctTradingMomentum.buildFull(IntRussellDaily.buildFull(stg, const))
    val cols = direct.columns.sorted.map(col).toSeq
    val stored = out("fct_trading_momentum").select(cols: _*)
    val directSel = direct.select(cols: _*)
    // multiset equality in one exceptAll pass: |stored| == |direct| and
    // stored ⊆ direct (as multisets) together imply equality — the second
    // exceptAll direction is redundant work at suite scale
    assert(stored.count() == directSel.count())
    assert(stored.exceptAll(directSel).count() == 0)

    // marts materialized on disk; views never are
    for (t <- Seq("int_russell_daily", "fct_trading_momentum",
        "agg_daily_market_breadth", "dim_securities_current"))
      assert(Files.exists(Paths.get(s"$store/$t")), t)
    assert(!Files.exists(Paths.get(s"$store/stg_daily_stocks")))

    // incremental tables are trade_date-partitioned (prunable layout)
    val dates = out("int_russell_daily").select("trade_date").distinct().count()
    val partDirs = new java.io.File(s"$store/int_russell_daily")
      .listFiles().count(f => f.isDirectory && f.getName.startsWith("trade_date="))
    assert(partDirs.toLong == dates)

    // breadth mart row count = one per trade date
    assert(out("agg_daily_market_breadth").count() == dates)
  }

  test("legacy TS-less raw layout self-heals at read; wider drift still refuses") {
    import graft.ingest.RawLoader
    val rawPath = Files.createTempDirectory("rawlegacy").toString + "/raw"
    // a LEGACY raw store: the reference layout before TS existed (the case
    // its ADD COLUMN IF NOT EXISTS safeguard repairs, snowflake_client.py)
    val native = T.rawDaily(spark, sf)
    native.drop("TS").write.partitionBy("DATE").parquet(rawPath)
    val legacy = spark.read.parquet(rawPath)
    assert(!legacy.columns.contains("TS"))
    val healed = RawLoader.heal(legacy)
    // canonical shape restored: TS typed, all-NULL, canonical column order
    assert(healed.schema.fieldNames.toSeq == RawLoader.rawSchema.fieldNames.toSeq)
    assert(healed.schema("TS").dataType == org.apache.spark.sql.types.TimestampType)
    assert(healed.count() == native.count())
    assert(healed.filter(col("TS").isNotNull).count() == 0)
    // healed raw flows through staging and the contracted DAG without
    // drift. A 90-day slice: heal + contract semantics are date-count
    // independent, and the full-corpus DAG (500 trade_date partition
    // commits per incremental model) is already the first test's run —
    // re-paying it here was a third of the suite's wall-clock
    val store = Files.createTempDirectory("healstore").toString
    val stgHealed = StgDailyStocks.build(healed)
    val maxD = stgHealed.agg(max("trade_date")).head().getDate(0)
    val slice = stgHealed.filter(
      col("trade_date") >= date_sub(lit(maxD), 90))
    val out = StockPipeline.run(spark, slice,
      T.constituents(spark, sf), store) // contracts pass: no throw
    assert(out("int_russell_daily").count() > 0)
    // a frame already carrying TS passes through untouched
    assert(RawLoader.heal(native) eq native)
    // anything beyond the TS case refuses to heal, named
    val ex = intercept[IllegalStateException](RawLoader.heal(legacy.drop("VW")))
    assert(ex.getMessage.contains("VW"), ex.getMessage)
    // MIXED store: legacy TS-less files + newer files carrying real TS.
    // A read trusting one inferred footer could hide TS and NULL the real
    // values; readRaw schema-merges, so legacy rows read NULL TS while the
    // newer rows keep theirs
    native.filter(col("DATE").isNotNull).limit(50)
      .write.mode("append").partitionBy("DATE").parquet(rawPath)
    val mixed = RawLoader.readRaw(spark, rawPath)
    assert(mixed.count() == native.count() + 50)
    assert(mixed.filter(col("TS").isNotNull).count() == 50)
    // an all-legacy store still heals through readRaw
    assert(RawLoader.readRaw(spark,
      rawPath).columns.contains("TS"))
  }

  test("schema contract aborts the DAG at the drifted model, before any write") {
    val store = Files.createTempDirectory("driftstore").toString
    val stg = T.stagedBars(spark, sf)
    val const = T.constituents(spark, sf)
    // upstream type drift that SURVIVES the model's projection (an extra
    // column would be dropped by the explicit select; a type change rides
    // through it into the declared output): volume narrows to INT
    val retyped = stg.withColumn("volume", col("volume").cast("int"))
    val ex = intercept[IllegalStateException](
      StockPipeline.run(spark, retyped, const, store))
    assert(ex.getMessage.contains("int_russell_daily"), ex.getMessage)
    assert(ex.getMessage.contains("volume"), ex.getMessage)
    // fail-fast: the drifted model aborted BEFORE writing its table
    assert(!Files.exists(Paths.get(s"$store/int_russell_daily")))
    // a store left behind by the aborted run is still buildable: the
    // undrifted DAG rebuilds into the SAME store (a bounded 180-day
    // slice — slice semantics are the first test's proof; what this
    // re-proves is store reusability after a contract abort)
    val maxD = stg.agg(max("trade_date")).head().getDate(0)
    val slice = stg.filter(col("trade_date") >= date_sub(lit(maxD), 180))
    val rebuilt = StockPipeline.run(spark, slice, const, store)
    assert(rebuilt("int_russell_daily").count() > 0)
    assert(Files.exists(Paths.get(s"$store/int_russell_daily")))
  }
}
