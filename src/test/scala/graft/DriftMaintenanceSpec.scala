package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.streaming.{DriftMaintenance, StoreMaintenance}
import graft.streaming.DriftMaintenance.{Kind, Outcome, Store}

/** The shared model-maintenance engine itself — the contracts the nine
  * family instantiations lean on: the history-store pin fails loudly on a
  * list that diverges from the writer's storePaths, a no-drift
  * counterfactual never moves the pointer, a drift ships the RETAINED
  * candidate with history carried verified, and a retrain that fails its
  * own verification publishes nothing.
  */
class DriftMaintenanceSpec extends SparkSpec {

  import spark.implicits._

  private def modelPath(root: String) = s"$root/model"
  private def ledgerPath(root: String) = s"$root/ledger"

  /** A minimal flat writer root: one frozen model table and one
    * epoch-layout history store.
    */
  private def flatRoot(): String = {
    val root = Files.createTempDirectory("drift-flat").toString + "/fam"
    Seq((1L, "frozen")).toDF("k", "v")
      .write.parquet(modelPath(root))
    spark.range(10L).select(col("id").as("doc_id"))
      .write.parquet(s"${ledgerPath(root)}/batch=0")
    root
  }

  private def famOf(
      cf: (org.apache.spark.sql.SparkSession, String) => Outcome[String],
      pin: Option[String => Seq[String]] = Some(r => Seq(ledgerPath(r))),
      lossyRetrain: Boolean = false) = DriftMaintenance.Family[String](
    what = "TestFamily",
    stores = Seq(
      Store("model", modelPath _, Kind.Model),
      Store("ledger", ledgerPath _, Kind.History())),
    counterfactual = cf,
    retrainInto = (spark, m, _, dest, _) => {
      import spark.implicits._
      Seq((1L, m)).toDF("k", "v").write.parquet(modelPath(dest))
      if (lossyRetrain) throw new IllegalStateException(
        "TestFamily.retrain: lossy re-derive — not publishing")
    },
    pinStorePaths = pin)

  private val never = (_: org.apache.spark.sql.SparkSession, _: String) =>
    Outcome(drifted = false, "unused")
  private val always = (_: org.apache.spark.sql.SparkSession, _: String) =>
    Outcome(drifted = true, "candidate")

  test("a history list diverging from the writer's storePaths fails loudly") {
    val flat = flatRoot()
    val genRoot = Files.createTempDirectory("drift-gen").toString + "/fam"
    // the writer grew a second accumulating store the family's carry
    // does not know about — both adopt and retrain must refuse before
    // writing anything
    val diverged = famOf(always,
      pin = Some(r => Seq(ledgerPath(r), s"$r/extra")))
    val err = intercept[IllegalArgumentException] {
      DriftMaintenance.adopt(spark, diverged, genRoot, flat)
    }
    assert(err.getMessage.contains("diverged"), err.getMessage)
    // an aligned pin adopts fine…
    DriftMaintenance.adopt(spark, famOf(always), genRoot, flat)
    // …and the same divergence then blocks the retrain path too
    val err2 = intercept[IllegalArgumentException] {
      DriftMaintenance.retrainWith(spark, diverged, genRoot, "candidate")
    }
    assert(err2.getMessage.contains("diverged"), err2.getMessage)
  }

  test("no drift never moves the pointer; drift ships the retained candidate") {
    val genRoot = Files.createTempDirectory("drift-gen2").toString + "/fam"
    DriftMaintenance.adopt(spark, famOf(never), genRoot, flatRoot())
    val gen0 = StoreMaintenance.currentGeneration(spark, genRoot)
    val (m0, g0) = DriftMaintenance.maintain(spark, famOf(never), genRoot)
    assert(m0 == "unused" && g0.isEmpty)
    assert(StoreMaintenance.currentGeneration(spark, genRoot) == gen0)
    // drift: the measured candidate is the one shipped, history carried
    val (m1, g1) = DriftMaintenance.maintain(spark, famOf(always), genRoot)
    assert(m1 == "candidate" && g1.isDefined)
    val cur = StoreMaintenance.resolveCurrent(spark, genRoot)
    assert(g1.contains(cur))
    assert(spark.read.parquet(modelPath(cur)).select("v")
      .head().getString(0) == "candidate")
    // carried history: every decision row present, landed at batch=-1
    val ledger = spark.read.parquet(ledgerPath(cur))
    assert(ledger.count() == 10L)
    assert(ledger.select("batch").distinct().head().getInt(0) == -1)
  }

  test("a retrain that fails its own verification publishes nothing") {
    val genRoot = Files.createTempDirectory("drift-gen3").toString + "/fam"
    DriftMaintenance.adopt(spark, famOf(never), genRoot, flatRoot())
    val gen0 = StoreMaintenance.currentGeneration(spark, genRoot)
    intercept[IllegalStateException] {
      DriftMaintenance.maintain(spark,
        famOf(always, lossyRetrain = true), genRoot)
    }
    // readers stay on the old generation; the crashed partial is abandoned
    assert(StoreMaintenance.currentGeneration(spark, genRoot) == gen0)
  }
}
