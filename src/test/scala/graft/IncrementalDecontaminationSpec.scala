package graft

import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, FloatType, LongType, StructField, StructType}

import graft.ops.Similarity
import graft.streaming.IncrementalDecontamination
import graft.testdata.{TestFixtures => T}

/** Incremental semantic decontamination: batch≡incremental agreement by
  * construction, exactly-once replay, clean/flagged partition of every
  * batch, and eval-set re-registration.
  */
class IncrementalDecontaminationSpec extends SparkSpec {

  private val embSchema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType))))

  private lazy val emb = T.table(spark, sf, "embeddings")
    .select("vec_id", "embedding")

  private def rows(df: DataFrame): Seq[Row] =
    df.collect().toSeq

  private def land(landing: Path, name: String, rs: Seq[Row]): Unit =
    landParquet(landing, name, spark.createDataFrame(rs.asJava, embSchema))

  private def dirs(): (Path, String, String, String, String) = {
    val landing = Files.createTempDirectory("idc-landing")
    val ckpt = Files.createTempDirectory("idc-ckpt").toString + "/c"
    val eval = Files.createTempDirectory("idc-eval").toString + "/eval"
    val flags = Files.createTempDirectory("idc-flags").toString + "/flags"
    val clean = Files.createTempDirectory("idc-clean").toString + "/clean"
    (landing, ckpt, eval, flags, clean)
  }

  private def flagSet(df: DataFrame): Set[(Long, Long, Double)] =
    df.select("vec_id", "n_test_hits", "max_cos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("per-batch ledgers union to the batch operator's result, evidence included") {
    val (landing, ckpt, eval, flags, clean) = dirs()
    val evalSet = emb.filter(col("vec_id") >= 450) // 50 probe vectors
    val train = emb.filter(col("vec_id") < 450)
    IncrementalDecontamination.registerEvalSet(evalSet, eval)
    // three landings
    land(landing, "b1.parquet", rows(train.filter(col("vec_id") < 150)))
    land(landing, "b2.parquet",
      rows(train.filter(col("vec_id") >= 150 && col("vec_id") < 300)))
    land(landing, "b3.parquet", rows(train.filter(col("vec_id") >= 300)))
    val ledger = IncrementalDecontamination.run(
      spark, landing.toString, ckpt, eval, flags, clean, embSchema)
    val batch = Similarity.crossSetContamination(train, evalSet)
      .select(col("vec_id"), col("n_probe_hits").as("n_test_hits"),
        col("max_cos"))
    assert(flagSet(ledger) == flagSet(batch))
    assert(flagSet(ledger).nonEmpty)
    // clean ∪ flagged = every landed id, disjoint
    val cleanIds = spark.read.parquet(clean).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    val flaggedIds = flagSet(ledger).map(_._1)
    assert((cleanIds & flaggedIds).isEmpty)
    assert(cleanIds ++ flaggedIds ==
      train.collect().map(_.getLong(0)).toSet)
  }

  test("a replay from a fresh checkpoint rewrites identical ledgers") {
    val (landing, ckpt, eval, flags, clean) = dirs()
    IncrementalDecontamination.registerEvalSet(
      emb.filter(col("vec_id") >= 480), eval)
    land(landing, "b1.parquet", rows(emb.filter(col("vec_id") < 240)))
    land(landing, "b2.parquet",
      rows(emb.filter(col("vec_id") >= 240 && col("vec_id") < 480)))
    val first = flagSet(IncrementalDecontamination.run(
      spark, landing.toString, ckpt, eval, flags, clean, embSchema))
    // fresh checkpoint replays both landings from scratch: batch ids
    // restart at 0, per-batch overwrite dirs rewrite the same content
    val ckpt2 = Files.createTempDirectory("idc-ckpt2").toString + "/c"
    val second = flagSet(IncrementalDecontamination.run(
      spark, landing.toString, ckpt2, eval, flags, clean, embSchema))
    assert(first == second)
    assert(spark.read.parquet(flags).drop("batch").count() == first.size)
  }

  test("re-registering a grown eval set screens later batches against it") {
    val (landing, ckpt, eval, flags, clean) = dirs()
    // initial eval: vectors 490+; vector 7's planted copy is NOT in it
    IncrementalDecontamination.registerEvalSet(
      emb.filter(col("vec_id") >= 490), eval)
    land(landing, "b1.parquet", rows(emb.filter(col("vec_id") === 7)))
    val before = IncrementalDecontamination.run(
      spark, landing.toString, ckpt, eval, flags, clean, embSchema)
    val hadIt = flagSet(before).exists(f => f._1 == 7L && f._3 > 0.999)
    assert(!hadIt)
    // the eval suite grows by an exact copy of vector 7 under a new id
    val grown = emb.filter(col("vec_id") >= 490).unionByName(
      emb.filter(col("vec_id") === 7)
        .select((col("vec_id") + 100000L).as("vec_id"), col("embedding")))
    IncrementalDecontamination.registerEvalSet(grown, eval)
    // the same content re-lands under a new doc id (a re-crawl)
    land(landing, "b2.parquet", rows(
      emb.filter(col("vec_id") === 7)
        .select((col("vec_id") + 555L).as("vec_id"), col("embedding"))))
    val after = IncrementalDecontamination.run(
      spark, landing.toString, ckpt, eval, flags, clean, embSchema)
    assert(flagSet(after).exists(f => f._1 == 562L && f._3 > 0.999),
      "copy of the newly registered eval doc was not flagged")
  }

  test("an unregistered eval set screens nothing and admits everything") {
    val (landing, ckpt, eval, flags, clean) = dirs()
    land(landing, "b1.parquet", rows(emb.filter(col("vec_id") < 50)))
    val ledger = IncrementalDecontamination.run(
      spark, landing.toString, ckpt, eval, flags, clean, embSchema)
    assert(ledger.count() == 0)
    assert(spark.read.parquet(clean).count() == 50)
  }
}
