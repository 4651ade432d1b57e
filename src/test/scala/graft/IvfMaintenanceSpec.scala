package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Similarity
import graft.streaming.{IncrementalAnnIndex, IvfMaintenance, StoreMaintenance}

/** The IVF maintenance loop: a drifted stream crowds the frozen-leader
  * index into one hot list, the imbalance signal trips the policy, and a
  * retrain into a fresh generation restores probe recall — atomically,
  * behind the generation pointer.
  */
class IvfMaintenanceSpec extends SparkSpec {

  /** Deterministic drifted corpus. Bootstrap rows (id < 50) sit on axes
    * 0..15 — so the frozen seed leaders (vec_id < 16) tile them cleanly.
    * Every LATER row lives in one of 8 clusters on axes 16..23 the
    * bootstrap never saw, plus a common 0.35·e_0 pull that routes ALL of
    * them to frozen leader 0 — the drift scenario: one list takes the
    * whole stream while fifteen idle.
    */
  private def drifted(n: Long): DataFrame =
    spark.range(n).select(col("id").as("vec_id"), expr(
      """transform(sequence(0, 63), d -> CAST(
        |  (CASE WHEN id < 50 AND d = id % 16 THEN 1.0
        |        WHEN id >= 50 AND d = 16 + id % 8 THEN 1.0
        |        ELSE 0.0 END)
        |  + (CASE WHEN id >= 50 AND d = 0 THEN 0.35 ELSE 0.0 END)
        |  + ((pmod(hash(id, d), 201) - 100) * 0.0001) AS FLOAT))""".stripMargin
        .replaceAll("\n", " ")).as("embedding"))

  private lazy val emb = drifted(2050L).cache()
  private lazy val queries =
    emb.filter(col("vec_id") % Similarity.QueryStride === 0)

  /** recall@k of `got` against the exact `truth` top-k. */
  private def recall(got: DataFrame, truth: DataFrame): Double = {
    val t = truth.select("query_id", "neighbor_id")
    got.select("query_id", "neighbor_id")
      .join(t, Seq("query_id", "neighbor_id")).count().toDouble / t.count()
  }

  test("imbalance triggers retrain; recall recovers; swap is atomic") {
    val landing = Files.createTempDirectory("ivfm-landing")
    val ckpt = Files.createTempDirectory("ivfm-ckpt").toString + "/c"
    val leaders = Files.createTempDirectory("ivfm-l").toString + "/leaders"
    val lists = Files.createTempDirectory("ivfm-lists").toString + "/lists"
    val root = Files.createTempDirectory("ivfm-root").toString + "/index"

    // bootstrap on the pre-drift distribution, then the drifted stream
    landParquet(landing, "b1.parquet", emb.filter(col("vec_id") < 50L))
    IncrementalAnnIndex.run(
      spark, landing.toString, ckpt, leaders, lists, emb.schema)
    landParquet(landing, "b2.parquet", emb.filter(col("vec_id") >= 50L))
    IncrementalAnnIndex.run(
      spark, landing.toString, ckpt, leaders, lists, emb.schema)

    // adopt the flat pair into the generation layout
    val gen0 = IvfMaintenance.adopt(spark, root, leaders, lists, numFiles = 1)
    assert(StoreMaintenance.resolveCurrent(spark, root) == gen0)

    val truth = Similarity.bruteTopK(emb)
      .select("query_id", "neighbor_id").cache()
    val before = recall(IvfMaintenance.topKCurrent(spark, root, queries), truth)

    // below-threshold maintenance is a pure read: no new generation
    val noop = IvfMaintenance.maintain(spark, root, threshold = 1e9)
    assert(!noop.retrained && noop.generation.isEmpty)
    assert(StoreMaintenance.resolveCurrent(spark, root) == gen0)

    // the drifted store trips the default threshold and retrains
    val report = IvfMaintenance.maintain(spark, root)
    assert(report.retrained, s"imbalance ${report.imbalanceFactor} must trip")
    assert(report.imbalanceFactor > IvfMaintenance.DefaultImbalanceThreshold)
    val gen1 = report.generation.get
    assert(StoreMaintenance.resolveCurrent(spark, root) == gen1)
    assert(gen1 != gen0)
    // the superseded generation is intact for readers still draining it
    assert(spark.read.parquet(IvfMaintenance.listsPath(gen0)).count() == 2050L)

    // no vector lost or duplicated by the reassignment
    val newLists = spark.read.parquet(IvfMaintenance.listsPath(gen1))
    assert(newLists.count() == 2050L)
    assert(newLists.groupBy("vec_id").count()
      .filter(col("count") > 1).count() == 0)

    // the whole point: probe recall@10 recovers against the exact oracle
    val after = recall(IvfMaintenance.topKCurrent(spark, root, queries), truth)
    assert(after > before + 0.15,
      s"retrain must lift recall: before=$before after=$after")

    // and the load spreads: the hot list is gone
    val imbAfter = IvfMaintenance.imbalanceFactor(
      newLists.select("list_id"))
    assert(imbAfter < report.imbalanceFactor / 2,
      s"imbalance must drop: ${report.imbalanceFactor} -> $imbAfter")

    // the stream re-enters service on the retrained generation: frozen
    // (retrained) leaders are adopted, the batch layout stays readable,
    // and membership dedup still sees the reassigned rows
    val landing2 = Files.createTempDirectory("ivfm-landing2")
    val ckpt2 = Files.createTempDirectory("ivfm-ckpt2").toString + "/c"
    landParquet(landing2, "b3.parquet",
      drifted(2100L).filter(col("vec_id") >= 2040L)) // 10 re-lands
    val grown = IncrementalAnnIndex.run(
      spark, landing2.toString, ckpt2,
      IvfMaintenance.leadersPath(gen1), IvfMaintenance.listsPath(gen1),
      emb.schema)
    assert(grown.count() == 2100L)
    assert(grown.groupBy("vec_id").count()
      .filter(col("count") > 1).count() == 0)
  }

  test("hash-tile seeds are deterministic and corpus-spread") {
    val seeds = IvfMaintenance.hashTileSeeds(emb, Similarity.NumLists)
    assert(seeds.count() == Similarity.NumLists.toLong)
    val again = IvfMaintenance.hashTileSeeds(emb, Similarity.NumLists)
    assert(seeds.exceptAll(again).count() == 0)
    // seeds must come from the corpus at large, not the bootstrap ids the
    // frozen quantizer already used
    val lowIdOnly = IvfMaintenance
      .hashTileSeeds(emb.filter(col("vec_id") < 16), Similarity.NumLists)
    assert(seeds.exceptAll(lowIdOnly).count() > 0)
  }

  test("retrain on a too-small corpus fails loudly, publishes nothing") {
    val root = Files.createTempDirectory("ivfm-small").toString + "/index"
    val leaders = Similarity.trainLeaders(emb.filter(col("vec_id") < 50))
    val tmp = Files.createTempDirectory("ivfm-small-src").toString
    leaders.write.parquet(s"$tmp/leaders")
    Similarity.assignWithLeadersRetaining(
      emb.filter(col("vec_id") < 5), leaders)
      .select("vec_id", "list_id", "list_cos", "embedding", "norm")
      .write.parquet(s"$tmp/lists/batch=0")
    val gen0 = IvfMaintenance.adopt(
      spark, root, s"$tmp/leaders", s"$tmp/lists", numFiles = 1)
    intercept[IllegalArgumentException] {
      IvfMaintenance.retrain(spark, root)
    }
    assert(StoreMaintenance.resolveCurrent(spark, root) == gen0,
      "a failed retrain must leave the pointer untouched")
  }
}
