package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Curation
import graft.streaming.{IncrementalDsir, IncrementalLearnedEnsemble, IncrementalLmFilter, IncrementalQualityFilter}

/** Incremental learned-ensemble drain: all three families' tables freeze
  * at one bootstrap, a single drain reproduces the batch ensemble's
  * verdicts exactly, later batches score under the frozen tables
  * label-free, replays are idempotent, and each family's loud
  * frozen-table validation still stands.
  */
class IncrementalLearnedEnsembleSpec extends SparkSpec {

  /** Even ids are fluent seed documents (patterned cycle over `w0..w3`,
    * target lang weighted); odd ids are crawl documents drawing
    * hash-driven tokens from a shared 8-word vocabulary — enough overlap
    * that every family produces a real split rather than a constant.
    */
  private def corpus(lo: Long, hi: Long): DataFrame =
    spark.range(lo, hi).toDF("doc_id").selectExpr(
      "doc_id",
      "IF(doc_id % 2 = 0, 'src0', 'crawl') AS source",
      "IF(doc_id % 3 = 0, 'en', 'de') AS lang",
      """IF(doc_id % 2 = 0,
        |  array_join(transform(sequence(0, 39), i -> concat('w', i % 4)), ' '),
        |  array_join(transform(sequence(0, 11),
        |    i -> element_at(array('w0', 'w1', 'w2', 'w3',
        |                          'x0', 'x1', 'x2', 'x3'),
        |                    CAST(pmod(hash(doc_id, i), 8) AS INT) + 1)), ' '))
        |  AS text""".stripMargin.replaceAll("\n", " "))

  private def schema = corpus(0L, 1L).schema

  private def verdicts(df: DataFrame) = df
    .select("doc_id", "nb_selected", "lm_selected", "dsir_selected", "kept")
    .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2),
      r.getBoolean(3), r.getBoolean(4))).toSet

  test("a single drain reproduces the batch ensemble exactly") {
    val landing = Files.createTempDirectory("ens1-landing")
    val ckpt = Files.createTempDirectory("ens1-ckpt").toString + "/c"
    val root = Files.createTempDirectory("ens1-root").toString + "/e"
    val docs = corpus(0L, 400L)
    landParquet(landing, "b1.parquet", docs)
    val ledger = IncrementalLearnedEnsemble.run(
      spark, landing.toString, ckpt, root, schema)
    assert(ledger.count() == 400L)
    // the bootstrap batch IS the corpus, so all five frozen tables equal
    // the batch operator's and the verdicts match learnedAudit exactly
    val got = verdicts(ledger)
    val want = verdicts(Curation.learnedAudit(docs))
    assert(got == want)
    // a real ensemble: filters disagree somewhere and the AND is a cut
    assert(got.exists(_._5) && got.exists(!_._5))
    assert(got.exists(v => v._2 != v._3 || v._2 != v._4))
    // one drain, one ledger: the admitted stream carries exactly the
    // jointly-kept documents with the input schema preserved
    val admitted = spark.read.parquet(
      IncrementalLearnedEnsemble.admittedPath(root))
    assert(admitted.columns.toSet ==
      Set("doc_id", "source", "lang", "text", "batch"))
    assert(admitted.count() == got.count(_._5).toLong)
  }

  test("later batches score under the FROZEN tables, label-free") {
    val landing = Files.createTempDirectory("ens2-landing")
    val ckpt = Files.createTempDirectory("ens2-ckpt").toString + "/c"
    val root = Files.createTempDirectory("ens2-root").toString + "/e"
    val b1 = corpus(0L, 300L)
    landParquet(landing, "b1.parquet", b1)
    IncrementalLearnedEnsemble.run(spark, landing.toString, ckpt, root, schema)
    val (nbM, nbP, lmM, lmC, lr) =
      IncrementalLearnedEnsemble.readTables(spark, root)
    // batch 2 arrives WITHOUT labels (scoring is doc_id+text only) and
    // skewed (crawl-heavy): per-batch re-training would move the scores;
    // the frozen tables must not
    val b2 = corpus(300L, 500L).filter(col("doc_id") % 4 =!= 0)
      .select("doc_id", "text")
    landParquet(landing, "b2.parquet", b2)
    val ledger = IncrementalLearnedEnsemble.run(
      spark, landing.toString, ckpt, root,
      org.apache.spark.sql.types.StructType(
        schema.filter(f => Set("doc_id", "text")(f.name))))
    val got = ledger.join(b2.select("doc_id"), Seq("doc_id"))
    val want = IncrementalLearnedEnsemble.scoreBatch(b2, nbM, nbP, lmM,
      lmC, lr)
    assert(verdicts(got) == verdicts(want),
      "batch 2 must score under the frozen tables")
    assert(got.count() == b2.count())
  }

  test("an at-least-once replay rewrites identical ledger rows") {
    val landing = Files.createTempDirectory("ens3-landing")
    val ckpt = Files.createTempDirectory("ens3-ckpt").toString + "/c"
    val root = Files.createTempDirectory("ens3-root").toString + "/e"
    landParquet(landing, "b1.parquet", corpus(0L, 200L))
    val first = IncrementalLearnedEnsemble.run(
      spark, landing.toString, ckpt, root, schema)
      .collect().map(_.toString).sorted
    // crash-replay: commit 0 (and its crc sibling) lost, checkpoint
    // kept — a fresh checkpoint is NOT a replay; the era guard refuses it
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(ckpt, "commits", "0"))
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(ckpt, "commits", ".0.crc"))
    val second = IncrementalLearnedEnsemble.run(
      spark, landing.toString, ckpt, root, schema)
      .collect().map(_.toString).sorted
    assert(second.sameElements(first))
    // and the fresh-checkpoint spelling is refused outright
    val ckptF = Files.createTempDirectory("ens3-ckptf").toString + "/c"
    val err = intercept[IllegalArgumentException] {
      IncrementalLearnedEnsemble.run(
        spark, landing.toString, ckptF, root, schema)
    }
    assert(err.getMessage.contains("compact first"), err.getMessage)
  }

  test("each family's frozen-table validation still fails loudly") {
    val landing = Files.createTempDirectory("ens4-landing")
    val ckpt = Files.createTempDirectory("ens4-ckpt").toString + "/c"
    val root = Files.createTempDirectory("ens4-root").toString + "/e"
    landParquet(landing, "b1.parquet", corpus(0L, 200L))
    IncrementalLearnedEnsemble.run(spark, landing.toString, ckpt, root, schema)
    // truncate the DSIR ratio table to a partial write: the ensemble's
    // next drain must refuse through IncrementalDsir's own completeness
    // validation, not score against a hole
    val ratio = IncrementalDsir.ratioPath(
      IncrementalLearnedEnsemble.dsirRoot(root))
    val partial = spark.read.parquet(ratio).limit(10).collect()
    spark.createDataFrame(
        java.util.Arrays.asList(partial: _*),
        spark.read.parquet(ratio).schema)
      .coalesce(1).write.mode("overwrite").parquet(ratio)
    landParquet(landing, "b2.parquet", corpus(200L, 250L))
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      IncrementalLearnedEnsemble.run(
        spark, landing.toString, ckpt, root, schema)
    }
    assert(e.getMessage.contains("ratio table") ||
      e.getCause.getMessage.contains("ratio table"))
  }
}
