package graft

import org.apache.spark.sql.functions._

import graft.ops._
import graft.testdata.{TestFixtures => T}

/** Invariants of the composed curation funnel beyond the DuckDB oracle. */
class CurationSpec extends SparkSpec {

  private lazy val docs = T.table(spark, sf, "documents").cache()
  private lazy val audited =
    Curation.audit(docs, Dedup.minhashDupClusters(docs)).cache()

  test("learned ensemble verdicts equal the individual selects; funnel consistent") {
    val audit = Curation.learnedAudit(docs).cache()
    assert(audit.count() == docs.count())
    def ids(d: org.apache.spark.sql.DataFrame) =
      d.select("doc_id").collect().map(_.getLong(0)).toSet
    // each verdict column is exactly its filter's admission set
    assert(ids(audit.filter(col("nb_selected"))) ==
      ids(QualityClassifier.select(docs)))
    assert(ids(audit.filter(col("lm_selected"))) ==
      ids(LmPerplexity.select(docs)))
    assert(ids(audit.filter(col("dsir_selected"))) == ids(Dsir.select(docs)))
    // kept is the AND, and the fixture exercises a real joint cut
    assert(audit.filter(col("kept") =!=
      (col("nb_selected") && col("lm_selected") && col("dsir_selected")))
      .count() == 0)
    val kept = audit.filter(col("kept")).count()
    assert(kept > 0 && kept < docs.count())
    // funnel counters are internally consistent with the audit
    val f = Curation.learnedFunnel(audit).head()
    assert(f.getAs[Long]("n_docs") == docs.count())
    assert(f.getAs[Long]("n_kept") == kept)
    assert(f.getAs[Long]("n_kept") <= Seq("n_nb_lm", "n_nb_dsir", "n_lm_dsir")
      .map(f.getAs[Long]).min)
    assert(Seq("n_nb_lm", "n_nb_dsir", "n_lm_dsir").map(f.getAs[Long]).max <=
      Seq("n_nb", "n_lm", "n_dsir").map(f.getAs[Long]).max)
    audit.unpersist(blocking = false)
  }

  test("audit covers every document exactly once") {
    assert(audited.count() == docs.count())
    assert(audited.select("doc_id").distinct().count() == docs.count())
  }

  test("curated implies every stage gate passed") {
    val bad = audited.filter(col("curated") &&
      !(col("is_keeper") === 1 && col("passes_quality") &&
        !col("flagged_repetitive") && col("sample_kept")))
    assert(bad.count() == 0)
  }

  test("corpus is exactly the curated audit rows joined back to docs") {
    val corpus = Curation.corpus(docs, audited)
    val expected = audited.filter(col("curated")).select("doc_id")
    assert(corpus.count() == expected.count())
    assert(corpus.select("doc_id").except(expected).count() == 0)
    assert(corpus.columns.toSet ==
      Set("doc_id", "lang", "source", "n_chars", "quality_score", "split"))
  }

  test("funnel stages are monotone and splits partition the curated set") {
    val f = Curation.funnel(audited).collect().head
    val total = f.getAs[Long]("n_total")
    val dedup = f.getAs[Long]("n_after_dedup")
    val qual = f.getAs[Long]("n_after_quality")
    val rep = f.getAs[Long]("n_after_repetition")
    val cur = f.getAs[Long]("n_curated")
    assert(total >= dedup && dedup >= qual && qual >= rep && rep >= cur)
    assert(cur == f.getAs[Long]("n_train") + f.getAs[Long]("n_val") +
      f.getAs[Long]("n_test"))
    assert(total == docs.count())
    assert(cur > 0, "funnel should not curate everything away at test SF")
  }

  test("rowAudit agrees with the full audit wherever dedup is moot") {
    // for documents that are their own cluster keeper, the incremental
    // path's gate verdict must equal the batch audit's — the two paths
    // may not drift
    val ra = Curation.rowAudit(docs)
      .select(col("doc_id"), col("curated").as("row_curated"))
    val joined = audited.filter(col("is_keeper") === 1)
      .join(ra, Seq("doc_id"))
    assert(joined.filter(col("curated") =!= col("row_curated")).count() == 0)
  }

  test("a near-dup family contributes exactly one (best-quality) doc") {
    import spark.implicits._
    // identical pair (1,2) → one cluster with one keeper; doc 3 shares no
    // shingles with them and must stay a singleton
    val base = (1 to 30).map(i => s"tok$i").mkString(" ")
    val other = (1 to 30).map(i => s"word$i").mkString(" ")
    val d = Seq(
      (1L, base),
      (2L, base),
      (3L, other)).toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
    val a = Curation.audit(d, Dedup.minhashDupClusters(d))
    val fam = a.filter(col("cluster_id") === 1L)
    assert(fam.count() == 2)
    assert(fam.filter(col("is_keeper") === 1).count() == 1)
  }
}
