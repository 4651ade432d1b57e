package graft

import org.apache.spark.sql.functions._

import graft.ops.Dsir
import graft.testdata.{TestFixtures => T}

/** DSIR (graft.ops.Dsir) properties beyond the sf oracle: the likelihood-
  * ratio formula against an independent computation, the selection-favors-
  * target semantics, and consistency between weights/select/summary.
  */
class DsirSpec extends SparkSpec {

  private lazy val docs = T.table(spark, sf, "documents")

  test("every document gets exactly one weight row") {
    val w = Dsir.weights(docs)
    assert(w.count() == docs.count())
    assert(w.select("doc_id").distinct().count() == docs.count())
  }

  test("target-language documents score higher than every other slice") {
    val means = Dsir.weights(docs)
      .join(docs.select("doc_id", "lang"), Seq("doc_id"))
      .groupBy("lang").agg(avg("logweight_micro").as("mean_lw"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val target = means(Dsir.TargetLang)
    (means - Dsir.TargetLang).foreach { case (lang, m) =>
      assert(target > m, s"target mean $target not above $lang mean $m")
    }
  }

  test("the ratio table matches an independent smoothed log-ratio computation") {
    import spark.implicits._
    // three docs, two langs; grams: d0(en)="a b" -> 1:a, 1:b, 2:a b;
    // d1(de)="a" -> 1:a; d2(en)="b" -> 1:b
    val tiny = Seq(
      (0L, "a b", "en"), (1L, "a", "de"), (2L, "b", "en"))
      .toDF("doc_id", "text", "lang")
    val all = Dsir.ratioTable(Dsir.featureCounts(tiny)).collect()
    // COMPLETE table: every hashed bucket gets its smoothed estimate
    assert(all.length == Dsir.Buckets)
    val totCt = 4.0; val totCr = 5.0; val b = Dsir.Buckets
    def expect(ct: Long, cr: Long): Long =
      math.floor((math.log((ct + 1) / (totCt + b))
        - math.log((cr + 1) / (totCr + b))) * Dsir.Micro).toLong
    // observed buckets: 1:a -> (ct 1, cr 2); 1:b -> (ct 2, cr 2);
    // 2:"a b" -> (ct 1, cr 1); the other 1021 carry the unseen-bucket
    // constant expect(0, 0)
    val lr = all.filter(_.getAs[Long]("cr") > 0)
      .map(r => (r.getAs[Long]("ct"), r.getAs[Long]("cr")) ->
        r.getAs[Long]("lr_micro")).toMap
    assert(lr.keySet == Set((1L, 2L), (2L, 2L), (1L, 1L)))
    lr.foreach { case ((ct, cr), m) => assert(m == expect(ct, cr)) }
    val unseen = all.filter(_.getAs[Long]("cr") == 0)
    assert(unseen.length == Dsir.Buckets - 3)
    unseen.foreach(r => assert(r.getAs[Long]("lr_micro") == expect(0L, 0L)))
  }

  test("select is the key-thresholded subset of weights; summary agrees") {
    val sel = Dsir.select(docs)
    val bad = sel.filter(
      col("key_micro") =!= col("logweight_micro") + col("gumbel_micro") ||
        col("key_micro") < Dsir.SelectTauMicro)
    assert(bad.count() == 0)
    val sm = Dsir.summary(docs).collect().head
    assert(sm.getAs[Long]("n_docs") == docs.count())
    assert(sm.getAs[Long]("n_selected") == sel.count())
    assert(sm.getAs[Long]("min_logweight_micro") <=
      sm.getAs[Long]("max_logweight_micro"))
  }

  test("weights are invariant to input partitioning (exact integer sums)") {
    val a = Dsir.weights(docs).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val b = Dsir.weights(docs.repartition(7)).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(a == b)
  }

  test("frozen-table scoring is label-free and weighs unseen-bucket grams") {
    val frozen = Dsir.ratioTable(Dsir.featureCounts(docs))
    // lang is a training-time input: a crawl batch without it scores fine
    val withLang = Dsir.weightsWith(docs, frozen).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val without = Dsir.weightsWith(docs.drop("lang"), frozen).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(withLang == without)
    // a gram the frozen table never saw still weighs its smoothed
    // estimate (the complete-table contract), not zero — and counts in
    // n_grams
    import spark.implicits._
    val novel = Seq((777L, "zzznovelgram")).toDF("doc_id", "text")
    val row = Dsir.weightsWith(novel, frozen).head()
    val bucket = spark.sql(
      s"SELECT ${graft.ops.Portable.hexcastSpark("'1:zzznovelgram'")}" +
        s" % ${Dsir.Buckets} AS b").head().getLong(0)
    val want = frozen.filter(col("bucket") === bucket)
      .head().getAs[Long]("lr_micro")
    assert(row.getAs[Long]("n_grams") == 1L)
    assert(row.getAs[Long]("logweight_micro") == want,
      "the single gram must weigh exactly its bucket's table entry " +
        "(complete table: present even for unseen buckets)")
  }
}
