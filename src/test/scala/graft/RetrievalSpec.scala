package graft

import org.apache.spark.sql.functions._

import graft.ops.{Portable, Retrieval}
import graft.testdata.{TestFixtures => T}

/** BM25 (graft.ops.Retrieval) properties the sf oracle can't see: the
  * formula against an independent hand computation, rank contiguity, and
  * partitioning-invariance of the integerized ranking.
  */
class RetrievalSpec extends SparkSpec {

  private lazy val docs = T.table(spark, sf, "documents")

  test("every query returns contiguously ranked top-k with positive scores") {
    val rows = Retrieval.bm25TopK(docs).collect()
    assert(rows.nonEmpty)
    val byQuery = rows.groupBy(_.getAs[Long]("query_id"))
    assert(byQuery.keySet == Portable.bm25Queries.map(_._1.toLong).toSet)
    byQuery.values.foreach { qs =>
      val ranks = qs.map(_.getAs[Int]("rank")).sorted.toSeq
      assert(ranks == (1 to qs.length), s"ranks not contiguous: $ranks")
      assert(qs.forall(_.getAs[Long]("score_micro") > 0))
      assert(qs.forall { r =>
        val h = r.getAs[Long]("n_hit_terms")
        h >= 1 && h <= Portable.Bm25MaxTerms
      })
    }
  }

  test("the engine score matches an independent BM25 computation") {
    import spark.implicits._
    // 3-doc corpus engineered so tf, df, dl are all different:
    //   d0: "join join hash x"  d1: "join y y y y"  d2: "z z"
    val tiny = Seq(
      (0L, "join join hash x"),
      (1L, "join y y y y"),
      (2L, "z z")).toDF("doc_id", "text")
    val out = Retrieval.bm25TopK(tiny)
      .filter(col("query_id") === 0) // query 0 = (join, hash)
      .select("doc_id", "n_hit_terms", "score_micro")
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    val k1 = 1.25; val b = 0.75
    val n = 3.0; val avgdl = (4 + 5 + 2) / 3.0
    def idf(df: Int) = math.log(1 + ((n - df) + 0.5) / (df + 0.5))
    def ts(tf: Long, df: Int, dl: Long) =
      idf(df) * ((tf * (k1 + 1)) / (tf + (k1 * ((1 - b) + (b * (dl / avgdl))))))
    def micro(x: Double) = math.floor(x * 1e6).toLong
    // d0 hits join(tf 2, df 2) and hash(tf 1, df 1), dl 4
    assert(out(0L) == ((2L, micro(ts(2, 2, 4) + ts(1, 1, 4)))))
    // d1 hits join only (tf 1, df 2), dl 5
    assert(out(1L) == ((1L, micro(ts(1, 2, 5)))))
    // d2 hits nothing — no row
    assert(!out.contains(2L))
  }

  test("ranking is invariant to input partitioning") {
    val a = Retrieval.bm25TopK(docs)
      .select("query_id", "doc_id", "rank").collect().toSet
    val b = Retrieval.bm25TopK(docs.repartition(7))
      .select("query_id", "doc_id", "rank").collect().toSet
    assert(a == b)
  }
}
