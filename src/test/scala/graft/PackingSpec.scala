package graft

import org.apache.spark.sql.functions._

import graft.ops.Packing
import graft.testdata.{TestFixtures => T}

/** Sequence packing (graft.ops.Packing) properties beyond the sf oracle:
  * agreement with an independent sequential packing per shard, the
  * bounded-overflow invariant, offset bounds, and token conservation.
  */
class PackingSpec extends SparkSpec {

  private lazy val docs = T.table(spark, sf, "documents")

  test("bin assignment matches an independent per-shard sequential scan") {
    val rows = Packing.packBins(docs).collect()
      .map(r => (r.getAs[Long]("shard"), r.getAs[Long]("doc_id")) ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("bin"),
          r.getAs[Long]("bin_offset"))).toMap
    rows.keys.groupBy(_._1).foreach { case (shard, keys) =>
      var cum = 0L
      keys.toSeq.sortBy(_._2).foreach { case k @ (_, _) =>
        val (n, bin, off) = rows(k)
        val start = cum
        assert(bin == start / Packing.Budget, s"bin mismatch at $k")
        assert(off == start - bin * Packing.Budget, s"offset mismatch at $k")
        cum = start + n
      }
      assert(shard >= 0 && shard < Packing.Shards)
    }
  }

  test("offsets stay inside the budget; bins are dense from 0 per shard") {
    val b = Packing.packBins(docs)
    assert(b.filter(col("bin_offset") < 0 ||
      col("bin_offset") >= Packing.Budget).count() == 0)
    // density needs every doc shorter than the budget (a budget-exceeding
    // doc's span can swallow a whole bin interval) — true of the fixture
    assert(b.agg(max("n_tokens")).head().getLong(0) < Packing.Budget)
    // then a span crosses every budget boundary, so bin ids per shard are
    // the contiguous range [0, max]
    b.groupBy("shard").agg(
        min("bin").as("lo"), max("bin").as("hi"),
        countDistinct("bin").as("nb"))
      .collect().foreach { r =>
        assert(r.getAs[Long]("lo") == 0L)
        assert(r.getAs[Long]("nb") == r.getAs[Long]("hi") + 1)
      }
  }

  test("stats agrees with packBins and conserves tokens; overflow is bounded") {
    val bins = Packing.packBins(docs)
    val st = Packing.stats(docs).collect()
    assert(st.map(_.getAs[Long]("n_docs")).sum == docs.count())
    val totalTokens = bins.agg(sum("n_tokens")).head().getLong(0)
    assert(st.map(_.getAs[Long]("total_tokens")).sum == totalTokens)
    // bounded overflow: every bin holds < budget + its heaviest doc
    val maxDoc = bins.agg(max("n_tokens")).head().getLong(0)
    st.foreach { r =>
      assert(r.getAs[Long]("max_bin_tokens") < Packing.Budget + maxDoc)
    }
  }
}
