package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.{Pq, Similarity}
import graft.testdata.{TestFixtures => T}

/** Recall measurement for the PQ family — the numbers behind the
  * [[graft.ops.Pq.AdcRecallFloorMicro]] / [[graft.ops.Pq.IvfpqRecallFloorMicro]]
  * floors: recall@k of full-scan ADC, residual IVFPQ, and raw
  * (`by_residual=false`) IVFPQ against the exact cosine top-k.
  *
  * {{{ sbt 'Test/runMain graft.ProfilePq /root/testdata/sf0.01' }}}
  */
object ProfilePq {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    val sf = args.headOption.getOrElse("/root/testdata/sf0.001")
    val emb = T.table(spark, sf, "embeddings")
    val exact = Similarity.bruteTopK(emb)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val approx = df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      println(f"PQRECALL $name%-14s ${(exact & approx).size.toDouble / exact.size}%.4f")
    }
    recall("adc", Pq.adcTopK(emb))
    recall("ivfpq_resid", Pq.ivfpqTopK(emb))
    recall("ivfpq_raw", Pq.ivfpqTopK(emb, byResidual = false))
    // the residual gain only counts against the REACHABLE ceiling: IVF
    // pruning bounds both forms by the candidate lists' exact recall
    recall("ivf_ceiling", Similarity.ivfTopK(emb))
    spark.stop()
  }
}
