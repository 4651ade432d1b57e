package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.ops.{Dedup, Similarity}

/** Incremental ANN index maintenance — the similarity-family analogue of
  * [[IncrementalCuration]]: embeddings arrive continuously, and the IVF
  * index grows by ASSIGNMENT against frozen leaders (the FAISS `add`
  * semantics), never by retraining the coarse quantizer per batch.
  *
  * Stores:
  *  - leader store: the trained `(list_id, lvec, lnorm)` centroids,
  *    written ONCE by the bootstrap batch ([[Similarity.trainLeaders]])
  *    and read-only afterwards — retraining on later data would silently
  *    re-route earlier assignments;
  *  - list store: `(vec_id, list_id, list_cos, embedding, norm)` rows,
  *    appended per batch. The vector RIDES IN THE LIST ROW (how IVF lists
  *    are physically laid out), so probes read one store instead of
  *    joining a separate embedding table; at warehouse scale the store is
  *    written partitioned by `list_id` so a probe prunes to its nprobe
  *    lists.
  *
  * Per-batch cost: one broadcast of [[Similarity.NumLists]] centroids ×
  * one linear scan of the batch — independent of index size.
  * Exactly-once follows the house pattern: checkpointed file tracking +
  * per-batch overwrite directories.
  */
object IncrementalAnnIndex {

  /** One probe against the accumulated stores: for each query vector, rank
    * the `nprobe` nearest lists by leader cosine, then rank the kept
    * members of those lists. Lists keep their `maxListOccupancy` lowest
    * vec_ids, exactly like the batch path ([[Similarity.MaxListOccupancy]])
    * — so a store grown from N batches probes identically to a batch index
    * built over the union.
    */
  def topKFromStore(
      spark: SparkSession,
      leaderPath: String,
      listPath: String,
      queries: DataFrame,
      k: Int = Similarity.TopK,
      nprobe: Int = Similarity.NProbe,
      maxListOccupancy: Int = Similarity.MaxListOccupancy): DataFrame = {
    val cents = spark.read.parquet(leaderPath)
    val lists = spark.read.parquet(listPath).drop("batch")
      .withColumn("lrnk", row_number().over(
        Window.partitionBy("list_id").orderBy("vec_id")))
      .filter(col("lrnk") <= maxListOccupancy)
      .select("vec_id", "list_id", "embedding", "norm")
    val q = queries.select(col("vec_id"), col("embedding"),
      expr(s"sqrt(${Dedup.dot("embedding", "embedding")})").as("norm"))
    val probes = q.crossJoin(broadcast(cents))
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"),
        col("norm").as("qnorm"), col("list_id"),
        (expr(Dedup.dot("embedding", "lvec")) / (col("norm") * col("lnorm")))
          .as("leader_cos"))
      .withColumn("prnk", row_number().over(Window.partitionBy("query_id")
        .orderBy(col("leader_cos").desc, col("list_id"))))
      .filter(col("prnk") <= nprobe)
      .select("query_id", "qvec", "qnorm", "list_id")
    probes.join(lists, Seq("list_id"))
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        (expr(Dedup.dot("qvec", "embedding")) / (col("qnorm") * col("norm")))
          .as("cos_sim"))
      // a neighbor reachable through BOTH probed lists would rank twice
      .distinct()
      .withColumn("rank", row_number().over(Window.partitionBy("query_id")
        .orderBy(col("cos_sim").desc, col("neighbor_id"))))
      .filter(col("rank") <= k)
  }

  /** Drain the landing dir, training leaders on the bootstrap batch and
    * assigning every subsequent batch against them. Returns the list
    * store.
    */
  def run(
      spark: SparkSession,
      landingDir: String,
      checkpointDir: String,
      leaderPath: String,
      listPath: String,
      embSchema: org.apache.spark.sql.types.StructType,
      kmeansIters: Int = 0): DataFrame = {
    def exists(p: String): Boolean = StoragePaths.exists(spark, p)
    val q = spark.readStream.schema(embSchema).parquet(landingDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          if (!exists(leaderPath)) {
            // bootstrap: train once on the first batch; every later batch
            // is an index ADD against these frozen centroids
            val trained = Similarity.trainLeaders(batch, kmeansIters)
            val n = trained.count()
            require(n == Similarity.NumLists.toLong,
              s"IncrementalAnnIndex bootstrap: got $n leaders, need " +
                s"${Similarity.NumLists} — the bootstrap batch must " +
                s"contain the seed vec_ids (< ${Similarity.NumLists})")
            trained.write.parquet(leaderPath)
          }
          val cents = spark.read.parquet(leaderPath)
          val norms = batch.select(col("vec_id"), col("embedding"),
            expr(s"sqrt(${Dedup.dot("embedding", "embedding")})").as("norm"))
          Similarity.assignWithLeaders(batch, cents)
            .join(norms, Seq("vec_id"))
            .select("vec_id", "list_id", "list_cos", "embedding", "norm")
            .write.mode("overwrite").parquet(s"$listPath/batch=$batchId")
        }
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.read.parquet(listPath).drop("batch")
  }
}
