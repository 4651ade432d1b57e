package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType, LongType, StructField, StructType}

import graft.ops.{Dedup, Similarity}

/** Incremental ANN index maintenance — the similarity-family analogue of
  * [[IncrementalCuration]]: embeddings arrive continuously, and the IVF
  * index grows by ASSIGNMENT against frozen leaders (the FAISS `add`
  * semantics), never by retraining the coarse quantizer per batch.
  *
  * Stores:
  *  - leader store: the trained `(list_id, lvec, lnorm)` centroids,
  *    written by the BOOTSTRAP batch (the first non-empty one, [[Similarity
  *    .trainLeaders]]) with overwrite — a replay of the bootstrap epoch
  *    retrains and rewrites the identical frame, so a crash mid-write
  *    cannot leave a partial leader set behind; every read re-validates
  *    the leader count. Frozen afterwards: retraining on later data would
  *    silently re-route earlier assignments.
  *  - list store: `(vec_id, list_id, list_cos, embedding, norm)` rows,
  *    appended per batch in one pass ([[Similarity
  *    .assignWithLeadersRetaining]]). The vector RIDES IN THE LIST ROW
  *    (how IVF lists are physically laid out), so probes read one store;
  *    at warehouse scale the store is written partitioned by `list_id` so
  *    a probe prunes to its nprobe lists.
  *
  * Re-landed vec_ids (a re-crawl) are IGNORED — first write wins, matching
  * FAISS `add` (an updated embedding needs an explicit remove+add). The
  * membership check is a vec_id anti-join against the store; at warehouse
  * scale that column read is a Bloom-filter / primary-key probe.
  *
  * Per-batch cost: one broadcast of [[Similarity.NumLists]] centroids ×
  * one linear scan of the batch, plus the membership probe.
  * Exactly-once follows the house pattern: checkpointed file tracking +
  * per-batch overwrite directories.
  */
object IncrementalAnnIndex {

  /** Schema of the list store. */
  val ListSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("list_id", LongType),
    StructField("list_cos", DoubleType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("norm", DoubleType)))

  private def readLeaders(spark: SparkSession, leaderPath: String): DataFrame = {
    val cents = spark.read.parquet(leaderPath)
    val n = cents.count()
    require(n == Similarity.NumLists.toLong,
      s"IncrementalAnnIndex: leader store at $leaderPath holds $n " +
        s"centroids, expected ${Similarity.NumLists} — partial or foreign " +
        "write; rebuild the leader store")
    cents
  }

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
    val cents = readLeaders(spark, leaderPath)
    val lists = spark.read.parquet(listPath).drop("batch")
      .withColumn("lrnk", row_number().over(
        Window.partitionBy("list_id").orderBy("vec_id")))
      .filter(col("lrnk") <= maxListOccupancy)
      .select("vec_id", "list_id", "embedding", "norm")
    val q = Similarity.withNorms(queries)
    val probes = q.crossJoin(broadcast(cents))
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"),
        col("norm").as("qnorm"), col("list_id"),
        (expr(Dedup.dot("embedding", "lvec")) / (col("norm") * col("lnorm")))
          .as("leader_cos"))
      .withColumn("prnk", row_number().over(Window.partitionBy("query_id")
        .orderBy(col("leader_cos").desc, col("list_id"))))
      .filter(col("prnk") <= nprobe)
      .select("query_id", "qvec", "qnorm", "list_id")
    // each stored vector lives in exactly one list, so every
    // (query, neighbor) pair joins at most once — no dedup needed
    probes.join(lists, Seq("list_id"))
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        (expr(Dedup.dot("qvec", "embedding")) / (col("qnorm") * col("norm")))
          .as("cos_sim"))
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
      embSchema: StructType,
      kmeansIters: Int = 0): DataFrame = {
    def exists(p: String): Boolean = StoragePaths.exists(spark, p)
    val q = spark.readStream.schema(embSchema).parquet(landingDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          // one row per vec_id even within the drain (a file and its
          // re-crawl can land in the same AvailableNow batch) — BEFORE
          // bootstrap too, or duplicated seed rows double the leader set
          val uniq = batch.dropDuplicates("vec_id")
          if (!exists(leaderPath)) {
            // bootstrap exactly while no leaders exist — i.e. on the first
            // NON-EMPTY batch. Keying on batchId == 0 as well would brick
            // the stream if epoch 0 ever committed empty (a drain over a
            // not-yet-populated landing dir): every later batch would die
            // in readLeaders with no recovery short of deleting the
            // checkpoint. The exists() guard alone already keeps a store
            // re-entering service under a fresh checkpoint
            // (post-compaction) on its frozen leaders — no retrain, no
            // re-routing of existing assignments. A partial leader
            // write from a crashed bootstrap is not silently trusted —
            // readLeaders fails loudly on a wrong centroid count.
            val trained = Similarity.trainLeaders(uniq, kmeansIters)
            val n = trained.count()
            require(n == Similarity.NumLists.toLong,
              s"IncrementalAnnIndex bootstrap: got $n leaders, need " +
                s"${Similarity.NumLists} — the bootstrap batch must " +
                s"contain the seed vec_ids (< ${Similarity.NumLists})")
            trained.write.mode("overwrite").parquet(leaderPath)
          }
          val cents = readLeaders(spark, leaderPath)
          // first write wins for a re-landed vec_id (FAISS add
          // semantics). The membership read EXCLUDES this batch's own
          // partition: foreachBatch is at-least-once, and a replay after
          // a crash-post-write would otherwise anti-join the batch
          // against its own previously written rows and overwrite
          // batch=N with an empty directory — silent data loss.
          val fresh =
            if (exists(listPath))
              uniq.join(
                spark.read.parquet(listPath)
                  .filter(col("batch").cast("long") =!= batchId)
                  .select("vec_id"),
                Seq("vec_id"), "left_anti")
            else uniq
          Similarity.assignWithLeadersRetaining(fresh, cents)
            .select("vec_id", "list_id", "list_cos", "embedding", "norm")
            .write.mode("overwrite").parquet(s"$listPath/batch=$batchId")
        }
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // a drain that landed nothing never creates the store — return an
    // empty index, not a crash
    if (exists(listPath)) spark.read.parquet(listPath).drop("batch")
    else spark.createDataFrame(new java.util.ArrayList[Row](), ListSchema)
  }
}
