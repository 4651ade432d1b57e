package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ops.{Similarity, SkewJoin}
import graft.streaming.RawLanding
import graft.testdata.{TestFixtures => T}

/** Scale utilities: salted skew join, IVF recall, streaming raw landing. */
class ScaleOpsSpec extends SparkSpec {

  test("salted join equals plain join on skewed data, for inner and left") {
    import spark.implicits._
    // 10k rows of one hot key + tail, joined to a 100-row build side
    val skewed = spark.range(10000)
      .select((when(col("id") % 10 =!= 0, 1L).otherwise(col("id") % 100)).as("k"),
        col("id").as("rowid"))
    val build = spark.range(100).select(col("id").as("k"), (col("id") * 2).as("v"))
    for (jt <- Seq("inner", "left")) {
      val plain = skewed.join(build, Seq("k"), jt)
      val salted = SkewJoin.saltedJoin(skewed, build, Seq("k"), 8, col("rowid"), jt)
      assert(salted.exceptAll(plain).count() == 0, s"$jt: extra rows")
      assert(plain.exceptAll(salted).count() == 0, s"$jt: missing rows")
    }
  }

  test("HLL daily distinct users stays within the configured error bound") {
    import graft.ops.Events
    val ev = T.events(spark, sf)
    val out = Events.dailyUsersApprox(ev, rsd = 0.02)
      .join(Events.dailyUsersExact(ev), Seq("day")).collect()
    assert(out.nonEmpty)
    // HLL++ rsd=0.02 is a standard-deviation bound; 5x gives a hard ceiling
    // that still catches a broken sketch (exact equality is not expected)
    out.foreach { r =>
      val approx = r.getAs[Long]("n_users_approx").toDouble
      val exact = r.getAs[Long]("n_users_exact").toDouble
      assert(math.abs(approx - exact) / exact <= 0.10,
        s"day ${r.get(0)}: approx $approx vs exact $exact")
    }
  }

  test("approx value quantiles honor the sketch's RANK-error guarantee") {
    import graft.ops.Events
    val ev = T.events(spark, sf)
    // Greenwald-Khanna bounds rank error, not value error (value distance
    // to the interpolated exact percentile is unbounded on sparse tails),
    // so assert the rank of each returned value is within tolerance.
    val values = ev.select(col("event_type"), col("value")).collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getDouble(1)).sorted).toMap
    def assertRank(row: org.apache.spark.sql.Row, colName: String, q: Double): Unit = {
      val vs = values(row.getString(0))
      val a = row.getAs[Double](colName)
      val rank = vs.count(_ <= a).toDouble / vs.length
      assert(math.abs(rank - q) <= 0.02,
        s"${row.getString(0)} $colName: value $a has rank $rank, want ~$q")
    }
    val approx = Events.valueQuantilesApprox(ev).collect()
    assert(approx.nonEmpty)
    for (r <- approx; q <- Events.QuantilePoints)
      assertRank(r, s"p${(q * 100).toInt}_approx", q)
    // the exact twin's interpolated values must land at the same ranks
    for (r <- Events.valueQuantilesExact(ev).collect(); q <- Events.QuantilePoints)
      assertRank(r, s"p${(q * 100).toInt}_exact", q)
  }

  test("CMS user frequencies: never underestimate, overestimate bounded") {
    import graft.ops.Events
    val ev = T.events(spark, sf)
    val n = ev.count()
    val bound = 3L * math.ceil(Events.CmsEps * n).toLong
    val out = Events.userCountsCompared(ev).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val exact = r.getAs[Long]("n_events")
      val cms = r.getAs[Long]("n_events_cms")
      // the structural CMS guarantee: counters only add, so an estimate
      // below the true count means the sketch is broken
      assert(cms >= exact, s"user ${r.get(0)}: CMS $cms underestimates $exact")
      assert(cms <= exact + bound,
        s"user ${r.get(0)}: CMS $cms exceeds $exact + $bound")
    }
    // the driver-checkable gate agrees
    assert(Events.userCountsCmsErr(ev).head().getLong(0) == 0L)
    // partitioning invariance: counters are additive and the seed pins
    // the hash family, so a reshuffled input builds the SAME sketch
    val re = Events.userCountsCompared(ev.repartition(7)).collect()
      .map(r => (r.getLong(0), r.getAs[Long]("n_events_cms"))).toMap
    out.foreach { r =>
      assert(re(r.getLong(0)) == r.getAs[Long]("n_events_cms"),
        s"user ${r.get(0)}: estimate changed under repartition")
    }
  }

  test("token shards: distributed prefix sum equals the global running sum") {
    import graft.ops.HashSplit
    val docs = T.table(spark, sf, "documents")
    val out = HashSplit.tokenShards(docs, budget = 1000L)
      .orderBy("doc_id").collect()
    // cum_tokens is the exact running sum in doc_id order — the two-phase
    // offsets reconstruct the single-partition answer
    var running = 0L
    out.foreach { r =>
      running += r.getAs[Long]("n_tok")
      assert(r.getAs[Long]("cum_tokens") == running, s"at doc ${r.getLong(0)}")
      assert(r.getAs[Long]("shard_id") ==
        (r.getAs[Long]("cum_tokens") - r.getAs[Long]("n_tok")) / 1000L)
    }
    // shards are contiguous in doc order and each holds >= 1 doc
    val shardSeq = out.map(_.getAs[Long]("shard_id"))
    assert(shardSeq.sameElements(shardSeq.sorted))
  }

  test("df caps bound the posting-list joins on pathological hot keys") {
    import spark.implicits._
    import graft.ops.{Dedup, HashSplit}
    // every doc shares one boilerplate sentence (3 hot shingles, df = n)
    // plus unique filler — uncapped, ONE hot key pairs every doc with every
    // other (the 100 TB quadratic blowup in miniature)
    val n = 60
    val nPairs = n.toLong * (n - 1) / 2
    val docs = (1 to n).map(i =>
      (i.toLong, s"shared boiler plate sentence here u$i v$i w$i"))
      .toDF("doc_id", "text")
    assert(Dedup.ngramJaccardPairs(docs).count() == nPairs)
    // capped: boilerplate shingles leave candidate generation entirely, so
    // the candidate count is bounded by sum(df²) over df <= cap keys
    assert(Dedup.ngramJaccardPairs(docs, maxDf = 10).count() == 0)
    assert(HashSplit.contaminatedTrainDocs(docs, maxDf = 10).count() == 0)
    // identical documents — one LSH band bucket holding the whole corpus.
    // Over the cap the bucket degrades to STAR candidates: linear (n-1)
    // pairs instead of quadratic, and — the part a plain drop would lose —
    // the giant duplicate family still resolves to ONE cluster.
    val dup = (1 to n).map(i =>
      (i.toLong, "all documents carry identical content here"))
      .toDF("doc_id", "text")
    assert(Dedup.minhashPairs(dup).count() == nPairs)
    val starred = Dedup.minhashPairs(dup, maxBandOccupancy = 10)
    assert(starred.count() == (n - 1).toLong)
    assert(starred.filter(col("is_duplicate") =!= 1).count() == 0)
    val clusters = Dedup.dupClusters(dup,
      starred.filter(col("is_duplicate") === 1))
    assert(clusters.select("cluster_id").distinct().count() == 1)
    // simhash: identical signatures put the whole corpus in one nibble
    // bucket per band — the same star degradation applies
    val shStar = Dedup.simhashPairs(dup, maxBandOccupancy = 10)
    assert(shStar.count() == (n - 1).toLong)
    assert(shStar.filter(col("hamming") =!= 0).count() == 0)
  }

  test("similarity LSH band joins degrade hot buckets to star candidates") {
    import spark.implicits._
    // identical embeddings — the whole corpus lands in ONE nibble bucket per
    // band, the embedding analogue of ScaleOpsSpec's identical-documents
    // fixture: uncapped, that single bucket yields n(n-1)/2 candidate pairs
    val n = 60
    val vec = Array.fill(Similarity.Dim)(0.5f)
    val emb = (1 to n).map(i => (i.toLong, vec)).toDF("vec_id", "embedding")
    assert(Similarity.lshNearDup(emb).count() == n.toLong * (n - 1) / 2)
    // capped: star candidates rooted at the bucket-min vec_id — linear n-1
    // pairs, every one still a verified near-dup (cos 1.0)
    val starred = Similarity.lshNearDup(emb, maxBandOccupancy = 10)
    assert(starred.count() == (n - 1).toLong)
    assert(starred.filter(col("cos_sim") < Similarity.NearDupCosine).count() == 0)
    assert(starred.filter(col("a_id") =!= 1L).count() == 0)
    // top-k: the only query (vec_id 50) is NOT the bucket root (vec_id 1),
    // so the star leaves it exactly one candidate — the root — instead of
    // the 59 co-bucketed members an uncapped join would rank
    val capped = Similarity.lshTopK(emb, maxBandOccupancy = 10)
    assert(capped.count() == 1)
    assert(capped.select("neighbor_id").head().getLong(0) == 1L)
    assert(Similarity.lshTopK(emb).count() == Similarity.TopK)
  }

  test("pair operators free their persisted legs (no session-lifetime cache leak)") {
    import spark.implicits._
    import graft.ops.{Dedup, HashSplit}
    val sc = spark.sparkContext
    val docs = (1 to 40).map(i =>
      (i.toLong, s"alpha beta gamma delta u$i v$i w$i x$i"))
      .toDF("doc_id", "text")
    // Each operator persists corpus-sized legs (shingle relation, candidate
    // set) internally; the contract is that after the call returns, the only
    // block it still holds is the RESULT's own localCheckpoint (freed by the
    // ContextCleaner when the frame goes unreachable). A leak of the legs
    // shows up as >1 newly-registered persistent RDD.
    def newlyPersisted(f: => Unit): Int = {
      val before = sc.getPersistentRDDs.keySet.toSet
      f
      (sc.getPersistentRDDs.keySet.toSet -- before).size
    }
    assert(newlyPersisted(Dedup.minhashPairs(docs).count()) <= 1)
    assert(newlyPersisted(Dedup.ngramJaccardPairs(docs).count()) <= 1)
    assert(newlyPersisted(Dedup.simhashPairs(docs).count()) <= 1)
    assert(newlyPersisted(HashSplit.contaminatedTrainDocs(docs).count()) <= 1)
    assert(newlyPersisted(
      Similarity.ivfTopK(T.table(spark, sf, "embeddings")).count()) <= 1)
    assert(newlyPersisted(
      Similarity.lshNearDup(T.table(spark, sf, "embeddings")).count()) <= 1)
    assert(newlyPersisted(
      Similarity.lshTopK(T.table(spark, sf, "embeddings")).count()) <= 1)
    assert(newlyPersisted(Dedup.keeperByQuality(
      Dedup.exact(docs).select(col("keeper_doc_id").as("doc_id"),
        col("keeper_doc_id").as("cluster_id")),
      docs.select(col("doc_id"), col("doc_id").cast("double").as("quality_score")))
      .count()) <= 1)
  }

  test("salted join rejects join types that would duplicate build rows") {
    import spark.implicits._
    val l = Seq((1L, 1L)).toDF("k", "rowid")
    val r = Seq((1L, 2L)).toDF("k", "v")
    for (jt <- Seq("right", "full", "full_outer"))
      intercept[IllegalArgumentException](
        SkewJoin.saltedJoin(l, r, Seq("k"), 4, col("rowid"), jt))
  }

  test("widened LSH signatures shrink candidates but stay exact-verified") {
    import graft.ops.Dedup
    val emb = T.table(spark, sf, "embeddings")
    // 32 planes / 4 bands = 256 buckets per band (the corpus-growth knob):
    // every returned pair must still be a true near-dup (exact cosine
    // verification runs after candidate generation), i.e. a subset of the
    // quadratic baseline's pairs
    val wide = Similarity.lshNearDup(emb, planes = 32, nBands = 4)
      .select("a_id", "b_id")
    val brute = Dedup.embeddingNearDup(emb).select("a_id", "b_id")
    assert(wide.exceptAll(brute).count() == 0)
    // invalid shapes are rejected at the API boundary
    intercept[IllegalArgumentException](Similarity.signatures(emb, planes = 63))
    intercept[IllegalArgumentException](
      Similarity.signatures(emb, planes = 10, bands = 4))
  }

  test("IVF top-k neighbors agree with brute force cosines; decent recall") {
    val emb = T.table(spark, sf, "embeddings")
    val brute = Similarity.bruteTopK(emb)
      .select(col("query_id"), col("neighbor_id"), col("cos_sim").as("brute_cos"))
      .cache()
    def recallOf(ivf: org.apache.spark.sql.DataFrame): Double = {
      val joined = ivf.join(brute, Seq("query_id", "neighbor_id"), "left").cache()
      // any overlapping pair must carry the identical cosine
      assert(joined.filter(col("brute_cos").isNotNull &&
        col("cos_sim") =!= col("brute_cos")).count() == 0)
      joined.filter(col("brute_cos").isNotNull).count().toDouble / brute.count().toDouble
    }
    val recall = recallOf(Similarity.ivfTopK(emb))
    assert(recall >= 0.2, s"IVF recall $recall collapsed (nprobe=2/16 lists)")
    // Lloyd-refined leaders must keep recall in the same band (on this
    // near-uniform synthetic corpus k-means mostly rebalances lists; the
    // assertion pins that refinement never BREAKS the probe mechanics)
    val kmRecall = recallOf(Similarity.ivfTopK(emb, kmeansIters = 3))
    assert(kmRecall >= 0.2, s"k-means IVF recall $kmRecall collapsed")
  }

  test("IVF per-list occupancy cap bounds probe candidates on a one-cluster corpus") {
    import spark.implicits._
    // identical embeddings: every vector ties to every leader, so the
    // tie-break assigns the WHOLE corpus to one list — probing it uncapped
    // is a full corpus scan per query
    val n = 60
    val vec = Array.fill(Similarity.Dim)(0.5f)
    val emb = (1 to n).map(i => (i.toLong, vec)).toDF("vec_id", "embedding")
    assert(Similarity.ivfAssignments(emb)
      .select("list_id").distinct().count() == 1)
    // capped at 5 members, the only query (vec_id 50) sees exactly the
    // 5 lowest-id members as candidates — not all 59
    val capped = Similarity.ivfTopK(emb, maxListOccupancy = 5)
    assert(capped.count() == 5)
    assert(capped.select("neighbor_id").collect().map(_.getLong(0)).sorted
      .sameElements(Array(1L, 2L, 3L, 4L, 5L)))
    // uncapped the same query ranks the full list and returns k rows
    assert(Similarity.ivfTopK(emb).count() == Similarity.TopK)
    // k-means on a one-cluster corpus converges without dropping lists
    // (seeds = vec_id < NumLists; ids start at 1, so 15 seeds here)
    assert(Similarity.kmeansLeaders(emb, 2).count() ==
      emb.filter(col("vec_id") < Similarity.NumLists).count())
  }

  test("bucketed tables: co-located join plans without a shuffle exchange") {
    import spark.implicits._
    val bars = T.stagedBars(spark, sf).select("ticker", "trade_date", "close")
    val vols = T.stagedBars(spark, sf).select("ticker", "trade_date", "volume")
    bars.write.bucketBy(8, "ticker").sortBy("ticker", "trade_date")
      .mode("overwrite").saveAsTable("bars_bucketed")
    vols.write.bucketBy(8, "ticker").sortBy("ticker", "trade_date")
      .mode("overwrite").saveAsTable("vols_bucketed")
    val joined = spark.table("bars_bucketed")
      .join(spark.table("vols_bucketed"), Seq("ticker", "trade_date"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join should not shuffle:\n$plan")
    assert(joined.count() == bars.count())
    spark.sql("DROP TABLE bars_bucketed")
    spark.sql("DROP TABLE vols_bucketed")
  }

  test("streaming raw landing drains idempotently with exactly-once file tracking") {
    val landing = Files.createTempDirectory("landing")
    val raw = Files.createTempDirectory("rawstream").toString + "/raw"
    val ckpt = Files.createTempDirectory("ckpt").toString + "/c"
    def barJson(t: String, date: String, c: Double): String =
      s"""{"T":"$t","v":100.0,"vw":$c,"o":$c,"c":$c,"h":$c,"l":$c,"n":5,"t_ms":1704067200000,"api_date":"$date"}"""
    Files.writeString(landing.resolve("d1.json"),
      barJson("AAA", "2024-01-02", 10.0) + "\n" + barJson("BBB", "2024-01-02", 20.0) + "\n")

    RawLanding.drainOnce(spark, landing.toString, raw, ckpt)
    val after1 = spark.read.parquet(raw)
    assert(after1.count() == 2)
    assert(after1.schema.fieldNames.contains("INGESTED_AT"))
    assert(after1.filter(col("DATE") === "2024-01-02").count() == 2)

    // replay with no new files: nothing re-ingested
    RawLanding.drainOnce(spark, landing.toString, raw, ckpt)
    assert(spark.read.parquet(raw).count() == 2)

    // a new landed file is picked up exactly once
    Files.writeString(landing.resolve("d2.json"), barJson("CCC", "2024-01-03", 30.0) + "\n")
    RawLanding.drainOnce(spark, landing.toString, raw, ckpt)
    val after3 = spark.read.parquet(raw)
    assert(after3.count() == 3)
    assert(after3.filter(col("T") === "CCC").count() == 1)
  }
}
