package graft

import org.apache.spark.sql.functions._

import graft.ops._
import graft.testdata.{TestFixtures => T}

/** Dedup / similarity / multimodal invariants beyond the DuckDB oracle. */
class OpsSpec extends SparkSpec {

  private lazy val docs = T.table(spark, sf, "documents").cache()
  private lazy val emb = T.table(spark, sf, "embeddings").cache()

  test("chunk dedup: keep-first across docs, shorter tail chunk, reassembly") {
    import spark.implicits._
    val boiler = "b0 b1 b2 b3 b4 b5 b6 b7" // one exact 8-token chunk
    val d = Seq(
      (1L, s"$boiler u1a u1b u1c u1d u1e u1f u1g u1h tail1 tail2"),
      (2L, s"$boiler u2a u2b u2c u2d u2e u2f u2g u2h"),
      (3L, "solo1 solo2"),
      (4L, "")).toDF("doc_id", "text")
    val audit = Dedup.chunkDedup(d).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_idx")) -> r).toMap
    // doc 1 owns the first occurrence; doc 2's copy is dropped, multiplicity 2
    assert(audit((1L, 0L)).getAs[Boolean]("kept"))
    assert(!audit((2L, 0L)).getAs[Boolean]("kept"))
    assert(audit((2L, 0L)).getAs[Long]("n_copies") == 2L)
    // unique chunks all survive, including doc 1's short 2-token tail chunk
    assert(audit((1L, 2L)).getAs[Boolean]("kept"))
    assert(audit.keys.count(_._1 == 1L) == 3 && audit.keys.count(_._1 == 2L) == 2)
    // token-free docs contribute no chunk rows
    assert(!audit.keys.exists(_._1 == 4L))
    val out = Dedup.chunkDedupDocs(d).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[String]("clean_text") ==
      s"$boiler u1a u1b u1c u1d u1e u1f u1g u1h tail1 tail2")
    assert(out(2L).getAs[String]("clean_text") == "u2a u2b u2c u2d u2e u2f u2g u2h")
    assert(out(2L).getAs[Long]("n_chunks") == 2L && out(2L).getAs[Long]("n_kept") == 1L)
    assert(out(3L).getAs[String]("clean_text") == "solo1 solo2")
    assert(!out.contains(4L))
  }

  test("boilerplate filter: drop-ALL on cross-doc df, intra-doc repeats survive") {
    import spark.implicits._
    val boiler = "b0 b1 b2 b3 b4 b5 b6 b7"    // shared by docs 1 and 2
    val selfrep = "s0 s1 s2 s3 s4 s5 s6 s7"   // twice INSIDE doc 3 only
    val d = Seq(
      (1L, s"$boiler u1a u1b u1c u1d u1e u1f u1g u1h"),
      (2L, s"$boiler u2a u2b u2c u2d u2e u2f u2g u2h"),
      (3L, s"$selfrep $selfrep"),
      (4L, "solo only")).toDF("doc_id", "text")
    val audit = Dedup.boilerplateChunks(d).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_idx")) -> r).toMap
    // the cross-document chunk drops EVERYWHERE — including its first
    // occurrence (the policy difference vs chunkDedup's keep-first)
    assert(!audit((1L, 0L)).getAs[Boolean]("kept"))
    assert(!audit((2L, 0L)).getAs[Boolean]("kept"))
    assert(audit((1L, 0L)).getAs[Long]("df_docs") == 2L)
    // intra-document repetition alone never trips df (distinct docs = 1)
    assert(audit((3L, 0L)).getAs[Boolean]("kept") &&
      audit((3L, 1L)).getAs[Boolean]("kept"))
    assert(audit((3L, 0L)).getAs[Long]("df_docs") == 1L)
    assert(audit((4L, 0L)).getAs[Boolean]("kept"))
    val out = Dedup.boilerplateDocs(d).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[String]("clean_text") ==
      "u1a u1b u1c u1d u1e u1f u1g u1h")
    assert(out(2L).getAs[String]("clean_text") ==
      "u2a u2b u2c u2d u2e u2f u2g u2h")
    assert(out(3L).getAs[String]("clean_text") == s"$selfrep $selfrep")
    // stats: boilerplate chunk count and dropped occurrences line up
    val st = Dedup.boilerplateStats(d).head()
    assert(st.getAs[Long]("n_boilerplate_chunks") == 1L)
    assert(st.getAs[Long]("n_dropped") == 2L)
    assert(st.getAs[Long]("chars_dropped") == 2L * boiler.length)
    // corpus sanity: agree with a driver-side brute force of the policy
    val occ = Dedup.chunkRows(docs).select("doc_id", "chunk_text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val dfDocs = occ.groupBy(_._2).view.mapValues(_.map(_._1).distinct.size).toMap
    val expectDropped = occ.count(o => dfDocs(o._2) >= Dedup.BoilerplateMinDf)
    val corpusSt = Dedup.boilerplateStats(docs).head()
    assert(corpusSt.getAs[Long]("n_dropped") == expectDropped.toLong)
    assert(expectDropped > 0, "fixture must exercise the drop path")
  }

  test("temperature sampling: exact alpha=1/2 thresholds, rarest stratum intact") {
    val th = Sampling.temperatureThresholds(docs).collect()
      .map(r => r.getAs[String]("stratum") ->
        (r.getAs[Long]("n_total"), r.getAs[Long]("threshold"))).toMap
    val nMin = th.values.map(_._1).min
    th.foreach { case (s, (n, t)) =>
      // bit-exact contract: floor(1e6 * sqrt(n_min / n)) — the same IEEE
      // steps the operator and the oracle both take
      val expect = math.floor(1e6 * math.sqrt(nMin.toDouble / n)).toLong
      assert(t == expect, s"$s: threshold $t != $expect")
    }
    // the rarest stratum keeps everything; bigger strata thin monotonically
    assert(th.values.exists { case (n, t) => n == nMin && t == Portable.SampleMod })
    val byN = th.values.toSeq.sortBy(_._1)
    byN.zip(byN.tail).foreach { case ((_, t1), (_, t2)) => assert(t1 >= t2) }
    // realized mix ∝ sqrt(n): kept counts follow q ∝ p^(1/2) within
    // binomial noise — the distributional point of the operator
    val sum = Sampling.temperatureSummary(docs).collect()
      .map(r => r.getAs[String]("stratum") ->
        (r.getAs[Long]("n_total"), r.getAs[Long]("n_kept"))).toMap
    sum.foreach { case (s, (n, k)) =>
      val expect = n * math.sqrt(nMin.toDouble / n)
      assert(math.abs(k - expect) <= 4 * math.sqrt(expect) + 1,
        s"$s: kept $k vs expected $expect")
    }
    // audit identity, and the assignment joins the SAME thresholds
    val a = Sampling.temperatureAssign(docs)
    assert(a.filter(col("kept") =!= (col("bucket") < col("threshold"))).count() == 0)
    assert(a.count() == docs.count())
    val aTh = a.select("stratum", "threshold").distinct().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(aTh == th.view.mapValues(_._2).toMap)
  }

  test("semdedup: within-list lowest-id keeper, orthogonal vectors survive") {
    import spark.implicits._
    def v(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray
    val e = Seq(
      (0L, v(1, 0, 0, 0)), (1L, v(0, 1, 0, 0)),
      (2L, v(0, 0, 1, 0)), (3L, v(0, 0, 0, 1)),
      (20L, v(0, 0, 0, 2)),      // same direction as 3 → dup_of 3
      (21L, v(1, 1, 0, 0)),      // cos .707 with leader 0 → dup_of 0
      (22L, v(-1, 0.01, 0, 0))   // lands in list 1 at cos ~.01 → kept
    ).toDF("vec_id", "embedding")
    val out = Similarity.semDedup(e).collect()
      .map(r => r.getAs[Long]("vec_id") -> r).toMap
    assert(out.size == 7)
    for (id <- Seq(0L, 1L, 2L, 3L, 22L)) {
      assert(out(id).getAs[Boolean]("kept"), s"vec $id should survive")
      assert(out(id).isNullAt(out(id).fieldIndex("dup_of")))
    }
    assert(!out(20L).getAs[Boolean]("kept") && out(20L).getAs[Long]("dup_of") == 3L)
    assert(!out(21L).getAs[Boolean]("kept") && out(21L).getAs[Long]("dup_of") == 0L)
    // audit is total: one row per input vector, kept ⇔ dup_of is null
    assert(out.values.forall(r =>
      r.getAs[Boolean]("kept") == r.isNullAt(r.fieldIndex("dup_of"))))
  }

  test("semdedup head cap: dups of head members drop, beyond-head dups keep (documented)") {
    import spark.implicits._
    def v(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray
    // list 3 members by id: 3 (head under cap=1), 20, 30; 20 dups 3; 30
    // is orthogonal to 3 but identical in direction to 20
    val e = Seq(
      (0L, v(1, 0, 0, 0)), (1L, v(0, 1, 0, 0)),
      (2L, v(0, 0, 1, 0)), (3L, v(0, 0, 0, 1)),
      (20L, v(0, 0, 0, 3)),
      (30L, v(0, 0, 0, 2))
    ).toDF("vec_id", "embedding")
    val out = Similarity.semDedup(e, maxListOccupancy = 1).collect()
      .map(r => r.getAs[Long]("vec_id") -> r).toMap
    assert(!out(20L).getAs[Boolean]("kept") && out(20L).getAs[Long]("dup_of") == 3L)
    // 30 also dups 3 via the head — the cap still catches family members
    // through the head exemplar
    assert(!out(30L).getAs[Boolean]("kept") && out(30L).getAs[Long]("dup_of") == 3L)
    // stats invariants on the real corpus: kept occurrences == distinct
    // chunks, occurrences == kept + dropped
    val st = Dedup.chunkDedupStats(docs).head()
    assert(st.getAs[Long]("n_occurrences") ==
      st.getAs[Long]("n_distinct_chunks") + st.getAs[Long]("n_dropped"))
  }

  test("target sampling derives ceiling thresholds and hits the mix") {
    val t = Sampling.targetThresholds(docs, 40L).collect()
      .map(r => r.getAs[String]("stratum") ->
        (r.getAs[Long]("n_total"), r.getAs[Long]("threshold"))).toMap
    t.foreach { case (s, (n, th)) =>
      val expected = math.min(graft.ops.Portable.SampleMod,
        (40L * graft.ops.Portable.SampleMod + n - 1) / n)
      assert(th == expected, s"stratum $s: threshold $th != $expected")
    }
    // a stratum at-or-under target keeps everything; realized counts land
    // within hash-bucket noise of the target otherwise
    val kept = Sampling.targetAssign(docs, 40L)
      .filter(col("kept")).groupBy("stratum").count().collect()
      .map(r => r.getAs[String]("stratum") -> r.getAs[Long]("count")).toMap
    t.foreach { case (s, (n, _)) =>
      if (n <= 40L) assert(kept.getOrElse(s, 0L) == n,
        s"stratum $s under target must keep all $n")
      else {
        val k = kept.getOrElse(s, 0L).toDouble
        assert(k >= 20 && k <= 80,
          s"stratum $s kept $k, expected ≈40 within binomial noise")
      }
    }
  }

  test("exact dedup: injected duplicate collapses to one keeper with n_copies=2") {
    import spark.implicits._
    val d = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma delta"),
      (3L, "something else entirely")).toDF("doc_id", "text")
    val out = Dedup.exact(d).collect()
    assert(out.length == 2)
    val dup = out.find(_.getAs[Long]("n_copies") == 2L).get
    assert(dup.getAs[Long]("keeper_doc_id") == 1L)
  }

  test("minhash pairs: identical long texts are certain duplicates, jaccard 1") {
    import spark.implicits._
    val txt = (1 to 30).map(i => s"tok$i").mkString(" ")
    val d = Seq((1L, txt), (2L, txt), (3L, "wholly different words " * 8))
      .toDF("doc_id", "text")
    val pairs = Dedup.minhashPairs(d).collect()
    assert(pairs.exists(r => r.getAs[Long]("a_id") == 1L && r.getAs[Long]("b_id") == 2L &&
      r.getAs[Double]("jaccard") == 1.0 && r.getAs[Int]("is_duplicate") == 1))
  }

  test("simhash: identical texts hash identically (hamming 0)") {
    import spark.implicits._
    val txt = (1 to 30).map(i => s"tok$i").mkString(" ")
    val d = Seq((1L, txt), (2L, txt)).toDF("doc_id", "text")
    val p = Dedup.simhashPairs(d).collect()
    assert(p.length == 1 && p.head.getAs[Long]("hamming") == 0L)
  }

  test("LSH near-dup is a subset of exact near-dup with identical cosines") {
    val exact = Dedup.embeddingNearDup(emb).withColumnRenamed("cos_sim", "exact_cos")
    val lsh = Similarity.lshNearDup(emb)
    val joined = lsh.join(exact, Seq("a_id", "b_id"), "left").cache()
    assert(joined.filter(col("exact_cos").isNull).count() == 0, "LSH pair not in exact set")
    assert(joined.filter(col("cos_sim") =!= col("exact_cos")).count() == 0)
    val recall = lsh.count().toDouble / exact.count().toDouble
    assert(recall >= 0.25, s"LSH recall $recall collapsed") // 4×4-bit bands ⇒ partial recall by design
  }

  test("LSH top-k ranks consistently with brute force on shared candidates") {
    val brute = Similarity.bruteTopK(emb)
      .select(col("query_id"), col("neighbor_id"), col("cos_sim").as("brute_cos"))
    val lsh = Similarity.lshTopK(emb)
    val joined = lsh.join(brute, Seq("query_id", "neighbor_id"), "inner")
    assert(joined.filter(col("cos_sim") =!= col("brute_cos")).count() == 0)
  }

  test("mapPartitions decode path agrees with the expression path exactly") {
    val expr = Multimodal.byteStats(docs)
    val mp = Multimodal.decodeFeatures(spark, docs).toDF()
    assert(mp.exceptAll(expr).count() == 0)
    assert(expr.exceptAll(mp).count() == 0)
  }

  test("frame sampling covers every video with stride-2 indices") {
    val fs = Multimodal.frameSample(docs).cache()
    assert(fs.filter(col("frame_idx") % 2 =!= 0).count() == 0)
    val videos = Multimodal.media(docs).filter(col("media_type") === "video")
    assert(fs.select("media_id").distinct().count() == videos.count())
  }

  test("dup clusters: chains collapse to min-id component, singletons self-cluster") {
    import spark.implicits._
    val d = Seq(1L, 2L, 3L, 4L, 9L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("a_id", "b_id") // a chain
    val out = Dedup.dupClusters(d, pairs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(out(_)._1 == 1L))
    assert(out(1L)._2 == 1 && out(2L)._2 == 0)
    assert(out(9L) == (9L, 1)) // singleton keeps itself
  }

  test("keeper-by-quality keeps exactly the best-quality doc per cluster") {
    import spark.implicits._
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (9L, 9L))
      .toDF("doc_id", "cluster_id")
    val quality = Seq((1L, 0.5), (2L, 0.9), (3L, 0.9), (9L, 0.1))
      .toDF("doc_id", "quality_score")
    val out = Dedup.keeperByQuality(clusters, quality).collect()
      .map(r => r.getLong(0) -> r.getInt(3)).toMap
    // doc 2 wins the tie with doc 3 on lower id; min-id doc 1 loses on quality
    assert(out == Map(1L -> 0, 2L -> 1, 3L -> 0, 9L -> 1))
  }

  test("keeper-by-quality edge cases: -inf beats unscored; null cluster survives") {
    import spark.implicits._
    // doc 5 is SCORED -Infinity, doc 7 has no quality row: any scored doc
    // outranks any unscored one, so 5 is keeper despite the lower id 7...
    val clusters = Seq((5L, Some(4L)), (7L, Some(4L)), (8L, None))
      .toDF("doc_id", "cluster_id")
    val quality = Seq((5L, Double.NegativeInfinity)).toDF("doc_id", "quality_score")
    val out = Dedup.keeperByQuality(clusters, quality).collect()
      .map(r => r.getLong(0) -> r.getInt(3)).toMap
    assert(out(5L) == 1 && out(7L) == 0)
    // ...and a null cluster_id keeps its row (null-safe join-back)
    assert(out.contains(8L) && out(8L) == 1)
  }

  test("language-ID assigns 'und' only to marker-free docs") {
    val lid = TextAnalysis.languageId(docs)
    val und = lid.filter(col("predicted_lang") === "und")
    val markers = Portable.langMarkers.flatMap(_._2)
    assert(und.filter(col("score_en") > 0 || col("score_de") > 0 ||
      col("score_es") > 0 || col("score_fr") > 0 || col("score_zh") > 0).count() == 0)
  }

  test("repetition: looped text flags, flat text passes, short docs keep rows") {
    import spark.implicits._
    val looped = ("spam ham " * 20).trim // "spam ham" covers ~89% of chars
    val flat = (1 to 40).map(i => s"w$i").mkString(" ")
    val d = Seq((1L, looped), (2L, flat), (3L, ""), (4L, "single"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.repetition(d).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out.size == 4) // every doc keeps a row, gram-free ones included
    assert(out(1L).getAs[Boolean]("flagged_repetitive"))
    assert(out(1L).getAs[Double]("top_bigram_char_frac") > 0.5)
    assert(out(1L).getAs[Double]("dup_5gram_char_frac") > 0.5)
    assert(!out(2L).getAs[Boolean]("flagged_repetitive"))
    assert(out(2L).getAs[Double]("dup_5gram_char_frac") == 0.0)
    assert(out(3L).getAs[Double]("top_bigram_char_frac") == 0.0)
    assert(out(4L).getAs[Double]("top_trigram_char_frac") == 0.0)
  }

  test("pii scan: counts each kind, redacts in place, clean docs untouched") {
    import spark.implicits._
    val d = Seq(
      (1L, "mail a.b@x.org or c@d.io, host 10.0.0.1, call 555-123-4567 now"),
      (2L, "no pii here at all")).toDF("doc_id", "text")
    val out = TextAnalysis.piiScan(d).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Long]("n_emails") == 2L)
    assert(out(1L).getAs[Long]("n_ipv4s") == 1L)
    assert(out(1L).getAs[Long]("n_phones") == 1L)
    assert(out(1L).getAs[Boolean]("has_pii"))
    assert(out(1L).getAs[String]("redacted_text") ==
      "mail <EMAIL> or <EMAIL>, host <IP>, call <PHONE> now")
    assert(!out(2L).getAs[Boolean]("has_pii"))
    assert(out(2L).getAs[String]("redacted_text") == "no pii here at all")
  }

  test("stratified sample: pure function of key, zh keeps all, audit holds") {
    val a1 = Sampling.stratifiedAssign(docs)
    val a2 = Sampling.stratifiedAssign(docs)
    assert(a1.except(a2).isEmpty && a2.except(a1).isEmpty) // deterministic
    // audit identity: kept == bucket < threshold, row by row
    assert(a1.filter(col("kept") =!= (col("bucket") < col("threshold"))).count() == 0)
    // the sampled corpus is exactly the kept ids
    val corpusIds = Sampling.stratifiedSample(docs).select("doc_id")
    val keptIds = a1.filter(col("kept")).select("doc_id")
    assert(corpusIds.except(keptIds).isEmpty && keptIds.except(corpusIds).isEmpty)
    // rate-1.0 stratum keeps everything; summary internally consistent
    val sum = Sampling.sampleSummary(docs).collect()
      .map(r => r.getAs[String]("stratum") -> r).toMap
    sum.get("zh").foreach { r =>
      assert(r.getAs[Long]("n_kept") == r.getAs[Long]("n_total"))
    }
    sum.values.foreach { r =>
      assert(r.getAs[Double]("realized_rate") ==
        r.getAs[Long]("n_kept").toDouble / r.getAs[Long]("n_total"))
    }
  }

  test("source cap: deterministic hash-ordered keep-K per source") {
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    val c1 = rows(Sampling.sourceCap(docs, cap = 2))
    assert(c1 == rows(Sampling.sourceCap(docs, cap = 2))) // deterministic
    // the cap binds per source, and a source with <= cap docs keeps all
    val totals = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val perSource = c1.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    totals.foreach { case (src, n) =>
      assert(perSource(src) == math.min(n, 2L),
        s"$src: kept ${perSource(src)} of $n at cap 2")
    }
    // survivors are elected by the lowest salted hashes: every kept row's
    // hash is <= every dropped same-source row's hash
    val all = rows(Sampling.sourceCap(docs, cap = Int.MaxValue))
    val keptIds = c1.map(_._1)
    val maxKept = c1.groupBy(_._2).view.mapValues(_.map(_._3).max).toMap
    val outRanked = all.filter(r =>
      !keptIds.contains(r._1) && r._3 < maxKept(r._2))
    assert(outRanked.isEmpty,
      s"a dropped row must never out-rank a kept row of its source: $outRanked")
    // the election is hash-shuffled, not doc_id order: at cap 2 some
    // source must keep a doc that is not among its two lowest ids
    // (guards against the hash silently degrading to identity)
    val lowestTwo = docs.select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._2).values.flatMap(_.map(_._1).sorted.take(2)).toSet
    assert(keptIds.exists(!lowestTwo.contains(_)))
  }
}
