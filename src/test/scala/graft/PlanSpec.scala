package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.api.Queries
import graft.models.{FctTradingMomentum, IntRussellDaily}
import graft.ops.{AsOfJoin, Curation, Dedup, Relational, Sampling, Similarity, TextAnalysis}
import graft.testdata.{TestFixtures => T}

/** Physical-plan assertions for the scale-critical operators: these pin the
  * properties that make the operators survive a 100 TB / 1000-executor
  * deployment — column-pruned scans, pushed filters, broadcast of the SMALL
  * side, top-k instead of global sort, single-shuffle as-of. A regression
  * here can pass every value-correctness test and still be a disaster at
  * scale, so the plans are contract, not implementation detail.
  */
class PlanSpec extends SparkSpec {

  private def plan(df: DataFrame): String = {
    // suites share one session; a sibling suite's cache would swap the
    // asserted FileScan for an InMemoryTableScan
    spark.catalog.clearCache()
    df.queryExecution.executedPlan.toString
  }

  /** Physical-plan node names (pre-AQE, subqueries included) — assertions on
    * OPERATOR PRESENCE collect nodes instead of grepping rendered text, so
    * they can't false-match a word inside an expression or a comment.
    * Scan METADATA (ReadSchema / PushedFilters / PartitionFilters) has no
    * node-level API and stays a rendered-string check via [[plan]].
    */
  private def nodes(df: DataFrame): Seq[String] = {
    spark.catalog.clearCache()
    // post-EnsureRequirements (exchanges/sorts inserted), pre-execution:
    // unwrap AQE to its initial plan rather than collecting one opaque
    // AdaptiveSparkPlan node
    val p = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.initialPlan
      case other => other
    }
    p.collectWithSubqueries { case n => n.nodeName }
  }

  test("text token stats: parquet scan prunes to (doc_id, text)") {
    val p = plan(TextAnalysis.tokenStats(T.table(spark, sf, "documents")))
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"), p)
  }

  test("winnow gram relation: parquet scan prunes to (doc_id, text)") {
    // the gram relation is the whole cost of winnowing at corpus scale —
    // its scan must shed every other document column, and its windows are
    // doc_id-partitioned (the battery-wide unpartitioned-window guard
    // cannot see through the operator's eager materialization, so pin the
    // pre-checkpoint shape here)
    val g = graft.ops.Dedup.gramRows(
      T.table(spark, sf, "documents"), graft.ops.Dedup.WinnowK)
    val p = plan(g)
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"), p)
  }

  test("point-in-time constituents join broadcasts the dimension (J1)") {
    val ns = nodes(IntRussellDaily.buildFull(
      T.stagedBars(spark, sf), T.constituents(spark, sf)))
    assert(ns.contains("BroadcastHashJoin"), ns)
    // the range predicate rides the broadcast join, not a cartesian filter
    assert(!ns.contains("CartesianProduct"), ns)
  }

  test("brand volume broadcasts the part dimension, aggregates partially") {
    val q = Relational.brandVolume(
      T.table(spark, sf, "lineitem"), T.table(spark, sf, "part"))
    val ns = nodes(q)
    assert(ns.contains("BroadcastHashJoin"), ns)
    // map-side combine: two HashAggregates around the exchange
    assert(ns.count(_ == "HashAggregate") >= 2, ns)
    assert(plan(q).contains("PushedFilters: [IsNotNull(l_partkey)]"))
  }

  test("ticker history and screener run as top-k, not global sort") {
    val fct = FctTradingMomentum.buildFull(IntRussellDaily.buildFull(
      T.stagedBars(spark, sf), T.constituents(spark, sf)))
    val hist = nodes(Queries.tickerHistory(fct, "S07",
      java.sql.Date.valueOf("1995-01-01"), java.sql.Date.valueOf("1998-12-31")))
    assert(hist.contains("TakeOrderedAndProject"), hist)
    val dim = graft.models.DimSecuritiesCurrent.build(fct)
    val scr = nodes(Queries.screener(dim, Queries.ScreenerFilter(rsiLo = Some(20))))
    assert(scr.contains("TakeOrderedAndProject"), scr)
  }

  test("topCustomers is two-phase top-k, not a global window rank") {
    val ns = nodes(Relational.topCustomers(T.table(spark, sf, "lineitem"),
      T.table(spark, sf, "orders"), T.table(spark, sf, "customer")))
    // phase 1: per-partition top-k + driver merge; the rank window then
    // runs over ≤ k rows instead of the whole customer aggregate
    assert(ns.contains("TakeOrderedAndProject"), ns)
  }

  test("no unpartitioned window over unbounded input (SparkEntry battery)") {
    import org.apache.spark.sql.catalyst.plans.logical.{GlobalLimit, LocalLimit, Window => LWindow}
    // A window with no PARTITION BY funnels its entire input through ONE
    // task — at 100 TB that task never finishes. Allowed only when the
    // window's input is bounded: a limit beneath it in the plan, or a
    // relation whose cardinality is bounded by construction (whitelist,
    // with the bounding argument spelled out).
    val boundedByDesign = Map(
      "stock_breadth" -> "cumulative A/D line: one row per trading day",
      "api_breadth_trend" -> "same breadth relation (one row per day)",
      "split_token_shards" ->
        "offsets leg of the two-phase prefix sum: one row per range partition",
      "curate_token_shards" ->
        "same two-phase prefix sum over the curated subset",
      "stock_volume_deciles" ->
        "ntile(10) is a global rank over the per-ticker aggregate by definition",
      "sample_temperature_assign" ->
        "corpus-wide min over the PER-STRATUM count relation: one row per stratum",
      "sample_temperature_summary" ->
        "same per-stratum threshold relation (one row per stratum)",
      "sql_temperature_by_source" ->
        "same per-stratum threshold relation via the temp_assign view")
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot { case (name, _) => boundedByDesign.contains(name) }
      .flatMap { case (name, fn) =>
        // analyzed plan, not optimized: cache substitution (memoized marts)
        // would hide the mart-build windows behind an InMemoryRelation
        fn(spark, sf).queryExecution.analyzed.collect {
          case w: LWindow if w.partitionSpec.isEmpty &&
              w.child.collectFirst {
                case g: GlobalLimit => g
                case l: LocalLimit => l
              }.isEmpty =>
            s"$name: ${w.windowExpressions.map(_.name).mkString(",")}"
        }
      }
    assert(offenders.isEmpty,
      s"unpartitioned windows over unbounded input:\n${offenders.mkString("\n")}")
  }

  test("stratified sampling is one narrow scan — no exchange, no join") {
    // the keep decision is row-local; any Exchange here means someone
    // reintroduced the assignment self-join
    val ns = nodes(Sampling.stratifiedSample(T.table(spark, sf, "documents")))
    assert(!ns.exists(n => n.contains("Exchange") || n.contains("Join")), ns)
  }

  test("source cap is a two-phase rank-limit over a two-column scan") {
    val q = Sampling.sourceCap(T.table(spark, sf, "documents"))
    // the election reads (doc_id, source) only — never text
    assert(plan(q).contains("ReadSchema: struct<doc_id:bigint,source:string>"),
      plan(q))
    // and sheds beyond-cap rows per partition BEFORE the shuffle: a
    // billion-document domain crosses the wire as ~cap rows per partition
    val unwrapped = q.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.initialPlan
      case other => other
    }
    val modes = unwrapped.collectWithSubqueries {
      case w: org.apache.spark.sql.execution.window.WindowGroupLimitExec =>
        w.mode.toString }
    assert(modes.contains("Partial"), s"WindowGroupLimit modes: $modes")
  }

  test("curation audit stays within its corpus-scan budget") {
    // Scan budget at 100 TB: the keeper leg arrives pre-materialized (flat
    // checkpointed RDD — its dedup chain is shared and already bounded), so
    // the audit itself may read the corpus at most 5 times: 4 inside the
    // repetition metrics (the 2/3/5-gram union legs + the n_chars join —
    // the documented explode-over-window trade) and ONE combined row-gates
    // projection for sampling + split. A sixth scan means someone split the
    // row-level gates back into separate joined relations.
    val docs = T.table(spark, sf, "documents")
    val audited = Curation.audit(docs, Dedup.minhashDupClusters(docs))
    val scans = nodes(audited).count(_.startsWith("Scan parquet"))
    assert(scans <= 5, s"audit reads the corpus $scans times (budget 5)")
  }

  test("brute-force ANN broadcasts the query side, streams the corpus") {
    val q = Similarity.bruteTopK(T.table(spark, sf, "embeddings"))
    assert(nodes(q).contains("BroadcastNestedLoopJoin"), nodes(q))
    assert(plan(q).contains("BroadcastNestedLoopJoin BuildLeft")) // build SIDE
    // partial per-partition top-k before the shuffle (WindowGroupLimit)
    assert(nodes(q).contains("WindowGroupLimit"), nodes(q))
  }

  test("as-of join is one shuffle over the key, with pushed event filters") {
    val ev = T.events(spark, sf)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("event_id", "ts", "user_id", "value")
    val views = ev.filter(col("event_type") === "view")
      .groupBy("user_id", "ts").agg(max("event_id").as("view_event_id"))
    val q = AsOfJoin.asofJoin(purchases, views, Seq("user_id"), "ts", "ts",
      Seq("view_event_id"))
    assert(plan(q).contains(
      "PushedFilters: [IsNotNull(event_type), EqualTo(event_type,purchase)]"))
    // exactly one window pass; shuffles = one for the view-leg pre-agg plus
    // one on the key for the union window — no join-shaped explosion
    val ns = nodes(q)
    assert(ns.count(_ == "Window") == 1, ns)
    assert(ns.count(_ == "Exchange") == 2, ns)
    assert(!ns.contains("SortMergeJoin") && !ns.contains("CartesianProduct"), ns)
  }

  test("chunk dedup audit scans (doc_id, text) only and sheds chunk_text") {
    val q = Dedup.chunkDedup(T.table(spark, sf, "documents"))
    val p = plan(q)
    // column pruning reaches the parquet scan: the audit never reads
    // lang/source/n_chars
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"), p)
    // the first-occurrence shuffle carries digests, not chunk text — the
    // documented id-width-exchange property. chunk_text must not appear in
    // any Exchange's output schema (it would multiply shuffle bytes by the
    // chunk width)
    val unwrapped = q.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.initialPlan
      case other => other
    }
    val exchanges = unwrapped.collectWithSubqueries {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
        e.output.map(_.name)
    }
    assert(exchanges.nonEmpty && exchanges.forall(!_.contains("chunk_text")),
      exchanges.toString)
  }

  test("semDedup head election ranks id-width rows — no vector-carrying window") {
    import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}
    import org.apache.spark.sql.types.ArrayType
    // the un-checkpointed plan (semDedup's public output is localCheckpoint-
    // flattened, which would hide the election shape)
    val (out, _) = Similarity.semDedupPlan(T.table(spark, sf, "embeddings"),
      Similarity.NearDupCosine, 0, Similarity.MaxListOccupancy)
    spark.catalog.clearCache()
    val unwrapped = out.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.initialPlan
      case other => other
    }
    // the hot-list guard: no per-list window (election or rank) may carry
    // an array (vector) column through its sort — a degenerate corpus that
    // lands in one IVF list would funnel every embedding through one task
    def perListWithVectors(part: Seq[org.apache.spark.sql.catalyst.expressions.Expression],
        child: org.apache.spark.sql.execution.SparkPlan): Boolean =
      part.exists(_.references.exists(_.name == "list_id")) &&
        child.output.exists(_.dataType.isInstanceOf[ArrayType])
    val offenders = unwrapped.collectWithSubqueries {
      case w: WindowExec if perListWithVectors(w.partitionSpec, w.child) =>
        s"Window[${w.child.output.map(_.name).mkString(",")}]"
      case w: WindowGroupLimitExec if perListWithVectors(w.partitionSpec, w.child) =>
        s"WindowGroupLimit[${w.child.output.map(_.name).mkString(",")}]"
    }
    assert(offenders.isEmpty, s"vector-carrying per-list windows: $offenders")
    // and the rank-limit actually runs two-phase: a Partial WindowGroupLimit
    // sheds beyond-cap ids per input partition BEFORE the election shuffle
    val modes = unwrapped.collectWithSubqueries {
      case w: WindowGroupLimitExec => w.mode.toString }
    assert(modes.contains("Partial"), s"WindowGroupLimit modes: $modes")
  }

  test("IVF assignment (semdedup/ivf leg) broadcasts centroids, streams the corpus") {
    // the shared coarse-quantize leg of semDedup / ivfTopK / the
    // incremental index add: crossJoin(broadcast(cents)) — the corpus
    // streams once; no shuffle-join against the 16-row centroid relation
    // (semDedup's own output plan is checkpoint-flattened, so the leg is
    // asserted here)
    val e = T.table(spark, sf, "embeddings")
    val ns = nodes(Similarity.ivfAssignments(e))
    assert(ns.contains("BroadcastNestedLoopJoin"), ns)
    assert(!ns.contains("SortMergeJoin"), ns)
  }

  test("PQ encode is a shuffle-free pruned projection") {
    // the whole selling point of the code store: encoding 10^10 vectors is
    // ONE embarrassingly-parallel scan — any Exchange here means the
    // encode kernel regressed into a join/aggregate formulation
    val q = graft.ops.Pq.codes(T.table(spark, sf, "embeddings"))
    val ns = nodes(q)
    assert(!ns.exists(_.contains("Exchange")), ns)
    assert(!ns.exists(_.contains("Join")), ns)
    assert(plan(q).contains("ReadSchema: struct<vec_id:bigint,embedding:array<float>>"))
  }

  test("PQ ADC search is one broadcast fan-out, no distance-table joins") {
    // r15: the per-subspace distance-table joins folded into one codegen'd
    // projection over the splatted codebook literals — the code relation
    // streams through exactly ONE broadcast join (the query fan-out), and
    // nothing may shuffle the (at scale 10^10-row) code store
    val ns = nodes(graft.ops.Pq.adcTopK(T.table(spark, sf, "embeddings")))
    assert(ns.count(_.contains("Join")) == 1, ns)
    assert(ns.contains("BroadcastNestedLoopJoin"), ns)
    assert(!ns.contains("SortMergeJoin"), ns)
    // the one shuffle is the final per-query top-k
    assert(ns.count(_ == "Exchange") <= 1, ns)
  }

  test("residual code store: leaders broadcast, one id-keyed join at most") {
    // the residual encode pays one genuine corpus-self join (assignment ⋈
    // vector fetch, both vec_id-keyed — co-partitionable at any scale);
    // the 16-row leader relation must ride broadcasts on BOTH uses
    // (assignment ranking and the lvec subtraction), and nothing else may
    // shuffle-join
    val q = graft.ops.Pq.ivfpqCodes(T.table(spark, sf, "embeddings"))
    val ns = nodes(q)
    assert(ns.contains("BroadcastNestedLoopJoin"), ns) // leaders crossJoin
    assert(ns.count(_ == "SortMergeJoin") <= 1, ns)
  }

  test("IVFPQ candidate generation broadcasts leaders, carries no vectors") {
    // ivfpqTopK's own output plan is checkpoint-flattened
    // (materializeFreeing — the semDedup situation), so its two legs are
    // asserted at their shared seams: the probe-candidate leg here (ONE
    // construction with ivfTopK), and the one-projection ADC distance via
    // the ADC-search test above (ONE adcDistSql spelling for both paths)
    val (cand, assign) =
      Similarity.ivfProbeCandidates(T.table(spark, sf, "embeddings"))
    try {
      val ns = nodes(cand)
      assert(ns.contains("BroadcastNestedLoopJoin"), ns) // leaders crossJoin
      // the probes⋈assignment join co-partitions on list_id (a genuine
      // shuffle join — at scale neither side broadcasts); what must NOT
      // happen is vectors riding it: candidate rows are id-width
      assert(!cand.schema.fieldNames.contains("embedding"))
      assert(ns.count(_ == "WindowGroupLimit") >= 2, ns) // two-phase caps
    } finally assign.unpersist(blocking = false)
  }

  test("cross-set contamination broadcasts the probe side") {
    // corpus bands stream through broadcast joins of the (small) eval
    // side — band candidates and the exact verify both; shuffling the
    // corpus against an eval set thousands of times smaller is the wrong
    // build side at any scale
    val e = T.table(spark, sf, "embeddings")
    val probe = e.filter(col("vec_id") >= 450)
    val ns = nodes(Similarity.crossSetContamination(e, probe))
    assert(ns.count(_ == "BroadcastHashJoin") >= 2, ns)
    assert(!ns.contains("SortMergeJoin"), ns)
  }

  test("BM25 joins df/query/stats relations as broadcasts") {
    // the posting relation is the only large side; df (≤ vocabulary),
    // the query VALUES, and the 1-row stats aggregate all broadcast
    val ns = nodes(graft.ops.Retrieval.bm25TopK(T.table(spark, sf, "documents")))
    assert(ns.count(_ == "BroadcastHashJoin") >= 2, ns)
    assert(ns.contains("BroadcastNestedLoopJoin"), ns) // 1-row stats cross join
    assert(!ns.contains("SortMergeJoin"), ns)
  }

  test("CMS frequency ops scan user_id only — one narrow pass each") {
    // the sketch build and the exact twin both prune the six-column
    // events table to the one column they aggregate; at 100 TB the
    // difference between this and a full-width scan IS the query cost
    val p = plan(graft.ops.Events.userCountsSketch(T.events(spark, sf)))
    assert(p.contains("ReadSchema: struct<user_id:bigint>"), p)
    val p2 = plan(graft.ops.Events.userCountsExact(T.events(spark, sf)))
    assert(p2.contains("ReadSchema: struct<user_id:bigint>"), p2)
    // both are partial-aggregation shapes: counters merge map-side, so
    // the exchange carries sketch/count partials, never raw events
    val ns = nodes(graft.ops.Events.userCountsSketch(T.events(spark, sf)))
    assert(!ns.exists(_.contains("SortMergeJoin")), ns)
  }

  test("DSIR weights join the ratio table as a broadcast") {
    // the ≤1024-row integerized log-ratio table is the broadcast constant
    // that makes per-document weighting a single pass at any corpus size
    val ns = nodes(graft.ops.Dsir.weights(T.table(spark, sf, "documents")))
    assert(ns.contains("BroadcastHashJoin"), ns)
  }

  test("NB classifier score joins model and prior as broadcasts") {
    // the ≤1024-row model is the broadcast constant (same contract as the
    // DSIR ratio table); the 1-row prior rides a nested-loop cross join
    val ns = nodes(
      graft.ops.QualityClassifier.score(T.table(spark, sf, "documents")))
    assert(ns.contains("BroadcastHashJoin"), ns)
    assert(ns.contains("BroadcastNestedLoopJoin"), ns)
  }

  test("LM perplexity score joins model and contexts as broadcasts") {
    val ns = nodes(graft.ops.LmPerplexity.score(T.table(spark, sf, "documents")))
    // both model relations are bounded (≤B² and ≤B rows) — they must ride
    // broadcasts, never shuffle the bigram stream on bucket keys
    assert(ns.contains("BroadcastHashJoin"), ns)
    assert(!ns.contains("SortMergeJoin"), ns)
  }

  test("temperature sampling: per-stratum thresholds broadcast onto the corpus") {
    val ns = nodes(Sampling.temperatureAssign(T.table(spark, sf, "documents")))
    // the threshold relation is one row per stratum — it must ride a
    // broadcast, never shuffle the corpus on stratum
    assert(ns.contains("BroadcastHashJoin"), ns)
    assert(!ns.contains("SortMergeJoin"), ns)
  }

  test("boilerplate audit: digest-width flag-back, no text through the shuffle") {
    spark.catalog.clearCache()
    val df = Dedup.boilerplateChunks(T.table(spark, sf, "documents"))
    val p = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.initialPlan
      case other => other
    }
    val exchanges = p.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(exchanges.nonEmpty)
    // every exchange carries digest/id-width rows — the chunk text is
    // hashed away before anything crosses the wire
    exchanges.foreach { e =>
      val cols = e.child.output.map(_.name)
      assert(!cols.contains("text") && !cols.contains("chunk_text"),
        cols.mkString(","))
    }
  }

  test("epoch plan: reader-partitioned window, no global sort, id-width rows") {
    import org.apache.spark.sql.execution.SortExec
    spark.catalog.clearCache()
    val df = graft.ops.Packing.epochPlan(T.table(spark, sf, "documents"))
    val p = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.initialPlan
      case other => other
    }
    // reader streams sort locally inside their hash partitions — a global
    // (range-partitioned) sort would serialize the whole plan
    assert(p.collect { case s: SortExec if s.global => s }.isEmpty, p.toString)
    p.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }.foreach { e =>
      assert(!e.child.output.map(_.name).contains("text"),
        e.child.output.map(_.name).mkString(","))
    }
  }

  test("epoch plan bin seam: no tokenize, no text — id-width scan only") {
    spark.catalog.clearCache()
    // the multi-epoch deployment shape: the bin relation is materialized
    // once (here: written to parquet, as the IncrementalPacking store is)
    // and each epoch plans over THAT — the plan must never reach back to
    // document text, so no tokenize expression and no text column may
    // appear anywhere in it
    val dir = java.nio.file.Files.createTempDirectory("plan-binseam").toString
    graft.ops.Packing.packBins(T.table(spark, sf, "documents"))
      .write.mode("overwrite").parquet(dir)
    val df = graft.ops.Packing.epochPlanFrom(spark.read.parquet(dir))
    val p = plan(df)
    assert(!p.contains("regexp_extract_all"), p)
    assert(p.contains("ReadSchema: struct<shard:bigint,n_tokens:bigint," +
      "bin:bigint"), p)
  }

  test("learned ensemble: scoring is ONE text scan and no window exchange") {
    // the one-scan contract of learnedAuditWith: against frozen
    // (materialized) model tables — the incremental drain's exact shape —
    // the whole five-table ensemble scores from a SINGLE pass over the
    // corpus text. Each corpus pass is one parquet scan whose ReadSchema
    // carries the text column (rendered once per scan, unlike
    // expressions, which the plan text repeats per reference).
    val docs = T.table(spark, sf, "documents")
    val dir = java.nio.file.Files.createTempDirectory("plan-ensemble").toString
    val lmCounts = graft.ops.LmPerplexity.seedBigramCounts(docs)
    Seq(
      "nb" -> graft.ops.QualityClassifier.modelTable(docs),
      "prior" -> graft.ops.QualityClassifier.priorRow(docs),
      "lmm" -> graft.ops.LmPerplexity.modelOf(lmCounts),
      "lmc" -> graft.ops.LmPerplexity.contextsOf(lmCounts),
      "lr" -> graft.ops.Dsir.ratioTable(graft.ops.Dsir.featureCounts(docs))
    ).foreach { case (n, df) =>
      df.write.mode("overwrite").parquet(s"$dir/$n")
    }
    def t(n: String) = spark.read.parquet(s"$dir/$n")
    val p = plan(Curation.learnedAuditWith(docs,
      t("nb"), t("prior"), t("lmm"), t("lmc"), t("lr")))
    val textScans = "ReadSchema: [^\n]*text".r.findAllIn(p).length
    assert(textScans == 1, s"expected ONE scoring text scan, " +
      s"got $textScans:\n$p")
    // the pair relation assembles in the array domain: no window (and so
    // no extra exchange) between the scan and the shared aggregation
    assert(!p.contains("Window"), p)
  }

  test("chunk Docs reassembly: chunk_text crosses exactly ONE exchange") {
    // the reassembleFlagged contract: the election legs exchange
    // digest-width rows only; the corpus text is pre-partitioned by
    // doc_id once and both the flag join and the reassembly groupBy
    // reuse that partitioning — keying the flag-back on the digest would
    // ship the text through a second exchange
    spark.catalog.clearCache()
    val docs = T.table(spark, sf, "documents")
    for (df <- Seq(Dedup.chunkDedupDocs(docs), Dedup.boilerplateDocs(docs))) {
      val p = df.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.initialPlan
        case other => other
      }
      val textExchanges = p.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
            if e.child.output.map(_.name).contains("chunk_text") => e
      }
      assert(textExchanges.size == 1, p.toString)
      // and that one exchange is the doc_id repartition, not a digest key
      val keyCols = textExchanges.head.outputPartitioning match {
        case h: org.apache.spark.sql.catalyst.plans.physical.HashPartitioning =>
          h.expressions.flatMap(_.references.map(_.name))
        case other => fail(s"expected hash partitioning, got $other")
      }
      assert(keyCols == Seq("doc_id"), keyCols.mkString(","))
    }
  }

  test("per-batch reassembly: chunk_text crosses exactly ONE exchange too") {
    // the INCREMENTAL twins route reassembly through the same
    // reassembleFlagged seam as the batch Docs operators, but their flag
    // relation arrives from a doc_id join (the first-write-wins guard),
    // not straight from the election — pin the per-batch shape so a twin
    // rewrite cannot silently re-key the text exchange on the digest
    spark.catalog.clearCache()
    val rows = Dedup.chunkRows(T.table(spark, sf, "documents"))
    val survivors = Dedup.flaggedChunks(rows.drop("chunk_text"))
      .filter(col("kept")).select("doc_id", "chunk_idx")
    val flags = rows.select("doc_id", "chunk_idx")
      .join(survivors.withColumn("sv", lit(true)),
        Seq("doc_id", "chunk_idx"), "left")
      .withColumn("kept", coalesce(col("sv"), lit(false)))
    val p = Dedup.reassembleFlagged(rows, flags)
      .queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.initialPlan
      case other => other
    }
    val textExchanges = p.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
          if e.child.output.map(_.name).contains("chunk_text") => e
    }
    assert(textExchanges.size == 1, p.toString)
    val keyCols = textExchanges.head.outputPartitioning match {
      case h: org.apache.spark.sql.catalyst.plans.physical.HashPartitioning =>
        h.expressions.flatMap(_.references.map(_.name))
      case other => fail(s"expected hash partitioning, got $other")
    }
    assert(keyCols == Seq("doc_id"), keyCols.mkString(","))
  }

  test("sequence packing: one shard shuffle, local sort only, no text carried") {
    import org.apache.spark.sql.execution.SortExec
    spark.catalog.clearCache()
    val df = graft.ops.Packing.packBins(T.table(spark, sf, "documents"))
    val p = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.initialPlan
      case other => other
    }
    // the window sorts WITHIN shard partitions — a global sort here would
    // funnel the corpus through one range-partitioned ordering
    assert(p.collect { case s: SortExec if s.global => s }.isEmpty,
      p.toString)
    val exchanges = p.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(exchanges.size == 1, p.toString)
    // text is projected away before the shuffle: the exchange carries
    // id-width rows, never the corpus bytes
    assert(!exchanges.head.child.output.map(_.name).contains("text"),
      exchanges.head.child.output.map(_.name).mkString(","))
  }

  test("bin payloads: the id streams move through exactly ONE exchange") {
    spark.catalog.clearCache()
    val df = graft.ops.Packing.binPayloads(T.table(spark, sf, "documents"))
    val p = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.initialPlan
      case other => other
    }
    // the payload-width shuffle happens once, on shard, and the per-bin
    // assembly reuses it — HashPartitioning(shard) satisfies the
    // aggregation's ClusteredDistribution(shard, bin); a second exchange
    // would move every token id twice
    val exchanges = p.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(exchanges.size == 1, p.toString)
    assert(!exchanges.head.child.output.map(_.name).contains("text"),
      exchanges.head.child.output.map(_.name).mkString(","))
    // no global sort either — ordering is per shard partition
    import org.apache.spark.sql.execution.SortExec
    assert(p.collect { case s: SortExec if s.global => s }.isEmpty,
      p.toString)
  }

  test("interleaved multimodal payloads still cross exactly ONE exchange") {
    spark.catalog.clearCache()
    val df = graft.ops.Packing.binPayloadsMm(T.table(spark, sf, "documents"))
    val p = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.initialPlan
      case other => other
    }
    // the media leg adds slot arithmetic and the sidecar aggregate to the
    // SAME shard exchange + per-bin assembly — no second payload movement,
    // and no media bytes at all (the sidecar carries refs)
    val exchanges = p.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(exchanges.size == 1, p.toString)
    assert(!exchanges.head.child.output.map(_.name).contains("text"),
      exchanges.head.child.output.map(_.name).mkString(","))
    import org.apache.spark.sql.execution.SortExec
    assert(p.collect { case s: SortExec if s.global => s }.isEmpty,
      p.toString)
  }

  test("reader feed: id-width planning, payloads cross ONE exchange") {
    spark.catalog.clearCache()
    import spark.implicits._
    // a payload store as the drain writes it: per-batch fragment rows
    val root = java.nio.file.Files.createTempDirectory("plan-rf").toString
    spark.range(64).select(
      (col("id") % 8).as("shard"), (col("id") / 8).as("bin"),
      lit(2L).as("n_docs"), lit(6L).as("bin_tokens"),
      expr("sequence(id, id + 5)").as("input_ids"))
      .write.parquet(s"$root/payloads/batch=0")
    val df = graft.ops.Packing.readerFeedFrom(
      graft.streaming.IncrementalPacking.payloadStreams(spark, root), 1)
    val p = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.initialPlan
      case other => other
    }
    val exchanges = p.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    // the id streams move ONCE — the fragment-concatenation aggregate's
    // exchange, whose (shard, bin) partitioning the fetch join reuses.
    // Every other exchange (the stats aggregate, the reader deal) is
    // id-width: column pruning strips input_ids from the planning legs
    def wide(e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec) =
      e.child.output.exists(a =>
        a.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType] ||
          a.dataType == org.apache.spark.sql.types.BinaryType)
    assert(exchanges.count(wide) == 1,
      exchanges.map(_.child.output.map(a => s"${a.name}:${a.dataType}")
        .mkString("[", ",", "]")).mkString("\n") + "\n" + p.toString)
    // no global sort anywhere — positions order within reader partitions
    import org.apache.spark.sql.execution.SortExec
    assert(p.collect { case s: SortExec if s.global => s }.isEmpty,
      p.toString)
  }

  test("era feed: one payload exchange per era, id-width everywhere else") {
    spark.catalog.clearCache()
    val base = java.nio.file.Files.createTempDirectory("plan-era").toString
    val roots = Seq(s"$base/p0", s"$base/p1")
    roots.zipWithIndex.foreach { case (r, i) =>
      spark.range(32).select(
        (col("id") % 4).as("shard"), (col("id") / 4).as("bin"),
        lit(2L).as("n_docs"), lit(6L).as("bin_tokens"),
        expr(s"sequence(id * 10 + $i, id * 10 + $i + 5)").as("input_ids"))
        .write.parquet(s"$r/payloads/batch=0")
    }
    val df = graft.streaming.PackingMigration.eraFeed(spark, roots, 1)
    val p = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.initialPlan
      case other => other
    }
    val exchanges = p.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    def wide(e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec) =
      e.child.output.exists(a =>
        a.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType] ||
          a.dataType == org.apache.spark.sql.types.BinaryType)
    // each era's fragment concatenation moves its payload once; the
    // union, deal, and fetch legs above them stay id-width
    assert(exchanges.count(wide) == roots.size,
      exchanges.map(_.child.output.map(a => s"${a.name}:${a.dataType}")
        .mkString("[", ",", "]")).mkString("\n") + "\n" + p.toString)
    import org.apache.spark.sql.execution.SortExec
    assert(p.collect { case s: SortExec if s.global => s }.isEmpty,
      p.toString)
  }

  test("mm store feed: sidecar rides the ONE payload exchange; byte fetch moves bytes once") {
    spark.catalog.clearCache()
    // an mm payload store as the drain writes it: fragments carrying the
    // raw sidecar coordinates beside the id streams
    val root = java.nio.file.Files.createTempDirectory("plan-rfmm").toString
    spark.range(64).select(
      (col("id") % 8).as("shard"), (col("id") / 8).as("bin"),
      lit(2L).as("n_docs"), lit(6L).as("bin_tokens"),
      expr("concat(array(-1L), sequence(id, id + 4))").as("input_ids"),
      lit(0L).as("frag_base_off"),
      expr("array(named_struct('off', 0L, 'media_ref', id))")
        .as("media_offs"))
      .write.parquet(s"$root/payloads/batch=0")
    val feed = graft.ops.Packing.readerFeedMmFrom(
      graft.streaming.IncrementalPacking.payloadStreamsMm(spark, root), 1)
    def initial(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.initialPlan
        case other => other
      }
    def wide(e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec) =
      e.child.output.exists(a =>
        a.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType] ||
          a.dataType == org.apache.spark.sql.types.BinaryType)
    val p = initial(feed)
    val exchanges = p.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    // ids AND sidecar move once — the fragment concatenation's exchange,
    // whose (shard, bin) partitioning the fetch join reuses; the planning
    // legs prune both payload columns away
    assert(exchanges.count(wide) == 1,
      exchanges.map(_.child.output.map(a => s"${a.name}:${a.dataType}")
        .mkString("[", ",", "]")).mkString("\n") + "\n" + p.toString)
    import org.apache.spark.sql.execution.SortExec
    assert(p.collect { case s: SortExec if s.global => s }.isEmpty,
      p.toString)
    // the byte fetch: media BYTES cross at most one exchange (zero when
    // the ref side broadcasts — the bytes then never leave their scan),
    // and the ref side is id-width: input_ids are dropped BEFORE the
    // explode, so no exchange carries ids and bytes together
    val docs = T.table(spark, sf, "documents")
    val fetch = graft.ops.Packing.fetchMediaPayloads(
      feed.localCheckpoint(), graft.ops.Multimodal.media(docs))
    val fp = initial(fetch)
    val fEx = fp.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    def binary(e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec) =
      e.child.output.exists(_.dataType ==
        org.apache.spark.sql.types.BinaryType)
    assert(fEx.count(binary) <= 1,
      fEx.map(_.child.output.map(a => s"${a.name}:${a.dataType}")
        .mkString("[", ",", "]")).mkString("\n") + "\n" + fp.toString)
    assert(!fEx.exists(e => binary(e) &&
      e.child.output.exists(_.name == "input_ids")), fp.toString)
    // only fetched bins' refs probe the catalog: a one-reader fetch
    // serves exactly that reader's slots, none of the others'
    val one = graft.ops.Packing.fetchMediaPayloads(
      feed.filter(col("reader") === 0).localCheckpoint(),
      graft.ops.Multimodal.media(docs))
    assert(one.filter(col("reader") =!= 0).count() == 0)
    // the STORE-backed fetch keeps the same byte discipline: the catalog
    // side is a pruned parquet read instead of the media expression, and
    // bytes still cross at most one exchange, never beside input_ids
    val catRoot = java.nio.file.Files
      .createTempDirectory("plan-mcat").toString
    graft.streaming.MediaCatalogStore.write(
      graft.ops.Multimodal.media(docs), catRoot, buckets = 8)
    val sp = initial(graft.streaming.MediaCatalogStore.fetch(
      spark, catRoot, feed.localCheckpoint()))
    val sEx = sp.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(sEx.count(binary) <= 1,
      sEx.map(_.child.output.map(a => s"${a.name}:${a.dataType}")
        .mkString("[", ",", "]")).mkString("\n") + "\n" + sp.toString)
    assert(!sEx.exists(e => binary(e) &&
      e.child.output.exists(_.name == "input_ids")), sp.toString)
  }

  test("incremental packing batch: cursor broadcast, one batch shuffle, local sort") {
    import org.apache.spark.sql.execution.SortExec
    spark.catalog.clearCache()
    import spark.implicits._
    val cur = Seq((0L, 100L), (1L, 200L)).toDF("shard", "cum_tokens")
    val (bins, _) = graft.streaming.IncrementalPacking.packBatch(
      T.table(spark, sf, "documents"), cur, graft.ops.Packing.Shards)
    val p = bins.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.initialPlan
      case other => other
    }
    // the ≤shards-row cursor must ride a broadcast; a shuffled cursor
    // join would re-exchange the batch per micro-batch
    assert(p.collectWithSubqueries {
      case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => b
    }.nonEmpty, p.toString)
    assert(p.collect { case s: SortExec if s.global => s }.isEmpty,
      p.toString)
    assert(p.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }.size == 1, p.toString)
  }

  test("df cap never windows over h — broadcast anti-join only") {
    // the boilerplate-cap scale contract ([[Dedup.dfCapped]]): a
    // count().over(Window.partitionBy(h)) spelling buffers a mega-hot
    // fingerprint's EVERY row in one task before the filter can drop it —
    // exactly the adversarial key the cap exists for. The capped operators
    // materialize eagerly, so a plan assertion on their RESULT cannot see
    // the internal shape; instead capture every plan the session executes
    // while they run and assert none windows over h.
    import org.apache.spark.sql.execution.QueryExecution
    import org.apache.spark.sql.execution.window.WindowExec
    spark.catalog.clearCache()
    val offenders = new scala.collection.concurrent.TrieMap[String, String]()
    val sawMarker = new java.util.concurrent.atomic.AtomicBoolean(false)
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
          durationNs: Long): Unit = {
        val p = qe.executedPlan match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            a.initialPlan
          case other => other
        }
        p.foreach {
          case w: WindowExec if w.partitionSpec
              .flatMap(_.references.map(_.name).toSeq).contains("h") =>
            offenders.put(w.verboseString(120), funcName)
          case _ => ()
        }
        if (p.toString.contains("marker_df_cap")) sawMarker.set(true)
      }
      override def onFailure(funcName: String, qe: QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val docs = T.table(spark, sf, "documents")
      Dedup.ngramJaccardPairs(docs).count()
      Dedup.winnowOverlapPairs(docs).count()
      graft.ops.HashSplit.contaminatedTrainDocs(docs).count()
      // listener delivery is async on a FIFO queue: once the marker
      // query's event arrives, every earlier event has been delivered
      spark.range(1).selectExpr("id as marker_df_cap").collect()
      val deadline = System.currentTimeMillis + 30000
      while (!sawMarker.get && System.currentTimeMillis < deadline)
        Thread.sleep(50)
      assert(sawMarker.get, "listener marker never delivered")
    } finally spark.listenerManager.unregister(listener)
    assert(offenders.isEmpty,
      s"windows partitioned over h:\n${offenders.mkString("\n")}")
    // and the helper itself is the broadcast anti-join shape
    val fps = Dedup.winnowFingerprints(T.table(spark, sf, "documents"))
      .select("doc_id", "h").distinct().localCheckpoint()
    val ns = nodes(Dedup.dfCapped(fps, "h", Dedup.MaxShingleDf))
    assert(!ns.contains("Window"), ns)
    assert(ns.contains("BroadcastHashJoin"), ns)
  }

  test("band-occupancy caps never window over bucket keys") {
    // the occupancy-degrade scale contract ([[Dedup.hotBucketRoots]]): a
    // count/min-over-Window.partitionBy(bucket) spelling buffers the
    // hottest bucket's EVERY row in one task before the star degrade can
    // apply — and a giant near-dup family, dedup's target input, is
    // exactly that mega-bucket. Same listener technique as the df-cap
    // test: the operators materialize eagerly, so capture every plan the
    // session executes while they run and assert none windows over a band
    // bucket key. (Per-query rank windows partition by query_id/doc_id —
    // bounded by k per group — and stay allowed.)
    import org.apache.spark.sql.execution.QueryExecution
    import org.apache.spark.sql.execution.window.WindowExec
    spark.catalog.clearCache()
    val banned = Set("band_idx", "band_val", "q", "nib")
    val offenders = new scala.collection.concurrent.TrieMap[String, String]()
    val sawMarker = new java.util.concurrent.atomic.AtomicBoolean(false)
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
          durationNs: Long): Unit = {
        val p = qe.executedPlan match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            a.initialPlan
          case other => other
        }
        p.foreach {
          case w: WindowExec if w.partitionSpec
              .flatMap(_.references.map(_.name).toSeq)
              .exists(banned.contains) =>
            offenders.put(w.verboseString(120), funcName)
          case _ => ()
        }
        if (p.toString.contains("marker_band_cap")) sawMarker.set(true)
      }
      override def onFailure(funcName: String, qe: QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val docs = T.table(spark, sf, "documents")
      val emb = T.table(spark, sf, "embeddings")
      Dedup.minhashPairs(docs).count()
      Dedup.simhashPairs(docs).count()
      Similarity.lshTopK(emb).count()
      Similarity.lshNearDup(emb).count()
      // the incremental twin's store-side root election, relation-backed
      val batch = docs.filter(col("doc_id") % 7 === 0)
        .withColumn("doc_id", col("doc_id") + lit(1000000000L))
      graft.streaming.IncrementalCuration.newDuplicates(
        Dedup.minhashSignatures(batch),
        Dedup.minhashSignatures(docs)).count()
      spark.range(1).selectExpr("id as marker_band_cap").collect()
      val deadline = System.currentTimeMillis + 30000
      while (!sawMarker.get && System.currentTimeMillis < deadline)
        Thread.sleep(50)
      assert(sawMarker.get, "listener marker never delivered")
    } finally spark.listenerManager.unregister(listener)
    assert(offenders.isEmpty,
      s"windows partitioned over band bucket keys:\n${offenders.mkString("\n")}")
    // and the helper itself is the broadcast left-join shape (the
    // dfCapped twin below in the df-cap test): stats broadcast, no window
    val rel = Dedup.minhashSignatures(T.table(spark, sf, "documents"))
      .filter(col("n_shingles") > 0)
      .selectExpr("doc_id", "band_0 AS band_val").localCheckpoint()
    val ns = nodes(graft.ops.Dedup.hotBucketRoots(
      rel, Seq("band_val"), 8, struct(col("doc_id"))))
    assert(!ns.contains("Window"), ns)
    assert(ns.contains("BroadcastHashJoin"), ns)
    // the degrade's own degrade: above MaxBroadcastRoots the stats side
    // falls back to a SALTED shuffled join — the probe exchange hashes on
    // (bucket keys..., salt), never the bucket key alone, so a mega-bucket
    // spreads across reducers without relying on AQE's optional skew split
    val fb = graft.ops.Dedup.hotBucketRoots(rel, Seq("band_val"), 8,
      struct(col("doc_id")), relRows = Some(Long.MaxValue / 16))
    val fbPlan = (fb.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.initialPlan
      case other => other
    }).toString
    assert(fbPlan.contains(graft.ops.SkewJoin.SaltCol), fbPlan)
    // (no anti-broadcast assertion: the fix removes the FORCED broadcast
    // of an unbounded side; when the actual stats relation is small the
    // planner may still broadcast the salted build side — that sizing
    // decision is exactly what the fallback hands back to the planner)
    // bit-identical output either way — the fallback changes the exchange,
    // never the rows
    val viaB = graft.ops.Dedup.hotBucketRoots(rel, Seq("band_val"), 8,
      struct(col("doc_id")))
    assert(fb.exceptAll(viaB).count() == 0 &&
      viaB.exceptAll(fb).count() == 0)
  }
}
