package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (PQ) — compressed-vector approximate nearest
  * neighbor search, the MEMORY-scale path of the ANN stack.
  *
  * [[Similarity]]'s IVF/LSH paths prune *candidates* but still store and
  * score full vectors. At 100 TB the vectors themselves are the problem:
  * 10^10 × 64 float32 dims = 2.5 TB of raw embeddings, too big to keep hot.
  * PQ (Jégou, Douze, Schmid — "Product quantization for nearest neighbor
  * search", TPAMI 2011; the FAISS `PQ`/`IVFPQ` core) splits each vector
  * into [[NumSubspaces]] sub-vectors, quantizes each against a per-subspace
  * [[CodebookSize]]-entry codebook, and stores only the code indices: here
  * 64 float dims (256 B) become 8 six-bit codes (6 B) — ~42× compression —
  * while asymmetric-distance (ADC) search scans CODES with per-query lookup
  * tables and never touches the stored vectors.
  *
  * Scale shape, deliberately:
  *
  *  - **The codebook is bounded by construction**: [[NumSubspaces]] ×
  *    [[CodebookSize]] × [[SubDim]] values, collected once to the driver
  *    and splatted back as expression literals (the centroid-handling
  *    convention of [[Similarity.kmeansFromSeeds]] and MLlib k-means).
  *    Deterministic "sampled leaders" codebooks (sub-vectors of the
  *    [[CodebookSize]] lowest vec_ids) keep the DuckDB oracle able to
  *    replay every code bit-for-bit; [[codebookFrom]] is the training
  *    seam — a Lloyd-refined or re-trained quantizer plugs in there
  *    without touching the encode/search shapes.
  *  - **Encoding is shuffle-free.** Each row's codes are one codegen'd
  *    projection (argmin over the splatted codebook) — no explode, no
  *    join, no aggregation: encoding 10^10 vectors on 1000 executors is an
  *    embarrassingly-parallel scan writing id + 6 bytes of codes.
  *  - **ADC search never shuffles the corpus.** The query relation (the
  *    only non-literal input besides the codes) is broadcast WITH its
  *    per-query distance tables attached (`qdistSql` — the classic ADC
  *    lookup table of Jégou et al. §IV-A, computed once per query on the
  *    broadcast side, never as a per-subspace join: r14's table-JOIN form
  *    cost a hash probe per lookup, r15's inline form recomputed the
  *    query-side slices and dots per CANDIDATE); the code relation
  *    streams through ONE broadcast join paying 8 codegen'd array picks
  *    per candidate, and the only shuffle is the final per-query top-k
  *    over id-width rows — the same tail as [[Similarity.bruteTopK]].
  *
  * Both distance forms drop nothing from the math: encode ranks by
  * ‖c‖² − 2⟨x_m, c⟩ (the ‖x_m‖² term is constant within a row's argmin and
  * cancels), while ADC reports the full ‖q_m‖² − 2⟨q_m, c⟩ + ‖c‖², summed
  * in fixed subspace order so both engines produce the identical double.
  * Ties break toward the lower index (code k, then neighbor vec_id) in
  * both engines.
  */
object Pq {

  /** Sub-vector count M: 8 × 8-dim subspaces over the 64-dim testdata;
    * production configs (e.g. FAISS PQ64 over 1024-dim) scale M with the
    * dimension — the shapes below only assume `Dim % NumSubspaces == 0`.
    */
  val NumSubspaces = 8
  val SubDim: Int = Similarity.Dim / NumSubspaces
  /** Codebook entries per subspace (6-bit codes here; real deployments use
    * 256 = one byte per subspace). Entries are the [[CodebookSize]] lowest
    * vec_ids' sub-vectors — deterministic, oracle-replayable. Sizing note:
    * the synthetic testdata is i.i.d. near-orthogonal (unit-norm random) —
    * PQ's WORST case, no manifold to exploit — so granularity is chosen for
    * a recall the spec can gate (~0.3 at 8×6 bits) while keeping ~42×
    * compression; structured real-corpus embeddings recall far higher at
    * the same bit budget.
    */
  val CodebookSize = 64
  /** Bits per code (log2 [[CodebookSize]]) — the [[codes]] pack shift. */
  val CodeBits = 6

  /** One sub-quantizer entry: subspace `m`, code `k`, centroid sub-vector,
    * and its precomputed self-dot ‖c‖².
    */
  final case class CodebookEntry(m: Int, k: Int, cvec: Array[Float], cnorm2: Double)

  /** Left-fold self-dot replicating `graft_dot`'s accumulation order, so
    * the driver-side ‖c‖² literals stay bit-identical with the oracle's
    * `list_reduce` over the same floats.
    */
  private def selfDot(v: Array[Float]): Double = {
    var acc = 0.0
    var i = 0
    while (i < v.length) { acc += v(i).toDouble * v(i).toDouble; i += 1 }
    acc
  }

  /** The deterministic "sampled leaders" codebook: sub-vectors of the
    * [[CodebookSize]] lowest vec_ids. O(M × K × SubDim) values — one
    * bounded collect, like a trained quantizer loaded from its store.
    */
  def codebook(emb: DataFrame): Seq[CodebookEntry] = {
    val spark = emb.sparkSession
    import spark.implicits._
    val seeds = emb.filter(col("vec_id") < CodebookSize)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    codebookFrom(seeds.map { case (k, v) => (k.toInt, v) })
  }

  /** Codebook from EXPLICIT full-width seed vectors `(k, vector)` — the
    * training seam. Seed indices must be DENSE 0..K−1: the encode kernel
    * emits positional codes, so a sparse index set would silently misalign
    * every downstream (m, k) lookup.
    */
  def codebookFrom(seeds: Seq[(Int, Array[Float])]): Seq[CodebookEntry] = {
    require(seeds.map(_._1).sorted == (0 until seeds.size),
      s"codebookFrom: seed indices must be dense 0..${seeds.size - 1}, " +
        s"got ${seeds.map(_._1).sorted.take(8).mkString(",")}…")
    for {
      (k, v) <- seeds
      m <- 0 until NumSubspaces
    } yield {
      val sub = v.slice(m * SubDim, (m + 1) * SubDim)
      CodebookEntry(m, k, sub, selfDot(sub))
    }
  }

  /** Shortest-round-trip double SQL literal: `graft_dot` (and the oracle's
    * `list_reduce`) widen floats to double before multiplying, so splatting
    * the exact double value keeps both engines bit-identical.
    */
  private def d(x: Double): String = s"${x}D"

  /** 1-based `slice` of subspace `m` from an embedding column. */
  private def subSql(m: Int, embCol: String = "embedding"): String =
    s"slice($embCol, ${m * SubDim + 1}, $SubDim)"

  /** Per-row PQ codes, WIDE: `(vec_id, code_0 … code_{M−1}, pq_code)` with
    * `pq_code` the bit-packed single-BIGINT form (M·CodeBits = 48 bits) — the
    * 6-bytes-per-vector payload a code store persists at this config.
    *
    * One codegen'd projection per row through the native
    * [[graft.functions.PqEncode]] kernel, whose strict-less argmin update
    * keeps the FIRST (lowest-k) minimum — matching the oracle's
    * `row_number() ORDER BY (dist, k)` tie rule.
    */
  def codes(emb: DataFrame): DataFrame = codesWith(emb, codebook(emb))

  /** The encode-kernel invocation over a codebook: flattened `[m][k][i]`
    * centroids + `[m][k]` self-dots splatted as the foldable literal
    * arguments of `graft_pq_encode` — one constant fold at plan build,
    * then a bare per-row argmin loop inside whole-stage codegen. (The
    * obvious `array_position(array_min(...))` formulation inlines the K
    * distance expansions twice per subspace and blows codegen past the
    * JVM's 64 KB method limit — the kernel keeps the loop as data, not
    * code.) ONE spelling shared by [[codesWith]] and
    * [[quantizationError]], so the two cannot drift.
    */
  private def encodeCol(book: Seq[CodebookEntry],
      vecCol: String): org.apache.spark.sql.Column = {
    val sorted = book.sortBy(c => (c.m, c.k))
    // typedlit: one Literal node per array (see qdistCol) — the flat
    // codebook alone was 4096 parsed double literals per encode plan
    val cbFlat = typedlit(sorted.flatMap(_.cvec.map(_.toDouble)))
    val cn2 = typedlit(sorted.map(_.cnorm2))
    call_function("graft_pq_encode", col(vecCol), cbFlat, cn2,
      lit(NumSubspaces))
  }

  private[graft] def codesWith(emb: DataFrame, book: Seq[CodebookEntry]): DataFrame = {
    if (book.isEmpty) return emptyResult(emb, codesSchema)
    val codeCols = (0 until NumSubspaces).map(m =>
      expr(s"pq_codes_arr[$m]").as(s"code_$m"))
    val packed = (0 until NumSubspaces)
      .map(m => col(s"code_$m") * lit(1L << (CodeBits * m)))
      .reduce(_ + _)
    emb.select(col("vec_id"),
        encodeCol(book, "embedding").as("pq_codes_arr"))
      .select(col("vec_id") +: codeCols: _*)
      .withColumn("pq_code", packed)
  }

  /** Element-wise residual `x − l` as FLOAT. Single-rounded IEEE float
    * subtraction — bit-identical between Spark (`zip_with` over FLOAT
    * arrays) and the oracle's indexed `list_transform` with a FLOAT cast.
    */
  private def residualSql(vecCol: String, leadCol: String): String =
    s"zip_with($vecCol, $leadCol, (x, y) -> x - y)"

  /** The RESIDUAL codebook (FAISS `by_residual=true`): sub-vectors of
    * seed residuals `x − lvec(list(x))` under the deterministic IVF
    * leaders. Residuals concentrate near the origin once the coarse
    * component is removed, so the same bit budget spends its precision on
    * what the coarse quantizer could NOT explain — the reason FAISS
    * defaults its billion-scale IVFPQ indexes to residual encoding.
    *
    * Seeds are the [[CodebookSize]] lowest vec_ids ABOVE the leader range
    * `[NumLists, NumLists + CodebookSize)`: the leaders' own residuals
    * are exactly the zero vector (each leader is its own max-cosine
    * assignment), and seeding from `vec_id < CodebookSize` would collapse
    * [[Similarity.NumLists]] of the entries onto the origin — a quarter
    * of the codebook wasted on one point. Bounded like [[codebook]]: one
    * ≤[[CodebookSize]]-row collect.
    */
  private[graft] def residualCodebook(emb: DataFrame): Seq[CodebookEntry] = {
    val spark = emb.sparkSession
    import spark.implicits._
    val lo = Similarity.NumLists
    val seedSlice = emb.filter(
      col("vec_id") >= lo && col("vec_id") < lo + CodebookSize)
    val seeds = residualRows(seedSlice, Similarity.ivfLeaders(emb))
      .select(col("vec_id"), col("rvec"))
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    codebookFrom(seeds.map { case (k, v) => ((k - lo).toInt, v) })
  }

  /** `(vec_id, list_id, rvec)` — `rows` assigned against `leadersDf` (the
    * SAME ranking the IVF probe path uses, so a vector's residual list
    * always matches the list it is probed through), residual via
    * [[residualSql]]. Leaders are a bounded broadcast.
    */
  private def residualRows(rows: DataFrame, leadersDf: DataFrame): DataFrame =
    Similarity.assignWithLeaders(rows, leadersDf)
      .join(rows.select("vec_id", "embedding"), Seq("vec_id"))
      .join(broadcast(leadersDf.select("list_id", "lvec")), Seq("list_id"))
      .select(col("vec_id"), col("list_id"),
        expr(residualSql("embedding", "lvec")).as("rvec"))

  /** Residual PQ codes for an EXPLICIT capped assignment `(vec_id,
    * list_id)` (the shared IVF probe relation): join back the vector, the
    * assigned leader (broadcast), subtract, encode with the residual
    * kernel. WIDE: `(vec_id, list_id, code_0 … code_{M−1}, pq_code)` — the
    * code store of a residual IVFPQ index carries its list id, because
    * codes are only decodable RELATIVE to their list's centroid.
    */
  private[graft] def residualCodesFor(assign: DataFrame, emb: DataFrame,
      leadersDf: DataFrame, book: Seq[CodebookEntry]): DataFrame = {
    if (book.isEmpty) return emptyResult(emb, residualCodesSchema)
    val resid = assign
      .join(emb.select("vec_id", "embedding"), Seq("vec_id"))
      .join(broadcast(leadersDf.select("list_id", "lvec")), Seq("list_id"))
      .select(col("vec_id"), col("list_id"),
        expr(residualSql("embedding", "lvec")).as("rvec"))
    val codeCols = (0 until NumSubspaces).map(m =>
      expr(s"pq_codes_arr[$m]").as(s"code_$m"))
    val packed = (0 until NumSubspaces)
      .map(m => col(s"code_$m") * lit(1L << (CodeBits * m)))
      .reduce(_ + _)
    resid.select(col("vec_id"), col("list_id"),
        encodeCol(book, "rvec").as("pq_codes_arr"))
      .select(col("vec_id") +: col("list_id") +: codeCols: _*)
      .withColumn("pq_code", packed)
  }

  /** The codebook as a 64-row local relation `(m, k, cvec, cnorm2)` — the
    * broadcast side of [[quantizationError]]'s decode join. (The ADC
    * search paths no longer join a codebook relation at all: they fold
    * the centroids into the per-query distance tables — see `qdistSql`.)
    */
  /** `(vec_id, list_id, rvec)` residuals of `rows` under an EXPLICIT
    * leader relation — [[residualRows]] exposed for the maintenance loop
    * ([[graft.streaming.IvfPqMaintenance]]), which trains candidate
    * residual codebooks and measures drift against leaders that are NOT
    * the id-seeded bootstrap set.
    */
  private[graft] def residualsOf(rows: DataFrame, leadersDf: DataFrame): DataFrame =
    residualRows(rows, leadersDf)

  /** Mean RESIDUAL quantization error `(n_vectors, mean_qerr)` of a
    * corpus under an explicit (leaders, residual book) pair — the drift
    * monitor for the composed IVFPQ index: the error a stored code
    * actually carries is ‖rvec − decode(code(rvec))‖², residuals taken
    * against the list each vector assigns to, so BOTH a drifted coarse
    * quantizer (residuals grow) and a drifted sub-quantizer (codes stop
    * describing them) surface in one number.
    */
  private[graft] def residualQuantizationError(emb: DataFrame,
      leadersDf: DataFrame, book: Seq[CodebookEntry]): DataFrame =
    quantizationError(
      residualRows(emb, leadersDf)
        .select(col("vec_id"), col("rvec").as("embedding")),
      book)

  private def codebookDf(emb: DataFrame, book: Seq[CodebookEntry]): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    book.map(c => (c.m, c.k.toLong, c.cvec, c.cnorm2))
      .toDF("m", "k", "cvec", "cnorm2")
  }

  /** Asymmetric-distance top-k: queries (vec_id % [[Similarity.QueryStride]]
    * = 0) keep their EXACT sub-vectors; corpus vectors are represented by
    * codes only. `adc_dist` = Σ_m ‖q_m − c_{m,code_m}‖², the classic ADC
    * estimate. Approximate by design — [[PqSpec]] gates its recall against
    * [[Similarity.bruteTopK]]; the driver oracle replays it exactly.
    */
  def adcTopK(emb: DataFrame, k: Int = Similarity.TopK): DataFrame = {
    val book = codebook(emb)
    if (book.isEmpty) return emptyResult(emb, adcSchema)
    adcSearch(codesWith(emb, book),
      emb.filter(col("vec_id") % Similarity.QueryStride === 0), book, k)
  }

  /** ADC top-k of explicit `(vec_id, embedding)` queries against an
    * EXPLICIT code relation — the store-search seam
    * ([[graft.streaming.IncrementalPqIndex]] runs it over its accumulated
    * code store with the frozen codebook). A query id equal to a stored
    * id is excluded (self-match).
    */
  /** The per-QUERY ADC distance table for subspace `m`, as one array
    * expression over the splatted codebook literals — the r16 refinement
    * of the r15 one-projection distance (which computed, PER CANDIDATE
    * ROW, the query sub-vector slice, the query self-dot, and the
    * query×centroid dot — ~16 slices + 16 dots per candidate, all of
    * which depend only on the query):
    *
    *   qd_m[k] = (⟨q_m,q_m⟩ − 2·⟨q_m, c_{m,k}⟩) + ‖c_{m,k}‖²
    *
    * Every entry is the EXACT expression the r15 per-candidate form
    * computed for `k = code_m` (same `graft_dot` fold, same double ops in
    * the same association order, same float centroid values), evaluated
    * ONCE per query row on the broadcast side — this is the classic ADC
    * lookup table (Jégou et al. §IV-A), landed where it belongs: built
    * per query, consulted per candidate. The candidate side then pays 8
    * `element_at` picks + 7 adds per row instead of ~128 multiply-adds
    * (see [[adcTableDist]]). The `transform` lambda runs interpreted, but
    * only over Q × M × K entries on the bounded query relation — never on
    * the corpus-sized code stream.
    */
  private def qdistCol(book: Seq[CodebookEntry], m: Int,
      qvec: String): org.apache.spark.sql.Column = {
    val entries = book.groupBy(_.m)(m).sortBy(_.k)
    // typedlit packs each array into ONE Literal node; the r16.0 spelling
    // splatted ~4600 CAST(<double> AS FLOAT) parse nodes per search,
    // and every consumer of the (cached) search relation re-walked that
    // tree during analysis — a flat multi-second driver cost per query
    // instantiation (measured 2.7 s/rep on the recall gate). Values are
    // bit-identical: CAST(d AS FLOAT) of a float's double widening IS
    // the float.
    val cb = typedlit(entries.map(_.cvec.toSeq))
    val cn = typedlit(entries.map(_.cnorm2))
    val qs = slice(col(qvec), m * SubDim + 1, SubDim)
    def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      call_function("graft_dot", a, b)
    transform(sequence(lit(0), lit(entries.size - 1)), k =>
      (dot(qs, qs) - lit(2.0) * dot(qs,
        element_at(cb, (k + lit(1)).cast("int")))) +
        element_at(cn, (k + lit(1)).cast("int")))
  }

  /** Project a query-keyed relation down to `keep` plus the M per-query
    * distance-table arrays `qd_0 … qd_{M−1}` over `vecCol`. Applied to
    * the BROADCAST side only (queries, or the (query, probed-list)
    * residual pairs) — the arrays are Q × M × K doubles by construction.
    */
  private def withDistTables(rel: DataFrame, book: Seq[CodebookEntry],
      vecCol: String, keep: Seq[String]): DataFrame =
    rel.select(keep.map(col) ++
      (0 until NumSubspaces).map(m =>
        qdistCol(book, m, vecCol).as(s"qd_$m")): _*)

  /** The per-candidate ADC distance over the attached `qd_m` tables: 8
    * array picks (whole-stage codegen `element_at`) + the fixed-order
    * fold `((t0 + t1) + t2)…` — value-identical to the r15 per-candidate
    * projection, which evaluated the identical term expression inline at
    * `k = code_m`.
    */
  private def adcTableDist: org.apache.spark.sql.Column =
    (0 until NumSubspaces).map(m =>
        element_at(col(s"qd_$m"), (col(s"code_$m") + lit(1)).cast("int")))
      .reduceLeft(_ + _)

  /** All-codes-present guard: the former distance-table INNER joins
    * dropped a row whose code was null (an all-null encode of a null
    * vector); the direct expression must drop it too, not rank a null
    * distance.
    */
  private def codesPresent: org.apache.spark.sql.Column =
    (0 until NumSubspaces).map(m => col(s"code_$m").isNotNull)
      .reduce(_ && _)

  private[graft] def adcSearch(codes: DataFrame, queries: DataFrame,
      book: Seq[CodebookEntry], k: Int = Similarity.TopK): DataFrame = {
    // the query relation broadcasts WITH its distance tables attached
    // (Q × M × K doubles — still a bounded broadcast); the code relation
    // streams through the one nested-loop fan-out paying 8 array picks
    // per candidate instead of recomputing the query-side slices/dots
    val q = broadcast(withDistTables(
      queries.select(col("vec_id").as("query_id"),
        col("embedding").as("q_emb")),
      book, "q_emb", Seq("query_id")))
    codes
      .filter(codesPresent)
      .crossJoin(q)
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        adcTableDist.as("adc_dist"))
      .withColumn("rank", row_number().over(Window.partitionBy("query_id")
        .orderBy(col("adc_dist").asc, col("neighbor_id"))))
      .filter(col("rank") <= k)
  }

  /** IVFPQ search — the composition FAISS ships as its default
    * billion-scale index: the IVF coarse quantizer prunes candidates to
    * the query's [[Similarity.NProbe]] nearest (occupancy-capped) lists,
    * and PQ codes score ONLY those candidates by ADC. Per query the work
    * is `nprobe/nlists` of the corpus in code arithmetic instead of a
    * full-corpus code scan ([[adcTopK]]) or a full-vector probe
    * ([[Similarity.ivfTopK]]) — at 10^10 vectors: probe ~10^8 codes
    * (2 bytes each) per query, no vector I/O at all.
    *
    * `byResidual = true` (the default, FAISS's billion-scale default):
    * codes quantize the LIST RESIDUAL `x − lvec(list(x))` rather than the
    * raw vector, so the bit budget describes only what the coarse
    * quantizer could not explain, and the distance tables are built per
    * (query, probed list) from the query's residual against that list's
    * leader. `byResidual = false` keeps the raw-vector encoding
    * (`by_residual=false`) — the code relation shared verbatim with
    * [[codes]] — as the comparison baseline [[PqSpec]] gates the residual
    * form's recall gain against.
    */
  def ivfpqTopK(emb: DataFrame, k: Int = Similarity.TopK,
      maxListOccupancy: Int = Similarity.MaxListOccupancy,
      byResidual: Boolean = true): DataFrame = {
    val book = if (byResidual) residualCodebook(emb) else codebook(emb)
    if (book.isEmpty) return emptyResult(emb, adcSchema)
    ivfpqTopKWith(emb, book, k, maxListOccupancy, byResidual)
  }

  /** [[ivfpqTopK]] over an explicit codebook — the seam [[adcRecallGate]]
    * drives its ivfpq leg through (the gate trains the residual book once
    * and passes it here instead of calling the default-arg entry point).
    */
  private def ivfpqTopKWith(emb: DataFrame, book: Seq[CodebookEntry],
      k: Int, maxListOccupancy: Int, byResidual: Boolean): DataFrame = {
    // IVF side: the SHARED capped-list probe candidates (one construction
    // with ivfTopK — the two paths cannot diverge from the oracle's
    // shared CTE chain); candidates already exclude self and carry the
    // probed list
    val (cand, assign) =
      Similarity.ivfProbeCandidates(emb, 0, maxListOccupancy)
    val queries = emb.filter(col("vec_id") % Similarity.QueryStride === 0)
    // PQ side: score the pruned candidates only. Distance tables are
    // built from the QUERY SLICE — building them from the full corpus
    // would broadcast an N-proportional relation per subspace
    val ranked =
      if (byResidual) residualLeg(cand, assign, emb, book, k)
      else {
        val joined = cand.join(codesWith(emb, book), Seq("vec_id"))
          .filter(codesPresent)
          .join(broadcast(withDistTables(
            queries.select(col("vec_id").as("query_id"),
              col("embedding").as("q_emb")),
            book, "q_emb", Seq("query_id"))), Seq("query_id"))
        rankAdc(joined, k)
      }
    Dedup.materializeFreeing(ranked, assign)
  }

  /** The residual encode + rank leg over EXPLICIT candidate/assignment
    * relations — ONE spelling shared by [[ivfpqTopKWith]] and
    * [[ivfpqTopKFrom]].
    */
  private def residualLeg(cand: DataFrame, assign: DataFrame,
      emb: DataFrame, book: Seq[CodebookEntry], k: Int): DataFrame = {
    val leadersDf = Similarity.ivfLeaders(emb)
    val queries = emb.filter(col("vec_id") % Similarity.QueryStride === 0)
    residualAdcRank(cand,
      residualCodesFor(assign, emb, leadersDf, book),
      queries, leadersDf, book, k)
  }

  /** The default-configuration residual IVFPQ search over EXPLICIT
    * (persisted, caller-owned) probe candidate + capped assignment
    * relations — the share seam: a battery memoizing
    * [[Similarity.ivfCappedAssignWith]]/`ivfCandidatesWith` feeds the
    * flat search, this search, and the code-store row from ONE
    * assignment build (r15 built it once per row).
    */
  private[graft] def ivfpqTopKFrom(cand: DataFrame, assign: DataFrame,
      emb: DataFrame, k: Int = Similarity.TopK): DataFrame = {
    val book = residualCodebook(emb)
    if (book.isEmpty) return emptyResult(emb, adcSchema)
    residualLeg(cand, assign, emb, book, k)
  }

  /** Residual ADC scoring + per-query rank over an EXPLICIT candidate
    * relation `(query_id, list_id, vec_id)` and residual code relation —
    * ONE construction shared by [[ivfpqTopK]] and the incremental store
    * search ([[graft.streaming.IncrementalIvfPqIndex.searchStore]]), so
    * the two paths cannot drift: only candidate GENERATION differs (the
    * batch operator's shared probe relation vs the store's capped lists).
    */
  private[graft] def residualAdcRank(cand: DataFrame, codes: DataFrame,
      queries: DataFrame, leadersDf: DataFrame, book: Seq[CodebookEntry],
      k: Int): DataFrame = {
    // r15 computed, PER CANDIDATE ROW, the query residual (an interpreted
    // 64-float zip_with) plus the full slice/dot distance expression —
    // work that depends only on the (query, probed list) pair, of which
    // there are ≤ Q × NProbe. r16 derives that pair relation from the
    // candidates (one id-width distinct — partial-aggregated map-side,
    // never a payload shuffle), computes each pair's residual ONCE with
    // the same zip_with/`graft_dot` folds (bit-identical doubles), folds
    // it into the per-pair distance tables, and broadcast-joins the
    // bounded table relation back onto the candidate stream — which now
    // pays 8 codegen'd array picks per row.
    val qlPairs = cand.select("query_id", "list_id").distinct()
      .join(broadcast(queries.select(col("vec_id").as("query_id"),
        col("embedding").as("q_emb"))), Seq("query_id"))
      .join(broadcast(leadersDf.select("list_id", "lvec")), Seq("list_id"))
      .withColumn("qres", expr(residualSql("q_emb", "lvec")))
    val qd = withDistTables(qlPairs, book, "qres", Seq("query_id", "list_id"))
    val joined = cand.join(codes, Seq("vec_id", "list_id"))
      .filter(codesPresent)
      .join(broadcast(qd), Seq("query_id", "list_id"))
    rankAdc(joined, k)
  }

  private def rankAdc(joined: DataFrame, k: Int): DataFrame =
    joined
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        adcTableDist.as("adc_dist"))
      .withColumn("rank", row_number().over(Window.partitionBy("query_id")
        .orderBy(col("adc_dist").asc, col("neighbor_id"))))
      .filter(col("rank") <= k)

  /** Recall floors for [[adcRecallGate]], in millionths. Loose by design
    * (see [[CodebookSize]] — the synthetic corpus is PQ's worst case):
    * the gate catches broken encode/ADC/prune math, where recall collapses
    * to chance ≈ k/N ≈ 0.02, not quantization noise. Measured on the sf
    * fixtures: ADC 0.28–0.32, residual IVFPQ 0.19–0.20 (the IVF prune
    * ceiling itself is 0.33). Note the i.i.d. near-orthogonal corpus is
    * the one geometry where residual encoding CANNOT beat raw codes —
    * subtracting a near-orthogonal unit leader raises the energy to
    * quantize (E‖x−l‖² ≈ 2 − 2·E[max cos] > 1) — so the floors stay
    * conservative here and [[PqSpec]] demonstrates the residual gain on a
    * clustered corpus, the geometry the FAISS default exists for.
    */
  val AdcRecallFloorMicro = 200000L
  val IvfpqRecallFloorMicro = 150000L

  /** The PQ accuracy gate, battery-shaped like the sketch `_err` queries:
    * approximate results are implementation-defined in general, so the
    * driver hash-checks the GATE — recall@k of [[adcTopK]] and
    * [[ivfpqTopK]] against the exact [[Similarity.bruteTopK]], integerized
    * and compared to the declared floors, returning a violation count that
    * must be zero. One row per method:
    * `(method, n_exact, n_overlap, recall_micro, floor_micro, violations)`.
    */
  def adcRecallGate(emb: DataFrame): DataFrame =
    adcRecallGateWith(emb, Similarity.bruteTopK(emb))

  /** [[adcRecallGate]] over ALREADY-COMPUTED search relations — the
    * reuse seam: a battery run materializes [[Similarity.bruteTopK]],
    * [[adcTopK]], and [[ivfpqTopK]] as their own checked queries, and
    * the gate grades THOSE relations instead of re-running all three
    * searches (`adcApprox`/`ivfpqApprox` must be the default-argument
    * [[adcTopK]]/[[ivfpqTopK]] results — the same relations the battery
    * checks). That contract is CHECKED, not trusted: a supplied relation
    * must carry the search schema and its max rank must EQUAL the
    * default k — a caller grading a different-k (smaller or larger) or
    * different-shape search refuses loudly instead of stamping the
    * wrong recall into the gate. The gate
    * itself is unchanged — same floors, same integerized recall; when
    * BOTH overrides are supplied no codebook trains at all (the gate
    * pays for the overlap joins plus one rank probe per relation), and
    * the degenerate-corpus degrade rides that probe: empty approx
    * relations mean the searches degraded to their emptyResult contract,
    * so the gate returns the empty result too, never a zero-recall
    * violation row.
    */
  def adcRecallGateWith(emb: DataFrame, exactTopK: DataFrame,
      adcApprox: Option[DataFrame] = None,
      ivfpqApprox: Option[DataFrame] = None): DataFrame = {
    // shape check on every supplied relation: the search schema, with
    // ranks bounded by the default k the gate's floors were declared at
    val supplied = Seq("adcApprox" -> adcApprox, "ivfpqApprox" -> ivfpqApprox)
    supplied.foreach {
      case (n, Some(df)) =>
        require(adcSchema.fieldNames.forall(df.columns.contains),
          s"adcRecallGateWith: $n must be a default-configuration search " +
            s"relation ${adcSchema.fieldNames.mkString("(", ", ", ")")}, " +
            s"got ${df.columns.mkString("(", ", ", ")")}")
      case _ => ()
    }
    val bothSupplied = adcApprox.isDefined && ivfpqApprox.isDefined
    // trains at most once per quantizer, and only when some leg needs it
    lazy val trainedBooks: (Seq[CodebookEntry], Seq[CodebookEntry]) =
      (codebook(emb), residualCodebook(emb))
    // EVERY supplied relation is probed, not just the both-supplied case
    // (a single-override caller must not bypass the contract): one tiny
    // agg doubles as the emptiness probe (null max = empty relation — a
    // degraded search, so the gate degrades too instead of stamping a
    // zero-recall violation row) and the row-shape check. The max rank
    // must EQUAL the default k, not merely fit under it: a relation
    // searched at a SMALLER k would pass a <= check and be graded
    // against default-k floors — a spurious low-recall violation, the
    // exact wrong-verdict the probe exists to refuse. The refusal is
    // deliberately strict: a default-configuration search over a corpus
    // too small to fill rank k (fewer than k candidates per query) also
    // refuses here, because the floors are calibrated at k neighbors
    // and grading a partial ranking against them is exactly as wrong as
    // grading a small-k search — at that corpus scale the gate is not a
    // meaningful measurement, and a loud refusal beats a junk verdict
    val anySuppliedEmpty = supplied.flatMap(_._2).exists { df =>
      val m = df.agg(max("rank")).head()
      if (!m.isNullAt(0)) require(m.getInt(0) == Similarity.TopK,
        s"adcRecallGateWith: supplied relation's max rank " +
          s"${m.getInt(0)} != the default k ${Similarity.TopK} — the " +
          "gate's floors grade the default-configuration search only " +
          "(a smaller- or larger-k search would stamp the wrong recall)")
      m.isNullAt(0)
    }
    // with both legs supplied no codebook trains at all; any leg the gate
    // must run itself needs BOTH quantizers trainable (the residual split:
    // exhaustive ADC scores raw-vector codes, IVFPQ residual codes) or it
    // degrades to the emptyResult contract every degenerate path honors
    val degenerate = anySuppliedEmpty ||
      (!bothSupplied &&
        (trainedBooks._1.isEmpty || trainedBooks._2.isEmpty))
    if (degenerate) return emptyResult(emb, gateSchema)
    val exact = exactTopK.select("query_id", "neighbor_id")
    def leg(method: String, approx: DataFrame, floorMicro: Long): DataFrame = {
      val overlap = exact.join(approx.select("query_id", "neighbor_id"),
        Seq("query_id", "neighbor_id"))
      exact.agg(count(lit(1)).as("n_exact"))
        .crossJoin(overlap.agg(count(lit(1)).as("n_overlap")))
        .select(
          lit(method).as("method"), col("n_exact"), col("n_overlap"),
          expr(s"CAST(floor((n_overlap * CAST($Micro1e6 AS DOUBLE)) / n_exact) AS BIGINT)")
            .as("recall_micro"),
          lit(floorMicro).as("floor_micro"))
        .withColumn("violations",
          when(col("recall_micro") >= col("floor_micro"), 0L).otherwise(1L))
    }
    def queries = emb.filter(col("vec_id") % Similarity.QueryStride === 0)
    leg("adc",
      adcApprox.getOrElse {
        val book = trainedBooks._1
        adcSearch(codesWith(emb, book), queries, book)
      },
      AdcRecallFloorMicro)
      .unionByName(leg("ivfpq",
        ivfpqApprox.getOrElse(ivfpqTopKWith(emb, trainedBooks._2,
          Similarity.TopK, Similarity.MaxListOccupancy, byResidual = true)),
        IvfpqRecallFloorMicro))
  }

  /** The residual IVFPQ code STORE view `(vec_id, list_id, code_0 …
    * code_{M−1}, pq_code)` over the capped lists — what a residual index
    * persists per vector: the list id plus M·[[CodeBits]] bits. The
    * battery checks it directly so an encode regression localizes here
    * instead of surfacing as a search-result hash drift.
    */
  def ivfpqCodes(emb: DataFrame,
      maxListOccupancy: Int = Similarity.MaxListOccupancy): DataFrame =
    ivfpqCodesFrom(
      Similarity.ivfCappedAssignWith(emb, Similarity.ivfLeaders(emb),
        maxListOccupancy),
      emb)

  /** [[ivfpqCodes]] over an EXPLICIT capped assignment — the share seam
    * (see [[ivfpqTopKFrom]]): the code-store row reads the battery's one
    * memoized assignment instead of rebuilding it.
    */
  private[graft] def ivfpqCodesFrom(assign: DataFrame,
      emb: DataFrame): DataFrame = {
    val book = residualCodebook(emb)
    if (book.isEmpty) return emptyResult(emb, residualCodesSchema)
    residualCodesFor(assign, emb, Similarity.ivfLeaders(emb), book)
  }

  /** Fixed-point scale for [[adcRecallGate]]'s integerized recall. */
  val Micro1e6 = 1000000L

  /** Corpus-mean squared quantization error of `book` over `emb` — the
    * index-health metric of a PQ deployment: Σ_m ‖x_m − c_{code_m}‖²
    * averaged over the corpus. One pass: encode (the kernel), explode to
    * (vector, subspace) rows referencing the already-computed code array,
    * one broadcast join against the codebook for the assigned centroid's
    * error term. Returns `(n_vectors, mean_qerr)`.
    *
    * Drift monitor for [[graft.streaming.PqMaintenance]]: a codebook
    * trained at bootstrap measures ever-worse against a corpus that has
    * moved — rising mean error is exactly "the codes stopped describing
    * the vectors".
    */
  def quantizationError(emb: DataFrame, book: Seq[CodebookEntry]): DataFrame = {
    val spark = emb.sparkSession
    if (book.isEmpty)
      return spark.sql("SELECT CAST(0 AS BIGINT) AS n_vectors, " +
        "CAST(NULL AS DOUBLE) AS mean_qerr")
    val withCodes = emb.select(
      col("vec_id") +:
        encodeCol(book, "embedding").as("carr") +:
        (0 until NumSubspaces).map(m => expr(subSql(m)).as(s"sub_$m")): _*)
    val subStructs = (0 until NumSubspaces)
      .map(m => s"struct($m AS m, sub_$m AS sub, carr[$m] AS k)")
      .mkString(", ")
    withCodes
      .select(col("vec_id"), expr(s"inline(array($subStructs))"))
      .join(broadcast(codebookDf(emb, book)), Seq("m", "k"))
      .select(col("vec_id"),
        ((expr("graft_dot(sub, sub)") -
          lit(2.0) * expr("graft_dot(sub, cvec)")) + col("cnorm2"))
          .as("err_m"))
      .agg(
        (count(lit(1)) / NumSubspaces).cast("bigint").as("n_vectors"),
        (sum("err_m") / (count(lit(1)) / NumSubspaces)).as("mean_qerr"))
  }

  private def emptyResult(emb: DataFrame,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    emb.sparkSession.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](), schema)

  private def codesSchema: org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(
      StructField("vec_id", LongType) +:
        ((0 until NumSubspaces).map(m => StructField(s"code_$m", LongType)) :+
          StructField("pq_code", LongType)))
  }

  private def residualCodesSchema: org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(
      StructField("vec_id", LongType) +: StructField("list_id", LongType) +:
        ((0 until NumSubspaces).map(m => StructField(s"code_$m", LongType)) :+
          StructField("pq_code", LongType)))
  }

  private def adcSchema: org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("query_id", LongType), StructField("neighbor_id", LongType),
      StructField("adc_dist", DoubleType), StructField("rank", IntegerType)))
  }

  private def gateSchema: org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("method", StringType), StructField("n_exact", LongType),
      StructField("n_overlap", LongType),
      StructField("recall_micro", LongType),
      StructField("floor_micro", LongType),
      StructField("violations", LongType)))
  }
}
