package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Benchmark decontamination: flag training documents that share word
 * n-grams with an evaluation corpus (the GPT-3 appendix-C / Llama-2
 * style overlap check — public method, e.g. Brown et al. 2020 §C).
 *
 * Scale shape: the benchmark side is eval sets — thousands of
 * documents, millions of distinct n-grams at most — so its distinct
 * n-gram set is BROADCAST; the 100 TB training side is touched by one
 * map-side join plus a single groupBy(id) shuffle that carries two
 * longs per document. Nothing on the big side is ever collected or
 * re-shuffled by n-gram.
 */
object Decontaminate {

  /**
   * The benchmark's distinct word n-gram set: one `sh` column,
   * globally distinct over ALL benchmark docs ([[Dedup.shingled]]
   * canonicalization). Callers needing both the overlap profile and
   * the filter compute this ONCE (persist it — it is eval-set-sized)
   * and pass it to both, instead of paying the benchmark shingle scan
   * twice.
   */
  def benchGrams(bench: DataFrame, benchTextCol: String, n: Int): DataFrame =
    // the id column is irrelevant here (shingled's per-row
    // array_distinct is per input row regardless of id, and only the
    // globally-distinct grams survive) — a constant keeps the plan
    // fully deterministic, where monotonically_increasing_id would
    // depend on partition layout
    Dedup.shingled(
        bench.select(lit(0L).as("__bid"), col(benchTextCol).as("__bt")),
        "__bid", "__bt", n)
      .select("sh").distinct()

  /**
   * Per-document overlap profile against the benchmark corpus:
   * (id, n_grams, n_hit, overlap_frac) over DISTINCT word n-grams of
   * the canonical text ([[Dedup.shingled]] semantics). Documents with
   * fewer than n tokens have zero shingles and are naturally absent —
   * they cannot be contaminated.
   *
   * `overlap_frac` is the fraction of the document's distinct n-grams
   * that appear anywhere in the benchmark; callers threshold it (or
   * `n_hit` ≥ 1 for the strict GPT-3 rule).
   */
  def ngramOverlap(
      docs: DataFrame, idCol: String, textCol: String,
      bench: DataFrame, benchTextCol: String, n: Int): DataFrame =
    ngramOverlapAgainst(docs, idCol, textCol, benchGrams(bench, benchTextCol, n), n)

  /** [[ngramOverlap]] against a precomputed [[benchGrams]] frame. */
  def ngramOverlapAgainst(
      docs: DataFrame, idCol: String, textCol: String,
      grams: DataFrame, n: Int): DataFrame = {
    val docGrams = Dedup.shingled(docs, idCol, textCol, n)
    // one pass: broadcast-mark each gram, count rows vs non-null marks
    // in the same aggregate (count(col) skips nulls)
    docGrams
      .join(broadcast(grams.withColumn("__hit", lit(1))), Seq("sh"), "left")
      .groupBy(col("id").as(idCol))
      .agg(
        count(lit(1)).as("n_grams"),
        count(col("__hit")).as("n_hit"))
      .withColumn("overlap_frac",
        round(col("n_hit").cast("double") / col("n_grams"), 6))
  }

  /**
   * The FIXED-BROADCAST form of [[ngramOverlap]] for benchmark suites
   * too large to broadcast as rows (hundreds of eval sets pile up to
   * hundreds of millions of distinct grams): the benchmark's gram set
   * folds into ONE Bloom filter via Spark's built-in
   * `bloom_filter_agg` (bitwise-OR mergeable partials, deterministic
   * hashing, codegen'd `might_contain` probes — the machinery Spark
   * itself uses for runtime row-group filtering), so the broadcast is
   * `numBits/8` bytes NO MATTER how many benchmarks accumulate, and
   * the corpus side stays one map-side probe plus the same
   * two-longs-per-doc groupBy.
   *
   * One-sided error, the fallback discipline: a Bloom has NO false
   * negatives, so every truly contaminated gram still counts —
   * per-doc `n_hit` is ≥ the exact join's and thresholding can only
   * drop MORE (conservative; spec-pinned). Size `numBits` for the
   * accumulated benchmark gram count (~10 bits/gram ≈ 1% FP at the
   * default 7 hashes Spark derives).
   */
  /** The benchmark's gram set folded into ONE Bloom synopsis —
    * `numBits/8` bytes no matter how many benchmarks accumulate.
    * BloomFilterAggregate is a Spark built-in (the runtime
    * row-group-filtering machinery) but not registered in the SQL
    * function registry — constructed directly via the expression
    * bridge, like the repo's other native expressions. The returned
    * bytes are what callers broadcast as a literal (might_contain
    * requires a CONSTANT filter — the IVF-centroid-table idiom: a
    * driver-held fixed-size model, never a data-sized collect). */
  def benchGramsBloom(
      bench: DataFrame, benchTextCol: String, n: Int,
      estimatedGrams: Long = 1L << 20, numBits: Long = 1L << 23): Array[Byte] = {
    import org.apache.spark.sql.graft.ColumnBridge.{catalystExpression, column}
    val bloomAgg = column(
      new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
        catalystExpression(xxhash64(col("sh"))),
        org.apache.spark.sql.catalyst.expressions.Literal(estimatedGrams),
        org.apache.spark.sql.catalyst.expressions.Literal(numBits))
        .toAggregateExpression())
    benchGrams(bench, benchTextCol, n).agg(bloomAgg.as("__bf"))
      .head().getAs[Array[Byte]](0)
  }

  /** Codegen'd Bloom membership probe of `xxhash64(c)`, with the
    * filter riding a BROADCAST — not a plan `Literal(BinaryType)`:
    * embedding the synopsis bytes in the plan grows the serialized
    * task binary by numBits/8 per filter (1 MiB at the default
    * sizing — the r17 `weak`), where a broadcast is resolved once per
    * task by the existing [[graft.plans.BloomMightContainExpr]]
    * codegen and keeps plan size independent of the synopsis. The
    * hashing is identical on both paths: `BloomFilterAggregate`
    * inserts the xxhash64 longs via `putLong` and the sketch's
    * `mightContainLong` is what both Spark's own
    * `BloomFilterMightContain` and our expression call. */
  private def bloomHit(
      spark: org.apache.spark.sql.SparkSession,
      bfBytes: Array[Byte], c: Column): Column =
    graft.plans.BloomMightContainExpr.mightContain(
      xxhash64(c),
      spark.sparkContext.broadcast(
        org.apache.spark.util.sketch.BloomFilter.readFrom(
          new java.io.ByteArrayInputStream(bfBytes))))

  def ngramOverlapBloom(
      docs: DataFrame, idCol: String, textCol: String,
      bench: DataFrame, benchTextCol: String, n: Int,
      estimatedGrams: Long = 1L << 20, numBits: Long = 1L << 23): DataFrame =
    ngramOverlapBloomAgainst(docs, idCol, textCol,
      benchGramsBloom(bench, benchTextCol, n, estimatedGrams, numBits), n)

  /** [[ngramOverlapBloom]] against a PRECOMPUTED synopsis — the probe
    * half, split out (the [[ngramOverlapBySuiteBloomAgainst]] pattern)
    * so callers that already hold the filter bytes (a persisted store,
    * or a pipeline that builds several synopses concurrently) never
    * rebuild the aggregate. */
  def ngramOverlapBloomAgainst(
      docs: DataFrame, idCol: String, textCol: String,
      bfBytes: Array[Byte], n: Int): DataFrame = {
    val hit = bloomHit(docs.sparkSession, bfBytes, col("sh"))
    Dedup.shingled(docs, idCol, textCol, n)
      .groupBy(col("id").as(idCol))
      .agg(
        count(lit(1)).as("n_grams"),
        sum(when(hit, 1L).otherwise(0L)).as("n_hit"))
      .withColumn("overlap_frac",
        round(col("n_hit").cast("double") / col("n_grams"), 6))
  }

  /** The STRICT rule ([[removeContaminated]]) in the fixed-broadcast
    * Bloom form: a doc drops when ANY of its grams might be in the
    * benchmark synopsis. One-sided error — no false negatives, so
    * every truly contaminated doc still drops and the Bloom can only
    * drop MORE (conservative; at the default ~8 bits/gram sizing the
    * extra-drop probability is ~1e-13 per corpus, unobservable). Use
    * [[benchGramsBloom]] once per accumulated benchmark suite and pass
    * the bytes here when gating many corpora against it. */
  def removeContaminatedBloomAgainst(
      docs: DataFrame, idCol: String, textCol: String,
      bfBytes: Array[Byte], n: Int): DataFrame = {
    val contaminatedIds = Dedup.shingled(docs, idCol, textCol, n)
      .filter(bloomHit(docs.sparkSession, bfBytes, col("sh")))
      .select(col("id").as(idCol)).distinct()
    docs.join(contaminatedIds, Seq(idCol), "left_anti")
  }

  /**
   * Per-(document, eval-suite) contamination ATTRIBUTION — the
   * data-card form of [[ngramOverlap]] once many eval suites
   * accumulate: a production curation run records not just THAT a
   * document overlaps the benchmark pool but WHICH suite(s) hit it
   * (so a suite can be re-run cleanly after the fact, and a
   * high-value doc contaminated by one niche suite can be re-admitted
   * for every other evaluation). Returns one row per (doc, suite)
   * pair sharing ≥ 1 distinct word n-gram: `(idCol, suite, n_grams,
   * n_hit, overlap_frac)` — a doc hit by k suites carries k rows,
   * unhit docs are absent (the [[ngramOverlap]] absence contract),
   * and `n_grams` is the doc's own distinct-gram count so each row's
   * fraction is self-contained.
   *
   * Scale shape: the (suite, gram) set is eval-suite-sized and
   * BROADCAST (its size is why [[ngramOverlapBloom]] exists for the
   * yes/no question — attribution inherently needs the labeled
   * grams); the corpus pays two map-only shingle passes (per-doc
   * totals, then the hit join) plus a groupBy(id, suite) that
   * carries only hit rows. Nothing corpus-sized shuffles by gram.
   */
  def ngramOverlapBySuite(
      docs: DataFrame, idCol: String, textCol: String,
      bench: DataFrame, suiteCol: String, benchTextCol: String,
      n: Int): DataFrame = {
    val suiteGrams = benchSuiteGrams(bench, suiteCol, benchTextCol, n)
    val docGrams = Dedup.shingled(docs, idCol, textCol, n)
    val totals = docGrams.groupBy("id").agg(count(lit(1)).as("n_grams"))
    docGrams.join(broadcast(suiteGrams), Seq("sh"))
      .groupBy(col("id"), col("suite"))
      .agg(count(lit(1)).as("n_hit"))
      .join(totals, Seq("id"))
      .select(col("id").as(idCol), col("suite"), col("n_grams"), col("n_hit"),
        round(col("n_hit").cast("double") / col("n_grams"), 6).as("overlap_frac"))
  }

  /**
   * [[ngramOverlapBySuite]] in the FIXED-BROADCAST form — one Bloom
   * synopsis PER SUITE instead of the labeled-gram row broadcast: the
   * attribution table's driver/broadcast footprint becomes
   * |suites| · numBits/8 bytes, bounded by the suite COUNT rather
   * than the accumulated gram volume (the [[ngramOverlapBloom]]
   * argument, kept per label so attribution survives). Per suite the
   * error is one-sided: `n_hit` ≥ the exact form's and a (doc, suite)
   * row can only be ADDED, never lost — conservative, spec-pinned on
   * a starved filter. The corpus side probes all |suites| synopses in
   * ONE map-only pass ([[graft.plans.BloomsHitIndicesExpr]] over ONE
   * broadcast array of filters — plan/task-binary size independent of
   * suite count, spec-pinned) and only hit rows reach the groupBy.
   */
  def ngramOverlapBySuiteBloom(
      docs: DataFrame, idCol: String, textCol: String,
      bench: DataFrame, suiteCol: String, benchTextCol: String, n: Int,
      estimatedGrams: Long = 1L << 20, numBits: Long = 1L << 23): DataFrame =
    ngramOverlapBySuiteBloomAgainst(docs, idCol, textCol,
      benchSuiteBlooms(bench, suiteCol, benchTextCol, n, estimatedGrams, numBits), n)

  /** [[ngramOverlapBySuiteBloom]] against PRECOMPUTED per-suite
    * synopses — the probe half, split out so callers that persist the
    * synopses (a production run accumulates suites incrementally;
    * [[SuiteSynopsisStore]]) never rebuild filters already on disk. */
  def ngramOverlapBySuiteBloomAgainst(
      docs: DataFrame, idCol: String, textCol: String,
      blooms: Seq[(String, Array[Byte])], n: Int): DataFrame = {
    require(blooms.nonEmpty, "ngramOverlapBySuiteBloom: benchmark has no suites")
    // ONE broadcast holds every suite's deserialized filter — the plan
    // carries a single broadcast reference no matter how many suites
    // accumulate (vs ~numBits/8 plan-Literal bytes PER SUITE, the r17
    // task-binary hazard; size independence spec-pinned at 4 vs 64
    // suites). The probe returns the hit INDICES in one codegen'd
    // pass; only hit rows survive the explode, and the index→name map
    // is a |suites|-string literal lookup (bytes, not synopses).
    val spark = docs.sparkSession
    // deterministic index→name mapping regardless of caller order
    val sorted = blooms.sortBy(_._1)
    val suiteNames = sorted.map(_._1)
    val bcast = spark.sparkContext.broadcast(
      sorted.map { case (_, bytes) =>
        org.apache.spark.util.sketch.BloomFilter.readFrom(
          new java.io.ByteArrayInputStream(bytes))
      }.toArray)
    val docGrams = Dedup.shingled(docs, idCol, textCol, n)
    val totals = docGrams.groupBy("id").agg(count(lit(1)).as("n_grams"))
    docGrams
      .select(col("id"),
        explode(graft.plans.BloomsHitIndicesExpr.hitIndices(
          xxhash64(col("sh")), bcast)).as("__si"))
      .groupBy(col("id"), col("__si"))
      .agg(count(lit(1)).as("n_hit"))
      .join(totals, Seq("id"))
      .select(col("id").as(idCol),
        element_at(typedLit(suiteNames), col("__si") + 1).as("suite"),
        col("n_grams"), col("n_hit"),
        round(col("n_hit").cast("double") / col("n_grams"), 6).as("overlap_frac"))
  }

  /** The benchmark pool's distinct (suite, gram) set. Shingling keys
    * directly on the SUITE column — [[Dedup.shingled]]'s per-row
    * `array_distinct` is per input row (= per bench doc) regardless of
    * the id it carries, and the trailing distinct collapses docs of
    * one suite sharing a gram — so no synthetic row id exists at all.
    * (The previous form keyed rows with monotonically_increasing_id
    * and re-evaluated the bench frame in two plan branches; mIID is
    * nondeterministic across evaluations, so a task retry or sampled
    * input could silently attribute grams to the wrong suite.) */
  private def benchSuiteGrams(
      bench: DataFrame, suiteCol: String, benchTextCol: String, n: Int): DataFrame =
    Dedup.shingled(
        bench.select(col(suiteCol).as("__suite"), col(benchTextCol).as("__bt")),
        "__suite", "__bt", n)
      .select(col("id").as("suite"), col("sh")).distinct()

  /** One Bloom synopsis per suite of a benchmark pool — the
    * build half of [[ngramOverlapBySuiteBloom]], public so callers
    * can persist the synopses and probe them later
    * ([[ngramOverlapBySuiteBloomAgainst]]). */
  def benchSuiteBlooms(
      bench: DataFrame, suiteCol: String, benchTextCol: String, n: Int,
      estimatedGrams: Long = 1L << 20,
      numBits: Long = 1L << 23): Seq[(String, Array[Byte])] =
    suiteBlooms(benchSuiteGrams(bench, suiteCol, benchTextCol, n),
      estimatedGrams, numBits)

  /** One Bloom synopsis per suite from a (suite, sh) frame: ONE
    * grouped aggregate builds every filter; the collect is |suites|
    * rows of numBits/8 bytes each — suite-count-bounded, the
    * IVF-centroid-table idiom (a driver-held fixed-size model). */
  private def suiteBlooms(
      suiteGrams: DataFrame,
      estimatedGrams: Long, numBits: Long): Seq[(String, Array[Byte])] = {
    import org.apache.spark.sql.graft.ColumnBridge.{catalystExpression, column}
    val bloomAgg = column(
      new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
        catalystExpression(xxhash64(col("sh"))),
        org.apache.spark.sql.catalyst.expressions.Literal(estimatedGrams),
        org.apache.spark.sql.catalyst.expressions.Literal(numBits))
        .toAggregateExpression())
    suiteGrams
      .groupBy("suite").agg(bloomAgg.as("__bf"))
      .collect().toSeq
      .map(r => r.getString(0) -> r.getAs[Array[Byte]](1))
      .sortBy(_._1)
  }

  /**
   * N-gram NOVELTY scoring — the measuring half of decontamination:
   * for each document, the fraction of its distinct word n-grams that
   * appear nowhere in a reference snapshot
   * `(id, n_ngrams, n_novel, novelty)`. High novelty = new content
   * worth keeping; near-zero novelty = the snapshot already covers it
   * (the continuous-crawl freshness signal).
   *
   * Unlike [[ngramOverlap]]'s eval-set-sized benchmark, the reference
   * snapshot here can be corpus-sized (yesterday's crawl), so its
   * distinct gram set is NOT broadcast: both sides shuffle once on the
   * shingle key into a hash-bucketed left join, and AQE splits any
   * hot-shingle skew. Documents with fewer than n tokens have no
   * n-grams and are naturally absent.
   */
  def novelty(
      docs: DataFrame, reference: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = {
    val docGrams = Dedup.shingled(docs, idCol, textCol, n)
    val refGrams = Dedup.shingled(reference, idCol, textCol, n)
      .select("sh").distinct()
    docGrams
      .join(refGrams.withColumn("__hit", lit(1)), Seq("sh"), "left")
      .groupBy(col("id").as(idCol))
      .agg(
        count(lit(1)).as("n_ngrams"),
        (count(lit(1)) - count(col("__hit"))).as("n_novel"))
      .withColumn("novelty",
        round(col("n_novel").cast("double") / col("n_ngrams"), 6))
  }

  /** Convenience filter: training docs with NO n-gram overlap with the
    * benchmark (strict decontamination — any shared n-gram drops the
    * document). Anti-join keeps docs whose grams never match, plus
    * docs too short to have grams. */
  def removeContaminated(
      docs: DataFrame, idCol: String, textCol: String,
      bench: DataFrame, benchTextCol: String, n: Int): DataFrame =
    removeContaminatedAgainst(docs, idCol, textCol, benchGrams(bench, benchTextCol, n), n)

  /** [[removeContaminated]] against a precomputed [[benchGrams]] frame. */
  def removeContaminatedAgainst(
      docs: DataFrame, idCol: String, textCol: String,
      grams: DataFrame, n: Int): DataFrame = {
    val contaminatedIds = Dedup.shingled(docs, idCol, textCol, n)
      .join(broadcast(grams), Seq("sh"), "left_semi")
      .select(col("id").as(idCol)).distinct()
    docs.join(contaminatedIds, Seq(idCol), "left_anti")
  }

  /**
   * SEMANTIC (embedding-space) contamination vs an eval-suite table —
   * the modality the n-gram check is structurally blind to: a
   * paraphrased or translated eval item shares no 13-gram with its
   * source but sits next to it in embedding space (the SemDeDup-era
   * argument, Abbas et al. 2023, applied to decontamination). Per
   * training doc: the MAX cosine over ALL suite vectors and the
   * arg-max suite row (`nearest_id`, ties to the smallest suite id —
   * deterministic). Only docs at `cos ≥ threshold` are emitted — the
   * attribution rows a data card records, [[ngramOverlapBySuite]]'s
   * shape in the embedding modality.
   *
   * Scale shape: an eval suite is thousands-to-millions of vectors —
   * broadcast-sized BY DEFINITION (the same bound [[benchGrams]]
   * rides) — so the suite side is broadcast and the corpus side is
   * touched by ONE map-side nested-loop scan; the per-doc max is a
   * map-side partial aggregate, so the only shuffle carries ONE row
   * per doc (the groupBy(id) combine). Nothing corpus-sized is
   * collected, re-shuffled by vector, or materialized pairwise: the
   * |docs|×|suite| product exists only inside the per-task loop.
   * Cosines are rounded to 6 decimals ([[SimilaritySearch.pairCos]])
   * so engine and oracle rank and threshold identically. The arg-max
   * rides [[graft.plans.TopKAgg]] at k=1 (score DESC, id ASC — the
   * tie goes to the SMALLEST suite id): a bounded hash aggregate,
   * where `max(struct(cos, -id))` would fall back to a per-task SORT
   * of the whole doc×suite product (struct max is sort-based).
   */
  def semanticOverlap(
      docs: DataFrame, idCol: String, embCol: String,
      suite: DataFrame, suiteIdCol: String, suiteEmbCol: String,
      threshold: Double): DataFrame = {
    import graft.functions.VectorFunctions
    val dn = docs.select(col(idCol), col(embCol).as("__dv"))
      .withColumn("__dn", VectorFunctions.l2Norm(col("__dv")))
    val sn = suite.select(col(suiteIdCol).as("__sid"), col(suiteEmbCol).as("__sv"))
      .withColumn("__sn", VectorFunctions.l2Norm(col("__sv")))
    val top1 = graft.plans.TopKAgg.topK(1)
    dn.join(broadcast(sn))
      .withColumn("__cos",
        SimilaritySearch.pairCos(col("__dv"), col("__dn"), col("__sv"), col("__sn")))
      .groupBy(col(idCol))
      .agg(top1(col("__cos"), col("__sid")).as("__tops"))
      .select(col(idCol),
        col("__tops").getItem(0).getField("id").as("nearest_id"),
        col("__tops").getItem(0).getField("score").as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** The strict semantic gate: drop every doc with ANY suite vector at
    * cosine ≥ threshold; all doc columns survive. Docs without an
    * embedding row simply never match ([[semanticOverlap]] sees only
    * rows present in `docs`). */
  def removeSemanticContaminated(
      docs: DataFrame, idCol: String, embCol: String,
      suite: DataFrame, suiteIdCol: String, suiteEmbCol: String,
      threshold: Double): DataFrame =
    docs.join(
      semanticOverlap(docs, idCol, embCol, suite, suiteIdCol, suiteEmbCol, threshold)
        .select(col(idCol)),
      Seq(idCol), "left_anti")
}
