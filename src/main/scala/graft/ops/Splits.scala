package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions.tokens

/** Dataset splitting, mixing, and packing — the assignment operators a
  * training-data pipeline runs after curation: deterministic train/val/
  * test splits, per-domain mixture sampling, balanced per-stratum draws,
  * and context-window sequence packing.
  *
  * Everything is keyed on content hashes (md5), never `rand()`: the same
  * corpus produces the same split/mixture/packing on every engine, every
  * run, any partitioning — the reproducibility contract training jobs
  * need for resumable preprocessing and honest ablations. All of these
  * are narrow per-row transforms or single-window passes; nothing
  * shuffles payload text except the pack window, which is per-shard by
  * construction.
  */
object Splits {

  /** 0-255 content bucket: the first byte of md5(content) — the shared
    * assignment key for splits and mixtures. Content-keyed so re-crawled
    * duplicates land in the same split (no train/test leakage through a
    * changed surrogate id).
    */
  def contentBucket(content: Column): Column =
    graft.functions.Expressions.md5_bits(content, 2)

  /** Deterministic train/val/test assignment: bucket < `trainUpto` →
    * train, < `valUpto` → val, else test (fractions of 256; defaults
    * ≈ 80/10/10). A pure narrow projection — at 100 TB this is a zero-
    * shuffle map a split-membership filter pushes straight into.
    */
  def hashSplit(docs: DataFrame, idCol: String, contentCol: String,
                trainUpto: Int = 205, valUpto: Int = 230): DataFrame =
    docs.select(col(idCol), contentBucket(col(contentCol)).as("bucket"))
      .withColumn("split",
        when(col("bucket") < trainUpto, lit("train"))
          .when(col("bucket") < valUpto, lit("val"))
          .otherwise(lit("test")))

  /** Leakage-safe train/val/test split: assignment is keyed on the
    * near-dup CLUSTER representative's content, so a cluster of near
    * duplicates can never straddle splits — the eval-contamination
    * failure mode [[hashSplit]] still has (it keys on each doc's own
    * content, and near-dups differ in a few bytes). `pairs` is any
    * near-dup pair table (id_a, id_b) — MinHash-LSH, SimHash, n-gram
    * Jaccard; singletons are their own cluster, so un-paired docs split
    * exactly like hashSplit of the doc's own text.
    *
    * Scale shape: components over the pair table (min-label, bounded
    * rounds), one join back for the representative's content, then the
    * same narrow bucket projection as hashSplit — the pair table is
    * LSH-bounded, never all-pairs.
    */
  def leakageSafeSplit(docs: DataFrame, idCol: String, contentCol: String,
                       pairs: DataFrame, trainUpto: Int = 205,
                       valUpto: Int = 230): DataFrame = {
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
    val comps = graft.operators.Graph.connectedComponents(edges,
      extraNodes = Some(docs.select(col(idCol).as("node"))))
    val repContent = docs.select(col(idCol).as("component"),
      col(contentCol).as("__rep_content"))
    docs.select(col(idCol))
      .join(comps.withColumnRenamed("node", idCol), Seq(idCol))
      .join(repContent, Seq("component"))
      .select(col(idCol), col("component"),
        contentBucket(col("__rep_content")).as("bucket"))
      .withColumn("split",
        when(col("bucket") < trainUpto, lit("train"))
          .when(col("bucket") < valUpto, lit("val"))
          .otherwise(lit("test")))
  }

  /** Per-domain mixture sampling (static domain reweighting): keep a row
    * iff its content bucket falls under the domain's rate (in 256ths).
    * Domains absent from `rates` are dropped — an explicit mixture is
    * also an explicit exclusion list. Narrow filter, no shuffle.
    */
  def mixtureSample(docs: DataFrame, idCol: String, contentCol: String,
                    domainCol: String, rates: Map[String, Int]): DataFrame = {
    val rate = rates.foldLeft(lit(0)) { case (acc, (domain, r)) =>
      when(col(domainCol) === domain, lit(r)).otherwise(acc)
    }
    docs.select(col(idCol), col(domainCol),
        contentBucket(col(contentCol)).as("bucket"))
      .filter(col("bucket") < rate)
  }

  /** Square-root temperature mixture (alpha = 0.5 source rebalancing —
    * the multilingual/source-flattening resample of mBERT/XLM-style
    * pipelines): source `s` with `n_s` documents is kept at a rate
    * proportional to `sqrt(n_s) / n_s`, so the KEPT corpus's source
    * shares follow `sqrt(n_s) / sum(sqrt)` — rare sources are
    * up-weighted relative to their raw share, dominant sources
    * down-weighted — with the overall kept fraction steered by
    * `targetPermille`. Alpha is fixed at 0.5 on purpose: `sqrt` is
    * IEEE-correctly-rounded on every engine while `pow(n, alpha)` goes
    * through exp/ln and diverges across libm builds — the oracle
    * reproduces this operator exactly.
    *
    * All rate math is integer once past the one exact `sqrt`:
    * `sqrt_scaled = floor(sqrt(n) * 100)` per source (integer-summed, so
    * the total is order-independent — a float sum over sources would
    * differ in ULPs by visit order), then
    * `keep_permille = min(1000, (targetPermille * N * sqrt_scaled) div
    * (S * n_s))`, and the per-row keep test is the usual 20-bit md5
    * content bucket: `bucket * 1000 < keep_permille * 2^20`.
    * Deterministic, content-keyed, reproducible anywhere. The rate
    * products run in decimal(38,0) (the engine twin of the oracle's
    * HUGEINT promotion), so corpus size never silently wraps them; the
    * resulting permille is back in long range by definition.
    *
    * Plan shape: one map-side-combinable count per source, the
    * per-source rate table re-joined hint-free (named-dataset mixtures
    * keep it tiny and AQE broadcasts it; per-domain mixing makes it
    * web-scale and the join shuffles on the source key instead), and a
    * narrow filter — the corpus itself never shuffles in the broadcast
    * regime.
    */
  def mixtureSqrtSample(docs: DataFrame, idCol: String, contentCol: String,
                        sourceCol: String,
                        targetPermille: Int = 500): DataFrame = {
    require(targetPermille >= 0 && targetPermille <= 1000,
      s"targetPermille must be in [0, 1000], got $targetPermille")
    val counts = docs.groupBy(col(sourceCol)).agg(count(lit(1)).as("__n"))
      .withColumn("__ss", floor(sqrt(col("__n")) * 100).cast("long"))
    val totals = counts.agg(sum(col("__n")).as("__tot_n"),
      sum(col("__ss")).as("__tot_ss"))
    val rates = counts.crossJoin(broadcast(totals))
      .select(col(sourceCol),
        least(lit(1000L),
          expr(s"CAST(($targetPermille * CAST(__tot_n AS DECIMAL(38,0)) * __ss)" +
            s" div (CAST(__tot_ss AS DECIMAL(38,0)) * __n) AS BIGINT)"))
          .as("keep_permille"))
    docs.join(rates, sourceCol)
      .filter(graft.functions.Expressions.md5_bits(col(contentCol), 5) * lit(1000L) <
        col("keep_permille") * lit(1048576L))
  }

  /** Score-proportional deterministic sampling — the consumer of a
    * quality or link-authority score ([[graft.operators.Graph.pageRankScaled]],
    * `TextAnalysis.qualityStats`): keep probability ≈
    * `min(1, score * targetPermille / (1000 * mean(score)))`, so a
    * mean-scored document survives at `targetPermille`/1000 and rank
    * mass shifts the corpus toward high-authority pages WITHOUT an
    * order-by (no global sort, no rand()). The keep test is pure
    * integer arithmetic on a 20-bit content-hash bucket —
    * `bucket * (sum div n) < ((score * targetPermille) div 1000) * 2^20`
    * — deterministic, reproducible on any engine, content-keyed like
    * every sampler here. One tiny broadcast row carries (sum, n); the
    * filter itself is a narrow scan.
    *
    * `scoreCol` must be integral (a scaled long, e.g. rank_scaled at
    * 1e9 = rank 1.0) and non-negative; keep the scale under ~1e12 so
    * the 20-bit product stays inside 64 bits. Null scores drop. The
    * corpus-wide score sum accumulates in decimal(38,0) — a long sum
    * would silently wrap past ~9e18 total score mass (the DuckDB
    * oracle's SUM(BIGINT) promotes to HUGEINT; this is the engine
    * twin); the mean itself is back in long range by construction.
    */
  def scoreWeightedSample(docs: DataFrame, idCol: String, contentCol: String,
                          scoreCol: String,
                          targetPermille: Int = 500): DataFrame = {
    require(targetPermille >= 0 && targetPermille <= 1000,
      s"targetPermille must be in [0, 1000], got $targetPermille")
    val stats = docs.agg(sum(col(scoreCol).cast("decimal(38,0)")).as("__sum"),
      count(lit(1)).as("__n"))
    val bucket = graft.functions.Expressions.md5_bits(col(contentCol), 5)
    docs.crossJoin(broadcast(stats))
      .filter(bucket * expr("CAST(__sum div __n AS BIGINT)") <
        expr(s"(`$scoreCol` * $targetPermille) div 1000") * lit(1048576L))
      .drop("__sum", "__n")
  }

  /** Priority sampling (Duffield-Lund-Thorup 2007): an exact-size-k
    * weighted sample WITHOUT replacement per group, with the
    * Horvitz-Thompson weight estimator that makes subset sums unbiased
    * — the principled "keep k documents, weighted by quality/length,
    * and still estimate corpus totals" primitive
    * ([[scoreWeightedSample]] is its Bernoulli cousin: rate-targeted,
    * size only in expectation). Priority q = (w << 30) div u with u a
    * content-derived uniform in [1, 2^30] (md5, never rand() — same
    * corpus, same sample, any engine/partitioning); keep the k largest
    * q per group; threshold tau = the (k+1)-th priority (0 when the
    * group fits entirely); estimator w_hat = max(w, tau). Every step is
    * truncating BIGINT arithmetic, so a SQL oracle replays it verbatim.
    *
    * Scale shape: only (id, group, w, q) enter the window shuffle —
    * never the payload; the rank filter bounds output at k rows per
    * group (a TopK-rewritable pattern). `weightCol` must be a positive
    * integral (scaled) column with w < 2^33 so q = w·2^30 stays in
    * range. Ties in q break by id; the tie rule is part of the
    * deterministic contract.
    */
  def prioritySample(docs: DataFrame, idCol: String, contentCol: String,
                     weightCol: String, groupCol: String, k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("q").desc, col(idCol))
    val wGrp = Window.partitionBy(col(groupCol))
    docs.select(col(idCol), col(groupCol), col(weightCol),
        (graft.functions.Expressions.md5_bits(col(contentCol), 8)
          % 1073741824L + 1L).as("__u"))
      .withColumn("q", expr(s"(`$weightCol` * 1073741824L) div __u"))
      .drop("__u")
      .withColumn("__rn", row_number().over(w))
      .withColumn("tau",
        coalesce(max(when(col("__rn") === k + 1, col("q"))).over(wGrp), lit(0L)))
      .filter(col("__rn") <= k)
      .withColumn("w_hat", greatest(col(weightCol), col("tau")))
      .drop("__rn")
  }

  /** Balanced per-stratum draw: the `nPerGroup` rows of each stratum with
    * the smallest content hash — equal-count stratified sampling with a
    * deterministic, content-keyed order (ties broken by id). One window
    * shuffle partitioned by the stratum; skew is bounded by the largest
    * stratum, and the rank filter cuts before anything wide happens.
    */
  def stratifiedTopN(docs: DataFrame, idCol: String, contentCol: String,
                     groupCol: String, nPerGroup: Int): DataFrame = {
    // only (id, group, hash) enter the window shuffle — never the payload
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("__h"), col(idCol))
    docs.select(col(idCol), col(groupCol), md5(col(contentCol)).as("__h"))
      .withColumn("pick_rank", row_number().over(w).cast("long"))
      .filter(col("pick_rank") <= nPerGroup)
      .drop("__h")
  }

  /** Per-domain token budget cap: admit each domain's documents in
    * deterministic content-hash order until the domain's cumulative
    * token count reaches `budget` — the "N tokens per source" quota a
    * mixture spec turns into at materialization time. The EXCLUSIVE
    * running total decides admission (a doc is admitted while the
    * budget is not yet exhausted, so every domain with any documents
    * contributes at least one). One window shuffle carrying only
    * (id, domain, hash, n_tokens) — never the payload; at 100 TB the
    * per-domain windows run in parallel and skew is bounded by the
    * largest domain.
    */
  def tokenBudgetCap(docs: DataFrame, idCol: String, textCol: String,
                     domainCol: String, budget: Long): DataFrame = {
    val w = Window.partitionBy(col(domainCol)).orderBy(col("__h"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs.select(col(idCol), col(domainCol), md5(col(textCol)).as("__h"),
        size(tokens(col(textCol))).cast("long").as("n_tokens"))
      .withColumn("pre", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .filter(col("pre") < budget)
      .drop("__h")
  }

  /** Contiguous sequence packing: lay documents end-to-end in id order
    * within each shard and cut bins every `budget` tokens — each doc gets
    * (bin, bin_offset) so a reader can assemble fixed-size context
    * windows without a second pass. Packing is per-`shardCol` (one window
    * shuffle, shards pack in parallel); a global pack of a 100 TB corpus
    * would serialize on a single partition, which is exactly why
    * production packing is sharded. Documents longer than `budget`
    * overflow their bin — contiguous packing never reorders or splits
    * content, it only indexes it.
    */
  def packSequences(docs: DataFrame, idCol: String, textCol: String,
                    shardCol: String, budget: Int): DataFrame = {
    val w = Window.partitionBy(col(shardCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs.select(col(idCol), col(shardCol),
        size(tokens(col(textCol))).cast("long").as("n_tokens"))
      .withColumn("pre", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      // integral div/mod on longs, not floor(double-divide): exact for
      // any cumulative token count (doubles lose integers past 2^53)
      .withColumn("bin", expr(s"pre div ${budget}L"))
      .withColumn("bin_offset", col("pre") % budget)
      .drop("pre")
  }

  /** Length-bucketed batch formation — the padding-minimizing batcher a
    * training loader runs: documents are grouped into length buckets
    * (`bucketWidth` tokens wide), batches of `batchSize` are cut within
    * each bucket in id order, and every document is charged its padding
    * waste against the LONGEST member of its batch (what the loader
    * actually pads to). Complements [[packSequences]]: packing
    * concatenates, bucketing batches similarly-sized documents — the two
    * standard answers to padding overhead.
    *
    * Two window passes over the bucket partitioning (row_number, then
    * max over the assembled batch) — one exchange on the bucket key;
    * buckets are independent and parallel at any corpus size, and the
    * bucket key is near-uniform by construction (length distribution
    * sliced into fixed bands).
    */
  def lengthBucketBatches(docs: DataFrame, idCol: String, textCol: String,
                          bucketWidth: Int, batchSize: Int): DataFrame = {
    require(bucketWidth >= 1 && batchSize >= 1)
    val wBatch = Window.partitionBy(col("bucket"), col("batch_id"))
    docs.select(col(idCol),
        size(tokens(col(textCol))).cast("long").as("n_tokens"))
      .withColumn("bucket", expr(s"n_tokens div ${bucketWidth}L"))
      .withColumn("batch_id",
        expr(s"(row_number() OVER (PARTITION BY bucket ORDER BY ${idCol}) - 1) " +
          s"div ${batchSize}L"))
      .withColumn("batch_max", max(col("n_tokens")).over(wBatch))
      .withColumn("pad_waste", col("batch_max") - col("n_tokens"))
  }

  /** Nucleus (top-p) mass filter: per group, keep the highest-scoring
    * rows whose cumulative score mass stays under `permille`/1000 of
    * the group total — the data-curation analogue of nucleus sampling
    * ("keep the head that carries 90% of the quality mass"), and the
    * budgeted cousin of [[tokenBudgetCap]] where the budget is a
    * FRACTION of group mass rather than an absolute count. Scores must
    * be non-negative integers (integerize upstream: cents, milli
    * units); the keep test cross-multiplies (1000·prefix <
    * permille·total), so membership is engine-exact. The caller owns
    * the overflow bound: a group's total score mass must stay ≤
    * Long.MaxValue/1000 ≈ 9.2·10^15 so the ×1000 cross-multiply cannot
    * wrap (the [[graft.functions]] convention of documented
    * caller-owned bounds); at larger masses integerize coarser
    * upstream. A row straddling the boundary is kept (its prefix-before
    * is under budget) — the same convention as tokenBudgetCap; ties
    * order by (score desc, id).
    *
    * Scale shape: one group-keyed sort-window; the prefix sum and the
    * group total share its exchange, and no second pass re-reads the
    * source. Payloads should be projected out before this and joined
    * back by id after.
    */
  def nucleusTopP(docs: DataFrame, idCol: String, scoreCol: String,
                  groupCol: String, permille: Int): DataFrame = {
    require(permille > 0 && permille <= 1000,
      "permille must be in (0, 1000]")
    val wPre = Window.partitionBy(col(groupCol))
      .orderBy(col(scoreCol).desc, col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.partitionBy(col(groupCol))
    docs.select(col(idCol), col(groupCol), col(scoreCol))
      .withColumn("pre", coalesce(sum(col(scoreCol)).over(wPre), lit(0L)))
      .withColumn("total", sum(col(scoreCol)).over(wAll))
      .filter(col("pre") * 1000 < col("total") * permille)
      .select(col(idCol), col(groupCol), col(scoreCol), col("pre"),
        col("total"))
  }
}

