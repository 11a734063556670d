package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sketch set algebra — the composability layer over the engine's
  * distinct sketches ([[graft.functions.Aggregators.KmvDistinct]],
  * HllDistinct): bottom-k (theta) sketches support union and
  * intersection ESTIMATES from the retained hash samples alone, which
  * registers and CMS cells cannot do. Engine-exact like the sketches
  * themselves: shared md5-60 hashes, truncating integer estimators.
  */
object Sketches {

  /** CMS join-size estimation (the AGMS/Count-Min inner-product
    * estimator, Alon-Matias-Szegedy / Cormode-Muthukrishnan): the
    * equi-join cardinality |A ⋈_key B| = Σ_k na_k·nb_k is estimated as
    * min over depths j of Σ_cells cmsA_j[c]·cmsB_j[c] — never an
    * undercount, overcount bounded by ‖na‖₁·‖nb‖₁/w per depth. The
    * optimizer-statistics primitive: join size from two fixed d×w
    * sketches without touching the other table's keys. Buckets come
    * from the same md5 derivation as the frequency CMS, every counter
    * and product is BIGINT, so the estimate hash-matches any engine;
    * the exact join size rides along for in-row audit. Overflow: Σ
    * ca·cb per cell pair stays under 2⁶³ through ~3·10⁹ rows per side.
    *
    * One conditional-count aggregation per depth (map-side
    * combinable), a (depth, cell)-keyed join of two d·w-row tables,
    * and a d-row min — at any input size the estimation stage costs
    * the same. Returns one row (est_join_size, exact_join_size).
    */
  def cmsJoinSize(events: DataFrame, keyCol: String, typeCol: String,
                  typeA: String, typeB: String,
                  depth: Int = 4): DataFrame = {
    require(depth >= 1 && depth <= 8, "depth in [1, 8]")
    val rows = events.filter(col(typeCol).isin(typeA, typeB))
      .select(when(col(typeCol) === typeA, lit("a")).otherwise(lit("b"))
        .as("side"), col(keyCol))
    val bucketed = rows.select(col("side"),
      explode(array((0 until depth).map(j => struct(lit(j).as("j"),
        graft.functions.Expressions
          .md5_bits(concat_ws("_", lit(j), col(keyCol)), 2).cast("int")
          .as("b"))): _*)).as("jb"))
      .select(col("side"), col("jb.j"), col("jb.b"))
    val counts = bucketed.groupBy(col("side"), col("j"), col("b"))
      .agg(count(lit(1)).as("c"))
    val est = counts.filter(col("side") === "a")
      .select(col("j"), col("b"), col("c").as("ca"))
      .join(counts.filter(col("side") === "b")
        .select(col("j"), col("b"), col("c").as("cb")), Seq("j", "b"))
      .groupBy(col("j")).agg(sum(col("ca") * col("cb")).as("e"))
      .agg(min(col("e")).as("est_join_size"))
    val exact = rows.groupBy(col(keyCol))
      .agg(sum(when(col("side") === "a", 1L).otherwise(0L)).as("na"),
        sum(when(col("side") === "b", 1L).otherwise(0L)).as("nb"))
      .agg(coalesce(sum(col("na") * col("nb")), lit(0L)).as("exact_join_size"))
    est.crossJoin(broadcast(exact))
  }

  /** Theta-sketch intersection of two key populations (the audience-
    * overlap question answered from k hashes per side instead of two
    * full distinct sets): per side keep the k smallest distinct
    * md5-60 hashes of `keyCol`; θ = the k-th smallest of their union;
    * ρ = retained hashes below θ present on BOTH sides; then
    * est_inter = ρ · (2⁶⁰ div θ) and est_union = (k−1) · (2⁶⁰ div θ)
    * — the standard theta estimator with the division spelled as the
    * truncating integer op both engines reproduce verbatim. Exact
    * distinct-both/distinct-union ride along for in-row audit.
    *
    * Below-k exact mode (standard theta-sketch semantics, mirroring
    * [[graft.functions.Aggregators.KmvDistinct]]): when the union
    * retains FEWER than k distinct hashes the populations are fully
    * observed, so estimating through θ = max retained hash would
    * grossly overstate them; instead θ emits the 2⁶⁰ sentinel, ρ is
    * every retained both-sides hash, and est_inter/est_union are the
    * exact retained counts.
    *
    * Scale shape: the log collapses to DISTINCT (side, hash) first,
    * the per-side bottom-k is a rank window over that collapsed table
    * (k-bounded, TopK-rewritable), and everything after operates on
    * ≤ 2k rows — at any population size the sketch-algebra stage costs
    * the same. Returns one row:
    * (theta, rho, est_inter, est_union, n_exact_both, n_exact_union).
    */
  def kmvIntersect(events: DataFrame, keyCol: String, typeCol: String,
                   typeA: String, typeB: String, k: Int = 64): DataFrame = {
    require(k >= 2, "k must be >= 2")
    val full = 1152921504606846976L // 2^60
    val hashed = events
      .filter(col(typeCol).isin(typeA, typeB))
      .select(when(col(typeCol) === typeA, lit("a")).otherwise(lit("b"))
        .as("side"),
        graft.functions.Expressions.md5_bits(col(keyCol).cast("string"), 15)
          .as("h"),
        col(keyCol))
    val distinctH = hashed.select(col("side"), col("h")).distinct()
    val wSide = Window.partitionBy(col("side")).orderBy(col("h"))
    val kept = distinctH
      .withColumn("__rn", row_number().over(wSide))
      .filter(col("__rn") <= k)
      .select(col("side"), col("h"))
    val wU = Window.orderBy(col("h"))
    val unionKept = kept.select(col("h")).distinct()
      .withColumn("__rn", row_number().over(wU))
      .filter(col("__rn") <= k)
    val stats = unionKept
      .agg(max(col("h")).as("theta_raw"), count(lit(1)).as("nu"))
    val both = kept.filter(col("side") === "a").select(col("h"))
      .intersect(kept.filter(col("side") === "b").select(col("h")))
    val rhoCnt = both.crossJoin(broadcast(stats))
      .agg(coalesce(sum(when(col("h") < col("theta_raw"), 1L)
          .otherwise(0L)), lit(0L)).as("rho_lt"),
        count(lit(1)).as("rho_all"))
    val exact = hashed
      .groupBy(col(keyCol))
      .agg(countDistinct(col("side")).as("__ns"))
      .agg(sum(when(col("__ns") === 2, 1L).otherwise(0L)).as("n_exact_both"),
        count(lit(1)).as("n_exact_union"))
    val exactMode = col("nu") < k
    stats.crossJoin(broadcast(rhoCnt)).crossJoin(broadcast(exact))
      .select(
        when(exactMode, lit(full)).otherwise(col("theta_raw")).as("theta"),
        when(exactMode, col("rho_all")).otherwise(col("rho_lt")).as("rho"),
        when(exactMode, col("rho_all"))
          .otherwise(expr(s"rho_lt * (${full}L div theta_raw)"))
          .as("est_inter"),
        when(exactMode, col("nu"))
          .otherwise(expr(s"${k - 1}L * (${full}L div theta_raw)"))
          .as("est_union"),
        col("n_exact_both"), col("n_exact_union"))
  }
}
