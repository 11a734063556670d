package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental view maintenance for keyed additive aggregates — the
  * DBSP/Materialize idea expressed as plain DataFrame algebra: a
  * materialized `GROUP BY keys -> (count, sums)` view is kept current
  * by applying a CHANGELOG of inserts and deletes, never by
  * recomputing from the base table.
  *
  * Why this matters at 100 TB: the weekly reference pipeline re-derives
  * its aggregates from scratch each run; at fact scale the delta is
  * orders of magnitude smaller than the base, and count/sum (and every
  * aggregate decomposable into them — avg, variance via moments) are
  * SELF-MAINTAINABLE: the new view is a function of (old view, delta
  * aggregate) only. The honest boundary: min/max are NOT delete-self-
  * maintainable (a deleted current-min forces a per-group recount), so
  * this module deliberately exposes only the additive family.
  *
  * Contract: the changelog is well-formed (a delete only retracts a
  * previously-inserted row). Groups whose count reaches zero DISAPPEAR
  * from the view — multiset semantics, matching what a from-scratch
  * aggregate over the final state produces.
  */
object Ivm {

  /** Build the initial materialization: keys, row count `n`, and one
    * `sum_<col>` per value column (integerize value columns upstream —
    * the engine-exactness convention).
    */
  def aggView(base: DataFrame, keys: Seq[String],
              valueCols: Seq[String]): DataFrame =
    base.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"),
        valueCols.map(c => sum(col(c)).as(s"sum_$c")): _*)

  /** Apply a changelog to a materialized [[aggView]]: `opCol` holds
    * 'I' (insert) or 'D' (delete); every other op fails loudly. The
    * delta is pre-aggregated per key with signed weights (one map-side
    * combinable pass over the CHANGELOG ONLY), then merged into the
    * view with a single key-keyed full outer join — work is
    * O(|delta| + |touched keys|), never O(|base|).
    */
  def applyAggDelta(view: DataFrame, changelog: DataFrame, keys: Seq[String],
                    opCol: String, valueCols: Seq[String]): DataFrame = {
    val sign = when(col(opCol) === "I", lit(1L))
      .when(col(opCol) === "D", lit(-1L))
      .otherwise(raise_error(concat(lit("Ivm: unknown op '"), col(opCol),
        lit("' (expected I or D)"))))
    val delta = changelog
      .groupBy(keys.map(col): _*)
      .agg(sum(sign).as("__dn"),
        valueCols.map(c => sum(sign * col(c)).as(s"__d_$c")): _*)
    val merged = view.join(delta, keys, "full_outer")
      .select(
        keys.map(col) ++
          Seq((coalesce(col("n"), lit(0L)) + coalesce(col("__dn"), lit(0L)))
            .as("n")) ++
          valueCols.map(c =>
            (coalesce(col(s"sum_$c"), lit(0L)) +
              coalesce(col(s"__d_$c"), lit(0L))).as(s"sum_$c")): _*)
    // zero-count groups vanish (multiset semantics); a NEGATIVE count
    // means the changelog retracted rows that were never inserted —
    // that is caller error, surfaced loudly rather than clamped.
    merged
      .withColumn("n", when(col("n") >= 0, col("n"))
        .otherwise(raise_error(concat(lit("Ivm: negative count for a group"),
          lit(" — changelog deleted rows never inserted")))))
      .filter(col("n") > 0)
  }

  /** Signed weight for a changelog op column: I -> +1, D -> -1,
    * anything else fails loudly.
    */
  private def opSign(opCol: String) =
    when(col(opCol) === "I", lit(1L))
      .when(col(opCol) === "D", lit(-1L))
      .otherwise(raise_error(concat(lit("Ivm: unknown op '"), col(opCol),
        lit("' (expected I or D)"))))

  /** A relation as a weighted multiset (z-set): one row per distinct
    * tuple with its multiplicity in `m` — the representation every
    * maintained view here uses.
    */
  def bag(rel: DataFrame): DataFrame =
    rel.groupBy(rel.columns.map(col): _*).agg(count(lit(1)).as("m"))

  /** Materialize the equi-join view A ⋈ B (on `keys`) as a z-set.
    * Non-key columns of A and B must be disjoint.
    */
  def joinView(a: DataFrame, b: DataFrame, keys: Seq[String]): DataFrame =
    bag(a.join(b, keys))

  /** Maintain a [[joinView]] from changelogs on BOTH sides — the DBSP
    * bilinear delta rule: with A₀/B₀ the pre-delta snapshots and
    * ΔA/ΔB the signed changelogs,
    *
    *   Δ(A ⋈ B) = ΔA ⋈ B₀  ∪  A₀ ⋈ ΔB  ∪  ΔA ⋈ ΔB
    *
    * with multiplicities MULTIPLYING across the join and SUMMING in the
    * final merge; rows whose multiplicity reaches zero vanish. Work is
    * O(|ΔA ⋈ B₀| + |A₀ ⋈ ΔB| + |ΔA ⋈ ΔB| + |touched view rows|) — the
    * base join A₀ ⋈ B₀ is never recomputed, which is the entire point:
    * at 100 TB the two delta-side joins are delta-driven probes (a
    * day's changelog against yesterday's snapshots), not fact × fact.
    * Snapshots are passed as plain relations (bagged internally);
    * changelogs carry `opCol` ∈ {I, D}. A negative final multiplicity
    * (a delete of a never-present row) fails loudly.
    */
  def applyJoinDelta(view: DataFrame, aOld: DataFrame, aLog: DataFrame,
                     bOld: DataFrame, bLog: DataFrame, keys: Seq[String],
                     opCol: String): DataFrame = {
    def signed(log: DataFrame): DataFrame = {
      val cols = log.columns.filterNot(_ == opCol)
      log.withColumn("__s", opSign(opCol))
        .groupBy(cols.map(col): _*).agg(sum(col("__s")).as("m"))
        .filter(col("m") =!= 0)
    }
    def wjoin(l: DataFrame, r: DataFrame): DataFrame = {
      val lw = l.withColumnRenamed("m", "__wl")
      val rw = r.withColumnRenamed("m", "__wr")
      val out = lw.join(rw, keys)
      val payload = out.columns.filterNot(c => c == "__wl" || c == "__wr")
      out.select(payload.map(col) :+ (col("__wl") * col("__wr")).as("m"): _*)
    }
    val dA = signed(aLog); val dB = signed(bLog)
    val deltaV = wjoin(dA, bag(bOld))
      .unionByName(wjoin(bag(aOld), dB))
      .unionByName(wjoin(dA, dB))
    val payload = view.columns.filterNot(_ == "m")
    view.unionByName(deltaV)
      .groupBy(payload.map(col): _*).agg(sum(col("m")).as("m"))
      .withColumn("m", when(col("m") >= 0, col("m"))
        .otherwise(raise_error(
          lit("Ivm: negative multiplicity — delete of a never-present row"))))
      .filter(col("m") > 0)
  }
}
