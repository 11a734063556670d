package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality validation — the engine-side analog of the reference's
  * pydantic model validation (movie_model.py: required fields, typed
  * coercions), generalized into declarative expectations evaluated in
  * ONE aggregation pass: completeness, uniqueness, ranges, row counts.
  * The report is a single row of measures + booleans, so a pipeline
  * gates a load on `expectations.filter(not(col("all_passed")))` being
  * empty — at 100 TB the entire audit costs one map-side-combined scan,
  * never one job per check.
  */
object DataQuality {

  /** Per-column profile: row count, null count, distinct count (exact),
    * min/max as strings (type-erased for a uniform report schema). One
    * row per profiled column, pivoted from two 1-row aggregations.
    *
    * Two aggregations, DELIBERATELY: min/max over a string column is
    * not hash-aggregable (var-length buffer), and mixing it into the
    * same agg as the multi-column countDistinct demotes the distinct
    * rewrite's grouped phase to SortAggregate — two real sorts of the
    * Expand'ed input (rows × profiled columns), the dominant cost at
    * scale. Split, the counts/min/max agg is a global streaming fold
    * (no grouping keys — no sort even as SortAggregate) and the
    * distinct Expand hash-aggregates; the two 1-row results cross-join
    * for free. Two scans, zero sorts, still never a job per column;
    * swap in approx_count_distinct when even the Expand matters.
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val statAggs = count(lit(1)).as("__n") +: cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__nn_$c"),
        min(col(c)).cast("string").as(s"__mn_$c"),
        max(col(c)).cast("string").as(s"__mx_$c"))
    }
    val distinctAggs = cols.map(c => countDistinct(col(c)).as(s"__d_$c"))
    val wide = df.agg(statAggs.head, statAggs.tail: _*)
      .crossJoin(df.agg(distinctAggs.head, distinctAggs.tail: _*))
    val perCol = cols.map { c =>
      struct(lit(c).as("column"),
        col("__n").as("n_rows"), (col("__n") - col(s"__nn_$c")).as("n_null"),
        col(s"__d_$c").as("n_distinct"),
        col(s"__mn_$c").as("min_value"), col(s"__mx_$c").as("max_value"))
    }
    wide.select(explode(array(perCol: _*)).as("p")).select("p.*")
  }

  /** Evaluate named boolean expectations over the WHOLE frame in one
    * aggregation: each constraint is a per-row predicate that must hold
    * everywhere (nulls count as failures — an unknown is not a pass).
    * Returns one row: per-constraint violation counts plus
    * `all_passed`.
    */
  def expect(df: DataFrame, constraints: Seq[(String, Column)]): DataFrame = {
    require(constraints.nonEmpty)
    // coalesce(sum, 0): an EMPTY frame must report zero violations and
    // a definite all_passed, not nulls the downstream gate silently
    // drops — if zero input rows is itself a failure, gate on n_rows
    // separately (e.g. an expectation over count)
    val aggs = constraints.map { case (name, pred) =>
      coalesce(sum(when(coalesce(pred, lit(false)), 0L).otherwise(1L)), lit(0L))
        .as(s"violations_$name")
    }
    val report = df.agg(aggs.head, aggs.tail: _*)
    // backtick-quoted so constraint names with dots resolve as columns
    report.withColumn("all_passed",
      constraints.map(c => col(s"`violations_${c._1}`") === 0L).reduce(_ && _))
  }

  /** Two-sample histogram drift: fixed-width bins over [lo, hi) shared
    * by populations A and B of `typeCol`, with the per-bin EXACT
    * cross-proportion deviation `dev = na·Nb − nb·Na` — zero exactly
    * when the bin's share is identical in both samples, sign giving
    * the direction, and Σ|dev|/(Na·Nb) the total-variation distance.
    * The chi-square-style divergence core without any division or
    * float accumulation, so the drift table hash-matches across
    * engines (the cross-sectional companion to [[cusumAlarms]]'s
    * temporal drift: "does this week's score distribution still look
    * like last week's"). Bin assignment is the same clamped IEEE
    * scaling as the z-order/Hilbert coordinates; out-of-range values
    * clamp into the edge bins, so every row is counted. Bins empty in
    * BOTH samples are absent (their deviation is zero by definition).
    * One conditional-sum aggregation plus a broadcast one-row totals
    * join. Overflow bound: Na·Nb must stay under 2⁶³ (fine through
    * ~3·10⁹ rows per side).
    */
  def histogramDrift(df: DataFrame, typeCol: String, valueCol: String,
                     typeA: String, typeB: String, nBins: Int,
                     lo: Double, hi: Double): DataFrame = {
    require(nBins >= 2 && hi > lo, "need >= 2 bins over a non-empty range")
    val span = hi - lo
    val bin = least(greatest(
      floor((col(valueCol).cast("double") - lit(lo)) / lit(span) * nBins)
        .cast("long"), lit(0L)), lit((nBins - 1).toLong))
    val counts = df
      .filter(col(typeCol).isin(typeA, typeB) && col(valueCol).isNotNull)
      .select(col(typeCol), bin.as("bin"))
      .groupBy(col("bin"))
      .agg(sum(when(col(typeCol) === typeA, 1L).otherwise(0L)).as("na"),
        sum(when(col(typeCol) === typeB, 1L).otherwise(0L)).as("nb"))
    val totals = counts.agg(sum(col("na")).as("__ta"), sum(col("nb")).as("__tb"))
    counts.crossJoin(broadcast(totals))
      .select(col("bin"), col("na"), col("nb"),
        (col("na") * col("__tb") - col("nb") * col("__ta")).as("dev"))
  }

  /** Benford leading-digit profile per key — the fraud/synthetic-data
    * smell test: naturally-occurring amounts lead with 1 ~30% of the
    * time; fabricated ones drift uniform. Defined EXACTLY: amounts are
    * first integerized to cents (floor(v·100 + 0.5), the engine's
    * standard half-up), and the digit is the first character of the
    * integer's decimal string — integer-to-string is identical in
    * every engine, where double-to-string formatting is not (the
    * subtle trap this formulation avoids: faithful float printing can
    * flip 9→1 at power-of-ten boundaries). Non-positive cents drop.
    * Emits (key, digit, n, milli_share); the milli shares are
    * truncating integer divisions of exact counts. One map-side-
    * combinable aggregation; shares via a key-partitioned window over
    * the 9-row-per-key aggregate.
    */
  def benfordProfile(df: DataFrame, keyCol: String,
                     valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cents = floor(col(valueCol).cast("double") * 100d + 0.5d).cast("long")
    df.select(col(keyCol), cents.as("__c"))
      .filter(col("__c") > 0)
      .withColumn("digit", substring(col("__c").cast("string"), 1, 1).cast("int"))
      .groupBy(col(keyCol), col("digit"))
      .agg(count(lit(1)).as("n"))
      .withColumn("__tot",
        sum(col("n")).over(Window.partitionBy(col(keyCol))))
      .withColumn("milli_share", expr("(n * 1000) div __tot"))
      .drop("__tot")
  }

  /** One-sided CUSUM drift alarms per key (Page 1954): detect a
    * sustained upward shift of `valueCol` against the key's own mean.
    * The sequential recursion S_t = max(0, S_{t-1} + (x_t - k - slack))
    * is rewritten as the EXACT window identity
    * S_t = P_t - min(0, min_{j<=t} P_j) over the prefix sums P of the
    * deviations — two running windows instead of an unexpressible
    * per-row recursion, so the whole detector is ordinary ordered
    * window arithmetic any engine replays identically. Values are
    * micro-quantized, the reference k is the key's truncating integer
    * mean, and every step stays BIGINT — engine-exact alarms.
    *
    * Scale shape: one aggregation for the per-key means, re-joined
    * hint-free (key cardinality is caller-defined, so AQE broadcasts
    * the means only when they fit and otherwise the join shares the
    * window's key exchange), one window shuffle keyed by `keyCol`
    * carrying (id, ts, xq)
    * — payload never enters the sort; per-key order is ts with id as
    * the deterministic tie-break. Emits only alarm rows
    * (cusum > thresholdMicro): the monitoring artifact, not the trace.
    */
  def cusumAlarms(df: DataFrame, keyCol: String, tsCol: String,
                  idCol: String, valueCol: String,
                  slackMicro: Long, thresholdMicro: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = df.select(col(keyCol), col(idCol), col(tsCol),
      floor(col(valueCol).cast("double") * 1000000d + 0.5d).cast("long").as("xq"))
    val refs = q.groupBy(col(keyCol))
      .agg(expr("CAST(sum(xq) AS BIGINT) div count(*)").as("__k"))
    val ordered = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    q.join(refs, keyCol)
      .withColumn("__d", col("xq") - col("__k") - lit(slackMicro))
      .withColumn("__p", sum(col("__d")).over(ordered))
      .withColumn("cusum_scaled",
        col("__p") - least(lit(0L), min(col("__p")).over(ordered)))
      .filter(col("cusum_scaled") > thresholdMicro)
      .select(col(keyCol), col(idCol), col("xq"), col("cusum_scaled"))
  }
}
