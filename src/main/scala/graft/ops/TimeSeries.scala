package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal reshaping operators: calendar densification with
  * last-observation-carried-forward, and SCD2 history construction from
  * an event log. Both are the batch halves of what the reference's
  * weekly incremental flow (`etl_flow.py` trailing-window rerun)
  * implies when the destination wants continuous, versioned state
  * rather than sparse observations.
  */
object TimeSeries {

  /** Per-key calendar densification + LOCF fill. `observed` must be one
    * row per (key, date) — aggregate first. Emits the full key × calendar
    * grid with `is_observed` and `<value>_filled` (nulls before a key's
    * first observation stay null: there is nothing to carry forward).
    *
    * Scale shape: the grid is distinct-keys (one narrow aggregation)
    * cross an in-plan literal calendar via `sequence` + `explode` — a
    * narrow generate, NOT a shuffled cartesian; rows produced =
    * keys × days, the output's own size. Both join inputs are
    * explicitly hash-partitioned by KEY ALONE: partitioning on a subset
    * of the equi-join keys satisfies the join's clustered distribution,
    * and the LOCF window needs exactly that partitioning — so the rows
    * shuffle once and the join, sort, and window all run on the same
    * exchange. (Left to EnsureRequirements, the join would partition on
    * (key, date) and the window would re-shuffle everything by key.)
    */
  def gapFillLocf(observed: DataFrame, keyCol: String, dateCol: String,
                  valueCol: String, start: String, end: String): DataFrame = {
    val grid = observed.select(col(keyCol)).distinct()
      .select(col(keyCol),
        explode(sequence(lit(start).cast("timestamp"), lit(end).cast("timestamp"),
          expr("INTERVAL 1 DAY"))).as(dateCol))
      .repartition(col(keyCol))
    val w = Window.partitionBy(keyCol).orderBy(dateCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(observed.repartition(col(keyCol)), Seq(keyCol, dateCol), "left")
      .withColumn("is_observed", col(valueCol).isNotNull)
      .withColumn(s"${valueCol}_filled", last(col(valueCol), ignoreNulls = true).over(w))
      .drop(valueCol)
  }

  /** SCD2 history build from an event log: per entity (ordered by
    * `tsCol`, tie-broken by the unique `tieCol`), collapse runs of
    * unchanged `attrCols` into validity intervals
    * [valid_from, valid_to), with `valid_to` null on the open current
    * row. Attribute comparison is null-safe, so a null-valued state is
    * a state like any other.
    *
    * Scale shape: two window passes, both partitioned by entity —
    * Catalyst plans ONE exchange and runs both sorts on it. No joins:
    * the classic build-vs-merge SCD2 (join current dim against the
    * batch) reduces to this after a union, which is how a 100 TB
    * backfill should run — one shuffle by entity, never a self-join
    * per version.
    */
  def scd2(log: DataFrame, entityCol: String, tsCol: String, tieCol: String,
           attrCols: Seq[String]): DataFrame = {
    require(attrCols.nonEmpty, "scd2 needs at least one tracked attribute")
    val w = Window.partitionBy(entityCol).orderBy(col(tsCol), col(tieCol))
    // row_number, NOT lag(tieCol).isNull: a null tie-breaker VALUE in the
    // log would make lag() read null on the FOLLOWING row and emit a
    // spurious segment boundary; position is what "first" means
    val isFirst = row_number().over(w) === 1
    val changed = attrCols
      .map(a => !(col(a) <=> lag(col(a), 1).over(w)))
      .reduce(_ || _)
    val changes = log
      .withColumn("__change", isFirst || changed)
      .filter(col("__change"))
      .select((entityCol +: attrCols).map(col) :+
        col(tsCol).as("valid_from") :+ col(tieCol).as("__tie"): _*)
    val w2 = Window.partitionBy(entityCol).orderBy(col("valid_from"), col("__tie"))
    changes
      .withColumn("valid_to", lead(col("valid_from"), 1).over(w2))
      .withColumn("is_current", col("valid_to").isNull)
      .drop("__tie")
  }

  /** Point-in-time (PIT) join of a fact stream against an SCD2 interval
    * dimension: each fact row picks up the dimension attributes that
    * were valid AT ITS TIMESTAMP — `valid_from <= ts < valid_to`, with
    * a null `valid_to` meaning still-current. Inner semantics: facts
    * before the entity's first interval drop. This is the attribution
    * read of [[scd2]]'s write side — "which segment was the user in
    * when the purchase happened".
    *
    * Scale shape: an equi-join on the entity key (one co-partitioned
    * exchange pair) with the interval predicate applied as a join
    * residual — per-entity interval lists are version-count-sized, so
    * the residual scan is bounded per key; never a time-range
    * cross-join of fact × full history.
    */
  def pitJoin(facts: DataFrame, dim: DataFrame, keyCol: String,
              factTsCol: String, validFromCol: String = "valid_from",
              validToCol: String = "valid_to"): DataFrame =
    facts.join(dim,
      facts(keyCol) === dim(keyCol) &&
        facts(factTsCol) >= dim(validFromCol) &&
        (dim(validToCol).isNull || facts(factTsCol) < dim(validToCol)))
      .drop(dim(keyCol))

  /** CDC changelog apply — materialize the end state of an
    * insert/update/delete event stream: last writer per key wins (by
    * `seqCol`, with `seqCol` itself the total order so no tie column is
    * needed), and a last-op DELETE erases the key from the snapshot.
    * This is the read-side of a merge-on-read lakehouse table: the same
    * one-exchange window shape as [[scd2]] (partition by key, one sort,
    * row_number desc), never a per-version self-join. At 100 TB the
    * changelog compacts shard-locally first (the same expression is a
    * valid per-file reducer because "latest per key" is associative),
    * then one global pass settles cross-shard keys.
    */
  def applyChangelog(log: DataFrame, keyCol: String, seqCol: String,
                     opCol: String, attrCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(seqCol).desc)
    log
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && col(opCol) =!= "D")
      .select((keyCol +: attrCols).map(col) :+ col(seqCol).as("last_seq"): _*)
  }

  /** Time-bucket downsampling to OHLC bars (open/high/low/close +
    * event count) per key — the standard telemetry/market resample.
    * Open and close are argmin/argmax SELECTIONS by the total event
    * order (ts, then `seqCol` for same-timestamp ties) via single
    * struct-min/max aggregates — one map-side-combinable exchange, never
    * a window sort over the raw stream, and no floating-point
    * ARITHMETIC (min/max/first/last of doubles are exact picks, so the
    * result is engine-reproducible; deliberately no sum/avg column —
    * that belongs to the decimal-typed aggregates).
    *
    * Shape at 100 TB: aggregation state is one constant-size struct per
    * (key, bucket); with time-partitioned input the exchange is
    * partition-local. This is the compaction step that turns an
    * unbounded event stream into a bounded bar table.
    */
  def resampleOhlc(events: DataFrame, keyCol: String, tsCol: String,
                   seqCol: String, valCol: String,
                   bucket: String = "hour"): DataFrame =
    events
      .groupBy(col(keyCol), date_trunc(bucket, col(tsCol)).as("bucket"))
      .agg(count(lit(1)).as("n_events"),
        min(struct(col(tsCol), col(seqCol), col(valCol)))
          .getField(valCol).as("open"),
        max(struct(col(tsCol), col(seqCol), col(valCol)))
          .getField(valCol).as("close"),
        min(col(valCol)).as("low"),
        max(col(valCol)).as("high"))

  /** Sweep-line peak concurrency over half-open intervals `[start, end)`:
    * per key, the maximum number of simultaneously-open intervals and
    * the earliest instant that peak is reached. Each interval emits a
    * +1/−1 delta; deltas are NETTED PER TIMESTAMP first (so an end and
    * a start at the same instant cancel — exactly the half-open
    * convention), then a running sum over the key's unique, ordered
    * timestamps yields the concurrency on `[t, next_t)`; the peak is
    * the running sum's max and the peak instant the `min_by` argmin.
    * All integers and timestamps — engine-exact.
    *
    * Scale shape: the netting aggregate is map-side combinable and
    * collapses the 2-row-per-interval delta stream to unique (key, t)
    * rows before the only sort-window; window and final rollup reuse
    * the same key partitioning. The classic alternative — joining each
    * interval against all overlapping intervals — is quadratic in the
    * overlap degree; this shape is linear in interval count and never
    * exchanges more than the netted change-point table.
    */
  def maxConcurrency(intervals: DataFrame, keyCol: String,
                     startCol: String, endCol: String): DataFrame = {
    val deltas = intervals
      .select(col(keyCol), col(startCol).as("t"), lit(1L).as("delta"))
      .union(intervals
        .select(col(keyCol), col(endCol).as("t"), lit(-1L).as("delta")))
    val net = deltas.groupBy(col(keyCol), col("t"))
      .agg(sum(col("delta")).as("net"))
    val wRun = Window.partitionBy(col(keyCol)).orderBy(col("t"))
    net
      .withColumn("conc", sum(col("net")).over(wRun))
      .groupBy(col(keyCol))
      .agg(max(col("conc")).as("peak_concurrency"),
        min_by(col("t"), struct((-col("conc")).as("neg_conc"),
          col("t").as("t"))).as("peak_ts"))
  }

  /** Interval-union coverage per key over half-open `[start, end)`
    * intervals: total covered time in exact integer microseconds and
    * the number of disjoint covered components — [[maxConcurrency]]'s
    * sweep-line read out a different way (time where the running count
    * is positive, components where it rises from zero). The classic
    * "total uptime / total on-air time from overlapping spans" reducer;
    * merging overlaps by self-joining every interval to every overlap
    * is the quadratic formulation this replaces.
    *
    * Scale shape: identical to [[maxConcurrency]] — map-side-combinable
    * netting down to unique (key, t) change points, then one key-sorted
    * window pass (the running sum, the lead, and the rises-from-zero
    * lag all share one sort) and a map-side-combinable rollup.
    */
  def intervalCoverage(intervals: DataFrame, keyCol: String,
                       startCol: String, endCol: String): DataFrame = {
    val deltas = intervals
      .select(col(keyCol), col(startCol).as("t"), lit(1L).as("delta"))
      .union(intervals
        .select(col(keyCol), col(endCol).as("t"), lit(-1L).as("delta")))
    val net = deltas.groupBy(col(keyCol), col("t"))
      .agg(sum(col("delta")).as("net"))
    val wRun = Window.partitionBy(col(keyCol)).orderBy(col("t"))
    net
      .withColumn("conc", sum(col("net")).over(wRun))
      .withColumn("next_t", lead(col("t"), 1).over(wRun))
      .withColumn("prev_conc", lag(col("conc"), 1, 0L).over(wRun))
      .groupBy(col(keyCol))
      .agg(
        sum(when(col("conc") > 0 && col("next_t").isNotNull,
          unix_micros(col("next_t")) - unix_micros(col("t")))
          .otherwise(0L)).as("covered_us"),
        sum(when(col("conc") > 0 && col("prev_conc") <= 0, 1L)
          .otherwise(0L)).as("n_components"))
  }

  /** Seasonal-naive forecast error: score each (key, period) value
    * against the value one season earlier — forecastᵗ = valueᵗ⁻ˢ, the
    * baseline every real forecaster must beat (the denominator of the
    * MASE metric). Emits per key the scored-period count, total/max
    * absolute error, and total actual, all in the caller's integer
    * units so every number is engine-exact. Periods whose season-lag
    * period is absent are not scored (no forecast exists), which is
    * why the lag is an inner self-join on (key, period − season)
    * rather than a window lag over PRESENT periods only.
    *
    * Scale shape: the log collapses to one row per (key, period)
    * first (map-side combinable); the season lag is then an equi-join
    * of that bounded table with itself on the same key partitioning,
    * and the rollup reuses it. No windows, no densification.
    */
  def seasonalNaiveError(events: DataFrame, keyCol: String, tsCol: String,
                         valueUnitCol: Column,
                         seasonDays: Int = 7): DataFrame = {
    require(seasonDays >= 1, "seasonDays must be positive")
    val daily = events
      .groupBy(col(keyCol), datediff(to_date(col(tsCol)),
        lit("1970-01-01").cast("date")).cast("long").as("day"))
      .agg(sum(valueUnitCol).as("actual"))
    val lagged = daily.select(col(keyCol),
      (col("day") + seasonDays).as("day"), col("actual").as("forecast"))
    daily.join(lagged, Seq(keyCol, "day"))
      .withColumn("abs_err", abs(col("actual") - col("forecast")))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_scored"),
        sum(col("abs_err")).as("total_abs_err"),
        max(col("abs_err")).as("max_abs_err"),
        sum(col("actual")).as("total_actual"))
  }

  /** Rolling co-movement of two event-type series: hourly counts on
    * the COMPLETE hour grid (zero-filled — absent hours are real
    * zeros, not missing rows), then over each trailing `windowHours`
    * frame the integer moment numerators
    * cov_num = n·Σxy − Σx·Σy and the two variance numerators — the
    * exact cores of covariance/correlation, division and sqrt left to
    * the consumer (sqrt is libm-divergent; the numerators hash-match
    * any engine). Only full frames emit, so every row summarizes
    * exactly `windowHours` observations and sign(cov_num) IS
    * sign(correlation) — the co-drift monitor for "do errors rise
    * with traffic".
    *
    * Scale note: the series is hour-grid-sized (10 years ≈ 9·10⁴
    * rows) — bounded metadata like the IVF codebooks — so the single
    * ordered window is a bounded sort, not a data-scale one; the
    * heavy lifting (per-hour counts) is one map-side-combinable
    * aggregation of the log.
    */
  def rollingCovariance(events: DataFrame, tsCol: String, typeCol: String,
                        typeA: String, typeB: String,
                        windowHours: Int = 24): DataFrame = {
    require(windowHours >= 2, "windowHours must be >= 2")
    val hourly = events.filter(col(typeCol).isin(typeA, typeB))
      .groupBy(date_trunc("hour", col(tsCol)).as("h"), col(typeCol).as("t"))
      .agg(count(lit(1)).as("c"))
    val bounds = hourly.agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
    val grid = bounds
      .select(explode(sequence(col("h0"), col("h1"),
        expr("INTERVAL 1 HOUR"))).as("h"))
    val series = grid
      .join(hourly.filter(col("t") === typeA)
        .select(col("h"), col("c").as("__ca")), Seq("h"), "left")
      .join(hourly.filter(col("t") === typeB)
        .select(col("h"), col("c").as("__cb")), Seq("h"), "left")
      .select(col("h"), coalesce(col("__ca"), lit(0L)).as("xa"),
        coalesce(col("__cb"), lit(0L)).as("xb"))
    val w = Window.orderBy(col("h")).rowsBetween(-(windowHours - 1), 0)
    val wAll = Window.orderBy(col("h"))
    series
      .withColumn("__rn", row_number().over(wAll))
      .withColumn("sx", sum(col("xa")).over(w))
      .withColumn("sy", sum(col("xb")).over(w))
      .withColumn("sxx", sum(col("xa") * col("xa")).over(w))
      .withColumn("syy", sum(col("xb") * col("xb")).over(w))
      .withColumn("sxy", sum(col("xa") * col("xb")).over(w))
      .filter(col("__rn") >= windowHours)
      .select(col("h"), col("xa"), col("xb"),
        expr(s"$windowHours * sxy - sx * sy").as("cov_num"),
        expr(s"$windowHours * sxx - sx * sx").as("varx_num"),
        expr(s"$windowHours * syy - sy * sy").as("vary_num"))
  }

  /** Per-key OLS trend slope in exact integer arithmetic: the
    * closed-form slope (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²) over
    * x = whole minutes since the key's first event and y = the value
    * in centi units, emitted as slope_micro =
    * (num·1000) div max(1, den div 1000) — truncating BIGINT end to
    * end, so the per-key drift rate hash-matches any engine (the
    * regression companion to the MAD/CUSUM monitors: direction and
    * rate, not just alarm). The micro scale is exact once the x
    * variance mass den exceeds 10³ (anything beyond ~minutes of
    * spread); below that the truncated prescale dominates — a
    * degenerate-key artifact, documented not hidden. The moment sums
    * ride along for audit and for computing intercepts/R² downstream
    * without a second scan.
    *
    * Both x and y are CENTERED before the moment pass — x at whole
    * minutes since the key's first event SHIFTED by the truncated
    * per-key mean, y likewise — because the slope is shift-invariant
    * (both the numerator and denominator are algebraically unchanged
    * under x→x−c, y→y−d for integer constants), while the raw moments
    * are not overflow-safe: with uncentered minutes·centi products,
    * n·Σxy blows through 2⁶³ near ~10⁵ rows × 10⁴ minutes per key (it
    * did, at the 10× ledger bench — DuckDB threw, Spark would have
    * wrapped silently). Centered, the binding term is n²·x̂·ŷ over the
    * mean absolute DEVIATIONS x̂, ŷ — spread-scale, not range-scale —
    * which holds through ~10⁸ rows per key at minutes/centi spreads;
    * beyond that, coarsen x to hours upstream. The emitted moment sums
    * are the centered ones (the meaningful covariance masses).
    * Degenerate keys (all events in one minute: den = 0) emit slope 0,
    * not a division error.
    *
    * One aggregation pass after the per-key anchor windows — anchors
    * and moments all hash by `keyCol`, one exchange; nothing wider
    * than (key, x, y) shuffles.
    */
  def olsTrend(events: DataFrame, keyCol: String, tsCol: String,
               valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wk = Window.partitionBy(col(keyCol))
    val b = events.select(col(keyCol),
        unix_micros(col(tsCol)).as("__us"),
        floor(col(valueCol).cast("double") * 100d + 0.5d).cast("long").as("y0"))
      .withColumn("__t0", min(col("__us")).over(wk))
      .withColumn("x0", expr("(__us - __t0) div 60000000"))
      // truncated per-key means as integer shift anchors (slope is
      // shift-invariant; the residues keep |Σx|, |Σy| < n). Integer
      // `div`, never float division: Σ can exceed 2⁵³ where doubles
      // drop low bits
      .withColumn("__sx0", sum(col("x0")).over(wk))
      .withColumn("__sy0", sum(col("y0")).over(wk))
      .withColumn("__cnt", count(lit(1)).over(wk))
      .withColumn("x", expr("x0 - (__sx0 div __cnt)"))
      .withColumn("y", expr("y0 - (__sy0 div __cnt)"))
    b.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("x") * col("y")).as("sxy"))
      // the n·Σ cross terms and the ×1000 prescale run in DECIMAL(38,0)
      // (DuckDB twin: HUGEINT) — exact 128-bit integer arithmetic, so
      // no ledger scale can wrap them; only the final micro-scale
      // quotient, which is small by construction, lands back in BIGINT.
      // Both engines' integral division truncates toward zero.
      .withColumn("slope_micro", expr(
        "CAST(((CAST(n AS DECIMAL(38,0)) * sxy - CAST(sx AS DECIMAL(38,0)) * sy) * 1000) div " +
        "greatest(CAST(1 AS DECIMAL(38,0)), " +
        "(CAST(n AS DECIMAL(38,0)) * sxx - CAST(sx AS DECIMAL(38,0)) * sx) div 1000) AS BIGINT)"))
      .select(keyCol, "n", "sx", "sy", "sxx", "sxy", "slope_micro")
  }
}
