package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product-analytics operators over an event log: ordered funnel
  * conversion, cohort retention, and the per-user next-event transition
  * matrix. These are the standard read-side queries an event pipeline
  * like the reference's weekly flow (`etl_flow.py`'s trailing-window
  * rerun over rating events) feeds downstream; all three emit exact
  * integer/timestamp results so the DuckDB oracle hash-matches.
  */
object EventAnalytics {

  /** Strictly-ordered funnel: a user reaches step i+1 when an event of
    * that type occurs STRICTLY after their first step-i arrival (and
    * within `windowSec` of it, when set). One row per step:
    * `(step_n, step, n_users)`.
    *
    * Scale shape: step 1 is one map-side-combinable min per user; each
    * later step is the step-filtered slice of events joined to the
    * previous frontier — every stage exchanges on the SAME user key, so
    * the k−1 joins reuse one partitioning, and each frontier is at most
    * one row per user (monotonically shrinking). Never a window over
    * the full history, never an unfiltered self-join; k is a small
    * constant set by the funnel definition.
    */
  def funnelConversion(events: DataFrame, userCol: String, tsCol: String,
                       typeCol: String, steps: Seq[String],
                       windowSec: Option[Long] = None): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    var frontier = events.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("t"))
    val frontiers = scala.collection.mutable.ArrayBuffer((steps.head, frontier))
    steps.tail.foreach { st =>
      val prev = frontier.select(col(userCol), col("t").as("prev_t"))
      val bound = windowSec.map(w =>
          col(tsCol) <= col("prev_t") + expr(s"INTERVAL $w SECOND"))
        .getOrElse(lit(true))
      frontier = events.filter(col(typeCol) === st)
        .join(prev, userCol)
        .filter(col(tsCol) > col("prev_t") && bound)
        .groupBy(col(userCol)).agg(min(col(tsCol)).as("t"))
      frontiers += ((st, frontier))
    }
    frontiers.zipWithIndex.map { case ((st, f), i) =>
      f.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1).as("step_n"), lit(st).as("step"), col("n_users"))
    }.reduce(_.union(_))
  }

  /** Weekly cohort retention: users are cohorted by the `date_trunc`
    * week of their first event; each (cohort week, whole-week offset)
    * cell counts the distinct users active that week. Week offsets are
    * exact integer divisions of epoch-second differences (aligned week
    * starts are always 604800 s apart in UTC).
    *
    * Scale shape: activity collapses to DISTINCT (user, week) FIRST —
    * the 100 TB event log shrinks to at most users × weeks rows before
    * anything joins — then one user-keyed join against the per-user min
    * (itself map-side combinable), and a final two-phase distinct
    * count. Three bounded exchanges, no windows.
    */
  def retentionCohorts(events: DataFrame, userCol: String,
                       tsCol: String): DataFrame = {
    val act = events
      .select(col(userCol), date_trunc("week", col(tsCol)).as("act_week"))
      .distinct()
    val first = act.groupBy(col(userCol))
      .agg(min(col("act_week")).as("cohort_week"))
    act.join(first, userCol)
      .withColumn("week_offset", expr(
        "(unix_timestamp(act_week) - unix_timestamp(cohort_week)) div 604800"))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(countDistinct(col(userCol)).as("n_users"))
  }

  /** First-order (Markov) transition matrix over each user's
    * time-ordered event stream: counts of adjacent (from, to) event
    * types and the conditional milli-probability
    * `P(to|from) = (n_trans · 1000) div n_from`, with `(ts, id)` as the
    * deterministic total order. The LM bookkeeping matches
    * [[TextAnalysis.bigramLm]]: context totals are transition-HEAD
    * sums, so each user's final event heads nothing.
    *
    * Scale shape: one user-keyed sort-window produces the adjacent
    * pairs (the only full exchange), the pair count is map-side
    * combinable, and context totals are a WINDOW SUM over the already
    * tiny transition table (event-type² rows) — deriving them as a
    * second aggregation of the source would duplicate the whole
    * log-scan-and-window subtree in the plan, the classic
    * self-referencing-CTE recompute.
    */
  def eventTransitions(events: DataFrame, userCol: String, tsCol: String,
                       typeCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    events
      .select(col(userCol), col(typeCol).as("from_type"),
        lead(col(typeCol), 1).over(w).as("to_type"))
      .filter(col("to_type").isNotNull)
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n_trans"))
      .withColumn("n_from",
        sum(col("n_trans")).over(Window.partitionBy(col("from_type"))))
      .withColumn("p_milli", expr("(n_trans * 1000) div n_from"))
      .select("from_type", "to_type", "n_trans", "n_from", "p_milli")
  }

  /** Gaps-and-islands activity streaks: per user, consecutive-day runs
    * of activity (any event counts), summarized as total active days,
    * number of streaks, and the longest streak with its deterministic
    * start day (earliest start among equal-length maxima). The island
    * key is the classic `epoch_day − row_number` difference — constant
    * exactly while days are consecutive — so every value is an exact
    * integer / date.
    *
    * Scale shape: the 100 TB log collapses to DISTINCT (user, day)
    * FIRST (at most users × days rows); both windows and both
    * aggregations then key on the same user partitioning, so the whole
    * chain after the distinct is one exchange reused three times. No
    * self-joins, no inequality joins.
    */
  def activityStreaks(events: DataFrame, userCol: String,
                      tsCol: String): DataFrame = {
    val days = events
      .select(col(userCol), datediff(to_date(col(tsCol)),
        lit("1970-01-01").cast("date")).cast("long").as("day"))
      .distinct()
    val w = Window.partitionBy(col(userCol)).orderBy(col("day"))
    val streaks = days
      .withColumn("island", col("day") - row_number().over(w))
      .groupBy(col(userCol), col("island"))
      .agg(count(lit(1)).as("len"), min(col("day")).as("start_day"))
    streaks
      .groupBy(col(userCol))
      .agg(sum(col("len")).as("n_active_days"),
        count(lit(1)).as("n_streaks"),
        max(col("len")).as("longest_streak"),
        min_by(col("start_day"), struct((-col("len")).as("neg_len"),
          col("start_day").as("sd"))).as("longest_start_day"))
  }

  /** Last-touch attribution: each conversion event credits the user's
    * most recent NON-conversion event (the "touchpoint") strictly
    * before it and within `windowSec`, then rolls up per channel:
    * conversion count, converted value, and total touch→conversion
    * delay in exact integer microseconds. The carry is a single
    * ignore-nulls `last` over the user's (ts, id)-ordered stream —
    * type and timestamp null out together on conversion rows, so both
    * carries always come from the same touch row.
    *
    * Scale shape: one user-keyed sort-window over the log (the only
    * full exchange) followed by a map-side-combinable channel rollup —
    * the same cost envelope as [[eventTransitions]]; never an
    * inequality self-join between touches and conversions, which is
    * the quadratic formulation this window shape replaces.
    */
  def lastTouchAttribution(events: DataFrame, userCol: String, tsCol: String,
                           idCol: String, typeCol: String, convType: String,
                           windowSec: Long, valueCol: String): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val isTouch = col(typeCol) =!= convType
    events
      .withColumn("lt_type",
        last(when(isTouch, col(typeCol)), ignoreNulls = true).over(w))
      .withColumn("lt_ts",
        last(when(isTouch, col(tsCol)), ignoreNulls = true).over(w))
      .filter(col(typeCol) === convType && col("lt_ts").isNotNull &&
        unix_micros(col(tsCol)) - unix_micros(col("lt_ts")) <=
          windowSec * 1000000L)
      .groupBy(col("lt_type").as("channel"))
      .agg(count(lit(1)).as("n_conversions"),
        round(sum(col(valueCol)), 2).as("sum_value"),
        sum(unix_micros(col(tsCol)) - unix_micros(col("lt_ts")))
          .as("total_delay_us"))
  }

  /** Trailing `windowDays`-day exact distinct actives per (key, day):
    * for every day a key has activity, the count of distinct users seen
    * in the `windowDays` days ending that day — the rolling-DAU/WAU
    * surface. A range window cannot host COUNT(DISTINCT), so the
    * rolling set union is expressed as an offset explode: each active
    * (key, day, user) fact contributes itself to the `windowDays`
    * window anchors it falls into, turning the range predicate into an
    * EQUI-join the engine can hash-partition.
    *
    * Scale shape: the log collapses to DISTINCT (key, day, user) FIRST;
    * the explode multiplies that bounded table by the constant
    * `windowDays`, the anchor semi-join keeps only days that really had
    * activity, and the final distinct count is the standard two-phase
    * expansion. Everything keys on (key, day) — no range joins, no
    * windowed distincts, no per-user state.
    */
  def rollingDistinct(events: DataFrame, keyCol: String, tsCol: String,
                      userCol: String, windowDays: Int = 7): DataFrame = {
    require(windowDays >= 1, "windowDays must be positive")
    val act = events
      .select(col(keyCol), datediff(to_date(col(tsCol)),
        lit("1970-01-01").cast("date")).cast("long").as("day"),
        col(userCol))
      .distinct()
    val anchors = act.select(col(keyCol), col("day")).distinct()
    val contrib = act
      .withColumn("off", explode(sequence(lit(0), lit(windowDays - 1))))
      .select(col(keyCol), (col("day") + col("off")).as("day"),
        col(userCol))
    contrib.join(anchors, Seq(keyCol, "day"))
      .groupBy(col(keyCol), col("day"))
      .agg(countDistinct(col(userCol)).as("n_users"))
  }

  /** Out-of-orderness (lateness) profile: for every event, how far its
    * event time lags the maximum event time already seen in its key's
    * ARRIVAL order (`idCol` — the ingest sequence), bucketed to
    * `bucketMinutes` and rolled up to (bucket, count, max lateness) —
    * exactly the histogram that prices a Structured Streaming
    * watermark: `withWatermark(X)` drops every event in buckets above
    * X, so this profile IS the loss-vs-latency curve. All integer
    * microseconds, engine-exact.
    *
    * Contract: `idCol` must be a TOTAL order within each key — with
    * ties, which of the tied rows counts as "already seen" for the
    * other is engine-defined and the profile stops being
    * deterministic. Callers with a non-unique arrival clock should
    * compose it with a unique id (e.g. `slot * K + id`).
    *
    * Scale shape: one key-partitioned sort-window (running max over
    * arrival order, per-stream like the watermark itself — never a
    * global order) and a map-side-combinable rollup over a
    * buckets-sized result.
    */
  def latenessProfile(events: DataFrame, keyCol: String, tsCol: String,
                      idCol: String, bucketMinutes: Long = 10L): DataFrame = {
    require(bucketMinutes >= 1, "bucketMinutes must be positive")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val bucketUs = bucketMinutes * 60000000L
    events
      .withColumn("__hwm", max(unix_micros(col(tsCol))).over(w))
      .withColumn("lateness_us", greatest(lit(0L),
        col("__hwm") - unix_micros(col(tsCol))))
      .groupBy(expr(s"lateness_us div ${bucketUs}L").as("lateness_bucket"))
      .agg(count(lit(1)).as("n_events"),
        max(col("lateness_us")).as("max_lateness_us"))
  }

  /** Time-to-convert profile: each user's delay from their FIRST
    * `fromType` event to their first `toType` event strictly after it,
    * profiled per cohort-free total: converted-user count, total / max
    * delay in exact integer microseconds, and the discrete-median delay
    * (a rank selection of a stored delay, never interpolation). The
    * latency companion to [[funnelConversion]]'s who-converts counts.
    *
    * Scale shape: two map-side-combinable per-user mins joined on the
    * user key, then a single global rollup over one row per converted
    * user — the global median window sorts only that bounded table.
    */
  def funnelTimeStats(events: DataFrame, userCol: String, tsCol: String,
                      typeCol: String, fromType: String,
                      toType: String): DataFrame = {
    val first = events.filter(col(typeCol) === fromType)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("t_from"))
    val conv = events.filter(col(typeCol) === toType)
      .join(first, userCol)
      .filter(col(tsCol) > col("t_from"))
      .groupBy(col(userCol), col("t_from"))
      .agg(min(col(tsCol)).as("t_to"))
      .withColumn("delay_us",
        unix_micros(col("t_to")) - unix_micros(col("t_from")))
    val wRank = Window.orderBy(col("delay_us"), col(userCol))
    conv
      .withColumn("__rn", row_number().over(wRank))
      .withColumn("__n", count(lit(1)).over(
        Window.partitionBy(lit(1))))
      .agg(count(lit(1)).as("n_converted"),
        sum(col("delay_us")).as("total_delay_us"),
        max(col("delay_us")).as("max_delay_us"),
        max(when(col("__rn") === expr("(__n * 500 + 999) div 1000"),
          col("delay_us"))).as("p500_delay_us"))
  }

  /** Any-order funnel completion: a user completes when every step
    * type has occurred at least once, REGARDLESS of order, and
    * converts when the span between their earliest and latest
    * first-occurrence timestamps fits in `windowSec` — the
    * checklist/activation metric ("did they do all three things this
    * week"), complementary to [[funnelConversion]]'s strictly-ordered
    * journey. Per user one conditional-min per step (a single
    * map-side-combinable aggregation of the filtered log — no joins,
    * no windows), then a one-row rollup; spans are exact integer
    * microseconds of stored timestamps.
    */
  def funnelUnordered(events: DataFrame, userCol: String, tsCol: String,
                      typeCol: String, steps: Seq[String],
                      windowSec: Long): DataFrame = {
    require(steps.size >= 2, "an unordered funnel needs at least two steps")
    val aggs = steps.map(st =>
      min(when(col(typeCol) === st, col(tsCol))).as(s"t_$st"))
    val per = events.filter(col(typeCol).isin(steps: _*))
      .groupBy(col(userCol))
      .agg(aggs.head, aggs.tail: _*)
    val allPresent = steps.map(st => col(s"t_$st").isNotNull).reduce(_ && _)
    val spanUs = unix_micros(greatest(steps.map(st => col(s"t_$st")): _*)) -
      unix_micros(least(steps.map(st => col(s"t_$st")): _*))
    val converted = allPresent && spanUs <= windowSec * 1000000L
    per.agg(
      count(lit(1)).as("n_users_any_step"),
      sum(when(allPresent, 1L).otherwise(0L)).as("n_users_all_steps"),
      sum(when(converted, 1L).otherwise(0L)).as("n_converted"),
      coalesce(sum(when(converted, spanUs)), lit(0L)).as("total_span_us"))
  }

  /** Position-based (U-shaped) multi-touch attribution: every touch in
    * the `windowSec` lookback of its user's NEXT conversion earns
    * permille credit by journey position — 1000 for a lone touch,
    * 500/500 for two, else 400 first / 400 last / `200 div (n−2)` per
    * middle (truncating; the U-shape marketers actually deploy, vs
    * [[lastTouchAttribution]]'s winner-take-all). Touches map to their
    * conversion with a forward-min window over the user's (ts, id)
    * order — never an inequality self-join — then one bounded
    * equi-join picks up the conversion's timestamp and micro-value,
    * and a (user, conversion)-keyed window assigns positions. Credited
    * value is `(conv_value_micro · credit) div 1000`: all integer, so
    * the channel rollup is engine-exact.
    *
    * Scale shape: two window passes (user-keyed, then
    * (user, conversion)-keyed — the second partitioning refines the
    * first) plus a user-keyed equi-join whose conversion side is
    * conversions-only; the rollup is map-side-combinable. Payload
    * never enters a sort: only (user, ord, type, ts, value-micro)
    * flows.
    */
  def positionAttribution(events: DataFrame, userCol: String, tsCol: String,
                          idCol: String, typeCol: String, convType: String,
                          windowSec: Long, valueCol: String): DataFrame = {
    val wOrd = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    val base = events.select(col(userCol), col(tsCol), col(idCol),
        col(typeCol), col(valueCol).as("__val"))
      .withColumn("__ord", row_number().over(wOrd))
    val isConv = col(typeCol) === convType
    val wNext = Window.partitionBy(col(userCol)).orderBy(col("__ord"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val touches = base
      .withColumn("__next_conv", min(when(isConv, col("__ord"))).over(wNext))
      .filter(!isConv && col("__next_conv").isNotNull)
      .select(col(userCol), col(tsCol), col(typeCol), col("__ord"),
        col("__next_conv"))
    val convs = base.filter(isConv)
      .select(col(userCol).as("__cu"), col("__ord").as("__conv_ord"),
        col(tsCol).as("__conv_ts"),
        floor(col("__val").cast("double") * 1000000d + 0.5d).cast("long")
          .as("__conv_value_micro"))
    val joined = touches
      .join(convs, col(userCol) === col("__cu") &&
        col("__next_conv") === col("__conv_ord"))
      .drop("__cu")
      .filter(unix_micros(col("__conv_ts")) - unix_micros(col(tsCol)) <=
        windowSec * 1000000L)
    val wConv = Window.partitionBy(col(userCol), col("__conv_ord"))
    val credited = joined
      .withColumn("__pos", row_number().over(wConv.orderBy(col("__ord"))))
      .withColumn("__n", count(lit(1)).over(wConv))
      .withColumn("credit_permille",
        when(col("__n") === 1, 1000L)
          .when(col("__n") === 2, 500L)
          .when(col("__pos") === 1 || col("__pos") === col("__n"), 400L)
          .otherwise(expr("200L div (__n - 2)")))
    credited.groupBy(col(typeCol).as("channel"))
      .agg(count(lit(1)).as("n_touches"),
        sum(col("credit_permille")).as("credit_sum_permille"),
        sum(expr("(__conv_value_micro * credit_permille) div 1000"))
          .as("credited_value_micro"))
  }
}
