package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode,
  TimerValues, TTLConfig, ValueState}

/** Arbitrary cross-batch state via Spark 4's `transformWithState` — the
  * successor of `flatMapGroupsWithState` with named, independently-typed
  * state variables, TTL, and timers. The engine exercises the API with
  * the canonical shape: a per-key running aggregate whose state is a
  * versioned value the processor owns outright (exactly what the
  * mapGroupsWithState operators here cannot express once state needs
  * several independently-evolving variables or TTL).
  *
  * Requires the RocksDB state store provider (a transformWithState
  * contract, enforced by Spark at query start) — callers scope
  * `spark.sql.streaming.stateStore.providerClass` around the stream the
  * way Queries.withStreamingConfs scopes partition sizing.
  */
object Stateful {

  /** Per-key running (count, integer-unit sum) carried across
    * micro-batches in a ValueState; emits the key's UPDATED totals once
    * per batch in which the key appears. Counts are strictly monotone
    * per key, so the final converged row for a key is its max-count row
    * — the downstream `max_by` contract the driver query pins.
    */
  class RunningTotals
      extends StatefulProcessor[Long, (Long, Long), (Long, Long, Long)] {
    @transient private var totals: ValueState[(Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      totals = getHandle.getValueState[(Long, Long)]("totals",
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong), TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[(Long, Long)],
                                 timerValues: TimerValues)
        : Iterator[(Long, Long, Long)] = {
      var (n, s) = if (totals.exists()) totals.get() else (0L, 0L)
      rows.foreach { case (_, unit) => n += 1; s += unit }
      totals.update((n, s))
      Iterator.single((key, n, s))
    }
  }

  /** Running per-key totals over a stream of (key, integerUnit) pairs. */
  def runningTotals(pairs: Dataset[(Long, Long)]): Dataset[(Long, Long, Long)] = {
    import pairs.sparkSession.implicits._
    pairs.groupByKey(_._1)
      .transformWithState(new RunningTotals, TimeMode.None(), OutputMode.Append())
  }
}
