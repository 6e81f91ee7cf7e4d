package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming._

/** Arbitrary stateful processing on the state-API v2
  * (`transformWithState`, Spark 4): the replacement for
  * flatMapGroupsWithState with NAMED state slots, per-state TTL, and
  * timers, backed by the RocksDB state store. This is the API a
  * long-running 100 TB feature-store stream should target — state
  * schema can evolve per slot, TTL eviction is declarative instead of
  * hand-rolled timeout bookkeeping, and RocksDB keeps hot state off the
  * executor heap.
  *
  * The processor here is the feature-store primitive: per-key running
  * (count, sum, max) emitted on every update. Exact integers, so the
  * spec can demand equality with the batch aggregate, not closeness.
  */
object StatefulV2 {
  case class Tick(userId: Long, cents: Long)
  case class Running(userId: Long, n: Long, sumCents: Long, maxCents: Long)

  class RunningAgg extends StatefulProcessor[Long, Tick, Running] {
    @transient private var state: ValueState[Running] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[Running](
        "running", Encoders.product[Running], TTLConfig.NONE)

    override def handleInputRows(
        key: Long, rows: Iterator[Tick], tv: TimerValues): Iterator[Running] = {
      var cur = Option(state.get()).getOrElse(Running(key, 0L, 0L, Long.MinValue))
      rows.foreach { t =>
        cur = Running(key, cur.n + 1, cur.sumCents + t.cents,
          math.max(cur.maxCents, t.cents))
      }
      state.update(cur)
      Iterator.single(cur)
    }
  }

  /** Streaming per-key running aggregate; one updated row per key per
    * micro-batch that touched it (Update mode).
    */
  def runningAgg(ticks: Dataset[Tick]): Dataset[Running] = {
    import ticks.sparkSession.implicits._
    ticks.groupByKey(_.userId)
      .transformWithState(new RunningAgg, TimeMode.None(), OutputMode.Update())
  }
}
