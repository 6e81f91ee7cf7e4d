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

  // ---- event-time sessionization on timers ----

  case class SessTick(userId: Long, ts: java.sql.Timestamp, cents: Long)
  case class Session(userId: Long, start: java.sql.Timestamp,
                     end: java.sql.Timestamp, n: Long, cents: Long)

  /** Inactivity-gap sessionizer on EVENT-TIME TIMERS: a session closes
    * when the WATERMARK passes lastEvent + gap — the v2-API expression
    * of what `session_window` does natively, but with the session state
    * and the closing rule fully programmable (the shape to reach for
    * when sessions need custom eviction or mid-session emission that
    * session_window cannot express). One timer per key is live at a
    * time; each batch re-arms it at the new session end + gap.
    */
  class Sessionizer(gapMs: Long) extends StatefulProcessor[Long, SessTick, Session] {
    @transient private var cur: ValueState[Session] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      cur = getHandle.getValueState[Session](
        "session", Encoders.product[Session], TTLConfig.NONE)

    override def handleInputRows(
        key: Long, rows: Iterator[SessTick], tv: TimerValues): Iterator[Session] = {
      // within a micro-batch arrival order is arbitrary; session algebra
      // needs event-time order
      val sorted = rows.toArray.sortBy(_.ts.getTime)
      var closed = List.empty[Session]
      var s = Option(cur.get())
      sorted.foreach { t =>
        s match {
          case Some(sess) if t.ts.getTime - sess.end.getTime < gapMs =>
            s = Some(Session(key, sess.start, t.ts, sess.n + 1, sess.cents + t.cents))
          case Some(sess) => // gap exceeded INSIDE the data: close and restart
            closed ::= sess
            s = Some(Session(key, t.ts, t.ts, 1L, t.cents))
          case None =>
            s = Some(Session(key, t.ts, t.ts, 1L, t.cents))
        }
      }
      s.foreach { sess =>
        cur.update(sess)
        getHandle.listTimers().foreach(getHandle.deleteTimer) // re-arm
        getHandle.registerTimer(sess.end.getTime + gapMs)
      }
      closed.reverseIterator
    }

    override def handleExpiredTimer(
        key: Long, tv: TimerValues,
        expired: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[Session] = {
      val s = Option(cur.get())
      cur.clear()
      s.iterator
    }
  }

  /** Event-time sessionization; emits each closed session exactly once.
    * Input must carry a watermark on `ts`.
    */
  def sessionize(ticks: Dataset[SessTick], gapMs: Long): Dataset[Session] = {
    import ticks.sparkSession.implicits._
    ticks.groupByKey(_.userId)
      .transformWithState(new Sessionizer(gapMs), TimeMode.EventTime(), OutputMode.Append())
  }

  // ---- declarative state TTL: suppress-within-window dedup ----

  case class Seen(userId: Long, firstCents: Long)

  /** First-arrival-wins suppression with DECLARATIVE state TTL: a key's
    * "seen" marker expires on its own after `ttl` (RocksDB evicts it, no
    * timer bookkeeping, no tombstone scan), so a key re-arriving after a
    * quiet period is treated as new. This is the v2 API's answer to the
    * unbounded-state problem `dropDuplicatesWithinWatermark` solves with
    * event time — here the bound is PROCESSING-time freshness, the
    * contract an at-most-once-per-window alerting/notification stream
    * wants ("page at most once per hour per host"). State size is
    * O(keys seen within one TTL window) by construction.
    */
  class TtlSuppressor(ttl: java.time.Duration)
      extends StatefulProcessor[Long, Tick, Seen] {
    @transient private var seen: ValueState[Seen] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getValueState[Seen](
        "seen", Encoders.product[Seen], new TTLConfig(ttl))

    override def handleInputRows(
        key: Long, rows: Iterator[Tick], tv: TimerValues): Iterator[Seen] = {
      if (!rows.hasNext) return Iterator.empty
      val first = rows.next() // remaining rows this batch are suppressed too
      if (seen.get() == null) {
        val s = Seen(key, first.cents)
        seen.update(s)
        Iterator.single(s)
      } else Iterator.empty
    }
  }

  /** At-most-once-per-TTL-window emission per key (Update mode,
    * processing-time TTL).
    */
  def suppressWithinTtl(ticks: Dataset[Tick], ttl: java.time.Duration): Dataset[Seen] = {
    import ticks.sparkSession.implicits._
    ticks.groupByKey(_.userId)
      .transformWithState(new TtlSuppressor(ttl), TimeMode.ProcessingTime(), OutputMode.Update())
  }
}
