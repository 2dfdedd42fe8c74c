package graft.streaming

import java.time.Duration

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming._

/** The Spark 4 arbitrary-state operator (`transformWithState`) applied
  * to the engine's keyed running-aggregate shape — the modern sibling
  * of the `flatMapGroupsWithState` machines in StreamingPipeline.
  *
  * What the new API buys at scale, relative to fMGWS:
  *  - typed, NAMED state slots (`getValueState`) instead of one opaque
  *    state object — evolvable schema, per-slot TTL;
  *  - built-in value TTL (`TTLConfig`) enforced by the state store
  *    itself, not hand-rolled timeout bookkeeping;
  *  - requires the RocksDB state-store provider, whose changelog
  *    checkpointing + disk-backed maps are the only state backend that
  *    survives 100 TB keyspaces (the default HDFS-heap store holds
  *    every key in executor memory).
  *
  * The reference's analog is the agents collection mutated per event
  * (reference routes/events.js:225-256) — unbounded heap state,
  * never expired.
  */
object TransformWithStateOps {

  case class EventIn(userId: Long, value: Double)
  case class RunningTotal(userId: Long, n: Long, total: Double)

  /** Keyed running totals in ONE named ValueState slot; each input
    * batch folds into the slot and emits the updated row (update-mode
    * changelog — the MergeSink upserts it downstream like any other
    * keyed changelog). */
  class RunningTotalProcessor(ttl: Option[Duration])
      extends StatefulProcessor[Long, EventIn, RunningTotal] {
    @transient private var st: ValueState[RunningTotal] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      val cfg = ttl.map(TTLConfig.apply).getOrElse(TTLConfig.NONE)
      st = getHandle.getValueState[RunningTotal](
        "totals", Encoders.product[RunningTotal], cfg)
    }

    override def handleInputRows(key: Long, rows: Iterator[EventIn],
        timerValues: TimerValues): Iterator[RunningTotal] = {
      val prev = if (st.exists()) st.get() else RunningTotal(key, 0L, 0.0)
      var n = prev.n
      var s = prev.total
      rows.foreach { e => n += 1; s += e.value }
      val out = RunningTotal(key, n, s)
      st.update(out)
      Iterator.single(out)
    }
  }

  /** Per-key running (count, sum) over a stream; state optionally
    * expires `ttl` after its last update (enforced by the store). */
  def runningTotals(events: Dataset[EventIn],
      ttl: Option[Duration] = None): Dataset[RunningTotal] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.userId)
      .transformWithState(new RunningTotalProcessor(ttl),
        TimeMode.None(), OutputMode.Update())
  }

  case class Scored(userId: Long, itemId: Long, score: Long)
  case class TopItem(userId: Long, rank: Int, itemId: Long, score: Long)

  /** Bounded per-key top-k on LIST state — the third state primitive
    * (ValueState above, timers below): the list holds AT MOST k
    * (score, item) entries, so state is O(k) per key no matter how
    * many events arrive, and each batch emits the key's full current
    * top-k as an update-mode changelog. Ties break toward the smaller
    * item id (deterministic under replay). */
  class TopKProcessor(k: Int)
      extends StatefulProcessor[Long, Scored, TopItem] {
    @transient private var st: ListState[Scored] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getListState[Scored](
        "topk", Encoders.product[Scored], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Scored],
        timerValues: TimerValues): Iterator[TopItem] = {
      // the CURRENT batch is authoritative per item: a rescored item
      // overrides its state entry (up OR down — a stale high score
      // must not hold a slot). Within one batch, shuffle-read order is
      // not replay-stable, so same-item collisions resolve by MAX
      // score (deterministic) rather than arrival order. Items outside
      // the kept k are forgotten — the price of O(k) state.
      val incoming = rows.toSeq.groupBy(_.itemId)
        .map(_._2.maxBy(_.score)).toSeq
      val incomingIds = incoming.map(_.itemId).toSet
      val kept = st.get().toSeq.filterNot(s => incomingIds.contains(s.itemId))
      val merged = (kept ++ incoming)
        .sortBy(s => (-s.score, s.itemId))
        .take(k)
      st.put(merged.toArray)
      merged.iterator.zipWithIndex.map { case (s, i) =>
        TopItem(key, i + 1, s.itemId, s.score)
      }
    }
  }

  /** Per-user running top-k items by score (k-bounded state). */
  def topKByUser(events: Dataset[Scored], k: Int): Dataset[TopItem] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.userId)
      .transformWithState(new TopKProcessor(k),
        TimeMode.None(), OutputMode.Update())
  }

  case class Categorized(userId: Long, category: String)
  case class CategoryCount(userId: Long, category: String, n: Long)

  /** Per-key category histogram on MAP state — the third state
    * primitive (ValueState, ListState above): one map entry per
    * distinct category, point-updated per event (the store reads and
    * writes only the touched entries, not the whole map — the reason
    * MapState exists instead of a ValueState[Map]). Each batch emits
    * the updated (key, category) counts as an update-mode changelog. */
  class CategoryCountProcessor
      extends StatefulProcessor[Long, Categorized, CategoryCount] {
    @transient private var st: MapState[String, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getMapState[String, Long](
        "cats", Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Categorized],
        timerValues: TimerValues): Iterator[CategoryCount] = {
      val touched = scala.collection.mutable.LinkedHashSet.empty[String]
      rows.foreach { r =>
        val cur = if (st.containsKey(r.category)) st.getValue(r.category) else 0L
        st.updateValue(r.category, cur + 1L)
        touched += r.category
      }
      touched.iterator.map(c => CategoryCount(key, c, st.getValue(c)))
    }
  }

  /** Per-user per-category running counts (one map entry per category). */
  def categoryCounts(events: Dataset[Categorized]): Dataset[CategoryCount] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.userId)
      .transformWithState(new CategoryCountProcessor,
        TimeMode.None(), OutputMode.Update())
  }

  case class Click(userId: Long, ts: java.sql.Timestamp)
  case class ClosedSession(userId: Long, startMs: Long, endMs: Long, n: Long)

  /** Session machine with EVENT-TIME TIMERS: each input extends the
    * open session and re-arms one timer at (last event + gap); the
    * session row is emitted from `handleExpiredTimer` when the
    * watermark passes that mark — the explicit-NFA form of
    * `session_window` (StreamAggs), and the new-API analog of the
    * fMGWS `EventTimeTimeout` TTLs in StreamingPipeline. State is one
    * ValueState + one timer per open key, evicted on close.
    *
    * INVARIANT: only correct under a ZERO-delay watermark (as
    * [[timerSessions]] wires it). Two rules depend on it: the merge
    * condition `t - cur.endMs <= gapMs` would also merge an event
    * arbitrarily far in the PAST into the open session, and the
    * immediate in-batch close emit assumes the watermark has already
    * passed the close mark. With 0 delay such older events are dropped
    * upstream, so neither case arises; reusing this processor behind a
    * lenient watermark would silently diverge from `session_window`
    * (extend the merge guard with `t >= cur.startMs - gapMs` and defer
    * emits to timers before allowing lateness). */
  class SessionCloseProcessor(gapMs: Long)
      extends StatefulProcessor[Long, Click, ClosedSession] {
    @transient private var st: ValueState[ClosedSession] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[ClosedSession](
        "open", Encoders.product[ClosedSession], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Click],
        timerValues: TimerValues): Iterator[ClosedSession] = {
      // fold in event-time order, SPLITTING when the gap is exceeded —
      // two bursts inside one micro-batch are two sessions, exactly as
      // session_window merges them. A gap-closed session is emitted
      // immediately (its close mark precedes the newer in-batch event,
      // so the watermark is already at or past it); only the open tail
      // waits for its timer.
      val closed = Seq.newBuilder[ClosedSession]
      var s = if (st.exists()) Some(st.get()) else None
      rows.toSeq.map(_.ts.getTime).sorted.foreach { t =>
        s match {
          case Some(cur) if t - cur.endMs <= gapMs =>
            s = Some(cur.copy(startMs = math.min(cur.startMs, t),
              endMs = math.max(cur.endMs, t), n = cur.n + 1))
          case Some(cur) =>
            closed += cur
            s = Some(ClosedSession(key, t, t, 1L))
          case None =>
            s = Some(ClosedSession(key, t, t, 1L))
        }
      }
      getHandle.listTimers().foreach(getHandle.deleteTimer)
      s.foreach { cur =>
        getHandle.registerTimer(cur.endMs + gapMs)
        st.update(cur)
      }
      closed.result().iterator
    }

    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[ClosedSession] =
      if (st.exists()) {
        val s = st.get()
        st.clear()
        Iterator.single(s)
      } else Iterator.empty
  }

  /** Sessions closed by event-time timers over a watermarked click
    * stream (append mode: a session emits exactly once, on close). */
  def timerSessions(clicks: Dataset[Click], gapMs: Long): Dataset[ClosedSession] = {
    import clicks.sparkSession.implicits._
    clicks.withWatermark("ts", "0 seconds")
      .as[Click]
      .groupByKey(_.userId)
      .transformWithState(new SessionCloseProcessor(gapMs),
        TimeMode.EventTime(), OutputMode.Append())
  }

  case class Metered(userId: Long, seq: Long, cents: Long)
  case class EwmaAlert(userId: Long, seq: Long, cents: Long,
      ema_before: Long, dev: Long, band: Long, alert: Boolean)

  /** ONLINE EWMA control chart — the streaming alerting leg of
    * `Relational.qTsEwma`, sharing its recurrence VERBATIM
    * (`ema' = (v + 3·ema) div 4`, integer cents): per key the state
    * holds (ema, Σ|dev|, n); each arriving point is judged against the
    * band BEFORE folding in (the prequential rule — an online monitor
    * can only use the past, where the batch chart's band is the whole
    * series' mean deviation). Alert when `dev > 3·(Σdev div (n−1))`
    * with at least 2 prior points. State is three longs per key —
    * O(keys), never O(history) — and rows emit with their dev/band so
    * the alert is auditable downstream. */
  class EwmaAlertProcessor
      extends StatefulProcessor[Long, Metered, EwmaAlert] {
    @transient private var st: ValueState[(Long, Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[(Long, Long, Long)](
        "ewma", Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
          Encoders.scalaLong), TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Metered],
        timerValues: TimerValues): Iterator[EwmaAlert] = {
      var (ema, sd, n) = if (st.exists()) st.get() else (0L, 0L, 0L)
      val out = rows.toSeq.sortBy(_.seq).map { m =>
        val dev = if (n == 0) 0L else math.abs(m.cents - ema)
        val band = if (n >= 2) 3L * (sd / (n - 1)) else Long.MaxValue
        val alert = n >= 2 && dev > band
        val res = EwmaAlert(key, m.seq, m.cents, ema, dev,
          if (band == Long.MaxValue) -1L else band, alert)
        if (n == 0) ema = m.cents
        else { sd += dev; ema = (m.cents + 3L * ema) / 4L }
        n += 1
        res
      }
      st.update((ema, sd, n))
      out.iterator
    }
  }

  /** Per-key online anomaly alerts over a metered stream; rows within
    * a batch process in `seq` order (the stream's event order). */
  def ewmaAlerts(points: Dataset[Metered]): Dataset[EwmaAlert] = {
    import points.sparkSession.implicits._
    points.groupByKey(_.userId)
      .transformWithState(new EwmaAlertProcessor,
        TimeMode.None(), OutputMode.Append())
  }
}
