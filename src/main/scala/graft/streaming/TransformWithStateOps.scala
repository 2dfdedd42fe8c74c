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
}
