package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.LongType

/** AS-OF JOIN as a first-class operator — custom `LogicalPlan` +
  * `SparkStrategy` + `SparkPlan`, registered through
  * `SparkSessionExtensions` (SURVEY §4.2's deferred tier (c); the
  * window-function formulation `Relational.qAsofJoin` remains the
  * composition-tier sibling).
  *
  * Semantics (J1, reference routes/events.js:74-87 `timestamp <
  * exitTimestamp`): for every left row, attach the payload of the
  * LATEST right row with the same key and right time STRICTLY before
  * the left time; ties on right time resolve to the greatest tiebreak
  * value. Left rows without a match keep NULL payload (left-outer).
  *
  * Physical strategy: both sides hash-partitioned on the key and
  * sorted by (key, time) — Spark inserts the exchanges/sorts to
  * satisfy `requiredChildDistribution`/`Ordering` — then ONE forward
  * merge pass per partition pair: the right cursor only ever advances,
  * so the cost is O(|L| + |R|) per partition with no window buffer and
  * no pair blow-up. At 100 TB both sides shuffle once on the key
  * (bucketed layouts can pre-pay it) and the merge streams.
  */
object AsOfJoin {

  // ---------------------------------------------------------------
  // logical node
  // ---------------------------------------------------------------

  /** Resolved logical as-of join. `leftTime`/`rightTime`/`rightTie`
    * are LongType attributes of the respective child (epoch numbers —
    * keeps the merge loop boxing-free). */
  case class AsOfJoinNode(left: LogicalPlan, right: LogicalPlan,
      leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
      leftTime: Attribute, rightTime: Attribute, rightTie: Attribute,
      payload: Seq[Attribute], toleranceMicros: Long = 0L,
      direction: String = "backward") extends BinaryNode {
    override def output: Seq[Attribute] =
      left.output ++ payload.map(_.withNullability(true))
    override protected def withNewChildrenInternal(
        newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
      copy(left = newLeft, right = newRight)
  }

  // ---------------------------------------------------------------
  // planner strategy
  // ---------------------------------------------------------------

  /** Physical selection mirrors Spark's own join strategy: a right
    * side whose estimated stats fit under the broadcast threshold
    * plans as [[BroadcastAsOfJoinExec]] (no shuffle or sort on either
    * side); otherwise the co-partitioned merge [[AsOfJoinExec]]. */
  object Strategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case AsOfJoinNode(l, r, lk, rk, lt, rt, tie, payload, tol, dir) =>
        val thr = org.apache.spark.sql.internal.SQLConf.get.autoBroadcastJoinThreshold
        val exec =
          if (thr > 0 && r.stats.sizeInBytes <= thr)
            BroadcastAsOfJoinExec(planLater(l), planLater(r),
              lk, rk, lt, rt, tie, payload, tol, dir)
          else
            AsOfJoinExec(planLater(l), planLater(r),
              lk, rk, lt, rt, tie, payload, tol, dir)
        exec :: Nil
      case _ => Nil
    }
  }

  /** For `SparkSession.builder().withExtensions(AsOfJoin.register)`. */
  def register(e: org.apache.spark.sql.SparkSessionExtensions): Unit =
    e.injectPlannerStrategy(_ => Strategy)

  // ---------------------------------------------------------------
  // physical exec
  // ---------------------------------------------------------------

  case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
      leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
      leftTime: Attribute, rightTime: Attribute, rightTie: Attribute,
      payload: Seq[Attribute], toleranceMicros: Long = 0L,
      direction: String = "backward") extends BinaryExecNode {

    override def output: Seq[Attribute] =
      left.output ++ payload.map(_.withNullability(true))

    // pin the partition count on both sides: zipPartitions pairs the
    // co-hashed partitions positionally, so AQE must not coalesce the
    // two shuffles differently
    override def requiredChildDistribution: Seq[Distribution] = {
      val n = Some(conf.numShufflePartitions)
      ClusteredDistribution(leftKeys, requiredNumPartitions = n) ::
        ClusteredDistribution(rightKeys, requiredNumPartitions = n) :: Nil
    }

    override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
      (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
      (rightKeys ++ Seq(rightTime, rightTie)).map(SortOrder(_, Ascending)))

    override def outputPartitioning: Partitioning = left.outputPartitioning
    override def outputOrdering: Seq[SortOrder] = left.outputOrdering

    override protected def withNewChildrenInternal(
        newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
      copy(left = newLeft, right = newRight)

    override protected def doExecute(): RDD[InternalRow] = {
      val lOut = left.output
      val rOut = right.output
      val lKeyIdx = leftKeys.map(a => lOut.indexWhere(_.exprId == a.exprId))
      val rKeyIdx = rightKeys.map(a => rOut.indexWhere(_.exprId == a.exprId))
      val lTimeIdx = lOut.indexWhere(_.exprId == leftTime.exprId)
      val rTimeIdx = rOut.indexWhere(_.exprId == rightTime.exprId)
      val keyTypes = leftKeys.map(_.dataType)
      val payloadIdx = payload.map(a => rOut.indexWhere(_.exprId == a.exprId))
      val payloadTypes = payload.map(_.dataType)
      val nPayload = payload.length
      val lArity = lOut.length

      left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
        val lKeyProj = UnsafeProjection.create(lKeyIdx.zip(keyTypes).map {
          case (i, t) => org.apache.spark.sql.catalyst.expressions.BoundReference(i, t, nullable = true)
        })
        val rKeyProj = UnsafeProjection.create(rKeyIdx.zip(keyTypes).map {
          case (i, t) => org.apache.spark.sql.catalyst.expressions.BoundReference(i, t, nullable = true)
        })
        // UnsafeProjection copies values into its own buffer; the
        // .copy() on capture detaches the candidate from the shuffle
        // iterator's reused row
        val payloadProj = UnsafeProjection.create(payloadIdx.zip(payloadTypes).map {
          case (i, t) => org.apache.spark.sql.catalyst.expressions.BoundReference(i, t, nullable = true)
        })
        val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
        // bind against NULLABLE payload attrs: the null-payload row must
        // project as NULL even when the right column was non-nullable
        // (a non-null binding would read getLong(null) == 0 instead)
        val resultProj = UnsafeProjection.create(output,
          lOut ++ payload.map(_.withNullability(true)))
        val nullPayload = new GenericInternalRow(nPayload)
        val joined = new JoinedRow

        val tol = toleranceMicros
        if (direction == "forward")
          // FORWARD direction: the match is the first same-key right
          // row with time strictly AFTER the left time. Left times are
          // ascending, so rows the cursor discards (time <= lTime) can
          // never match a later left row either — the cursor still only
          // advances, and the match is rHead ITSELF (not consumed: the
          // next left row may need the same right row).
          new Iterator[InternalRow] {
            private var rHead: InternalRow = if (rIt.hasNext) rIt.next() else null

            override def hasNext: Boolean = lIt.hasNext

            override def next(): InternalRow = {
              val l = lIt.next()
              val lKey = lKeyProj(l)
              val lTime = l.getLong(lTimeIdx)
              var advancing = true
              while (advancing && rHead != null) {
                val rKey = rKeyProj(rHead)
                val c = keyOrd.compare(rKey, lKey)
                if (c < 0 || (c == 0 && rHead.getLong(rTimeIdx) <= lTime))
                  rHead = if (rIt.hasNext) rIt.next() else null
                else advancing = false
              }
              val matches = rHead != null &&
                keyOrd.compare(rKeyProj(rHead), lKey) == 0 &&
                (tol == 0L || rHead.getLong(rTimeIdx) - lTime <= tol)
              resultProj(joined(l, if (matches) payloadProj(rHead) else nullPayload))
            }
          }
        else if (direction == "nearest")
          // NEAREST: closer of the strict-prior and strict-after
          // candidates; equal distances resolve BACKWARD. One cursor
          // still suffices: consumed rows (time <= lTime) fill a
          // TWO-slot backward buffer — (candA, tA) the latest consumed
          // row, (candB, tB) the latest with a strictly smaller time —
          // so a row tied to the CURRENT left time (captured for later
          // lefts, where it becomes strictly prior) cannot evict this
          // left's valid strictly-prior candidate. The unconsumed
          // rHead is the forward candidate.
          new Iterator[InternalRow] {
            private var rHead: InternalRow = if (rIt.hasNext) rIt.next() else null
            private var candKey: InternalRow = null
            private var candA: InternalRow = null; private var tA = Long.MinValue
            private var candB: InternalRow = null; private var tB = Long.MinValue

            override def hasNext: Boolean = lIt.hasNext

            override def next(): InternalRow = {
              val l = lIt.next()
              val lKey = lKeyProj(l)
              if (candKey == null || keyOrd.compare(candKey, lKey) != 0) {
                candKey = null
                candA = null; tA = Long.MinValue
                candB = null; tB = Long.MinValue
              }
              val lTime = l.getLong(lTimeIdx)
              var advancing = true
              while (advancing && rHead != null) {
                val rKey = rKeyProj(rHead)
                val c = keyOrd.compare(rKey, lKey)
                if (c < 0) { rHead = if (rIt.hasNext) rIt.next() else null }
                else if (c == 0 && rHead.getLong(rTimeIdx) <= lTime) {
                  val t = rHead.getLong(rTimeIdx)
                  if (t == tA) candA = payloadProj(rHead).copy()
                  else {
                    candB = candA; tB = tA
                    candA = payloadProj(rHead).copy(); tA = t
                  }
                  candKey = rKey.copy()
                  rHead = if (rIt.hasNext) rIt.next() else null
                } else advancing = false
              }
              // best strictly-prior candidate for THIS left
              val (back, backTime) =
                if (candA != null && tA < lTime) (candA, tA)
                else if (candB != null && tB < lTime) (candB, tB)
                else (null, Long.MinValue)
              val backOk = back != null && (tol == 0L || lTime - backTime <= tol)
              val fwdOk = rHead != null &&
                keyOrd.compare(rKeyProj(rHead), lKey) == 0 &&
                (tol == 0L || rHead.getLong(rTimeIdx) - lTime <= tol)
              val pick =
                if (backOk && fwdOk)
                  if (lTime - backTime <= rHead.getLong(rTimeIdx) - lTime) back
                  else payloadProj(rHead)
                else if (backOk) back
                else if (fwdOk) payloadProj(rHead)
                else nullPayload
              resultProj(joined(l, pick))
            }
          }
        else
        new Iterator[InternalRow] {
          private var rHead: InternalRow = if (rIt.hasNext) rIt.next() else null
          // latest right row (payload projection + time) for the current left key
          private var candKey: InternalRow = null
          private var cand: InternalRow = null
          private var candTime: Long = Long.MinValue

          override def hasNext: Boolean = lIt.hasNext

          override def next(): InternalRow = {
            val l = lIt.next()
            val lKey = lKeyProj(l)
            if (candKey == null || keyOrd.compare(candKey, lKey) != 0) {
              candKey = null; cand = null; candTime = Long.MinValue
            }
            val lTime = l.getLong(lTimeIdx)
            // advance the right cursor up to (but excluding) lTime for
            // keys <= lKey; remember the last same-key row passed
            var advancing = true
            while (advancing && rHead != null) {
              val rKey = rKeyProj(rHead)
              val c = keyOrd.compare(rKey, lKey)
              if (c < 0) { rHead = if (rIt.hasNext) rIt.next() else null }
              else if (c == 0 && rHead.getLong(rTimeIdx) < lTime) {
                candTime = rHead.getLong(rTimeIdx)
                cand = payloadProj(rHead).copy()
                candKey = rKey.copy()
                rHead = if (rIt.hasNext) rIt.next() else null
              } else advancing = false
            }
            // a bounded-lookback join rejects a latest-match that is
            // too old (anything older is older still — no match)
            val inWindow = cand != null && (tol == 0L || lTime - candTime <= tol)
            resultProj(joined(l, if (inWindow) cand else nullPayload))
          }
        }
      }
    }
  }

  /** Broadcast variant: the whole right side is broadcast, indexed per
    * key as a time-sorted array, and each left partition probes it
    * with a binary search — no exchange or sort on EITHER side (the
    * left keeps its partitioning, like Spark's BroadcastHashJoin). */
  case class BroadcastAsOfJoinExec(left: SparkPlan, right: SparkPlan,
      leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
      leftTime: Attribute, rightTime: Attribute, rightTie: Attribute,
      payload: Seq[Attribute], toleranceMicros: Long = 0L,
      direction: String = "backward") extends BinaryExecNode {

    override def output: Seq[Attribute] =
      left.output ++ payload.map(_.withNullability(true))

    override def requiredChildDistribution: Seq[Distribution] =
      org.apache.spark.sql.catalyst.plans.physical.UnspecifiedDistribution ::
        org.apache.spark.sql.catalyst.plans.physical.BroadcastDistribution(
          org.apache.spark.sql.catalyst.plans.physical.IdentityBroadcastMode) :: Nil

    override def outputPartitioning: Partitioning = left.outputPartitioning
    override def outputOrdering: Seq[SortOrder] = left.outputOrdering

    override protected def withNewChildrenInternal(
        newLeft: SparkPlan, newRight: SparkPlan): BroadcastAsOfJoinExec =
      copy(left = newLeft, right = newRight)

    override protected def doExecute(): RDD[InternalRow] = {
      val lOut = left.output
      val rOut = right.output
      val lKeyIdx = leftKeys.map(a => lOut.indexWhere(_.exprId == a.exprId))
      val rKeyIdx = rightKeys.map(a => rOut.indexWhere(_.exprId == a.exprId))
      val lTimeIdx = lOut.indexWhere(_.exprId == leftTime.exprId)
      val rTimeIdx = rOut.indexWhere(_.exprId == rightTime.exprId)
      val rTieIdx = rOut.indexWhere(_.exprId == rightTie.exprId)
      val keyTypes = leftKeys.map(_.dataType)
      val payloadIdx = payload.map(a => rOut.indexWhere(_.exprId == a.exprId))
      val payloadTypes = payload.map(_.dataType)
      val nPayload = payload.length

      val broadcastRows = right.executeBroadcast[Array[InternalRow]]()
      left.execute().mapPartitions { lIt =>
        // per-partition index build: key -> (sorted times, payloads)
        val rKeyProj = UnsafeProjection.create(rKeyIdx.zip(keyTypes).map {
          case (i, t) => org.apache.spark.sql.catalyst.expressions.BoundReference(i, t, nullable = true)
        })
        val payloadProj = UnsafeProjection.create(payloadIdx.zip(payloadTypes).map {
          case (i, t) => org.apache.spark.sql.catalyst.expressions.BoundReference(i, t, nullable = true)
        })
        val index = new java.util.HashMap[InternalRow,
          (Array[Long], Array[Long], Array[InternalRow])]()
        val grouped = new java.util.HashMap[InternalRow,
          scala.collection.mutable.ArrayBuffer[(Long, Long, InternalRow)]]()
        broadcastRows.value.foreach { r =>
          val k = rKeyProj(r).copy()
          var buf = grouped.get(k)
          if (buf == null) {
            buf = scala.collection.mutable.ArrayBuffer.empty
            grouped.put(k, buf)
          }
          buf += ((r.getLong(rTimeIdx), r.getLong(rTieIdx), payloadProj(r).copy()))
        }
        grouped.forEach { (k, buf) =>
          val sorted = buf.sortBy(x => (x._1, x._2))
          index.put(k, (sorted.map(_._1).toArray, sorted.map(_._2).toArray,
            sorted.map(_._3).toArray))
        }

        val lKeyProj = UnsafeProjection.create(lKeyIdx.zip(keyTypes).map {
          case (i, t) => org.apache.spark.sql.catalyst.expressions.BoundReference(i, t, nullable = true)
        })
        // bind against NULLABLE payload attrs: the null-payload row must
        // project as NULL even when the right column was non-nullable
        // (a non-null binding would read getLong(null) == 0 instead)
        val resultProj = UnsafeProjection.create(output,
          lOut ++ payload.map(_.withNullability(true)))
        val nullPayload = new GenericInternalRow(nPayload)
        val joined = new JoinedRow

        lIt.map { l =>
          val entry = index.get(lKeyProj(l))
          val matched =
            if (entry == null) nullPayload
            else if (direction == "forward") {
              val (times, _, payloads) = entry
              val lTime = l.getLong(lTimeIdx)
              // leftmost position with time > lTime: sorted by
              // (time, tie), so that position IS the min-(time,tie) row
              var lo = 0; var hi = times.length // [lo, hi)
              while (lo < hi) {
                val mid = (lo + hi) >>> 1
                if (times(mid) <= lTime) lo = mid + 1 else hi = mid
              }
              if (lo == times.length) nullPayload
              else if (toleranceMicros != 0L &&
                times(lo) - lTime > toleranceMicros) nullPayload
              else payloads(lo)
            } else if (direction == "nearest") {
              val (times, _, payloads) = entry
              val lTime = l.getLong(lTimeIdx)
              // two mirrored bisects: first >= lTime and first > lTime
              var lo = 0; var hi = times.length
              while (lo < hi) {
                val mid = (lo + hi) >>> 1
                if (times(mid) < lTime) lo = mid + 1 else hi = mid
              }
              val posGE = lo
              lo = posGE; hi = times.length
              while (lo < hi) {
                val mid = (lo + hi) >>> 1
                if (times(mid) <= lTime) lo = mid + 1 else hi = mid
              }
              val posGT = lo
              val backOk = posGE > 0 && (toleranceMicros == 0L ||
                lTime - times(posGE - 1) <= toleranceMicros)
              val fwdOk = posGT < times.length && (toleranceMicros == 0L ||
                times(posGT) - lTime <= toleranceMicros)
              if (backOk && fwdOk)
                if (lTime - times(posGE - 1) <= times(posGT) - lTime)
                  payloads(posGE - 1)
                else payloads(posGT)
              else if (backOk) payloads(posGE - 1)
              else if (fwdOk) payloads(posGT)
              else nullPayload
            } else {
              val (times, _, payloads) = entry
              val lTime = l.getLong(lTimeIdx)
              // rightmost position with time < lTime: sorted by
              // (time, tie), so that position IS the max-(time,tie) row
              var lo = 0; var hi = times.length // [lo, hi)
              while (lo < hi) {
                val mid = (lo + hi) >>> 1
                if (times(mid) < lTime) lo = mid + 1 else hi = mid
              }
              if (lo == 0) nullPayload
              else if (toleranceMicros != 0L &&
                lTime - times(lo - 1) > toleranceMicros) nullPayload
              else payloads(lo - 1)
            }
          resultProj(joined(l, matched))
        }
      }
    }
  }

  // ---------------------------------------------------------------
  // DataFrame API
  // ---------------------------------------------------------------

  /** Left-outer as-of join: attach `payload` columns of the latest
    * `right` row whose `rightTime` is STRICTLY before the left row's
    * `leftTime` on the same key (ties on `rightTime` → greatest
    * `rightTie` wins). Time and tiebreak columns must be LongType.
    * Right column names must not collide with left's.
    *
    * `toleranceMicros` > 0 bounds the lookback (the pandas/kdb as-of
    * `tolerance`): a latest-match older than the window yields NULL
    * payload instead — anything older is older still, so the reject
    * happens after the same O(1) cursor/bisect step and the merge
    * stays one forward pass.
    *
    * `direction = "forward"` flips the match to the EARLIEST right row
    * with `rightTime` strictly AFTER `leftTime` (pandas
    * `merge_asof(direction='forward')` — the "what happened next"
    * lookup; ties on `rightTime` → smallest `rightTie` wins, the
    * mirror of backward's greatest). Identical physical shapes: the
    * merge cursor still only advances (left times are ascending, so
    * discarded right rows can never match a later left), and the
    * broadcast probe is the mirrored bisect. `toleranceMicros` then
    * bounds the look-AHEAD.
    *
    * `direction = "nearest"` picks the CLOSER of the strict-prior and
    * strict-after candidates (equal distances resolve backward, each
    * side's own tie rule applies within it); `toleranceMicros` bounds
    * both distances. Still one advancing cursor in the merge (a
    * two-slot buffer keeps the strictly-prior candidate safe from
    * equal-time captures) and two mirrored bisects in the broadcast
    * probe. */
  def joinAsOf(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String, rightTie: String,
      payload: Seq[String], toleranceMicros: Long = 0L,
      direction: String = "backward"): DataFrame = {
    val spark = left.sparkSession
    // defensive registration for sessions not built withExtensions
    if (!spark.experimental.extraStrategies.contains(Strategy) &&
        !spark.sessionState.planner.strategies.contains(Strategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ Strategy
    val lPlan = left.queryExecution.analyzed
    val rPlan = right.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"column $n not found in ${p.output.map(_.name)}"))
    val lt = attr(lPlan, leftTime); val rt = attr(rPlan, rightTime)
    val tie = attr(rPlan, rightTie)
    require(lt.dataType == LongType && rt.dataType == LongType &&
      tie.dataType == LongType, "as-of time/tie columns must be LongType")
    require(toleranceMicros >= 0L, "as-of tolerance must be non-negative")
    require(Set("backward", "forward", "nearest").contains(direction),
      s"as-of direction must be backward|forward|nearest, got $direction")
    val node = AsOfJoinNode(lPlan, rPlan,
      Seq(attr(lPlan, leftKey)), Seq(attr(rPlan, rightKey)),
      lt, rt, tie, payload.map(attr(rPlan, _)), toleranceMicros,
      direction)
    org.apache.spark.sql.graft.GraftSqlBridge.ofRows(spark, node)
  }
}
