package graft

import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.taskrouter.{Derivation, Ingest}

/** ScalaCheck properties (SURVEY §5.2.4): duration invariants under
  * random millisecond jitter, and arrival-order invariance of the batch
  * pipeline (which the reference does NOT have — README.md:13). */
object DerivationProps extends Properties("Derivation") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = TestSpark.spark

  private def jstr(s: String): String =
    "\"" + s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"; case c => c.toString } + "\""
  private def ce(id: String, et: String, epochMs: Long): String = {
    val ts = java.time.Instant.ofEpochMilli(epochMs).toString
    val payload = Seq(
      "eventtype" -> et, "timestamp" -> ts,
      "task_sid" -> "WTp", "reservation_sid" -> "WRp", "worker_sid" -> "WKp",
      "task_channel_unique_name" -> "voice", "task_queue_name" -> "Q",
      "task_queue_sid" -> "WQ", "workflow_name" -> "W")
      .map { case (k, v) => jstr(k) + ":" + jstr(v) }.mkString("{", ",", "}")
    s"""{"id":${jstr(id)},"type":${jstr("com.twilio.taskrouter." + et)},"data":{"payload":$payload,"publisher_metadata":{"account_sid":"AC1"}}}"""
  }

  private val base = 1765000000000L // fixed epoch anchor
  private def floorSec(ms: Long): Long = ms / 1000

  private val genScenario: Gen[(Long, Long, Long, Long, Long)] = for {
    jitter <- Gen.choose(0L, 999L)
    createdGap <- Gen.choose(500L, 20000L)
    acceptGap <- Gen.choose(500L, 60000L)
    wrapGap <- Gen.choose(500L, 300000L)
    compGap <- Gen.choose(500L, 60000L)
  } yield (base + jitter, createdGap, acceptGap, wrapGap, compGap)

  property("durations are floor-second differences") =
    Prop.forAll(genScenario) { case (t0, cg, ag, wg, pg) =>
      val t1 = t0 + cg; val t2 = t1 + ag; val t3 = t2 + wg; val t4 = t3 + pg
      val events = Seq(
        ce("P1", "task-queue.entered", t0),
        ce("P2", "reservation.created", t1),
        ce("P3", "reservation.accepted", t2),
        ce("P4", "reservation.wrapup", t3),
        ce("P5", "reservation.completed", t4))
      import spark.implicits._
      val segs = Derivation.segments(Ingest.parseJson(spark, spark.createDataset(events)))
        .collect()
      val q = segs.find(_.getAs[String]("segment_kind") == "QUEUE").get
      val c = segs.find(_.getAs[String]("segment_kind") == "CONVERSATION").get
      Prop.all(
        Prop(q.getAs[Long]("queue_time") == floorSec(t2) - floorSec(t0)) :| "queue_time",
        Prop(c.getAs[Long]("ring_time") == floorSec(t2) - floorSec(t1)) :| "ring_time",
        Prop(c.getAs[Long]("talk_time") == floorSec(t3) - floorSec(t2)) :| "talk_time",
        Prop(c.getAs[Long]("wrapup_time") == floorSec(t4) - floorSec(t3)) :| "wrapup_time",
        Prop(q.getAs[Long]("queue_time") >= 0) :| "non-negative")
    }

  property("batch derivation is invariant under arrival permutations") =
    Prop.forAll(genScenario, Gen.choose(0L, Long.MaxValue)) {
      case ((t0, cg, ag, wg, pg), seed) =>
        val t1 = t0 + cg; val t2 = t1 + ag; val t3 = t2 + wg; val t4 = t3 + pg
        val events = Seq(
          ce("P1", "task-queue.entered", t0),
          ce("P2", "reservation.created", t1),
          ce("P3", "reservation.accepted", t2),
          ce("P4", "reservation.wrapup", t3),
          ce("P5", "reservation.completed", t4))
        val shuffled = new scala.util.Random(seed).shuffle(events)
        import spark.implicits._
        def run(ev: Seq[String]) =
          Derivation.segments(Ingest.parseJson(spark, spark.createDataset(ev)))
            .orderBy("uuid").collect().toSeq
        run(events) == run(shuffled)
    }
}
