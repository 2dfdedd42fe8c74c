package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.TestSpark
import graft.taskrouter.{Derivation, Ingest}

/** ScalaCheck: for RANDOM multi-task/multi-worker scenario sets, random
  * in-order micro-batch splits, and random within-batch shuffles, the
  * streaming changelog reduced by last-write-wins equals the batch
  * derivation row-for-row. */
object StreamingProps extends Properties("Streaming") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5)

  private lazy val spark = TestSpark.spark

  private def jstr(s: String): String =
    "\"" + s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"; case c => c.toString } + "\""

  private def ce(id: String, et: String, epochMs: Long, sids: (String, String, String)): String = {
    val (task, res, worker) = sids
    val ts = java.time.Instant.ofEpochMilli(epochMs).toString
    val payload = (Seq(
      "eventtype" -> et, "timestamp" -> ts,
      "worker_sid" -> worker, "task_queue_name" -> "Q",
      "worker_activity_name" -> "Avail") ++
      (if (task.nonEmpty) Seq("task_sid" -> task, "reservation_sid" -> res) else Nil))
      .map { case (k, v) => jstr(k) + ":" + jstr(v) }.mkString("{", ",", "}")
    s"""{"id":${jstr(id)},"type":${jstr("com.twilio.taskrouter." + et)},"data":{"payload":$payload,"publisher_metadata":{"account_sid":"AC1"}}}"""
  }

  /** One random task scenario: entered→created→accepted[→wrapup][→completed]
    * or an abandon or a failure, with random second gaps. */
  private def genTask(taskIdx: Int): Gen[Seq[(Long, String)]] = for {
    t0 <- Gen.choose(1765000000000L, 1765000600000L)
    g1 <- Gen.choose(1000L, 30000L)
    g2 <- Gen.choose(1000L, 30000L)
    g3 <- Gen.choose(1000L, 60000L)
    g4 <- Gen.choose(1000L, 30000L)
    shape <- Gen.oneOf("happy", "nowrap", "inprog", "abandon", "reject")
  } yield {
    val sids = (s"WT$taskIdx", s"WR$taskIdx", s"WKt$taskIdx")
    def e(n: Int, et: String, at: Long) = (at, ce(s"T$taskIdx-$n", et, at, sids))
    shape match {
      case "happy" => Seq(
        e(1, "task-queue.entered", t0), e(2, "reservation.created", t0 + g1),
        e(3, "reservation.accepted", t0 + g1 + g2),
        e(4, "reservation.wrapup", t0 + g1 + g2 + g3),
        e(5, "reservation.completed", t0 + g1 + g2 + g3 + g4)).map { case (a, c) => (a, c) }
      case "nowrap" => Seq(
        e(1, "task-queue.entered", t0), e(2, "reservation.created", t0 + g1),
        e(3, "reservation.accepted", t0 + g1 + g2),
        e(5, "reservation.completed", t0 + g1 + g2 + g3))
      case "inprog" => Seq(
        e(1, "task-queue.entered", t0), e(2, "reservation.created", t0 + g1),
        e(3, "reservation.accepted", t0 + g1 + g2))
      case "abandon" => Seq(
        e(1, "task-queue.entered", t0), e(6, "task.canceled", t0 + g1))
      case _ => Seq(
        e(1, "task-queue.entered", t0), e(2, "reservation.created", t0 + g1),
        e(7, "reservation.rejected", t0 + g1 + g2))
    }
  }

  private val genScenario: Gen[Seq[(Long, String)]] = for {
    nTasks <- Gen.choose(1, 4)
    tasks <- Gen.sequence[Seq[Seq[(Long, String)]], Seq[(Long, String)]](
      (0 until nTasks).map(genTask))
    nSplits <- Gen.choose(0, 3)
  } yield tasks.flatten

  private var qn = 1000
  private def runStream(batches: Seq[Seq[String]]): Seq[org.apache.spark.sql.Row] = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    qn += 1
    val name = s"prop_changelog_$qn"
    val input = MemoryStream[String]
    val changelog = StreamingPipeline.segmentsChangelog(spark,
      StreamingPipeline.parseStream(spark, input.toDF()))
    val q = changelog.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try batches.filter(_.nonEmpty).foreach { b => input.addData(b); q.processAllAvailable() }
    finally q.stop()
    StreamingPipeline.latestSegments(spark.table(name))
      .orderBy("uuid").collect().toSeq
  }

  property("random scenarios: stream latest == batch under splits + shuffles") =
    Prop.forAll(genScenario, Gen.choose(0L, Long.MaxValue), Gen.choose(1, 3)) {
      (events, seed, nBatches) =>
        val rnd = new scala.util.Random(seed)
        // split respecting global event-time order across batches,
        // shuffled within each batch
        val ordered = events.sortBy(_._1).map(_._2)
        val cuts = Seq.fill(nBatches - 1)(rnd.nextInt(ordered.length + 1)).sorted
        val batches = (Seq(0) ++ cuts ++ Seq(ordered.length)).sliding(2).map {
          case Seq(a, b) => rnd.shuffle(ordered.slice(a, b))
        }.toSeq
        import spark.implicits._
        val batch = Derivation.segments(
          Ingest.parseJson(spark, spark.createDataset(ordered)))
          .orderBy("uuid").collect().toSeq
        runStream(batches) == batch
    }
}
