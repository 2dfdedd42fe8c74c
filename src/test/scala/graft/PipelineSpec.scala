package graft

import graft.taskrouter.{Derivation, Ingest, Synth}

/** End-to-end façade test: JSON → log → derived tables → report, and
  * the checkpointed streaming variant over the same inputs. */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toFile.getPath

  test("batch pipeline: ingest, derive, read back, report") {
    val log = tmp("graft-pipe-log")
    val out = tmp("graft-pipe-out")
    // serialize the synthesized envelopes back to raw CloudEvent JSON
    val raw = Synth.cloudEvents(spark, sf0001)
      .select(org.apache.spark.sql.functions.to_json(
        org.apache.spark.sql.functions.struct($"id", $"type", $"data")).as("j"))
      .as[String]
    Pipeline.ingestJson(spark, raw, log)
    Pipeline.deriveTables(spark, log, out)
    val segs = Pipeline.segments(spark, out)
    val agents = Pipeline.agents(spark, out)
    assert(segs.count() == Synth.segments(spark, sf0001).count())
    assert(agents.count() == Synth.agents(spark, sf0001).count())
    val report = graft.report.Report.conversationsReport(segs)
    assert(report.count() == segs.count())
  }

  test("streaming pipeline: checkpointed file watch produces the same latest state") {
    val watch = tmp("graft-watch")
    val ckpt = tmp("graft-ckpt")
    val out = tmp("graft-stream-out")
    val events = Seq(
      """{"id":"PL1","type":"com.twilio.taskrouter.task-queue.entered","data":{"payload":{"eventtype":"task-queue.entered","timestamp":"2026-08-12T10:00:00.400Z","task_sid":"WTpl","reservation_sid":"WRpl","worker_sid":"WKpl","task_queue_name":"Q"},"publisher_metadata":{"account_sid":"AC1"}}}""",
      """{"id":"PL2","type":"com.twilio.taskrouter.reservation.created","data":{"payload":{"eventtype":"reservation.created","timestamp":"2026-08-12T10:00:05.900Z","task_sid":"WTpl","reservation_sid":"WRpl","worker_sid":"WKpl","task_queue_name":"Q"},"publisher_metadata":{"account_sid":"AC1"}}}""",
      """{"id":"PL3","type":"com.twilio.taskrouter.reservation.accepted","data":{"payload":{"eventtype":"reservation.accepted","timestamp":"2026-08-12T10:00:30.123Z","task_sid":"WTpl","reservation_sid":"WRpl","worker_sid":"WKpl","task_queue_name":"Q"},"publisher_metadata":{"account_sid":"AC1"}}}""",
      """{"id":"PL4","type":"com.twilio.taskrouter.reservation.completed","data":{"payload":{"eventtype":"reservation.completed","timestamp":"2026-08-12T10:02:40.789Z","task_sid":"WTpl","reservation_sid":"WRpl","worker_sid":"WKpl","task_queue_name":"Q"},"publisher_metadata":{"account_sid":"AC1"}}}""")
    java.nio.file.Files.write(new java.io.File(watch, "a.jsonl").toPath,
      events.take(2).mkString("\n").getBytes("UTF-8"))
    val q1 = Pipeline.startStreaming(spark, watch, ckpt, out)
    q1.awaitTermination(120000)
    // second file arrives; restart from checkpoint picks it up
    java.nio.file.Files.write(new java.io.File(watch, "b.jsonl").toPath,
      events.drop(2).mkString("\n").getBytes("UTF-8"))
    val q2 = Pipeline.startStreaming(spark, watch, ckpt, out)
    q2.awaitTermination(120000)

    val latest = Pipeline.latestSegments(spark, out)
    val batch = Derivation.segments(
      Ingest.parseJson(spark, spark.createDataset(events)))
    assert(latest.orderBy("uuid").collect().toSeq ==
      batch.orderBy("uuid").collect().toSeq)
  }

  test("incremental MERGE-by-uuid sink maintains the latest table across micro-batches") {
    val watch = tmp("graft-merge-watch")
    val ckpt = tmp("graft-merge-ckpt")
    val out = tmp("graft-merge-out")
    val events = Seq(
      """{"id":"MG1","type":"com.twilio.taskrouter.task-queue.entered","data":{"payload":{"eventtype":"task-queue.entered","timestamp":"2026-08-12T10:00:00.400Z","task_sid":"WTmg","reservation_sid":"WRmg","worker_sid":"WKmg","task_queue_name":"Q"},"publisher_metadata":{"account_sid":"AC1"}}}""",
      """{"id":"MG2","type":"com.twilio.taskrouter.reservation.created","data":{"payload":{"eventtype":"reservation.created","timestamp":"2026-08-12T10:00:05.900Z","task_sid":"WTmg","reservation_sid":"WRmg","worker_sid":"WKmg","task_queue_name":"Q"},"publisher_metadata":{"account_sid":"AC1"}}}""",
      """{"id":"MG3","type":"com.twilio.taskrouter.reservation.accepted","data":{"payload":{"eventtype":"reservation.accepted","timestamp":"2026-08-12T10:00:30.123Z","task_sid":"WTmg","reservation_sid":"WRmg","worker_sid":"WKmg","task_queue_name":"Q"},"publisher_metadata":{"account_sid":"AC1"}}}""",
      """{"id":"MG4","type":"com.twilio.taskrouter.reservation.completed","data":{"payload":{"eventtype":"reservation.completed","timestamp":"2026-08-12T10:02:40.789Z","task_sid":"WTmg","reservation_sid":"WRmg","worker_sid":"WKmg","task_queue_name":"Q"},"publisher_metadata":{"account_sid":"AC1"}}}""")
    // batch 1 inserts the queue + in-progress rows; batch 2's completed
    // must MERGE the conversion over the in-progress row by uuid
    java.nio.file.Files.write(new java.io.File(watch, "a.jsonl").toPath,
      events.take(3).mkString("\n").getBytes("UTF-8"))
    val q1 = Pipeline.startStreamingMerged(spark, watch, ckpt, out)
    q1.awaitTermination(120000)
    val mid = Pipeline.mergedSegments(spark, out)
    assert(mid.filter($"segment_kind" === "CONVERSATION IN PROGRESS").count() == 1)

    java.nio.file.Files.write(new java.io.File(watch, "b.jsonl").toPath,
      events.drop(3).mkString("\n").getBytes("UTF-8"))
    val q2 = Pipeline.startStreamingMerged(spark, watch, ckpt, out)
    q2.awaitTermination(120000)

    val merged = Pipeline.mergedSegments(spark, out)
    val batch = Derivation.segments(
      Ingest.parseJson(spark, spark.createDataset(events)))
    assert(merged.orderBy("uuid").collect().toSeq ==
      batch.orderBy("uuid").collect().toSeq)
    // the in-progress row was updated in place, not duplicated
    assert(merged.filter($"segment_kind" === "CONVERSATION IN PROGRESS").count() == 0)
    // clustered merge write: one file per touched partition dir, not
    // tasks × partitions (the 8192-file fan-out fixed in r6)
    val partDirs = new java.io.File(out, "segments_latest").listFiles()
      .filter(d => d.isDirectory && d.getName.startsWith("uuid_p="))
    assert(partDirs.nonEmpty)
    partDirs.foreach { d =>
      val files = d.listFiles().count(_.getName.endsWith(".parquet"))
      assert(files == 1, s"${d.getName}: $files files")
    }
  }

  test("merge is idempotent: replaying the same delta converges to the same table") {
    // the exactly-once story under foreachBatch retries: deterministic
    // uuids + last-write-wins make a replayed batch a no-op
    val out = tmp("graft-merge-idem")
    val events = Seq(
      """{"id":"ID1","type":"com.twilio.taskrouter.task-queue.entered","data":{"payload":{"eventtype":"task-queue.entered","timestamp":"2026-08-12T11:00:00.000Z","task_sid":"WTid","task_queue_name":"Q"},"publisher_metadata":{"account_sid":"AC1"}}}""",
      """{"id":"ID2","type":"com.twilio.taskrouter.reservation.created","data":{"payload":{"eventtype":"reservation.created","timestamp":"2026-08-12T11:00:05.000Z","task_sid":"WTid","reservation_sid":"WRid","worker_sid":"WKid","task_queue_name":"Q"},"publisher_metadata":{"account_sid":"AC1"}}}""",
      """{"id":"ID3","type":"com.twilio.taskrouter.reservation.accepted","data":{"payload":{"eventtype":"reservation.accepted","timestamp":"2026-08-12T11:00:20.000Z","task_sid":"WTid","reservation_sid":"WRid","worker_sid":"WKid","task_queue_name":"Q"},"publisher_metadata":{"account_sid":"AC1"}}}""")
    val changelog = graft.streaming.StreamingPipeline.segmentsChangelog(spark,
      Ingest.parseJson(spark, spark.createDataset(events)))
    graft.streaming.MergeSink.mergeBatch(spark, s"$out/t", changelog)
    val once = graft.streaming.MergeSink.read(spark, s"$out/t")
      .orderBy("uuid").collect().toSeq
    assert(once.nonEmpty)
    graft.streaming.MergeSink.mergeBatch(spark, s"$out/t", changelog)
    val twice = graft.streaming.MergeSink.read(spark, s"$out/t")
      .orderBy("uuid").collect().toSeq
    assert(twice == once)
  }

  test("incremental agents MERGE equals the batch dimension across micro-batches") {
    val watch = tmp("graft-agents-watch")
    val ckpt = tmp("graft-agents-ckpt")
    val out = tmp("graft-agents-out")
    def wk(id: String, et: String, ts: String, act: String, attrs: String) =
      s"""{"id":"$id","type":"com.twilio.taskrouter.$et","data":{"payload":{"eventtype":"$et","timestamp":"$ts","worker_sid":"WKag","worker_activity_name":"$act","worker_attributes":$attrs},"publisher_metadata":{"account_sid":"AC1"}}}"""
    val events = Seq(
      wk("AG1", "worker.created", "2026-08-12T09:00:00.000Z", "Available",
        "\"{\\\"email\\\":\\\"a@x.co\\\",\\\"team_name\\\":\\\"T1\\\"}\""),
      wk("AG2", "worker.activity.update", "2026-08-12T09:10:00.000Z", "Busy",
        "\"{\\\"email\\\":\\\"a@x.co\\\",\\\"team_name\\\":\\\"T2\\\"}\""),
      wk("AG3", "worker.attributes.update", "2026-08-12T09:20:00.000Z", "Busy",
        "\"{\\\"email\\\":\\\"b@x.co\\\",\\\"team_name\\\":\\\"T3\\\"}\""))
    // batch 1: created; batch 2: updates MERGE over the existing row
    java.nio.file.Files.write(new java.io.File(watch, "a.jsonl").toPath,
      events.take(1).mkString("\n").getBytes("UTF-8"))
    val q1 = Pipeline.startStreamingAgents(spark, watch, ckpt, out)
    q1.awaitTermination(120000)
    val mid = Pipeline.mergedAgents(spark, out).collect()
    assert(mid.length == 1 && mid(0).getAs[String]("team_name") == "T1")

    java.nio.file.Files.write(new java.io.File(watch, "b.jsonl").toPath,
      events.drop(1).mkString("\n").getBytes("UTF-8"))
    val q2 = Pipeline.startStreamingAgents(spark, watch, ckpt, out)
    q2.awaitTermination(120000)

    val merged = Pipeline.mergedAgents(spark, out)
    val batch = Derivation.agents(
      Ingest.parseJson(spark, spark.createDataset(events)))
    assert(merged.orderBy("agent_uuid").collect().toSeq ==
      batch.orderBy("agent_uuid").collect().toSeq)
    // last-write-wins: attrs from the newest event, date_joined from the first
    val row = merged.collect()(0)
    assert(row.getAs[String]("team_name") == "T3")
    assert(row.getAs[String]("email") == "b@x.co")
  }
}
