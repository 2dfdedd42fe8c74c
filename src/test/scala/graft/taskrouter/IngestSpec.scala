package graft.taskrouter

import graft.SparkSpec

class IngestSpec extends SparkSpec {
  import spark.implicits._

  private val valid =
    """{"id":"IG1","type":"com.twilio.taskrouter.task-queue.entered","data":{"payload":{"eventtype":"task-queue.entered","timestamp":"2026-08-12T10:00:00.400Z","task_sid":"WTi"},"publisher_metadata":{"account_sid":"AC1"}}}"""

  test("malformed timestamp drops the event, not the job") {
    val bad = valid.replace("2026-08-12T10:00:00.400Z", "not-a-timestamp")
      .replace("IG1", "IG2")
    val parsed = Ingest.parseJson(spark, spark.createDataset(Seq(valid, bad)))
    assert(parsed.count() == 1)
    assert(parsed.head.getAs[String]("event_id") == "IG1")
  }

  test("non-taskrouter types and broken JSON are filtered") {
    val otherType = valid.replace("com.twilio.taskrouter.", "com.twilio.voice.")
      .replace("IG1", "IG3")
    val brokenJson = """{"id": truncated"""
    val parsed = Ingest.parseJson(spark,
      spark.createDataset(Seq(valid, otherType, brokenJson)))
    assert(parsed.count() == 1)
  }

  test("missing attribute blobs default to empty structures") {
    val parsed = Ingest.parseJson(spark, spark.createDataset(Seq(valid)))
    val r = parsed.head
    assert(r.getAs[Map[String, String]]("wattr") == Map.empty)
    assert(r.getAs[org.apache.spark.sql.Row]("task_attr") != null)
  }
}
