package graft

import org.apache.spark.sql.execution.ExplainMode

import graft.sources.{EventLog, Signature}
import graft.taskrouter.Synth

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  test("event log round-trips with date partitions and pruning") {
    val dir = java.nio.file.Files.createTempDirectory("graft-log").toFile.getPath
    val parsed = Synth.parsedEvents(spark, sf0001)
    EventLog.append(parsed, dir)
    val back = EventLog.read(spark, dir)
    assert(back.count() == parsed.count())
    // physical layout: hive-style event_date=... partition dirs
    val dirs = new java.io.File(dir).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.nonEmpty && dirs.forall(_.startsWith("event_date=")))
    // partition pruning reaches the scan
    val pruned = back.filter($"event_date" === dirs.head.stripPrefix("event_date="))
    val plan = pruned.queryExecution
      .explainString(ExplainMode.fromString("formatted"))
    assert(plan.contains("PartitionFilters: [isnotnull(event_date"), plan)
    // append is additive
    EventLog.append(parsed, dir)
    assert(EventLog.read(spark, dir).count() == 2 * parsed.count())
    // clustered append: ONE file per date per append (un-clustered,
    // every shuffle task writes a file per date it holds)
    new java.io.File(dir).listFiles().filter(_.isDirectory).foreach { d =>
      val files = d.listFiles().count(_.getName.endsWith(".parquet"))
      assert(files <= 2, s"${d.getName}: $files files after 2 appends")
    }
  }

  test("signature validation keeps valid rows, drops forgeries") {
    val token = "secret-token"
    val url = "https://example.test/events"
    val body = """[{"id":"EZ1"}]"""
    val good = Signature.hmacSha1Base64(token)(url, body)
    val df = Seq(
      (url, body, good),
      (url, body, "forged-signature"),
      (url, body + "tampered", good)
    ).toDF("url", "body", "signature")
    val kept = Signature.validated(df, token).collect()
    assert(kept.length == 1)
    assert(kept.head.getAs[String]("signature") == good)
  }

  test("signature function matches a known HMAC-SHA1 vector") {
    // RFC 2202 test case 2: key "Jefe", data "what do ya want for nothing?"
    val sig = Signature.hmacSha1Base64("Jefe")("what do ya want for ", "nothing?")
    val expectedHex = "effcdf6ae5eb2fa2d27416d5f184df9c259a7c79"
    val sigHex = java.util.Base64.getDecoder.decode(sig).map("%02x".format(_)).mkString
    assert(sigHex == expectedHex)
  }
}
