package graft

import org.apache.spark.sql.functions._

import graft.streaming.StreamMetrics
import graft.taskrouter.{Derivation, Ingest, Synth}

/** Bounded-trigger ingestion: the sf0.001 CloudEvent corpus staged as
  * time-ordered chunk files must replay through `startStreamingMerged`
  * as MULTIPLE bounded micro-batches (maxFilesPerTrigger admission
  * control under AvailableNow) — and the merged table must equal the
  * single-batch run row for row. This is the 100 TB ingestion shape:
  * a backlog drains as N memory-sized batches, never one corpus-sized
  * batch (the r8 bench processed 206k rows as batch 0).
  */
class BoundedTriggerSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toFile.getPath

  private def corpus = Synth.cloudEvents(spark, sf0001)
    .select(to_json(struct(col("id"), col("type"), col("data"))).as("value"),
      col("data.payload.timestamp").as("ts"))

  test("maxFilesPerTrigger replays ordered chunks as bounded batches; merged table equals single-batch run") {
    val in = tmp("graft-bt-in")
    Pipeline.stageOrderedJson(corpus, col("ts"), col("value"), in, chunks = 4)
    val chunkFiles = new java.io.File(in).listFiles()
      .filter(_.getName.startsWith("part-")).sortBy(_.getName)
    assert(chunkFiles.length == 4, chunkFiles.mkString(","))
    // staging stamped strictly ascending mtimes (oldest-first admission)
    assert(chunkFiles.map(_.lastModified).sliding(2).forall(p => p(0) < p(1)))

    // TTL off for the equality claim: in bounded mode the watermark
    // advances BETWEEN batches, so the default 24h TTL evicts agent
    // spans idle longer than a day and their eventual close is
    // tolerated-dropped — the designed eviction path (StreamingTtlSpec),
    // which a single batch (watermark still 0) never reaches. Verified
    // on this corpus: with the default TTL exactly the 2 multi-day
    // worker spans differ, nothing else.
    val recorder = new StreamMetrics.Recorder()
    spark.streams.addListener(recorder)
    val boundedOut = tmp("graft-bt-out")
    try {
      Pipeline.startStreamingMerged(spark, in, tmp("graft-bt-ckpt"), boundedOut,
        stateTtlMs = None, maxFilesPerTrigger = Some(1)).awaitTermination(300000)
    } finally spark.streams.removeListener(recorder)
    val batches = recorder.drain().filter(_.numInputRows > 0)

    val total = corpus.count()
    // one chunk per trigger → 4 bounded data batches, none corpus-sized
    assert(batches.length == 4, batches.map(b => (b.batchId, b.numInputRows)))
    assert(batches.map(_.numInputRows).sum == total)
    batches.foreach(b => assert(b.numInputRows < total,
      s"batch ${b.batchId} admitted the whole corpus (${b.numInputRows})"))

    // bit-for-bit the single-batch (unbounded) result
    val singleOut = tmp("graft-bt-single")
    Pipeline.startStreamingMerged(spark, in, tmp("graft-bt-sckpt"), singleOut,
      stateTtlMs = None, maxFilesPerTrigger = None).awaitTermination(300000)
    val bounded = Pipeline.mergedSegments(spark, boundedOut)
      .orderBy("uuid").collect().toSeq
    val single = Pipeline.mergedSegments(spark, singleOut)
      .orderBy("uuid").collect().toSeq
    assert(bounded.nonEmpty)
    val onlyB = bounded.toSet -- single.toSet
    val onlyS = single.toSet -- bounded.toSet
    assert(onlyB.isEmpty && onlyS.isEmpty,
      s"bounded-only=${onlyB.size} single-only=${onlyS.size}\n" +
        s"sample bounded-only: ${onlyB.take(2).mkString("\n")}\n" +
        s"sample single-only: ${onlyS.take(2).mkString("\n")}")

    // and both equal the batch derivation over the same lines
    val batchRows = Derivation.segments(Ingest.parseJson(spark, {
      import spark.implicits._
      corpus.select("value").as[String]
    })).orderBy("uuid").collect().toSeq
    assert(bounded.size == batchRows.size)
  }

  test("agents leg: bounded multi-batch MERGE equals the single-batch dimension") {
    val in = tmp("graft-bt-ag-in")
    Pipeline.stageOrderedJson(corpus, col("ts"), col("value"), in, chunks = 4)
    val boundedOut = tmp("graft-bt-ag-out")
    Pipeline.startStreamingAgents(spark, in, tmp("graft-bt-ag-ckpt"),
      boundedOut, maxFilesPerTrigger = Some(1)).awaitTermination(300000)
    val singleOut = tmp("graft-bt-ag-single")
    Pipeline.startStreamingAgents(spark, in, tmp("graft-bt-ag-sckpt"),
      singleOut, maxFilesPerTrigger = None).awaitTermination(300000)
    val bounded = Pipeline.mergedAgents(spark, boundedOut)
      .orderBy("agent_uuid").collect().toSeq
    val single = Pipeline.mergedAgents(spark, singleOut)
      .orderBy("agent_uuid").collect().toSeq
    assert(bounded.nonEmpty)
    assert(bounded == single)
  }

  test("bus seam: rate source under rowsPerBatch admission converges to the file-source merged table") {
    import spark.implicits._
    // the same corpus a bus partition would deliver, in event-time
    // order, fed through the SECOND EventBusSource implementation —
    // proving the seam contract (one `value` column + bounded
    // admission) is all the pipeline depends on
    val lines = corpus.orderBy(col("ts")).select("value").as[String].collect().toSeq
    val n = lines.length
    val rowsPerBatch = math.max(1, n / 3) // 4 bounded batches
    // toLine: literal line array + try_element_at (NULL past the
    // corpus end under ANSI mode, so the infinite source tails off)
    val arr = typedlit(lines)
    val src = graft.sources.RateBusSource(rowsPerBatch,
      v => org.apache.spark.sql.functions.try_element_at(arr, (v + lit(1)).cast("int")))

    // file-source reference over the same lines (bounded, TTL off)
    val in = tmp("graft-bus-in")
    Pipeline.stageOrderedJson(corpus, col("ts"), col("value"), in, chunks = 4)
    val fileOut = tmp("graft-bus-file-out")
    Pipeline.startStreamingMerged(spark, in, tmp("graft-bus-file-ckpt"), fileOut,
      stateTtlMs = None, maxFilesPerTrigger = Some(1)).awaitTermination(300000)
    val want = Pipeline.mergedSegments(spark, fileOut)
      .orderBy("uuid").collect().toSeq
    assert(want.nonEmpty)

    val recorder = new StreamMetrics.Recorder()
    spark.streams.addListener(recorder)
    val rateOut = tmp("graft-bus-rate-out")
    val q = Pipeline.startStreamingMerged(spark, src,
      tmp("graft-bus-rate-ckpt"), rateOut, stateTtlMs = None,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
    try {
      // reads race the sink's partition rewrites (FAILED_READ_FILE
      // mid-merge) — Try + retry until convergence
      def got() = scala.util.Try(
        Pipeline.mergedSegments(spark, rateOut).orderBy("uuid").collect().toSeq
      ).getOrElse(Seq.empty)
      val deadline = System.currentTimeMillis() + 300000
      var found = got()
      while (found != want && System.currentTimeMillis() < deadline) {
        Thread.sleep(1000); found = got()
      }
      assert(found == want,
        s"rate-source merged table never converged: got ${found.size} want ${want.size}")
    } finally {
      q.stop(); spark.streams.removeListener(recorder)
    }
    // admission boundedness: the source enforces rowsPerBatch exactly —
    // no data batch ever admitted more source rows than the bound
    val batches = recorder.drain().filter(_.numInputRows > 0)
    assert(batches.nonEmpty)
    batches.foreach(b => assert(b.numInputRows <= rowsPerBatch,
      s"batch ${b.batchId} admitted ${b.numInputRows} > bound $rowsPerBatch"))
    // and the corpus arrived across MULTIPLE bounded batches
    assert(batches.count(_.numInputRows == rowsPerBatch) >= 3)
  }

  test("ordered staging: chunk N+1 never starts behind chunk N (no late rows between batches)") {
    val in = tmp("graft-bt-ord")
    Pipeline.stageOrderedJson(corpus, col("ts"), col("value"), in, chunks = 4)
    val spans = new java.io.File(in).listFiles()
      .filter(_.getName.startsWith("part-")).sortBy(_.getName).toSeq
      .map { f =>
        val df = spark.read.text(f.getPath)
        val parsed = Ingest.parseJson(spark, {
          import spark.implicits._
          df.select(col("value")).as[String]
        })
        val r = parsed.agg(min("ts"), max("ts")).head()
        (r.getTimestamp(0), r.getTimestamp(1))
      }
    spans.sliding(2).foreach {
      case Seq((_, prevMax), (nextMin, _)) =>
        assert(!nextMin.before(prevMax),
          s"chunk starts ($nextMin) behind previous chunk's end ($prevMax)")
      case _ =>
    }
  }
}
