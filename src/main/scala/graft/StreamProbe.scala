package graft

/** Dev-only: timing breakdown of the streaming TaskRouter path. */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.build()
    sys.env.get("PROBE_ROCKSDB").filter(_ == "true").foreach(_ =>
      spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"))
    import org.apache.spark.sql.functions.{col, struct, to_json}
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val base = "target/graft-stage/stream-probe"
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles.foreach(rm); f.delete(); ()
    }
    rm(new java.io.File(base))
    t("corpus prep") {
      graft.taskrouter.Synth.cloudEvents(spark, dir)
        .select(to_json(struct(col("id"), col("type"), col("data"))).as("value"))
        .write.text(s"$base/in")
    }
    spark.streams.addListener(new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit =
        println(s"[batch] rows=${e.progress.numInputRows} " +
          s"durationMs=${e.progress.durationMs}")
    })
    // the cost streaming pays that batch staging never does: parsing
    // the full CloudEvent JSON envelopes (batch synth builds structs)
    t("json envelope parse (batch-mode, for comparison)") {
      graft.taskrouter.Ingest.parseJson(spark,
        spark.read.text(s"$base/in").as[String](org.apache.spark.sql.Encoders.STRING))
        .write.format("noop").mode("overwrite").save()
    }
    t("changelog only (append sink, no merge)") {
      Pipeline.startStreaming(spark, s"$base/in", s"$base/ckpt0", s"$base/out0")
        .awaitTermination()
    }
    t("stream merge e2e") {
      Pipeline.startStreamingMerged(spark, s"$base/in", s"$base/ckpt", s"$base/out")
        .awaitTermination()
    }
    t("merged count")(println("rows=" +
      Pipeline.mergedSegments(spark, s"$base/out").count()))
    Thread.sleep(1000) // let the listener flush
    spark.stop()
  }
}
