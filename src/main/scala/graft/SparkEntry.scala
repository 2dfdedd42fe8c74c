package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.Relational

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every module's operator surface; `oracleSql`
  * carries the DuckDB-equivalent SQL for hash-matched correctness.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1Agg(spark, "/root/testdata/sf0.001")

  private def modules: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (Relational.queries, Relational.oracles),
      (graft.taskrouter.TaskRouterQueries.queries, graft.taskrouter.TaskRouterQueries.oracles),
      (graft.text.TextAnalysis.queries, graft.text.TextAnalysis.oracles),
      (graft.dedup.Dedup.queries, graft.dedup.Dedup.oracles),
      (graft.sim.Similarity.queries, graft.sim.Similarity.oracles),
      (graft.multimodal.Multimodal.queries, graft.multimodal.Multimodal.oracles),
      (graft.quality.Quality.queries, graft.quality.Quality.oracles),
      (graft.quality.Labeling.queries, graft.quality.Labeling.oracles),
      (graft.graph.GraphOps.queries, graft.graph.GraphOps.oracles),
      (graft.sim.IvfIndex.queries, graft.sim.IvfIndex.oracles),
      (graft.text.InvertedIndex.queries, graft.text.InvertedIndex.oracles),
      (graft.text.HtmlExtract.queries, graft.text.HtmlExtract.oracles),
      (graft.multimodal.PdfLite.queries, graft.multimodal.PdfLite.oracles),
      (graft.operators.ZoneMap.queries, graft.operators.ZoneMap.oracles)
    )

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.iterator.flatMap(_._1).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a rows-only check. */
  def oracleSql: Map[String, String] =
    modules.iterator.flatMap(_._2).toMap
}
