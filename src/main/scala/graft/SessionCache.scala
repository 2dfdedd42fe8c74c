package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped memoization of materialized (localCheckpoint'ed)
  * DataFrames — the test-harness stand-in for persisted derived tables
  * (signatures, normalized vectors, parsed event logs) that are
  * computed once per corpus and read many times at scale.
  *
  * Keys include the SparkContext's applicationId, so a fresh session
  * whose identityHashCode happens to collide with a stopped one can
  * never be served checkpointed blocks of a dead context.
  */
object SessionCache {
  private val cache =
    scala.collection.concurrent.TrieMap.empty[String, DataFrame]

  private def appPrefix(spark: SparkSession): String =
    spark.sparkContext.applicationId + "|"

  private def fullKey(spark: SparkSession, key: String): String =
    s"${appPrefix(spark)}${System.identityHashCode(spark)}|$key"

  /** Build-once: materializes `build` with localCheckpoint on first use
    * per (session, key) and returns the cached frame afterwards.
    * Entries of previous (stopped) SparkContexts are purged on access —
    * only one context lives per JVM, so a different applicationId means
    * the blocks behind those frames are already gone. */
  def checkpointed(spark: SparkSession, key: String)(build: => DataFrame): DataFrame = {
    val prefix = appPrefix(spark)
    cache.keys.filterNot(_.startsWith(prefix)).foreach(cache.remove)
    cache.getOrElseUpdate(fullKey(spark, key), build.localCheckpoint())
  }
}
