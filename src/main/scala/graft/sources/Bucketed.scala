package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed table layout (SCALE.md storage design): derived tables are
  * written bucketed by their join/aggregation key so repeated joins and
  * groupBys are bucket-local — no Exchange on the fact side at read
  * time. At 100 TB this is the difference between re-shuffling the
  * corpus per query and shuffling once at write time.
  *
  * Spark constraint: bucketing metadata lives in the session catalog,
  * so bucketed writes go through `saveAsTable` (with an explicit path),
  * not plain `parquet(path)`.
  */
object Bucketed {

  /** Write `df` as a parquet table bucketed (and sorted) by `key`. */
  def write(df: DataFrame, table: String, path: String,
      key: String, buckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .option("path", path)
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)
}
