package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr

/** Loaders for the driver testdata tables (TESTDATA.md / FIXTURES.md §B).
  * All reads go through here so filters/projections written downstream get
  * pushed into the parquet scan by Catalyst.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def documents(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "embeddings")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's schema inference
    * rejects by default. Supplying the schema explicitly (ts as BIGINT
    * nanos-since-epoch) sidesteps inference entirely — no session-conf
    * mutation (`nanosAsLong` stays untouched) and no side effect outside this
    * read. The nanos then truncate to microseconds, matching a
    * `CAST(ts AS TIMESTAMP)` of the same data in engines that keep the ns. */
  def events(spark: SparkSession, sfDir: String): DataFrame =
    spark.read
      .schema("event_id BIGINT, ts BIGINT, user_id BIGINT, event_type STRING, " +
        "value DOUBLE, props STRING")
      .parquet(s"$sfDir/events.parquet")
      .withColumn("ts", expr("timestamp_micros(cast(ts div 1000 AS bigint))"))
  def lineitem(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "region")
}
