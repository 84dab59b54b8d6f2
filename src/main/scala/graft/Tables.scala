package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated fixture tables
  * (`/root/testdata/<sf>/<name>.parquet`, schemas in FIXTURES.md §B).
  *
  * 100 TB rule (SURVEY.md §4.4): Parquet on the hot path — self-describing
  * schema, column pruning + predicate pushdown reach the scan for free.
  * No schema inference happens here (parquet footers carry the schema).
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = table(s, d, "lineitem")
  /** events.ts is parquet TIMESTAMP(NANOS) which Spark 4 refuses to read as
    * a timestamp (PARQUET_TYPE_ILLEGAL). Read it as raw nanos via the legacy
    * conf and truncate to µs ourselves. `div` (integer division) is
    * mandatory: `/` on longs goes through double, which cannot represent
    * ~1.7e18 ns exactly. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions
        .timestamp_micros(org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  /** also registers graft's native SQL functions (dot_f32) — every
    * embedding consumer resolves dot products through the registry */
  def embeddings(s: SparkSession, d: String): DataFrame = {
    graft.plans.GraftExtensions.register(s)
    table(s, d, "embeddings")
  }
}
