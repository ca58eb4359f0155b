package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet-backed table catalog over a scale-factor directory
  * (`/root/testdata/sf*`). Mirrors the reference's warehouse reads
  * (`/root/reference/src/pipelines/clustering.py:62-74` reads whole
  * tables from PostgreSQL); here the warehouse layer is columnar
  * parquet so scans prune columns and push filters natively.
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = apply(s, d, "lineitem")
  /** events.ts is parquet TIMESTAMP(NANOS), which Spark 4 refuses to read
    * natively; read it as nanos-since-epoch (legacy conf) and convert to a
    * microsecond timestamp by truncation — the same truncation DuckDB
    * applies casting TIMESTAMP_NS → TIMESTAMP, so oracles align.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    apply(s, d, "events").withColumn(
      "ts",
      org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame  = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
