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
  /** events.ts has shipped in two physical vintages: parquet
    * TIMESTAMP(NANOS) (which Spark 4 only reads as int64 nanos under the
    * legacy conf) and plain TIMESTAMP(MICROS) without UTC adjustment
    * (which scans as TIMESTAMP_NTZ). Branch on the *scanned* dtype so
    * either vintage normalizes to the same session-TZ microsecond
    * timestamp instead of hard-coding one file layout.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventTs(apply(s, d, "events"))
  }

  /** Normalize a scanned `ts` column to a TimestampType microsecond
    * timestamp whatever the file stored:
    *  - int64 (legacy nanos files read under `nanosAsLong`): truncate
    *    `div 1000` — the same truncation DuckDB applies casting
    *    TIMESTAMP_NS → TIMESTAMP, so oracles align. DECLARED
    *    ASSUMPTION: a bare int64 ts is nanos — the only int64 vintage
    *    ever shipped. An int64-MICROS file would be indistinguishable
    *    by dtype and silently land 1000× off; micros data must carry
    *    the parquet TIMESTAMP(MICROS) annotation (→ TIMESTAMP_NTZ
    *    branch below), which every tool that writes micros does;
    *  - TIMESTAMP_NTZ (micros files, isAdjustedToUTC=false): reinterpret
    *    in the session time zone — pinned to UTC everywhere, so the
    *    field values are preserved and DuckDB's naive read matches;
    *  - TimestampType: already canonical.
    * Any other type is a corrupt/mistyped file and fails loudly.
    */
  private[graft] def normalizeEventTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType    => df
      case other => throw new IllegalArgumentException(
        s"events.ts scanned as unsupported type $other — expected int64 nanos, " +
          "TIMESTAMP_NTZ micros, or TIMESTAMP")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
