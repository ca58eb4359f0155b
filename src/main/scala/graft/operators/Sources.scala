package graft.operators

import graft.{Det, Q, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Source/sink coverage beyond the parquet warehouse (SURVEY.md §2.1
  * S4/S6): CSV with an explicit schema (never inferred — schema
  * inference means a second full scan at 100 TB), and a JSON-lines
  * round trip. Each query writes the format to a scratch dir, reads it
  * back, and aggregates — so the round trip itself is under the oracle
  * gate (the oracle runs on the original parquet: any loss in the
  * format conversion breaks the hash match).
  */
object Sources {
  import Det._

  /** Per-JVM unique scratch paths with shutdown cleanup — see
    * [[graft.Scratch]].
    */
  private def scratch(name: String): String = graft.Scratch.dir(name)

  private val customerSchema = new StructType()
    .add("c_custkey", LongType).add("c_nationkey", LongType)
    .add("c_acctbal", DoubleType).add("c_mktsegment", StringType)

  val all: Seq[Q] = Seq(
    // CSV sink + source with explicit schema (S4/S6)
    Q(
      "q65_csv_roundtrip",
      (s, d) => {
        val out = scratch("csv")
        Tables.customer(s, d)
          .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"), col("c_mktsegment"))
          .write.mode("overwrite").option("header", "true").csv(out)
        s.read.schema(customerSchema).option("header", "true").csv(out)
          .groupBy(col("c_nationkey"), col("c_mktsegment"))
          .agg(count(lit(1)).as("n"), dsum(col("c_acctbal")).as("sum_bal"))
          .orderBy(col("c_nationkey"), col("c_mktsegment"))
      },
      Some("""
        SELECT c_nationkey, c_mktsegment,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE) AS sum_bal
        FROM customer GROUP BY 1, 2 ORDER BY 1, 2"""),
      bench = true
    ),

    // JSON-lines sink + source (schema-first read again)
    Q(
      "q66_json_roundtrip",
      (s, d) => {
        val out = scratch("json")
        Tables.supplier(s, d)
          .select(col("s_suppkey"), col("s_nationkey"), col("s_acctbal"))
          .write.mode("overwrite").json(out)
        val schema = new StructType()
          .add("s_suppkey", LongType).add("s_nationkey", LongType)
          .add("s_acctbal", DoubleType)
        s.read.schema(schema).json(out)
          .groupBy(col("s_nationkey"))
          .agg(count(lit(1)).as("n"), dsum(col("s_acctbal")).as("sum_bal"))
          .orderBy(col("s_nationkey"))
      },
      Some("""
        SELECT s_nationkey,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(s_acctbal AS DECIMAL(38,6))) AS DOUBLE) AS sum_bal
        FROM supplier GROUP BY 1 ORDER BY 1"""),
      bench = true
    ),

    // ORC sink + source (columnar twin to the parquet warehouse; like
    // q65/q66, the oracle runs on the ORIGINAL parquet, so any loss or
    // type drift in the ORC conversion breaks the hash match)
    Q(
      "q86_orc_roundtrip",
      (s, d) => {
        val out = scratch("orc")
        Tables.part(s, d)
          .select(col("p_partkey"), col("p_brand"), col("p_size"), col("p_retailprice"))
          .write.mode("overwrite").orc(out)
        s.read.orc(out)
          .groupBy(col("p_brand"))
          .agg(
            count(lit(1)).as("n"),
            min(col("p_size")).as("min_size"),
            dsum(col("p_retailprice")).as("sum_price"))
          .orderBy(col("p_brand"))
      },
      Some("""
        SELECT p_brand,
               CAST(COUNT(*) AS BIGINT) AS n,
               min(p_size) AS min_size,
               CAST(SUM(CAST(p_retailprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_price
        FROM part GROUP BY 1 ORDER BY 1"""),
      bench = true
    )
  )
}
