package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** The TopKRewrite optimizer rule: a session built with GraftExtensions
  * plans the row_number-filter idiom as a bounded ObjectHashAggregate,
  * produces the same rows as the window plan (including null keys and
  * every direction/null-ordering combination), and leaves plans it
  * cannot prove safe untouched.
  */
class TopKRewriteSpec extends SparkSpec {

  private lazy val ext: SparkSession = SparkSpec.extSession

  private def forAllSamples[A](gen: Gen[A], n: Int)(body: A => Unit): Unit =
    (1 to n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(body)
    }

  private def executed(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q10 idiom rewrites to a bounded aggregate and keeps its rows") {
    def q(s: SparkSession): DataFrame = {
      val w = Window
        .partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      Tables.orders(s, sf("sf0.001"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("o_custkey"), col("o_orderkey"), col("rn"))
    }
    val rewritten = q(ext)
    val p = executed(rewritten)
    assert(p.contains("ObjectHashAggregate"), s"expected the aggregate plan:\n$p")
    assert(!p.contains("Window"), s"expected no window exec:\n$p")
    val got = rewritten.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val want = q(spark).collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(executed(q(spark)).contains("Window")) // plain session keeps the window
    assert(got == want)
  }

  test("rewrite agrees with the window plan across directions, null orderings and k") {
    val rows = Gen.listOfN(300, Gen.zip(
      Gen.choose(0, 5),
      Gen.option(Gen.choose(-50, 50)),
      Gen.choose(0, 3)))
    val cases = Seq(
      (col("v").asc, "v ASC NULLS FIRST"),
      (col("v").asc_nulls_last, "v ASC NULLS LAST"),
      (col("v").desc, "v DESC NULLS LAST"),
      (col("v").desc_nulls_first, "v DESC NULLS FIRST"))
    forAllSamples(rows, n = 4) { xs =>
      cases.foreach { case (ord, label) =>
        def q(s: SparkSession, k: Int): Set[(Int, Long, Int)] = {
          import s.implicits._
          val df = xs.zipWithIndex
            .map { case ((g, v, _), i) => (g, i.toLong, v.map(_.toDouble)) }
            .toDF("g", "id", "v")
            .repartition(8)
          // id tiebreak makes the ordering total, so ties cannot differ
          val w = Window.partitionBy($"g").orderBy(ord, $"id")
          df.withColumn("rn", row_number().over(w))
            .filter($"rn" <= 3)
            .select($"g", $"id", $"rn")
            .collect().map(r => (r.getInt(0), r.getLong(1), r.getInt(2))).toSet
        }
        assert(q(ext, 3) == q(spark, 3), s"mismatch under $label")
      }
    }
  }

  test("unsupported shapes keep the window plan") {
    import ext.implicits._
    val df = Seq((1, "b", 2.0), (1, "a", 1.0), (2, "c", 3.0)).toDF("g", "name", "v")
    // descending strings have no order-reversing transform
    val w1 = Window.partitionBy($"g").orderBy($"name".desc)
    val p1 = executed(df.withColumn("rn", row_number().over(w1)).filter($"rn" <= 2))
    assert(p1.contains("Window"), s"desc-string must not rewrite:\n$p1")
    // rank() is not row_number: ties share ranks, an aggregate cannot model it
    val w2 = Window.partitionBy($"g").orderBy($"v")
    val p2 = executed(df.withColumn("rn", rank().over(w2)).filter($"rn" <= 2))
    assert(p2.contains("Window"), s"rank must not rewrite:\n$p2")
    // unbounded k must not build an unbounded heap
    val p3 = executed(df.withColumn("rn", row_number().over(w2)).filter($"rn" <= 100000))
    assert(p3.contains("Window"), s"huge k must not rewrite:\n$p3")
  }
}
