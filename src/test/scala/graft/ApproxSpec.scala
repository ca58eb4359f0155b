package graft

import org.apache.spark.sql.functions._

/** HLL-sketch error bound: q71's approx distinct counts must stay
  * within the configured relative standard deviation (2%, asserted at
  * 3x margin) of the exact counts.
  */
class ApproxSpec extends SparkSpec {

  test("approx_count_distinct stays within 3x rsd of exact") {
    val d = sf("sf0.01")
    val approx = SparkEntry.queries("q71_approx_distinct")(spark, d)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val exact = Tables.lineitem(spark, d)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_orderkey")).as("o"), countDistinct(col("l_partkey")).as("p"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, (o, p)) =>
      val (ao, ap) = approx(k)
      assert(math.abs(ao - o).toDouble / o <= 0.06, s"$k orders: approx=$ao exact=$o")
      assert(math.abs(ap - p).toDouble / p <= 0.06, s"$k parts: approx=$ap exact=$p")
    }
  }

  test("approx column profile: exact fields equal q106, distincts within 3x rsd (q114)") {
    val d = sf("sf0.01")
    def byCol(name: String) =
      SparkEntry.queries(name)(spark, d).collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getString(3), r.getString(4)))
        .toMap
    val exact = byCol("q106_column_profile")
    val approx = byCol("q114_approx_profile")
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (c, (nNull, nd, lo, hi)) =>
      val (aNull, and, alo, ahi) = approx(c)
      assert(aNull == nNull && alo == lo && ahi == hi,
        s"$c: null/min/max must be exact in the approx profile")
      assert(math.abs(and - nd).toDouble / nd.max(1L) <= 0.06,
        s"$c: approx distinct $and vs exact $nd exceeds 3x rsd")
    }
  }

  test("approx quantiles honor the rank-error guarantee per group (q118)") {
    // the sketch's contract is rank error (<= 1/accuracy = 0.001,
    // asserted at a generous 0.05): the reported value's empirical rank
    // within its group must bracket the requested percentile
    val d = sf("sf0.01")
    val byLang = Tables.documents(spark, d)
      .select(col("lang"), col("n_chars").cast("long")).collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val approx = SparkEntry.queries("q118_approx_quantiles")(spark, d)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    assert(approx.length == byLang.size * 4)
    approx.foreach { case (lang, p, v) =>
      val xs = byLang(lang)
      val n = xs.length.toDouble
      val rankLo = xs.count(_ < v) / n
      val rankHi = xs.count(_ <= v) / n
      assert(rankLo <= p + 0.05 && rankHi >= p - 0.05,
        s"$lang p=$p: value $v has rank [$rankLo,$rankHi], outside tolerance")
      assert(xs.contains(v), s"$lang p=$p: approx_percentile must return an actual element")
    }
  }
}
