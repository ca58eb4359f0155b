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

  test("q146 bucketed-min estimator: accurate on a 200k-key synthetic, deterministic") {
    import spark.implicits._
    // a synthetic lineitem-shaped table with KNOWN cardinalities, in
    // the n >> K regime the estimator declares (K = 1024 cells)
    val dir = java.nio.file.Files.createTempDirectory("graft_kmv").toString
    spark.range(200000)
      .select(
        lit("X").as("l_returnflag"),
        col("id").as("l_orderkey"),
        (col("id") % 50000).as("l_partkey"))
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val rows = SparkEntry.queries("q146_kmv_distinct")(spark, dir).collect()
    assert(rows.length == 1)
    val (o, p) = (rows.head.getLong(1), rows.head.getLong(2))
    assert(math.abs(o - 200000.0) / 200000.0 <= 0.15, s"orders estimate $o vs 200000")
    assert(math.abs(p - 50000.0) / 50000.0 <= 0.15, s"parts estimate $p vs 50000")
    val again = SparkEntry.queries("q146_kmv_distinct")(spark, dir).collect()
    assert(rows.sameElements(again), "the estimate must be run-to-run deterministic")
  }

  test("q147 hash-sample quantiles: ~10% stratum, bounded rank drift vs exact (sf0.01)") {
    val d = sf("sf0.01")
    val rows = SparkEntry.queries("q147_sample_quantiles")(spark, d).collect()
      .map(r => (r.getString(0), r.getDouble(1)) -> (r.getDouble(2), r.getLong(3))).toMap
    val total = Tables.documents(spark, d).groupBy(col("lang")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // the md5 stratum is ~10% of each language (binomial tolerance)
    total.foreach { case (lang, n) =>
      val m = rows((lang, 0.5))._2
      assert(math.abs(m - n / 10.0) <= 4 * math.sqrt(n * 0.1 * 0.9) + 1,
        s"$lang sample $m is not a ~10% stratum of $n")
    }
    // each sampled quantile sits near the exact one in RANK terms:
    // the empirical CDF of the exact corpus at the sampled value must
    // be within ~4/sqrt(m) of p
    val exact = Tables.documents(spark, d)
      .select(col("lang"), col("n_chars")).collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(1)).sorted).toMap
    rows.foreach { case ((lang, p), (qv, m)) =>
      val vals = exact(lang)
      val rank = vals.count(_ <= qv).toDouble / vals.length
      assert(math.abs(rank - p) <= 4.0 / math.sqrt(m.toDouble) + 1.0 / vals.length,
        s"$lang p=$p: sampled value $qv has exact rank $rank (m=$m)")
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
