package graft

import org.apache.spark.sql.functions._

/** HLL-sketch error bound: q71's approx distinct counts must stay
  * within the configured relative standard deviation (2%, asserted at
  * 3x margin) of the exact counts.
  */
class ApproxSpec extends SparkSpec {

  test("q71 certificate: exact arms match recomputation, HLL booleans hold") {
    val d = sf("sf0.01")
    val cert = SparkEntry.queries("q71_approx_distinct")(spark, d)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("exact_orders"), r.getAs[Long]("exact_parts"),
          r.getAs[Boolean]("orders_ok"), r.getAs[Boolean]("parts_ok"))).toMap
    val exact = Tables.lineitem(spark, d)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_orderkey")).as("o"), countDistinct(col("l_partkey")).as("p"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(cert.keySet == exact.keySet)
    exact.foreach { case (k, (o, p)) =>
      val (co, cp, okO, okP) = cert(k)
      assert(co == o && cp == p, s"$k: exact arms must match independent recomputation")
      assert(okO && okP, s"$k: HLL estimates must sit within the 5% certificate bound")
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

  test("q114 certificate: every field matches exact q106, HLL booleans hold") {
    val d = sf("sf0.01")
    val exact = SparkEntry.queries("q106_column_profile")(spark, d).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getString(3), r.getString(4)))
      .toMap
    val cert = SparkEntry.queries("q114_approx_profile")(spark, d).collect()
      .map(r => r.getString(0) ->
        (r.getAs[Long]("n_null"), r.getAs[Long]("n_distinct"),
          r.getAs[Boolean]("approx_ok"), r.getAs[String]("min_v"), r.getAs[String]("max_v")))
      .toMap
    assert(cert.keySet == exact.keySet)
    exact.foreach { case (c, (nNull, nd, lo, hi)) =>
      val (aNull, and, ok, alo, ahi) = cert(c)
      assert(aNull == nNull && and == nd && alo == lo && ahi == hi,
        s"$c: exact arms must equal the q106 profile")
      assert(ok, s"$c: HLL estimate must sit within the 5% certificate bound")
    }
    // the PRODUCTION sketch-only shape still estimates within 3x rsd
    val sketch = graft.operators.Warehouse.approxProfileSketch(spark, d).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    exact.foreach { case (c, (_, nd, _, _)) =>
      assert(math.abs(sketch(c) - nd).toDouble / nd.max(1L) <= 0.06,
        s"$c: sketch distinct ${sketch(c)} vs exact $nd exceeds 3x rsd")
    }
  }

  test("approx quantiles honor the rank-error guarantee per group (q118)") {
    // the sketch's contract is rank error (<= 1/accuracy = 0.001,
    // asserted at a generous 0.05): the reported value's empirical rank
    // within its group must bracket the requested percentile. q118's
    // gated output is the bracket certificate; the RAW estimates are
    // recomputed here with the same call to pin the rank property.
    val d = sf("sf0.01")
    val byLang = Tables.documents(spark, d)
      .select(col("lang"), col("n_chars").cast("long")).collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val cert = SparkEntry.queries("q118_approx_quantiles")(spark, d).collect()
    assert(cert.length == byLang.size * 4)
    cert.foreach { r =>
      assert(r.getAs[Boolean]("in_bracket"),
        s"${r.getString(0)} p=${r.getDouble(1)}: sketch value escaped its exact bracket")
      assert(r.getAs[Double]("q_lo") <= r.getAs[Double]("q_hi"))
      assert(r.getAs[Long]("n_docs") == byLang(r.getString(0)).length)
    }
    val approx = Tables.documents(spark, d)
      .groupBy(col("lang"))
      .agg(expr("approx_percentile(n_chars, array(0.25D, 0.5D, 0.75D, 0.9D), 1000)").as("qs"))
      .select(col("lang"), posexplode(col("qs")))
      .select(col("lang"),
        element_at(array(lit(0.25), lit(0.5), lit(0.75), lit(0.9)), col("pos") + 1).as("p"),
        col("col").cast("long").as("v"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
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
