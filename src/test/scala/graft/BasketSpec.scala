package graft

import org.apache.spark.sql.functions._

/** q161 association rules: the distributed top-50 must equal a
  * plain-Scala recomputation of the full Agrawal-Srikant statistics
  * (support / confidence / lift in exact integer micro-units) on the
  * real corpus — the oracle gate pins engine parity, this pins the
  * SEMANTICS against an independent implementation.
  */
class BasketSpec extends SparkSpec {

  test("q161 top-50 rules equal a plain-Scala recomputation, exactly and in order") {
    val d = sf("sf0.001")
    val rows = SparkEntry.queries("q161_basket_rules")(spark, d).collect()
    // independent recomputation
    val b = Tables.lineitem(spark, d)
      .select(col("l_orderkey"), col("l_partkey")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.distinct
    val nOrders = b.map(_._1).distinct.length.toLong
    val item = b.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val pair = b.groupBy(_._1).values.flatMap { basket =>
      val pids = basket.map(_._2)
      for (a <- pids; c <- pids; if a != c) yield (a, c)
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val rules = pair.toSeq.filter(_._2 >= 3L).map { case ((a, c), cab) =>
      val lift = (BigInt(cab) * nOrders * 1000000 / (BigInt(item(a)) * item(c))).toLong
      (a, c, cab,
        (BigInt(cab) * 1000000 / nOrders).toLong,
        (BigInt(cab) * 1000000 / item(a)).toLong,
        lift)
    }.sortBy(t => (-t._6, t._1, t._2)).take(50)
    assert(rules.nonEmpty, "sf0.001 must yield at least one rule at min-support 3")
    val got = rows.map(r => (
      r.getAs[Long]("antecedent"), r.getAs[Long]("consequent"), r.getAs[Long]("n_baskets"),
      r.getAs[Long]("support_micro"), r.getAs[Long]("confidence_micro"),
      r.getAs[Long]("lift_micro"))).toSeq
    assert(got == rules, s"rule list diverges:\n got=${got.take(3)}\n exp=${rules.take(3)}")
    // structural sanity on the shipped statistics
    got.foreach { case (a, c, cab, sup, conf, lift) =>
      assert(a != c, "no self-rules")
      assert(cab >= 3L, "min support respected")
      assert(sup in (0L, 1000000L), s"support is a valid scaled share: $sup")
      assert(conf in (0L, 1000001L), s"confidence is a valid scaled share: $conf")
      assert(lift > 0L)
    }
    spark.catalog.clearCache()
  }

  test("q162 incremental rules equal the q161 batch recompute column-for-column") {
    val d = sf("sf0.001")
    // orders live whole in one md5 bucket, so index + delivery merge
    // must reproduce the full-corpus statistics EXACTLY — the same
    // invariant the delivery family pins for dedup/BM25/PageRank
    val inc = SparkEntry.queries("q162_incremental_basket_rules")(spark, d).collect()
    val batch = SparkEntry.queries("q161_basket_rules")(spark, d).collect()
    assert(inc.length == batch.length && inc.nonEmpty)
    val incStripped = inc.map(r => (
      r.getAs[Long]("antecedent"), r.getAs[Long]("consequent"), r.getAs[Long]("n_baskets"),
      r.getAs[Long]("support_micro"), r.getAs[Long]("confidence_micro"),
      r.getAs[Long]("lift_micro"))).toSeq
    val batchT = batch.map(r => (
      r.getAs[Long]("antecedent"), r.getAs[Long]("consequent"), r.getAs[Long]("n_baskets"),
      r.getAs[Long]("support_micro"), r.getAs[Long]("confidence_micro"),
      r.getAs[Long]("lift_micro"))).toSeq
    assert(incStripped == batchT, "incremental must equal batch, order included")
    // n_base is a real decomposition: base mass never exceeds the
    // merged count, and strictly-new rules are visible as n_base = 0
    inc.foreach { r =>
      val base = r.getAs[Long]("n_base")
      assert(base >= 0L && base <= r.getAs[Long]("n_baskets"))
    }
    spark.catalog.clearCache()
  }

  test("q174 triple rules equal a plain-Scala recomputation, exactly and in order") {
    val d = sf("sf0.001")
    val rows = SparkEntry.queries("q174_triple_rules")(spark, d).collect()
    val b = Tables.lineitem(spark, d)
      .select(col("l_orderkey"), col("l_partkey")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.distinct
    val nOrders = b.map(_._1).distinct.length.toLong
    val item = b.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val byBasket = b.groupBy(_._1).values.map(_.map(_._2)).toSeq
    val pair = byBasket.flatMap { pids =>
      for (a <- pids; b2 <- pids; if a < b2) yield (a, b2)
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val tri = byBasket.flatMap { pids =>
      for (a <- pids; b2 <- pids; c <- pids; if a < b2 && c != a && c != b2)
        yield (a, b2, c)
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val rules = tri.toSeq.filter(_._2 >= 2L).map { case ((a, b2, c), cabc) =>
      val cab = pair((a, b2))
      (a, b2, c, cabc,
        (BigInt(cabc) * 1000000 / nOrders).toLong,
        (BigInt(cabc) * 1000000 / cab).toLong,
        (BigInt(cabc) * nOrders * 1000000 / (BigInt(cab) * item(c))).toLong)
    }.sortBy(t => (-t._7, t._1, t._2, t._3)).take(50)
    assert(rules.nonEmpty, "sf0.001 must yield at least one triple rule at min-support 2")
    val got = rows.map(r => (
      r.getAs[Long]("antecedent_a"), r.getAs[Long]("antecedent_b"),
      r.getAs[Long]("consequent"), r.getAs[Long]("n_baskets"),
      r.getAs[Long]("support_micro"), r.getAs[Long]("confidence_micro"),
      r.getAs[Long]("lift_micro"))).toSeq
    assert(got == rules, s"triple rule list diverges:\n got=${got.take(3)}\n exp=${rules.take(3)}")
    got.foreach { case (a, b2, c, cabc, sup, conf, lift) =>
      assert(a < b2 && c != a && c != b2, "antecedent ordered, consequent outside it")
      assert(cabc >= 2L, "min support respected")
      assert(sup in (0L, 1000000L))
      assert(conf in (0L, 1000000L), "confidence never exceeds 1: n_abc <= n_ab")
      assert(lift > 0L)
    }
    spark.catalog.clearCache()
  }

  private implicit class InRange(private val v: Long) {
    def in(lohi: (Long, Long)): Boolean = v >= lohi._1 && v <= lohi._2
  }
}
