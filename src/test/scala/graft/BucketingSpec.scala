package graft

import org.apache.spark.sql.functions._

/** Bucketing: the co-located join pattern for repeated large×large
  * joins (SURVEY.md §4 / the 100 TB design). Writing both sides
  * bucketed by the join key lets the join run with NO shuffle exchange
  * on either side — the property this spec pins in the physical plan.
  */
class BucketingSpec extends SparkSpec {

  private lazy val wh = {
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_bkt")
    Tables.lineitem(spark, sf("sf0.001"))
      .write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("graft_bkt.lineitem_b")
    Tables.orders(spark, sf("sf0.001"))
      .write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("graft_bkt.orders_b")
    true
  }

  test("bucketed join on the bucket key runs without a shuffle") {
    wh // force setup
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val li = spark.table("graft_bkt.lineitem_b")
      val o = spark.table("graft_bkt.orders_b")
      val joined = li.join(o, li("l_orderkey") === o("o_orderkey"))
        .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      val shufflesBeforeAgg = plan.linesIterator
        .count(l => l.contains("Exchange hashpartitioning") && l.contains("orderkey"))
      assert(shufflesBeforeAgg == 0,
        s"bucketed join must not re-shuffle its inputs:\n$plan")
      // and it still computes the right thing
      val n = joined.agg(sum("n")).head().getLong(0)
      assert(n == Tables.lineitem(spark, sf("sf0.001")).count())
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("bucketed fingerprint index probes without re-shuffling the index (q119 scale path)") {
    // pins q119's comment: with the corpus fingerprint index stored
    // bucketed by fp, an incoming batch's anti-join probe shuffles ONLY
    // the batch (into the bucket layout) — the index, however large,
    // is never exchanged
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_bkt")
    Tables.documents(spark, sf("sf0.001"))
      .filter(col("doc_id") < 400)
      .select(md5(col("text")).as("fp"))
      .write.mode("overwrite")
      .bucketBy(8, "fp").sortBy("fp")
      .saveAsTable("graft_bkt.fp_index")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val incoming = Tables.documents(spark, sf("sf0.001"))
        .filter(col("doc_id") >= 400)
        .select(col("doc_id"), md5(col("text")).as("fp"))
      val novel = incoming.join(spark.table("graft_bkt.fp_index"), Seq("fp"), "left_anti")
      val plan = novel.queryExecution.executedPlan.toString
      val fpExchanges = plan.linesIterator
        .count(l => l.contains("Exchange hashpartitioning") && l.contains("fp"))
      assert(fpExchanges == 1,
        s"only the incoming batch may shuffle; index side must stay in place:\n$plan")
      assert(plan.contains("Bucketed: true"),
        s"index scan must use the bucketed layout:\n$plan")
      // and the probe agrees with the unbucketed formulation
      val expected = incoming.join(
        Tables.documents(spark, sf("sf0.001")).filter(col("doc_id") < 400)
          .select(md5(col("text")).as("fp")),
        Seq("fp"), "left_anti").count()
      assert(novel.count() == expected)
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("bucketed ANCHOR index probes without re-shuffling (q144 scale path)") {
    // pins q144's comment: with the corpus's winnowing-anchor
    // fingerprints persisted bucketed by fp, the delivery probe
    // shuffles ONLY the incoming batch's anchors into the bucket
    // layout — the index, however large the held corpus, never
    // exchanges; per-delivery cost is O(batch), not O(corpus)
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_bkt")
    val anchors = operators.Dedup.spanAnchors(spark, sf("sf0.001"))
    anchors.filter(col("doc_id") < 400).select(col("fp")).distinct()
      .write.mode("overwrite")
      .bucketBy(8, "fp").sortBy("fp")
      .saveAsTable("graft_bkt.anchor_index")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val incoming = anchors.filter(col("doc_id") >= 400)
      val marked = incoming.join(spark.table("graft_bkt.anchor_index"), Seq("fp"), "left_semi")
      val plan = marked.queryExecution.executedPlan.toString
      val fpExchanges = plan.linesIterator
        .count(l => l.contains("Exchange hashpartitioning") && l.contains("fp"))
      assert(fpExchanges == 1,
        s"only the incoming batch may shuffle; anchor index must stay in place:\n$plan")
      assert(plan.contains("Bucketed: true"),
        s"index scan must use the bucketed layout:\n$plan")
      // and the persisted-index probe marks exactly what q144's
      // derived-index formulation marks
      val expected = incoming.join(
        anchors.filter(col("doc_id") < 400).select(col("fp")).distinct(),
        Seq("fp"), "left_semi").count()
      assert(marked.count() == expected && expected > 0)
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }
}
