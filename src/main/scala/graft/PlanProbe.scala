package graft
import org.apache.spark.sql.SparkSession
/** Plan-shape diagnostic: prints join strategies, exchange counts, and
  * per-table scan counts for the named queries at sf0.001. Usage:
  *   tools/run_main.sh graft.PlanProbe q76_ivf_topk q74_cluster_trajectory
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","4")
      .config("spark.sql.files.maxPartitionBytes","4m")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.ui.enabled","false")
      .withExtensions(new graft.functions.GraftExtensions).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- args) {
      val p = SparkEntry.queries(q)(spark, "/root/testdata/sf0.001").queryExecution.executedPlan.toString
      println(s"=== $q")
      println("  broadcast joins: " + p.linesIterator.count(_.contains("BroadcastHashJoin")))
      println("  sort-merge joins: " + p.linesIterator.count(_.contains("SortMergeJoin")))
      println("  exchanges: " + p.linesIterator.count(l => l.contains("Exchange") && !l.contains("Reused")))
      Seq("lineitem","documents","embeddings","orders").foreach { t =>
        val n = p.linesIterator.count(l => l.contains("FileScan") && l.contains(t))
        if (n > 0) println(s"  $t scans: $n")
      }
      println("  single-partition exchanges: " + p.linesIterator.count(_.contains("Exchange SinglePartition")))
      println("  cached reads (InMemoryTableScan): " + p.linesIterator.count(_.contains("InMemoryTableScan")))
      println("  distributed top-k (TakeOrderedAndProject): " + p.linesIterator.count(_.contains("TakeOrderedAndProject")))
      println("  expands: " + p.linesIterator.count(_.contains("Expand")))
      println("  window execs: " + p.linesIterator.count(_.contains("Window")))
      println("  object hash aggs: " + p.linesIterator.count(_.contains("ObjectHashAggregate")))
      // SPARK_GRAFT_PROBE_EXEC=1: execute the query (sf dir overridable
      // via SPARK_GRAFT_PROBE_SF) and print the ledger's shuffle/spill
      // byte totals — the observability the shuffle-width pins cite
      if (sys.env.get("SPARK_GRAFT_PROBE_EXEC").contains("1")) {
        val lst = new graft.pipelines.QueryLedgerListener
        spark.listenerManager.register(lst)
        // stage-level totals see EVERYTHING, including shuffles that
        // materialize cached subtrees (invisible to the final plan's
        // own metric tree)
        val stageShuffle = new java.util.concurrent.atomic.AtomicLong
        val sl = new org.apache.spark.scheduler.SparkListener {
          override def onStageCompleted(
              sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
            stageShuffle.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
        }
        spark.sparkContext.addSparkListener(sl)
        val dir = sys.env.getOrElse("SPARK_GRAFT_PROBE_SF", "/root/testdata/sf0.001")
        SparkEntry.queries(q)(spark, dir).write.format("noop").mode("overwrite").save()
        lst.awaitQuiescent()
        lst.snapshot(spark).collect().foreach { r =>
          println(s"  exec: rows=${r.getLong(1)} wallMs=${r.getLong(2) / 1000000} " +
            s"planShuffleBytes=${r.getLong(4)} spillBytes=${r.getLong(5)}")
        }
        println(s"  exec: stageShuffleBytes=${stageShuffle.get}")
        spark.sparkContext.removeSparkListener(sl)
        spark.listenerManager.unregister(lst)
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
