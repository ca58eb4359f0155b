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
      println("  expands: " + p.linesIterator.count(_.contains("Expand")))
      println("  window execs: " + p.linesIterator.count(_.contains("Window")))
      println("  object hash aggs: " + p.linesIterator.count(_.contains("ObjectHashAggregate")))
    }
    spark.stop()
  }
}
