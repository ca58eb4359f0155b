package graft
import org.apache.spark.sql.SparkSession

/** Per-round benchmark: times each headline query (Q.bench == true) on
  * SPARK_GRAFT_SF_DIR and prints one JSON line for the driver.
  * Queries run through the noop sink so the FULL plan executes —
  * `count()` would let Catalyst prune projections and undercount work.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/codegen warmup + parquet footer cache, not timed
    SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    val results = SparkEntry.benchQueries.map { q =>
      val t0 = System.nanoTime()
      try q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[bench] ${q.name}: $e") }
      val sec = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[bench] ${q.name}%-28s ${sec}%8.2fs")
      q.name -> sec
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
