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
      // test parquet files are single-digit-MB; split them so scans do not
      // collapse to one task (amplified by explodes downstream)
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm every query's plan shape at the smallest sf first (not
    // timed): Janino codegen compilation + JIT of the generated classes
    // costs tens of seconds across the suite and would otherwise be
    // charged to whichever query first uses a shape.
    SparkEntry.benchQueries.foreach { q =>
      try q.run(spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    // two timed runs, report the min: one-off JIT/GC stalls otherwise
    // get charged to an arbitrary query and swamp the signal
    val results = SparkEntry.benchQueries.map { q =>
      val runs = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        try q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable => System.err.println(s"[bench] ${q.name}: $e") }
        (System.nanoTime() - t0) / 1e9
      }
      val sec = runs.min
      System.err.println(f"[bench] ${q.name}%-28s ${sec}%8.2fs  (runs: ${runs.map(r => f"$r%.2f").mkString(", ")})")
      q.name -> sec
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
