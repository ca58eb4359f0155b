package graft
import org.apache.spark.sql.SparkSession

import java.util.concurrent.{Callable, Executors, ThreadFactory, TimeUnit, TimeoutException}

/** Per-round benchmark: times each headline query (Q.bench == true) on
  * SPARK_GRAFT_SF_DIR and prints a cumulative JSON line after EVERY
  * query — an external timeout then still leaves a complete, parseable
  * record of everything that finished (the last stdout JSON line is
  * always the freshest total).
  *
  * Queries run through the noop sink so the FULL plan executes —
  * `count()` would let Catalyst prune projections and undercount work.
  *
  * Robustness rules (each one bought with a failed round-1 bench):
  *  - per-run wall-clock cap, enforced with `cancelJobGroup`: one
  *    runaway query (or a host stall) can no longer eat the whole
  *    window — it is recorded as a DNF at the cap and the suite moves on;
  *  - `spark.catalog.clearCache()` after every query: operators cache
  *    frames shared across self-join sides (correct within a query);
  *    letting 60+ queries' caches accumulate in one JVM builds memory
  *    pressure that compounds into multi-minute stalls;
  *  - best of two timed runs: one-off JIT/GC stalls otherwise get
  *    charged to an arbitrary query and swamp the signal.
  */
object Bench {

  /** Cap per timed run. Generous: the slowest legitimate query at
    * sf0.1 is ~10 s isolated; anything past the cap is pathological.
    */
  private val RunCapSec = 90L
  private val WarmCapSec = 45L

  private val pool = Executors.newCachedThreadPool(new ThreadFactory {
    def newThread(r: Runnable) = {
      val t = new Thread(r, "bench-runner"); t.setDaemon(true); t
    }
  })

  /** Runs one execution under a wall-clock cap; cancels the Spark jobs
    * (not just the waiting thread) on timeout so executor slots free up.
    * Returns Some(seconds) on success, None on timeout/error.
    */
  private def runCapped(spark: SparkSession, q: Q, dir: String, capSec: Long): Option[Double] = {
    val fut = pool.submit(new Callable[Double] {
      def call(): Double = {
        spark.sparkContext.setJobGroup(q.name, q.name, interruptOnCancel = true)
        val t0 = System.nanoTime()
        q.run(spark, dir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
    })
    try Some(fut.get(capSec, TimeUnit.SECONDS))
    catch {
      case _: TimeoutException =>
        spark.sparkContext.cancelJobGroup(q.name)
        fut.cancel(true)
        System.err.println(s"[bench] ${q.name}: DNF (> ${capSec}s, jobs cancelled)")
        None
      case e: Throwable =>
        System.err.println(s"[bench] ${q.name}: ${e.getCause}")
        None
    }
  }

  private def jsonLine(sfDir: String, done: Seq[(String, Double)], dnf: Seq[String]): String = {
    val qs = done.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }.mkString("{", ",", "}")
    val total = done.map(_._2).sum
    val dnfs = dnf.map("\"" + _ + "\"").mkString("[", ",", "]")
    f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"dnf":$dnfs,"sf":"$sfDir"}"""
  }

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
      runCapped(spark, q, "/root/testdata/sf0.001", WarmCapSec)
      spark.catalog.clearCache()
    }

    var done = Vector.empty[(String, Double)]
    var dnf = Vector.empty[String]
    SparkEntry.benchQueries.foreach { q =>
      val runs = (1 to 2).flatMap(_ => runCapped(spark, q, sfDir, RunCapSec))
      if (runs.nonEmpty) {
        val sec = runs.min
        done :+= (q.name -> sec)
        System.err.println(
          f"[bench] ${q.name}%-28s $sec%8.2fs  (runs: ${runs.map(r => f"$r%.2f").mkString(", ")})")
      } else {
        dnf :+= q.name
        done :+= (q.name -> RunCapSec.toDouble) // cap charged so totals stay comparable
      }
      // caches are per-query scoped (self-join sharing); never let them
      // accumulate across the suite
      spark.catalog.clearCache()
      println(jsonLine(sfDir, done, dnf))
      System.out.flush()
    }
    spark.stop()
  }
}
