package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (Array(sfDir, outDir), only) = args.splitAt(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // the widest library aggregates (Lloyd per-round stats: k*(dim+1)
      // = 130 columns at k=10,dim=12; the elbow/cent0 max-when seeds)
      // sit above the 100-field whole-stage-codegen default cutoff and
      // fell back to interpreted eval — 2-4x slower per training round
      // (r17 JobCount A/B). 250 covers every declared plan with margin;
      // engine property, not a cluster-size tunable.
      .config("spark.sql.codegen.maxFields", "250")
      // test parquet files are single-digit-MB; split them so scans do not
      // collapse to one task (amplified by explodes downstream)
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // native functions + the top-k window rewrite, as a user's cluster
      // would get via spark.sql.extensions=graft.functions.GraftExtensions
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Bench.muteBoundedWindowWarning()
    new java.io.File(outDir).mkdirs()
    writeOracles(outDir) // FIRST: a mid-run death must not lose the whole gate
    // optional trailing args: dump only the named queries (local
    // iteration; the driver always runs the full set)
    val selected =
      if (only.isEmpty) SparkEntry.queries
      else SparkEntry.queries.filter { case (n, _) => only.contains(n) }
    // per-query wall-clock cap: one hanging query must not eat the
    // whole correctness window — it is recorded as failed, the rest
    // still dump (jobs cancelled via job group so executors free up)
    val capSec = sys.env.getOrElse("SPARK_GRAFT_VERIFY_CAP", "300").toLong
    val pool = java.util.concurrent.Executors.newCachedThreadPool()
    selected.foreach { case (name, fn) =>
      val finished = new java.util.concurrent.atomic.AtomicBoolean(false)
      val fut = pool.submit(new java.util.concurrent.Callable[Unit] {
        def call(): Unit =
          try {
            spark.sparkContext.setJobGroup(name, name, interruptOnCancel = true)
            fn(spark, sfDir).coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
          } finally finished.set(true)
      })
      try fut.get(capSec, java.util.concurrent.TimeUnit.SECONDS)
      catch {
        case _: java.util.concurrent.TimeoutException =>
          spark.sparkContext.cancelJobGroup(name)
          fut.cancel(true)
          // let the cancelled runner unwind before touching the cache
          val deadline = System.nanoTime() + 30L * 1000000000L
          while (!finished.get && System.nanoTime() < deadline) Thread.sleep(200)
          System.err.println(s"[verify] $name: timed out (> ${capSec}s), jobs cancelled")
        case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${Option(e.getCause).getOrElse(e).getMessage}")
      }
      // operators cache per-query frames (self-join sharing); a full
      // ~145-query dump must not accumulate every query's corpus-scale
      // caches in one JVM — same rule Bench applies after every query.
      // NEVER clear while a timed-out runner may still be inside a
      // cache build: Spark's CacheManager↔CachedRDDBuilder lock order
      // inverts between clearCache and buildBuffers' recacheByPlan and
      // the driver deadlocks (observed live in the round-8 sf1 sweep)
      if (finished.get) spark.catalog.clearCache()
      else System.err.println(s"[verify] $name: clearCache skipped (runner still unwinding)")
    }
    spark.stop()
  }

  /** Dump SparkEntry.oracleSql as JSON. String escape covers backslash,
    * quote, and ALL control chars (<0x20) — a tab or CR in
    * builder-authored SQL would otherwise make the driver's json.load
    * fail and silently zero the round's correctness.
    */
  private def writeOracles(outDir: String): Unit = {
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
  }
}
