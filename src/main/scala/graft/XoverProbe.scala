package graft

import graft.operators.{SimilarityScale => SS, Snapshots}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** The IVFADC crossover probe (VERDICT r16 task 1): does q199's
  * prune-then-ADC serve shape beat q196's flat ADC serve once the
  * corpus reaches the regime the composition was built for (N ≫ 10⁶,
  * cell count grown ~√N)? Round 16 measured the honest NEGATIVE at
  * 2×10⁵ vectors / 5 cells (probed fraction pinned ~0.69 by the
  * recall gate); this main tests the prediction at sweep scale on the
  * packed tier ([[operators.SimilarityScale]] — same plan shapes,
  * graft_dot rows instead of 64-way element explodes).
  *
  * Usage (alternated clean sessions, one arm per JVM — the CLAUDE.md
  * A/B discipline):
  *
  *   tools/run_main.sh graft.XoverProbe <dataDir> build  <cells> <assign>
  *   tools/run_main.sh graft.XoverProbe <dataDir> flat   <cells> <assign>
  *   tools/run_main.sh graft.XoverProbe <dataDir> pruned <cells> <assign> <probes>
  *
  * `build` trains both layers and publishes the 4-part index
  * cross-JVM via [[IndexStore]] (untimed — the ETL tier); the serve
  * arms resolve the published parts, TIME the serve query (3 runs,
  * noop sink, cap per run), then compute recall@10 against the exact
  * packed brute-force truth (untimed). One JSON line per invocation
  * on stdout.
  */
object XoverProbe {

  private val Depth = 160 // PqServeShortlist — the q196/q199 serve depth
  private val SampleMod = 20 // PQ trains on ~1/20 of the corpus

  private def indexName(cells: Int, assign: Int) = s"xover_ivfpq_c${cells}a$assign"

  private def resolveIndex(
      s: SparkSession, d: String, cells: Int, assign: Int, parts: Int): Map[String, String] =
    IndexStore.resolve(s, indexName(cells, assign), 1, d, Seq("embeddings.parquet")) {
      dirOf =>
        val ev = SS.packedVecs(s, d, parts).localCheckpoint(true)
        val cents = SS.coarseTrain(ev, cells)
        val cb = SS.pqTrainSampled(ev, SampleMod)
        Map(
          "cents" -> Snapshots.commit(cents, dirOf("cents"), replace = true),
          "postings" -> Snapshots.commit(
            SS.topCells(ev, cents, assign), dirOf("postings"), replace = true),
          "codebook" -> Snapshots.commit(cb, dirOf("codebook"), replace = true),
          "codes" -> Snapshots.commit(SS.pqEncode(ev, cb), dirOf("codes"), replace = true))
    }

  def main(args: Array[String]): Unit = {
    val d = args(0)
    val mode = args(1)
    val cells = if (args.length > 2) args(2).toInt else 1414
    val assign = if (args.length > 3) args(3).toInt else 2
    val probes = if (args.length > 4) args(4).toInt else 16
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val parts = cpus.toInt * 8
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Bench.muteBoundedWindowWarning()

    val t0 = System.nanoTime()
    val idx = resolveIndex(spark, d, cells, assign, parts)
    val buildSec = (System.nanoTime() - t0) / 1e9

    def serve(): DataFrame = {
      val ev = SS.packedVecs(spark, d, parts)
      mode match {
        case "flat" =>
          SS.flatServe(ev, Snapshots.read(spark, idx("codebook")),
            Snapshots.read(spark, idx("codes")), Depth)
        case "pruned" =>
          SS.prunedServe(ev, Snapshots.read(spark, idx("cents")),
            Snapshots.read(spark, idx("codebook")), Snapshots.read(spark, idx("postings")),
            Snapshots.read(spark, idx("codes")), probes, Depth)
        case _ => null
      }
    }

    val n = spark.read.parquet(s"$d/embeddings.parquet").count()
    if (mode == "build") {
      println(s"""{"mode":"build","n":$n,"cells":$cells,"assign":$assign,""" +
        f""""build_sec":$buildSec%.2f}""")
      spark.stop(); return
    }

    // timed serve runs — the Bench discipline: full plan through the
    // noop sink, best-of-N with every run reported
    val runs = (1 to 3).map { _ =>
      val t = System.nanoTime()
      serve().write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t) / 1e9
      spark.catalog.clearCache()
      sec
    }

    // recall@10 vs exact truth (untimed)
    val recall = SS.recallAt10(serve(), SS.bruteTruth(SS.packedVecs(spark, d, parts)))

    println(s"""{"mode":"$mode","n":$n,"cells":$cells,"assign":$assign,""" +
      s""""probes":${if (mode == "pruned") probes else -1},"depth":$Depth,""" +
      f""""runs":[${runs.map(r => f"$r%.2f").mkString(",")}],"best":${runs.min}%.2f,""" +
      f""""recall10":$recall%.4f,"resolve_sec":$buildSec%.2f}""")
    spark.stop()
  }
}
