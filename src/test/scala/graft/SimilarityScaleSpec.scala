package graft

import graft.operators.{SimilarityScale => SS}

/** Gates for the packed ANN scale tier (the XoverProbe machinery):
  * the tier has no DuckDB oracle (it exists for corpus sizes no
  * oracle runs at), so its correctness anchors are equivalences —
  * to the ORACLE-GATED q64 ranking for the exact arm, and between
  * the two serve arms when pruning is made vacuous (every cell
  * probed ⇒ the candidate set is the whole corpus ⇒ the pruned ADC
  * must reproduce the flat ADC exactly).
  */
class SimilarityScaleSpec extends SparkSpec {

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet

  test("packed brute-force truth equals the oracle-gated q64 ranking") {
    val truth = rows(SS.bruteTruth(SS.packedVecs(spark, sf("sf0.001"), 8)))
    val q64 = rows(SparkEntry.queries("q64_native_topk")(spark, sf("sf0.001")))
    assert(truth == q64,
      s"packed truth diverged from q64: missing ${(q64 -- truth).take(3)}, " +
        s"extra ${(truth -- q64).take(3)}")
    spark.catalog.clearCache()
  }

  test("pruned serve with every cell probed equals the flat serve exactly") {
    val ev = SS.packedVecs(spark, sf("sf0.001"), 8).localCheckpoint(true)
    val cells = 7
    val cents = SS.coarseTrain(ev, cells)
    val cb = SS.pqTrainSampled(ev, 1) // sampleMod=1: train on the full corpus
    val codes = SS.pqEncode(ev, cb).localCheckpoint(true)
    val postings = SS.topCells(ev, cents, 1)
    val flat = rows(SS.flatServe(ev, cb, codes, 32))
    val pruned = rows(SS.prunedServe(ev, cents, cb, postings, codes, cells, 32))
    assert(flat == pruned,
      s"vacuous pruning diverged: missing ${(flat -- pruned).take(3)}, " +
        s"extra ${(pruned -- flat).take(3)}")
    assert(flat.nonEmpty, "serve must produce rankings")
    spark.catalog.clearCache()
  }
}
