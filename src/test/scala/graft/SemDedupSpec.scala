package graft

/** Semantic pins for q152 (SemDeDup — cluster-then-dedup embedding
  * near-dup). The oracle hash gate pins engine parity; these pin the
  * dedup CONTRACT against the declared brute-force anchor q50.
  */
class SemDedupSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  test("every verdict names a lower-id same-cell neighbor; partition is total") {
    val rows = SparkEntry.queries("q152_semdedup")(spark, d).collect()
    val nVecs = Tables.embeddings(spark, d).count()
    assert(rows.length == nVecs, "one verdict row per corpus vector")
    val cellOf = rows.map(r => r.getLong(0) -> r.getInt(1)).toMap
    val dups = rows.filter(!_.isNullAt(2))
    assert(dups.nonEmpty, "the synthetic blobs must contain near-dups in-cell")
    dups.foreach { r =>
      assert(r.getLong(2) < r.getLong(0), "representative must be the lower id")
      assert(cellOf(r.getLong(2)) == r.getInt(1),
        "a dup and its representative must share a cell")
    }
    spark.catalog.clearCache()
  }

  test("flagged pairs are a subset of the q50 brute-force near-dup pairs") {
    // q152 only ever flags a pair the exact all-pairs scan also finds
    // (the converse is the declared tradeoff: cross-cell τ-pairs are
    // invisible to cluster-scoped dedup — that locality is exactly
    // what removes the O(n²) cost class)
    val brute = SparkEntry.queries("q50_embedding_neardup")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val flagged = SparkEntry.queries("q152_semdedup")(spark, d)
      .collect().filter(!_.isNullAt(2)).map(r => (r.getLong(2), r.getLong(0)))
    assert(flagged.nonEmpty)
    flagged.foreach { p =>
      assert(brute.contains(p), s"pair $p flagged by semdedup but not by the exact scan")
    }
    spark.catalog.clearCache()
  }

  test("verdicts are run-to-run deterministic") {
    val a = SparkEntry.queries("q152_semdedup")(spark, d).collect().map(_.toSeq).toVector
    spark.catalog.clearCache()
    val b = SparkEntry.queries("q152_semdedup")(spark, d).collect().map(_.toSeq).toVector
    assert(a == b)
    spark.catalog.clearCache()
  }
}
