package graft

import org.apache.spark.sql.functions._

/** Adversarial skew corpus for the LSH/shingle bucket guards: a block of
  * 200 identical near-empty documents (and 200 identical embeddings)
  * lands in ONE bucket / shares ONE hot shingle. Without the caps
  * (`Dedup.MaxBucket` / `MaxShingleDf` / `Similarity.MaxBucket`, all
  * mirrored in the oracle SQL) that key alone would emit 200·199/2 =
  * 19 900 candidate pairs — quadratic in the degenerate cluster size,
  * which at corpus scale is the classic LSH skew bomb. With the caps the
  * degenerate key is dropped entirely while normal-sized buckets still
  * produce their pairs.
  */
class DedupSkewSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_skew").toString
    val spam = (1000L until 1200L).map(i => (i, "spam spam spam spam spam"))
    val good = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"))
    (spam ++ good).toDF("doc_id", "text")
      .repartition(4).write.mode("overwrite").parquet(s"$d/documents.parquet")

    val spamVec = Array.fill(64)(1.0f)
    val goodVec = Array.tabulate(64)(i => if (i % 2 == 0) -1.0f else 2.0f)
    val vecs = (1000L until 1200L).map(i => (i, spamVec)) ++ Seq((1L, goodVec), (2L, goodVec))
    vecs.toDF("vec_id", "embedding")
      .repartition(4).write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  private def pairs(name: String, a: String, b: String): Set[(Long, Long)] =
    SparkEntry.queries(name)(spark, dir)
      .select(col(a), col(b)).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("q47 minhash pairs: degenerate band bucket is dropped, normal bucket survives") {
    val got = pairs("q47_minhash_pairs", "doc_a", "doc_b")
    assert(got == Set((1L, 2L)),
      s"expected only the good pair; degenerate bucket must emit nothing, got ${got.size} pairs")
  }

  test("q49 jaccard pairs: hot shingle (df=200) is excluded from the join") {
    val got = pairs("q49_jaccard_pairs", "doc_a", "doc_b")
    assert(got == Set((1L, 2L)),
      s"expected only the good pair; hot shingle must not generate pairs, got ${got.size} pairs")
  }

  test("q53 lsh neardup: oversized embedding bucket is dropped, small bucket survives") {
    val got = pairs("q53_lsh_neardup", "vec_a", "vec_b")
    assert(got == Set((1L, 2L)),
      s"expected only the good pair; oversized bucket must emit nothing, got ${got.size} pairs")
  }
}
