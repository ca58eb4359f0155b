package graft

import org.apache.spark.sql.functions._

/** Invariants of the corpus/analytics operators added after the q91
  * round: chunk reconstruction, vocab id density, funnel ordering,
  * cohort completeness, and reservoir bounds. The DuckDB oracle pins
  * exact values; these pin the semantic properties that must survive
  * any re-implementation.
  */
class CorpusOpsSpec extends SparkSpec {

  private val d = sf("sf0.001")

  test("q93 chunks reconstruct the original token stream (stride strips the overlap)") {
    val chunks = SparkEntry.queries("q93_context_chunks")(spark, d)
      .select("doc_id", "chunk_id", "start_tok", "chunk_text")
      .collect()
      .groupBy(_.getAs[Any]("doc_id"))
    val docs = Tables.documents(spark, d)
      .select(col("doc_id"), concat_ws(" ", graft.functions.TextFns.tokens(col("text"))).as("toks"))
      .collect().map(r => r.getAs[Any]("doc_id") -> r.getString(1)).toMap
    assert(chunks.nonEmpty)
    chunks.foreach { case (id, rows) =>
      val ordered = rows.sortBy(_.getAs[Int]("chunk_id"))
      // drop each chunk's 16-token overlap tail by re-slicing from start offsets
      val rebuilt = ordered.map { r =>
        val toks = r.getAs[String]("chunk_text").split(" ")
        (r.getAs[Int]("start_tok"), toks)
      }
      val full = docs(id).split(" ")
      rebuilt.foreach { case (start, toks) =>
        assert(toks.sameElements(full.slice(start, start + toks.length)),
          s"chunk at $start of doc $id does not match the source tokens")
      }
      // coverage: chunks start every 48 tokens until the stream is consumed
      val starts = ordered.map(_.getAs[Int]("start_tok")).toSeq
      assert(starts == starts.indices.map(_ * 48),
        s"doc $id chunk starts not at stride 48: ${starts.toSeq}")
      assert(starts.last + 64 >= full.length, s"doc $id tail tokens uncovered")
    }
  }

  test("q94 vocab ids are dense and frequency-ordered") {
    val rows = SparkEntry.queries("q94_vocab_build")(spark, d)
      .collect().map(r => (r.getInt(0), r.getLong(2)))
    assert(rows.map(_._1).toSeq == (1 to rows.length))
    assert(rows.map(_._2).toSeq == rows.map(_._2).sortBy(-_).toSeq, "tf not descending")
  }

  test("q96 funnel stages are strictly ordered and stage counts consistent") {
    val rows = SparkEntry.queries("q96_funnel")(spark, d).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val view = r.getLong(1)
      val click = if (r.isNullAt(2)) None else Some(r.getLong(2))
      val purchase = if (r.isNullAt(3)) None else Some(r.getLong(3))
      val stage = r.getInt(4)
      click.foreach(c => assert(c > view))
      purchase.foreach { p => assert(click.isDefined && p > click.get) }
      assert(stage == 1 + click.size + purchase.size)
    }
  }

  test("q97 week-0 retention equals each cohort's size") {
    val m = SparkEntry.queries("q97_cohort_retention")(spark, d)
      .collect().map(r => (r.getDate(0).toString, r.getInt(1)) -> r.getLong(2)).toMap
    val cohorts = Tables.events(spark, d)
      .select(col("user_id"), to_date(date_trunc("week", col("ts"))).as("wk"))
      .groupBy(col("user_id")).agg(min(col("wk")).as("c"))
      .groupBy(col("c")).agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    assert(cohorts.nonEmpty)
    cohorts.foreach { case (wk, n) =>
      assert(m((wk, 0)) == n, s"cohort $wk week-0 count != cohort size")
      // retention never exceeds the cohort
      m.collect { case ((`wk`, _), v) => assert(v <= n) }
    }
  }

  test("q98 reservoir keeps at most 5 per language with ranks 1..n") {
    val rows = SparkEntry.queries("q98_reservoir_sample")(spark, d)
      .collect().map(r => (r.getString(0), r.getInt(1)))
    rows.groupBy(_._1).foreach { case (lang, rs) =>
      assert(rs.length <= 5, s"$lang oversampled")
      assert(rs.map(_._2).sorted.toSeq == (1 to rs.length), s"$lang ranks not dense")
    }
  }

  test("q95 centroid row count is labels x dims and n matches label sizes") {
    val cent = SparkEntry.queries("q95_label_centroids")(spark, d).collect()
    val dims = Tables.embeddings(spark, d)
      .select(size(col("embedding"))).head().getInt(0)
    val sizes = Tables.embeddings(spark, d)
      .groupBy(col("label")).count()
      .collect().map(r => r.get(0) -> r.getLong(1)).toMap
    assert(cent.length == sizes.size * dims)
    cent.foreach { r => assert(r.getLong(2) == sizes(r.get(0))) }
  }
}
