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

  test("q100 trailing-7-day sums match a brute-force recomputation") {
    val rows = SparkEntry.queries("q100_rolling_7d")(spark, d)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDate(2).toLocalDate.toEpochDay, r.getDouble(3)))
    val orders = Tables.orders(spark, d)
      .select(col("o_custkey"), to_date(col("o_orderdate")).as("od"),
        col("o_totalprice").cast(Det.Money).as("p"))
      .collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate.toEpochDay, r.getDecimal(2)))
      .groupBy(_._1)
    rows.foreach { case (cust, _, day, got) =>
      val want = orders(cust)
        .filter { case (_, od, _) => od >= day - 6 && od <= day }
        .map(_._3).reduce(_ add _).doubleValue()
      assert(got == want, s"customer $cust day $day: $got != $want")
    }
  }

  test("q101 grouping sets reconcile with the grand total") {
    val rows = SparkEntry.queries("q101_grouping_sets")(spark, d).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getLong(4)))
    val total = Tables.orders(spark, d).count()
    val grand = rows.filter(r => r._3 == 1 && r._4 == 1)
    assert(grand.map(_._5).sum == total)
    assert(rows.filter(r => r._3 == 0).map(_._5).sum == total, "status set must partition")
    assert(rows.filter(r => r._4 == 0).map(_._5).sum == total, "year set must partition")
  }

  test("q102 rank family is bounded and cume_dist is monotone per customer") {
    val rows = SparkEntry.queries("q102_rank_family")(spark, d)
      .collect().map(r => (r.getLong(0), r.getInt(2), r.getDouble(3), r.getDouble(4)))
    rows.foreach { case (_, q, pr, cd) =>
      assert(q >= 1 && q <= 4); assert(pr >= 0 && pr <= 1); assert(cd > 0 && cd <= 1)
    }
    // cume_dist sorted ascending equals its own order within a customer
    rows.groupBy(_._1).foreach { case (_, rs) =>
      val cds = rs.map(_._4).toSeq
      assert(cds.max == 1.0)
    }
  }

  test("q103 pairs are a subset of brute-force edit-distance matches") {
    val got = SparkEntry.queries("q103_fuzzy_neardup")(spark, d)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    val names = Tables.part(spark, d).select("p_name").distinct()
      .collect().map(_.getString(0)).toSeq
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(a.length + 1)(i => Array.tabulate(b.length + 1)(j => i.max(j)))
      for (i <- 1 to a.length; j <- 1 to b.length)
        dp(i)(j) = Seq(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1,
          dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1)).min
      dp(a.length)(b.length)
    }
    val brute = (for {
      a <- names; b <- names if a < b
      dist = lev(a, b) if dist <= 3
    } yield (a, b, dist)).toSet
    assert(got.subsetOf(brute), "reported pair with wrong distance")
    // blocking is candidate generation: within-block recall is complete
    val inBlock = brute.filter { case (a, b, _) =>
      a.head == b.head && math.abs(a.length - b.length) <= 2
    }
    assert(got == inBlock, "missed a pair the block should have produced")
  }

  test("q103 length-band blocking bounds a hot first letter, recall survives (skew corpus)") {
    // The skew scenario the band defends against: ONE hot first letter
    // with a wide length spread. First-char-only blocking puts all of
    // it in one block (quadratic); the (first_char, band) key splits it
    // so each build row only meets its ±1-band neighborhood. TPC-H
    // names are too length-uniform to exercise this (every name within
    // 3 adjacent bands), so the corpus is crafted: 120 'a'-names with
    // lengths 5..64, plus near-dup pairs at a band BOUNDARY (lengths
    // 17/18 = bands 5/6) proving cross-band recall.
    import spark.implicits._
    val hot = (0 until 120).map(i => "a" + ("x" * (4 + i % 60)) + ('a' + i / 60).toChar)
    val nearDup = Seq("a" + "y" * 16, "a" + "y" * 16 + "z") // lev 1, bands 5 and 6
    val dir = java.nio.file.Files.createTempDirectory("graft_fuzzy").toString
    (hot ++ nearDup).toDF("p_name")
      .repartition(4).write.mode("overwrite").parquet(s"$dir/part.parquet")

    // recall: the banded pipeline must still find every in-block pair,
    // including the pair whose members sit in ADJACENT bands
    val got = SparkEntry.queries("q103_fuzzy_neardup")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got.contains((nearDup.minBy(identity), nearDup.maxBy(identity))),
      s"cross-band near-dup pair must be found, got $got")

    // per-block bound: no build row's neighborhood covers the hot
    // letter's whole population
    val names = hot ++ nearDup
    def band(s: String): Int = s.length / 3
    val byBlock = names.groupBy(s => (s.head, band(s))).view.mapValues(_.size.toLong).toMap
    val population = names.size.toLong
    val maxNeighborhood = byBlock.keys.map { case (c, b) =>
      (b - 1 to b + 1).map(k => byBlock.getOrElse((c, k), 0L)).sum
    }.max
    assert(maxNeighborhood * 4 < population,
      s"hot-letter block must shrink: neighborhood $maxNeighborhood of $population")
    // and the banded surface is a fraction of the single-block square
    val bandedSurface = byBlock.map { case ((c, b), n) =>
      n * (b - 1 to b + 1).map(k => byBlock.getOrElse((c, k), 0L)).sum
    }.sum
    assert(bandedSurface * 4 < population * population,
      s"banded surface $bandedSurface must be far below first-char-only ${population * population}")
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

  test("q135 quality pruning keeps roughly the top quartile per language") {
    val rows = SparkEntry.queries("q135_quality_prune")(spark, d).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (thr, total, kept, minKept) = (
        r.getAs[Double]("thr"), r.getAs[Long]("n_total"),
        r.getAs[Long]("n_kept"), r.getAs[Long]("min_kept_ppm"))
      // >= p75 keeps at least a quarter (ties only add); must prune
      // SOMETHING or the threshold did no work
      assert(kept * 4 >= total, s"${r.getString(0)}: kept $kept of $total — below quartile")
      assert(kept < total, s"${r.getString(0)}: threshold pruned nothing")
      assert(minKept.toDouble >= thr, s"${r.getString(0)}: kept a sub-threshold doc")
    }
  }

  test("q138 survivor is the argmax-quality member of its cluster") {
    // Independent recomputation: clusters from q84 (itself hash-green vs
    // the recursive-CTE oracle), quality recomputed driver-side with the
    // same whitespace tokenization — no Spark expressions shared with
    // the query under test.
    val clusters = SparkEntry.queries("q84_dup_clusters")(spark, d)
      .select("doc_id", "cluster_rep")
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val quality = Tables.documents(spark, d)
      .select("doc_id", "text")
      .collect().map { r =>
        val toks = r.getString(1).trim.split("\\s+")
        r.getLong(0) -> ((toks.distinct.length.toLong * 1000000L) / toks.length, toks.length)
      }.toMap
    val survivors = SparkEntry.queries("q138_cluster_survivor")(spark, d).collect()
    val byRep = clusters.groupBy(_._2)
    assert(survivors.length == byRep.size, "one survivor per cluster")
    survivors.foreach { r =>
      val (rep, keep) = (r.getAs[Long]("cluster_rep"), r.getAs[Long]("keep_id"))
      val members = byRep(rep).map(_._1)
      assert(members.contains(keep), s"survivor $keep not a member of cluster $rep")
      assert(r.getAs[Int]("cluster_size") == members.length)
      val expected = members.maxBy { id =>
        val (ppm, n) = quality(id); (ppm, n.toLong, -id)
      }
      assert(keep == expected,
        s"cluster $rep kept $keep but argmax-quality member is $expected")
      assert(r.getAs[Long]("keep_ppm") == quality(keep)._1)
    }
  }

  test("q134 leakage guarantee: no near-dup pair straddles train and eval") {
    // sf0.01: the corpus actually contains near-dup pairs (q47 >= 0.5)
    val split = SparkEntry.queries("q134_leakage_safe_split")(spark, sf("sf0.01"))
      .select("doc_id", "split")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val dupPairs = SparkEntry.queries("q47_minhash_pairs")(spark, sf("sf0.01"))
      .filter(col("jaccard") >= operators.Dedup.DupJaccard)
      .select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(dupPairs.nonEmpty, "fixture must contain near-dup pairs")
    dupPairs.foreach { case (a, b) =>
      assert(split(a) == split(b),
        s"near-dups $a/$b split across ${split(a)}/${split(b)} — leakage")
    }
    // and the split is still a split: both sides populated, all docs assigned
    val byTag = split.values.groupBy(identity).map { case (k, v) => k -> v.size }
    assert(byTag.getOrElse("train", 0) > 0 && byTag.getOrElse("eval", 0) > 0, byTag.toString)
    assert(split.size == 500)
  }

  test("q143 bigram quality: typical text outranks gibberish; scores are valid scaled probabilities") {
    import spark.implicits._
    // a corpus where one phrasing dominates: docs built from the common
    // bigram inventory must outscore a doc of bigrams nobody else uses
    val common = "the cat sat on the mat and the dog ran to the cat"
    val fixDir = java.nio.file.Files.createTempDirectory("graft_bgq").toString
    (Seq(
      (1L, common), (2L, common), (3L, common),
      (4L, "the cat ran to the mat"), // recombines common vocabulary
      (5L, "zxq wvu tsr qpo nml kji")) // unique bigrams only
      .map { case (id, t) => (id, t, "en", "fix", t.length.toLong) })
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$fixDir/documents.parquet")
    val out = SparkEntry.queries("q143_bigram_quality")(spark, fixDir)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L, 5L))
    // this ranking is exactly what the Laplace smoothing buys:
    // UNSMOOTHED self-trained conditionals would hand doc 5 a perfect
    // 1e6 (every bigram c2=1 over prefix c1=1) — the +V denominator
    // is what makes one-off contexts score the floor instead
    assert(out(1L) > out(5L) && out(4L) > out(5L),
      s"common-phrase docs must outscore unique-bigram gibberish: $out")
    // corpus-level scores are valid scaled means in (0, 1e6]
    val rows = SparkEntry.queries("q143_bigram_quality")(spark, d).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, q) = (r.getLong(1), r.getLong(2))
      assert(n >= 1 && q >= 1 && q <= 1000000, s"score out of range: $r")
    }
    // every doc with >= 2 tokens is scored (no silent drops)
    val expected = Tables.documents(spark, d)
      .filter(size(graft.functions.TextFns.tokens(col("text"))) >= 2).count()
    assert(rows.length == expected, s"${rows.length} scored vs $expected eligible")
  }

  test("q153 per-term ranking tracks true log-idf BM25 (k1=1.2, b=0.75)") {
    // per term, the integer-rational score is a monotone transform of
    // true BM25 (idf is a per-term constant; the tf part is computed
    // as an exact cleared-fraction rational), so the returned order
    // must match the double/log computation up to integer-floor ties
    val out = SparkEntry.queries("q153_bm25")(spark, d).collect()
    assert(out.map(_.getString(0)).distinct.length == 8, "eight data-derived query terms")
    // recompute corpus stats the long way
    val tok = Tables.documents(spark, d)
      .select(col("doc_id"), graft.functions.TextFns.tokens(col("text")).as("tok"))
      .select(col("doc_id"), size(col("tok")).as("len"), explode(col("tok")).as("token"))
      .collect()
    val nDocs = tok.map(_.getAs[Any]("doc_id")).distinct.length.toDouble
    val avgdl = tok.length.toDouble / nDocs
    val dfMap = tok.map(r => (r.getAs[Any]("doc_id"), r.getString(2))).distinct
      .groupBy(_._2).view.mapValues(_.length.toDouble).toMap
    out.groupBy(_.getString(0)).foreach { case (term, rows) =>
      assert(dfMap(term) > 0)
      val byRank = rows.sortBy(_.getInt(1))
      assert(byRank.map(_.getInt(1)).toSeq == (1 to byRank.length), s"dense ranks for $term")
      // idf is a positive per-term constant in the declared scoring, so
      // the per-term BM25 order is exactly the true tf-part order
      val trueScores = byRank.map { r =>
        val tf = r.getLong(3).toDouble; val len = r.getLong(4).toDouble
        tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * len / avgdl))
      }
      trueScores.sliding(2).foreach {
        case Array(hi, lo) =>
          assert(hi >= lo - 1e-9 * math.abs(hi),
            s"$term: true-BM25 order violated ($hi then $lo)")
        case _ =>
      }
    }
    spark.catalog.clearCache()
  }

  test("q160 report card matches a plain-Scala recomputation of every statistic") {
    val row = SparkEntry.queries("q160_corpus_report")(spark, d).collect().head
    val docs = Tables.documents(spark, d)
      .select(col("doc_id"), col("lang"), col("text")).collect()
      .map(r => (r.getAs[Any]("doc_id"), r.getString(1), r.getString(2)))
    val n = docs.length.toLong
    val email = java.util.regex.Pattern.compile(
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+")
    val url = java.util.regex.Pattern.compile("https?://[^ ]+")
    assert(row.getAs[Long]("n_docs") == n)
    assert(row.getAs[Long]("n_langs") == docs.map(_._2).distinct.length.toLong)
    val totalTok = docs.map(_._3.trim.split("\\s+").length.toLong).sum
    assert(row.getAs[Long]("total_tokens") == totalTok)
    assert(row.getAs[Long]("mean_tokens_micro") == totalTok * 1000000L / n)
    assert(row.getAs[Long]("exact_dup_docs") == n - docs.map(_._3).distinct.length)
    assert(row.getAs[Long]("pii_docs") ==
      docs.count(t => email.matcher(t._3).find() || url.matcher(t._3).find()).toLong)
    val conc = docs.groupBy(_._2).values
      .map(g => BigInt(g.length) * g.length * 1000000 / (BigInt(n) * n)).sum
    assert(row.getAs[Long]("lang_gini_micro") == 1000000L - conc.toLong)
    val gini = row.getAs[Long]("lang_gini_micro")
    assert(gini >= 0L && gini < 1000000L, s"Gini must be a valid scaled share: $gini")
    spark.catalog.clearCache()
  }

  test("bm25 corpus invariant: no document tokenizes to empty on any SF") {
    // q153/q155 define the retrieval corpus as "documents owning ≥1
    // token" and BOTH engines compute the (n_docs, Σlen) scalars from
    // the tf aggregate under that definition, so parity holds even if
    // a doc tokenized empty — this pin just records that on the
    // shipped corpora the two corpus definitions coincide
    for (sfd <- Seq(sf("sf0.001"), sf("sf0.01"))) {
      val empty = Tables.documents(spark, sfd)
        .filter(size(graft.functions.TextFns.tokens(col("text"))) === 0)
        .count()
      assert(empty == 0L, s"$sfd: $empty docs tokenize to empty")
    }
  }

  test("q155 ranks ONLY delivery-bucket docs, with index-frozen statistics") {
    val out = SparkEntry.queries("q155_incremental_bm25")(spark, d).collect()
    assert(out.nonEmpty, "the 10% delivery bucket must hit some standing query term")
    // every returned doc is from the delivery split (h60 bucket >= 90):
    // the standing corpus is index, never a result
    val ids = out.map(_.getAs[Any]("doc_id")).distinct.toSeq
    val buckets = Tables.documents(spark, d)
      .select(col("doc_id"),
        (graft.functions.TextFns.h60(col("doc_id").cast("string")) % 100).as("b"))
      .collect().map(r => r.getAs[Any]("doc_id") -> r.getLong(1)).toMap
    ids.foreach(id => assert(buckets(id) >= 90, s"index doc $id leaked into the ranking"))
    // the standing query terms come from the INDEX corpus's df ranking —
    // compare against a recomputation over the 90% bucket only
    val ixTerms = Tables.documents(spark, d)
      .filter((graft.functions.TextFns.h60(col("doc_id").cast("string")) % 100) < 90)
      .select(col("doc_id"), explode(graft.functions.TextFns.tokens(col("text"))).as("token"))
      .distinct()
      .groupBy("token").count()
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (t, n) => (-n, t) }
      .slice(9, 17).map(_._1).toSet
    assert(out.map(_.getString(0)).toSet == ixTerms,
      "standing query terms must be the index corpus's df ranks 10-17")
    spark.catalog.clearCache()
  }

  test("q170 BPE training: tie-break, overlapping-run greedy, and re-merge by hand") {
    import spark.implicits._
    // doc 1 alternates (tests re-merging of already-merged tokens in
    // rounds 2/3/5), doc 2 is a run of one token (tests the greedy
    // left-to-right rule on overlapping matches AND the count tie:
    // round 1 has "a a"=3 vs "a b"=3 → pair ASC must pick "a a"),
    // doc 3 is inert filler that must survive untouched until its
    // bigram is the last one standing.
    val cur0 = Seq(
      ("d1", Seq("a", "b", "a", "b", "a", "b")),
      ("d2", Seq("a", "a", "a", "a")),
      ("d3", Seq("c", "d"))).toDF("doc_id", "tok")
    val out = graft.operators.Text.bpeTrainOf(cur0).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    assert(out == Seq(
      (1, "a a", 3L, 2L, 10L),
      (2, "a b", 3L, 3L, 7L),
      (3, "a b a b", 2L, 1L, 6L),
      (4, "a a a a", 1L, 1L, 5L),
      (5, "a b a b a b", 1L, 1L, 4L)),
      s"merge-training trace wrong: ${out.mkString(", ")}")
    spark.catalog.clearCache()
  }

  test("q175 drift report equals a BigInt replay from the raw split (incl. share gap)") {
    val rows = SparkEntry.queries("q175_mix_drift")(spark, d).collect()
    // independent split + histogram on the collected (doc_id, lang)
    val split = Tables.documents(spark, d)
      .select(col("doc_id").cast("string"), col("lang"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    def h60(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    val (bs, ds) = split.partition { case (id, _) => h60(id) % 100 < 90 }
    val cb = bs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val cd = ds.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val (nb, nd) = (bs.length.toLong, ds.length.toLong)
    val exp = (cb.keySet ++ cd.keySet).toSeq.sorted.map { l =>
      val (b, dl) = (cb.getOrElse(l, 0L), cd.getOrElse(l, 0L))
      (l, b, dl,
        (BigInt(b) * 1000000 / nb).toLong,
        (BigInt(dl) * 1000000 / nd).toLong,
        ((BigInt(b) * nd - BigInt(dl) * nb).abs * 1000000 / (BigInt(nb) * nd)).toLong)
    }
    val got = rows.map(r => (
      r.getAs[String]("lang"), r.getAs[Long]("n_base"), r.getAs[Long]("n_delta"),
      r.getAs[Long]("share_base_micro"), r.getAs[Long]("share_delta_micro"),
      r.getAs[Long]("drift_micro"))).toSeq
    assert(got == exp, s"drift report diverges:\n got=$got\n exp=$exp")
    // the drift stat is symmetric in the shares: zero iff the shares
    // (in micro floor units) agree to the cross-product grain
    got.foreach { case (_, b, dl, _, _, drift) =>
      if (drift == 0L) assert(BigInt(b) * nd == BigInt(dl) * nb,
        "zero drift must mean exactly equal shares")
    }
    spark.catalog.clearCache()
  }

  test("q179 bpe apply == plain-Scala replay: train greedy merges on the 90% bucket, apply frozen to the delivery") {
    def h60(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    // greedy left-to-right single-rule application — the sequential
    // reference the distributed gaps-and-islands window must equal
    def applyRule(tok: Vector[String], pair: String): Vector[String] = {
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < tok.length) {
        if (i + 1 < tok.length && s"${tok(i)} ${tok(i + 1)}" == pair) {
          out += pair; i += 2
        } else { out += tok(i); i += 1 }
      }
      out.result()
    }
    val all = operators.Text.docs(spark, d)
      .select(col("doc_id").cast("string"), col("tok"))
      .collect().map(r => (r.getString(0), r.getSeq[String](1).toVector))
    val (base, delivery) = all.partition { case (id, _) => h60(id) % 100 < 90 }
    // train: 5 rounds of (most frequent adjacent pair, count desc / pair asc)
    var cur = base.map(_._2)
    val rules = (1 to 5).map { _ =>
      val counts = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
      cur.foreach(t => t.sliding(2).filter(_.size == 2)
        .foreach(p => counts(p.mkString(" ")) += 1))
      val pair = counts.toSeq.minBy { case (p, c) => (-c, p) }._1
      cur = cur.map(applyRule(_, pair))
      pair
    }
    val expected = delivery.map { case (id, t) =>
      id -> (t.length, rules.foldLeft(t)(applyRule).length)
    }.toMap
    val got = SparkEntry.queries("q179_bpe_apply")(spark, d).collect()
      .map(r => r.getAs[Any]("doc_id").toString ->
        (r.getAs[Int]("n_before"), r.getAs[Int]("n_after"))).toMap
    assert(got.keySet == expected.keySet,
      s"delivery doc set diverges: ${(got.keySet diff expected.keySet).take(3)} / " +
        s"${(expected.keySet diff got.keySet).take(3)}")
    got.foreach { case (id, (b, a)) =>
      assert((b, a) == expected(id), s"doc $id: got ($b,$a) expected ${expected(id)}")
      assert(a <= b, "merges can only shrink a document")
    }
    spark.catalog.clearCache()
  }

  test("q182 shard assignment == the md5-sort replay; full shards are exactly 64 with dense positions") {
    def h60(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    val got = SparkEntry.queries("q182_shard_assign")(spark, d).collect()
      .map(r => (r.getAs[Any]("doc_id").toString,
        r.getAs[Long]("shard"), r.getAs[Long]("pos_in_shard")))
    val ids = Tables.documents(spark, d).select(col("doc_id").cast("string"))
      .collect().map(_.getString(0))
    val expected = ids.sortBy(id => (h60(id + "|sh"), id.toLong)).zipWithIndex
      .map { case (id, i) => (id, i.toLong / 64, i.toLong % 64) }
    assert(got.toSeq == expected.toSeq,
      s"shard order diverges at ${got.zip(expected).indexWhere(p => p._1 != p._2)}")
    // every shard but the last is exactly full, positions dense 0..63
    val byShard = got.groupBy(_._2)
    val last = byShard.keys.max
    byShard.foreach { case (sh, rows) =>
      val n = if (sh == last) ids.length - 64 * last else 64L
      assert(rows.length.toLong == n, s"shard $sh has ${rows.length} docs, expected $n")
      assert(rows.map(_._3).sorted.toSeq == (0L until n), s"shard $sh positions not dense")
    }
    spark.catalog.clearCache()
  }

  test("q183 append-only shards: replay + immutability — appended shards start past every pinned standing shard") {
    def h60(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    val got = SparkEntry.queries("q183_incremental_shards")(spark, d).collect()
      .map(r => (r.getAs[Any]("doc_id").toString,
        r.getAs[Long]("shard"), r.getAs[Long]("pos_in_shard")))
    val ids = Tables.documents(spark, d).select(col("doc_id").cast("string"))
      .collect().map(_.getString(0))
    val (baseIds, delIds) = ids.partition(id => h60(id) % 100 < 90)
    val baseShards = (baseIds.length + 63) / 64
    val expected = delIds.sortBy(id => (h60(id + "|sh"), id.toLong)).zipWithIndex
      .map { case (id, i) => (id, baseShards + i.toLong / 64, i.toLong % 64) }
    assert(got.toSeq == expected.toSeq, "appended assignment diverges from the md5-sort replay")
    // immutability: every appended shard sits strictly past every
    // shard in the PINNED standing assignment (read back from the
    // snapshot the index committed), and the standing assignment
    // itself is the q182 replay over the standing bucket
    val (dir, v, n90) = operators.Text.shardIndex(spark, d)
    assert(n90 == baseIds.length.toLong)
    val standing = operators.Snapshots.read(spark, dir, Some(v)).collect()
      .map(r => (r.getAs[Any]("doc_id").toString,
        r.getAs[Long]("shard"), r.getAs[Long]("pos_in_shard")))
    val expStanding = baseIds.sortBy(id => (h60(id + "|sh"), id.toLong)).zipWithIndex
      .map { case (id, i) => (id, i.toLong / 64, i.toLong % 64) }
    assert(standing.sortBy(t => (t._2, t._3)).toSeq == expStanding.toSeq,
      "pinned standing assignment diverges from the q182 replay")
    assert(standing.map(_._2).max < got.map(_._2).min,
      "appended shards must never touch a shipped shard")
    spark.catalog.clearCache()
  }

  test("q180 rebalance: BigInt replay of rates + toss; kept mix never drifts further from the standing mix") {
    val rows = SparkEntry.queries("q180_mix_rebalance")(spark, d).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("n_base"),
        r.getAs[Long]("n_delta"), r.getAs[Long]("accept_micro"), r.getAs[Long]("n_kept")))
    def h60(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    val split = Tables.documents(spark, d)
      .select(col("doc_id").cast("string"), col("lang"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val (bs, ds) = split.partition { case (id, _) => h60(id) % 100 < 90 }
    val cb = bs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val dsByLang = ds.groupBy(_._2)
    val (nb, nd) = (bs.length.toLong, ds.length.toLong)
    val expRates = (cb.keySet ++ dsByLang.keySet).map { l =>
      val (b, dl) = (cb.getOrElse(l, 0L), dsByLang.get(l).map(_.length.toLong).getOrElse(0L))
      l -> (if (dl == 0) 1000000L
            else (BigInt(b) * nd * 1000000 / (BigInt(dl) * nb)).min(1000000).toLong)
    }.toMap
    val expKept = dsByLang.view.mapValues(_.count { case (id, l) =>
      h60(id + "|rb") % 1000000 < expRates(l) }.toLong).toMap
    rows.foreach { case (l, b, dl, acc, kept) =>
      assert(b == cb.getOrElse(l, 0L) && dl == dsByLang.get(l).map(_.size.toLong).getOrElse(0L))
      assert(acc == expRates(l), s"$l accept rate diverges: $acc vs ${expRates(l)}")
      assert(kept == expKept.getOrElse(l, 0L), s"$l kept count diverges")
      // a born language (no standing mass) is fully quarantined
      if (b == 0L) assert(acc == 0L && kept == 0L)
    }
    // the point of the verb: for every language present on both sides,
    // the KEPT delivery's share gap to the standing mix is no worse
    // than the raw delivery's (expected-count grain; the toss is
    // Bernoulli-exact per doc so we check the aggregate direction)
    val nk = rows.map(_._5).sum
    rows.foreach { case (l, b, dl, _, kept) =>
      if (b > 0 && dl > 0 && nk > 0) {
        val rawGap = (BigInt(b) * nd - BigInt(dl) * nb).abs * 1000000 / (BigInt(nb) * nd)
        val keptGap = (BigInt(b) * nk - BigInt(kept) * nb).abs * 1000000 / (BigInt(nb) * nk)
        assert(keptGap <= rawGap + 25000, // toss quantization headroom at this corpus size
          s"$l: rebalance made the mix WORSE (kept gap $keptGap vs raw $rawGap)")
      }
    }
    spark.catalog.clearCache()
  }

  test("q178 weighted sample == the md5-toss replay over q41's quality labels") {
    val sample = SparkEntry.queries("q178_weighted_sample")(spark, d).collect()
      .map(r => r.getAs[Any]("doc_id").toString -> r.getAs[String]("quality")).toMap
    val quality = SparkEntry.queries("q41_quality_score")(spark, d).collect()
      .map(r => r.getAs[Any]("doc_id").toString -> r.getAs[String]("quality")).toMap
    def h60(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    val expected = quality.filter { case (id, ql) =>
      h60(id + "|ws") % 100 < (if (ql == "good") 80L else 20L)
    }
    assert(sample.keySet == expected.keySet,
      s"sample set diverges: extra=${(sample.keySet -- expected.keySet).take(3)}, " +
        s"missing=${(expected.keySet -- sample.keySet).take(3)}")
    sample.foreach { case (id, ql) => assert(ql == quality(id), s"quality mismatch for $id") }
    // the weighting must actually bite: good docs sampled at ~4x the
    // low-doc rate (80 vs 20) — check the ratio ordering, not exact
    val (gIn, gAll) = (sample.values.count(_ == "good"), quality.values.count(_ == "good"))
    val (lIn, lAll) = (sample.values.count(_ == "low"), quality.values.count(_ == "low"))
    assert(gAll > 0 && lAll > 0)
    assert(gIn.toDouble / gAll > lIn.toDouble / lAll,
      s"good rate ${gIn}/$gAll must exceed low rate ${lIn}/$lAll")
    spark.catalog.clearCache()
  }

  test("gopher repetition signals: every metric by hand on fixtures") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, split}
    val docs = Seq(
      // "a a a b": top 3/4=750000; 2grams [a a, a a, a b] dup 1/3=333333;
      // 3grams [a a a, a a b] dup 0 → dropped on top-word AND dup-2gram
      (1L, "a a a b"),
      // all distinct → 0/0/0, kept
      (2L, "w x y z"),
      // "p q p q p q": top 3/6=500000; 2grams [pq,qp,pq,qp,pq] dup 3/5=600000;
      // 3grams [pqp,qpq,pqp,qpq] dup 2/4=500000 → dropped everywhere
      (3L, "p q p q p q"),
      // 10 words, 'a'/'b' twice each → top 2/10 = 200000; the repeated
      // "a b" is 1 dup 2-gram in 9 → 111111 → dropped on both cuts
      (4L, "a b c d e f g h a b"))
      .toDF("doc_id", "text")
      .withColumn("tok", split(col("text"), " "))
    val out = graft.operators.Text.gopherRepetition(docs)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5))))
      .toMap
    assert(out(1L) == ((4L, 750000L, 333333L, 0L, false)))
    assert(out(2L) == ((4L, 250000L, 0L, 0L, false)),
      "4 distinct words: top 1/4 = 250000 > threshold")
    assert(out(3L) == ((6L, 500000L, 600000L, 500000L, false)))
    assert(out(4L) == ((10L, 200000L, 111111L, 0L, false)))
    // and a genuinely kept doc: 10 distinct words
    val kept = graft.operators.Text.gopherRepetition(
      Seq((5L, "q w e r t y u i o p")).toDF("doc_id", "text")
        .withColumn("tok", split(col("text"), " ")))
      .collect().head
    assert(kept.getBoolean(5), "10 distinct words must pass every cut")
    spark.catalog.clearCache()
  }

  test("topRunCount is doc-length-linear: heavy-tail long docs stay cheap") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, split}
    // The round-14 form was O(len × distinct) per document — fine on
    // ~300-char docs, quadratic on a heavy-tail long one (50k distinct
    // tokens → 2.5B comparisons for a single row). The sorted-run-scan
    // form is O(n log n); these fixtures are its worst case (all
    // distinct) plus exact-count checks, sized so the quadratic form
    // would take minutes while the linear one clears in seconds.
    val allDistinct = (0 until 50000).map(i => s"w$i").mkString(" ")
    val skewed = (("hot " * 137) + (0 until 30000).map(i => s"t$i").mkString(" ")).trim
    val t0 = System.nanoTime()
    val out = Seq((1L, allDistinct), (2L, skewed), (3L, "solo"))
      .toDF("doc_id", "text")
      .withColumn("tok", split(col("text"), " "))
      .select(col("doc_id"), graft.operators.Text.topRunCount(col("tok")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sec = (System.nanoTime() - t0) / 1e9
    assert(out == Map(1L -> 1L, 2L -> 137L, 3L -> 1L))
    assert(sec < 30.0, f"long-doc topRunCount took $sec%.1f s — quadratic form reintroduced?")
    // empty array keeps array_max's null (the micro-rational division
    // downstream relies on it)
    val empty = Seq((1L, Seq.empty[String])).toDF("doc_id", "tok")
      .select(graft.operators.Text.topRunCount(col("tok")).as("c"))
      .collect().head
    assert(empty.isNullAt(0), "empty token array must yield null, not 0")
    spark.catalog.clearCache()
  }
}
