package graft.operators

import graft.{Q, Tables}
import graft.functions.TextFns
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** Text-analysis operators over the `documents` table: token counting,
  * quality scoring, lexicon-based language ID, and document
  * fingerprinting. These are the building blocks a training-data
  * pipeline runs over every document, so each stays a narrow
  * whole-stage-codegen projection + one hash aggregate — no UDFs, no
  * shuffles beyond the final groupBy where one exists.
  */
object Text {
  import TextFns.{Sql => T}

  private def docs(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.documents(s, d).withColumn("tok", TextFns.tokens(col("text")))

  /** Integer-exact ratio: CAST(a AS DOUBLE)/b rounded to 6 places. */
  private def r6(a: Column, b: Column): Column =
    round(a.cast("double") / b.cast("double"), 6)

  private val StopWords = Seq("the", "a", "or", "and", "of", "to", "in")
  private val stopList = StopWords.map(w => s"'$w'").mkString(", ")

  /** (lang, marker-token lexicon) pairs for the n-gram/lexicon language
    * ID heuristic. Marker sets are disjoint; prediction is argmax hit
    * count with a fixed tie-break order (en > es > de > fr > zh).
    */
  private val Markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "or"),
    "es" -> Seq("data", "row", "line"),
    "de" -> Seq("window", "group", "agg"),
    "fr" -> Seq("filter", "merge", "sort"),
    "zh" -> Seq("spark", "batch", "stream")
  )

  val all: Seq[Q] = Seq(
    Q(
      "q40_token_stats",
      (s, d) =>
        docs(s, d).select(
          col("doc_id"),
          size(col("tok")).as("n_tokens"),
          size(array_distinct(col("tok"))).as("n_distinct"),
          round(
            aggregate(col("tok"), lit(0), (acc, t) => acc + length(t)).cast("double")
              / size(col("tok")),
            6).as("avg_token_len"),
          col("n_chars")
        ).orderBy(col("doc_id")),
      Some(s"""
        WITH t AS (SELECT doc_id, n_chars, ${T.tokens} AS tok FROM documents)
        SELECT doc_id,
               CAST(len(tok) AS INT) AS n_tokens,
               CAST(len(list_distinct(tok)) AS INT) AS n_distinct,
               ROUND(CAST(list_sum(list_transform(tok, x -> len(x))) AS DOUBLE)
                     / CAST(len(tok) AS DOUBLE), 6) AS avg_token_len,
               n_chars
        FROM t ORDER BY doc_id""")
    ),

    // quality scoring: stopword ratio, vocabulary diversity, length band
    Q(
      "q41_quality_score",
      (s, d) =>
        docs(s, d)
          .select(
            col("doc_id"),
            size(col("tok")).as("n_tokens"),
            size(filter(col("tok"), t => t.isin(StopWords: _*))).as("n_stop"),
            size(array_distinct(col("tok"))).as("n_distinct")
          )
          .select(
            col("doc_id"),
            col("n_tokens"),
            r6(col("n_stop"), col("n_tokens")).as("stop_ratio"),
            r6(col("n_distinct"), col("n_tokens")).as("distinct_ratio"),
            when(
              col("n_tokens").between(10, 120)
                && r6(col("n_stop"), col("n_tokens")) <= 0.3
                && r6(col("n_distinct"), col("n_tokens")) >= 0.4,
              "good").otherwise("low").as("quality")
          )
          .orderBy(col("doc_id")),
      Some(s"""
        WITH t AS (SELECT doc_id, ${T.tokens} AS tok FROM documents),
        m AS (SELECT doc_id,
                     CAST(len(tok) AS INT) AS n_tokens,
                     CAST(len(list_filter(tok, x -> x IN ($stopList))) AS INT) AS n_stop,
                     CAST(len(list_distinct(tok)) AS INT) AS n_distinct
              FROM t)
        SELECT doc_id, n_tokens,
               ROUND(CAST(n_stop AS DOUBLE)/CAST(n_tokens AS DOUBLE), 6) AS stop_ratio,
               ROUND(CAST(n_distinct AS DOUBLE)/CAST(n_tokens AS DOUBLE), 6) AS distinct_ratio,
               CASE WHEN n_tokens BETWEEN 10 AND 120
                         AND ROUND(CAST(n_stop AS DOUBLE)/CAST(n_tokens AS DOUBLE), 6) <= 0.3
                         AND ROUND(CAST(n_distinct AS DOUBLE)/CAST(n_tokens AS DOUBLE), 6) >= 0.4
                    THEN 'good' ELSE 'low' END AS quality
        FROM m ORDER BY doc_id""")
    ),

    // lexicon language-ID heuristic with deterministic argmax tie-break
    Q(
      "q42_lang_id",
      (s, d) => {
        val scored = docs(s, d).select(
          col("doc_id") +: col("lang") +:
            Markers.map { case (l, ws) =>
              size(filter(col("tok"), t => t.isin(ws: _*))).as(s"s_$l")
            }: _*
        )
        val langs = Markers.map(_._1)
        // argmax with fixed-order tie-break: first lang >= all later ones
        val pred = langs.init.zipWithIndex
          .foldRight(lit(langs.last): Column) { case ((l, i), rest) =>
            val later = langs.drop(i + 1)
            when(later.map(o => col(s"s_$l") >= col(s"s_$o")).reduce(_ && _), l)
              .otherwise(rest)
          }
        scored
          .withColumn("predicted", pred)
          .withColumn("hit", (col("predicted") === col("lang")).cast(IntegerType))
          .orderBy(col("doc_id"))
      },
      Some {
        val scores = Markers.map { case (l, ws) =>
          val list = ws.map(w => s"'$w'").mkString(", ")
          s"CAST(len(list_filter(tok, x -> x IN ($list))) AS INT) AS s_$l"
        }.mkString(",\n                     ")
        val langs = Markers.map(_._1)
        val caseExpr = langs.init.zipWithIndex
          .map { case (l, i) =>
            val conds = langs.drop(i + 1).map(o => s"s_$l >= s_$o").mkString(" AND ")
            s"WHEN $conds THEN '$l'"
          }
          .mkString("\n                    ") + s"\n                    ELSE '${langs.last}'"
        s"""
        WITH t AS (SELECT doc_id, lang, ${T.tokens} AS tok FROM documents),
        m AS (SELECT doc_id, lang,
                     $scores
              FROM t)
        SELECT doc_id, lang, s_en, s_es, s_de, s_fr, s_zh,
               CASE $caseExpr END AS predicted,
               CAST(CASE $caseExpr END = lang AS INT) AS hit
        FROM m ORDER BY doc_id"""
      }
    ),

    // document fingerprinting: md5 over normalized text + 60-bit int form
    Q(
      "q43_fingerprint",
      (s, d) =>
        docs(s, d)
          .select(
            col("doc_id"),
            md5(array_join(col("tok"), " ")).as("fp"),
            TextFns.h60(array_join(col("tok"), " ")).as("fp60")
          )
          .orderBy(col("doc_id")),
      Some(s"""
        WITH t AS (SELECT doc_id, ${T.tokens} AS tok FROM documents)
        SELECT doc_id,
               md5(array_to_string(tok, ' ')) AS fp,
               ${T.h60("array_to_string(tok, ' ')")} AS fp60
        FROM t ORDER BY doc_id""")
    ),

    // word 3-gram shingling: totals plus hash-domain extrema per doc
    Q(
      "q44_shingle_stats",
      (s, d) =>
        docs(s, d)
          .select(col("doc_id"), explode(TextFns.shingles(col("tok"), 3)).as("shingle"))
          .distinct()
          .select(col("doc_id"), TextFns.hmod(col("shingle")).as("hm"))
          .groupBy(col("doc_id"))
          .agg(
            count(lit(1)).as("n_distinct_shingles"),
            min(col("hm")).as("min_h"),
            max(col("hm")).as("max_h")
          )
          .orderBy(col("doc_id")),
      Some(s"""
        WITH t AS (SELECT doc_id, ${T.tokens} AS tok FROM documents),
        e AS (SELECT doc_id, unnest(${T.shingles("tok", 3)}) AS shingle FROM t),
        ds AS (SELECT DISTINCT doc_id, shingle FROM e)
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_distinct_shingles,
               min(${T.hmod("shingle")}) AS min_h,
               max(${T.hmod("shingle")}) AS max_h
        FROM ds GROUP BY doc_id ORDER BY doc_id""")
    ),

    // BPE-ish sub-word piece counting: a GPT-2-style pretokenizer regex
    // (contraction suffixes, letter runs, digit runs, punctuation runs,
    // each with an optional leading space) — restricted to the
    // RE2-compatible subset (the original's \\s+(?!\\S) lookahead is not
    // RE2-expressible, and the oracle engine is RE2-based) so Java and
    // RE2 tokenize identically. Pure codegen projection, no UDF.
    Q(
      "q81_bpe_pieces",
      (s, d) => {
        val pat = """'(?:[sdmt]|ll|ve|re)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+"""
        docs(s, d)
          .select(
            col("doc_id"),
            size(col("tok")).as("n_ws_tokens"),
            size(regexp_extract_all(col("text"), lit(pat), lit(0))).as("n_pieces"))
          .withColumn("pieces_per_token", r6(col("n_pieces"), col("n_ws_tokens")))
          .orderBy(col("doc_id"))
      },
      Some(s"""
        WITH t AS (SELECT doc_id, text, ${T.tokens} AS tok FROM documents)
        SELECT doc_id,
               CAST(len(tok) AS INT) AS n_ws_tokens,
               CAST(len(regexp_extract_all(text,
                 '''(?:[sdmt]|ll|ve|re)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+')) AS INT) AS n_pieces,
               ROUND(CAST(len(regexp_extract_all(text,
                 '''(?:[sdmt]|ll|ve|re)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+')) AS DOUBLE)
                 / CAST(len(tok) AS DOUBLE), 6) AS pieces_per_token
        FROM t ORDER BY doc_id""")
    ),

    // Rolling-hash document fingerprint: left fold h = (h*B + hmod(tok))
    // mod P over the token stream — order-sensitive (reordered docs get
    // different fingerprints, unlike a bag-of-shingles minimum), one
    // higher-order function per row, no shuffle. B*P stays < 2^38 so
    // the fold never overflows int64 in either engine.
    Q(
      "q82_rolling_fingerprint",
      (s, d) =>
        docs(s, d)
          .filter(size(col("tok")) > 0)
          .select(
            col("doc_id"),
            size(col("tok")).as("n_tokens"),
            aggregate(
              slice(col("tok"), lit(2), greatest(size(col("tok")) - 1, lit(0))),
              TextFns.hmod(col("tok").getItem(0)),
              (acc, t) => (acc * 131L + TextFns.hmod(t)) % TextFns.P)
              .as("rolling_fp"))
          .orderBy(col("doc_id")),
      Some(s"""
        WITH t AS (SELECT doc_id, ${T.tokens} AS tok FROM documents)
        SELECT doc_id,
               CAST(len(tok) AS INT) AS n_tokens,
               list_reduce(list_transform(tok, x -> ${T.hmod("x")}),
                           (a, b) -> (a * 131 + b) % 1000000007) AS rolling_fp
        FROM t WHERE len(tok) > 0 ORDER BY doc_id""")
    ),

    // Training-shard assignment (sequence packing): documents are packed
    // greedily into ~TokenBudget-token shards per (lang, source) stream
    // in deterministic doc_id order — shard id = starting token offset
    // div budget. The running offset is a keyed window cumsum: the
    // shuffle is one exchange on (lang, source), and at corpus scale the
    // same assignment distributes as the classic two-phase cumsum
    // (per-partition partial sums -> broadcast offsets -> local scan);
    // the (lang, source) keying is what keeps any one window bounded to
    // a stream, not the corpus.
    Q(
      "q77_token_packing",
      (s, d) => {
        val budget = 4096
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("lang"), col("source"))
          .orderBy(col("doc_id"))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
        docs(s, d)
          .select(col("doc_id"), col("lang"), col("source"), size(col("tok")).cast("long").as("n_tokens"))
          .withColumn("cum_before", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
          .withColumn("shard", expr(s"cum_before div $budget").cast(IntegerType))
          .groupBy(col("lang"), col("source"), col("shard"))
          .agg(
            count(lit(1)).as("n_docs"),
            sum(col("n_tokens")).as("shard_tokens"))
          .orderBy(col("lang"), col("source"), col("shard"))
      },
      Some(s"""
        WITH t AS (SELECT doc_id, lang, source, CAST(len(${T.tokens}) AS BIGINT) AS n_tokens
                   FROM documents),
        c AS (SELECT doc_id, lang, source, n_tokens,
                     COALESCE(CAST(SUM(n_tokens) OVER (
                       PARTITION BY lang, source ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS cum_before
              FROM t)
        SELECT lang, source, CAST(cum_before // 4096 AS INT) AS shard,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS shard_tokens
        FROM c GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""")
    ),

    // Deterministic hash-based train/eval split (the md5 bucket is a
    // pure projection — any worker, any engine, any day assigns a doc to
    // the same split; no RNG, no state). 90/10 by bucket, summarized
    // per (lang, split).
    Q(
      "q78_train_split",
      (s, d) =>
        Tables.documents(s, d)
          .select(
            col("doc_id"), col("lang"),
            (TextFns.h60(col("doc_id").cast("string")) % 100).as("bucket"))
          .withColumn("split", when(col("bucket") < 90, "train").otherwise("eval"))
          .groupBy(col("lang"), col("split"))
          .agg(count(lit(1)).as("n_docs"))
          .orderBy(col("lang"), col("split")),
      Some(s"""
        WITH t AS (SELECT doc_id, lang,
                          (${T.h60("CAST(doc_id AS VARCHAR)")} % 100) AS bucket
                   FROM documents)
        SELECT lang,
               CASE WHEN bucket < 90 THEN 'train' ELSE 'eval' END AS split,
               CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM t GROUP BY 1, 2 ORDER BY 1, 2""")
    )
  )
}
