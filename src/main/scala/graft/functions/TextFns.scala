package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, LongType, StringType}

/** Column builders shared by the text-analysis / dedup / similarity
  * operators. Every primitive here is chosen to be expressible with
  * bitwise-identical results in DuckDB (the driver's oracle engine):
  * integer arithmetic, md5, regex token split — no engine-specific
  * hashes (Spark `hash()`/`xxhash64` and DuckDB `hash()` differ).
  */
object TextFns {

  /** Modulus for all modular hash arithmetic (fits comfortably in
    * int64 even after multiplying by small coefficients).
    */
  val P: Long = 1000000007L

  /** Whitespace tokenization of trimmed text. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Portable 60-bit string hash: first 15 hex digits of md5, as a
    * positive long. DuckDB: CAST('0x' || substr(md5(s),1,15) AS BIGINT).
    * Deterministic and engine-independent (md5 is md5 everywhere),
    * unlike the engines' built-in hash functions.
    */
  def h60(s: Column): Column =
    conv(substring(md5(s), 1, 15), 16, 10).cast(LongType)

  /** h60 reduced mod [[P]] — the input domain of the minhash family. */
  def hmod(s: Column): Column = h60(s) % P

  /** Word n-gram shingles ("a b c" strings) of a token array; empty
    * array when the doc has fewer than n tokens (guarded explicitly:
    * Spark's `sequence(1, 0)` would count DOWN, DuckDB's
    * generate_series(1,0) is empty).
    */
  def shingles(tok: Column, n: Int): Column =
    when(
      size(tok) >= n,
      transform(
        sequence(lit(1), size(tok) - (n - 1)),
        i => concat_ws(" ", slice(tok, i, lit(n))))
    ).otherwise(array().cast(ArrayType(StringType)))

  /** The j-th member of the minhash family applied to an [[hmod]]
    * value: (a_j * h + b_j) mod P with a_j = 2j+1 (odd), b_j = 7919j+1.
    * All operands stay < 2^40 so int64 arithmetic never overflows —
    * in either engine.
    */
  def minhashJ(h: Column, j: Column): Column =
    ((lit(2) * j + 1) * h + (lit(7919) * j + 1)) % P

  /** Count-Min cell index for key `k` at depth `d`: the d-th minhash
    * family member of the key's [[hmod]], reduced mod `width`. Shared
    * by the batch (q132) and streaming (q133) sketch builds so both
    * address the SAME cells — mergeability across engines and runs is
    * the property that makes the sketch useful.
    */
  def cmsCell(k: Column, d: Column, width: Int): Column =
    minhashJ(hmod(k), d) % width

  /** Oracle-SQL fragments mirroring the above, for embedding into
    * DuckDB statements.
    */
  object Sql {
    val tokens = """string_split_regex(trim(text), '\s+')"""
    def h60(s: String): String =
      s"CAST('0x' || substr(md5($s), 1, 15) AS BIGINT)"
    def hmod(s: String): String = s"(${h60(s)} % 1000000007)"
    def shingles(tok: String, n: Int): String =
      s"list_transform(generate_series(1, greatest(len($tok) - ${n - 1}, 0)), " +
        s"i -> array_to_string($tok[i:i+${n - 1}], ' '))"
    def minhashJ(h: String, j: String): String =
      s"(((2*$j+1) * $h + (7919*$j+1)) % 1000000007)"
    def cmsCell(k: String, d: String, width: Int): String =
      s"(${minhashJ(hmod(k), d)} % $width)"
  }
}
