package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions (SURVEY §2.10 L4, north-star text ops).
  * All pure `Column` compositions over codegen'd builtins — no UDFs — so
  * they stay inside whole-stage codegen at any scale.
  */
object Text {

  def tokens(c: Column): Column = split(c, " ")

  /** The cross-engine md5 bucket: first 4 hex chars of md5 as an integer
    * mod `n`. The ONE hashing scheme shared with every DuckDB oracle
    * (`('0x' || substr(md5(x), 1, 4))::BIGINT % n`) — used for train
    * splits (l33), stratified/top-k sampling (l19/l22), shuffle-sharding
    * (l40) and feature hashing (l59); change it here and in the oracle
    * snippet together or every consumer's hash compare breaks. */
  def md5Bucket(c: Column, n: Int): Column =
    conv(substring(md5(c.cast("binary")), 1, 4), 16, 10).cast("long") % n

  /** Word n-gram shingles: one string per window of `n` consecutive tokens.
    *
    * PERFORMANCE CONTRACT: every reference to the token array sits OUTSIDE
    * the lambda body. Higher-order-function lambdas are interpreted per
    * ELEMENT, and any outer expression referenced inside one is inlined and
    * re-evaluated on every invocation — the obvious formulation
    * `transform(indices, i => slice(split(text), i, n))` re-splits the
    * document once per shingle, O(tokens²) per doc (measured ~2× wall time
    * on the gram-heavy corpus queries at sf0.1; at 100 TB it is a second,
    * third, … full tokenize). Instead the n shifted slices are computed
    * once per ROW and zipped positionally, so the lambda touches only its
    * own struct variable. Guarded: texts shorter than n short-circuit to an
    * empty array (slice with a non-positive length would throw). */
  def shingles(c: Column, n: Int): Column = {
    val t = tokens(c)
    // shifted(k)[i] = t[i + k]; all slices have exactly L - n + 1 elements,
    // so the zip carries complete windows only (no null-padded tail)
    val win = greatest(size(t) - (n - 1), lit(0))
    // Alias each shifted slice: arrays_zip names struct fields after its
    // inputs, and the fallback index-naming for unnamed inputs ("0","1",…)
    // is undocumented Catalyst behavior that has changed across Spark
    // versions — explicit aliases keep the field names under our control.
    val shifted = (0 until n).map(k => slice(t, lit(k + 1), win).as(s"w$k"))
    when(size(t) < n, array().cast("array<string>"))
      .otherwise(transform(arrays_zip(shifted: _*), s =>
        concat_ws(" ", (0 until n).map(k => s.getField(s"w$k")): _*)))
  }

  def stopwordsEn: Seq[String] = Seq("the", "a", "of", "and", "in", "to")

  /** Share of tokens that are stopwords (language-quality signal). */
  def stopwordRatio(c: Column, stop: Seq[String] = stopwordsEn): Column = {
    val t = tokens(c)
    size(filter(t, x => x.isInCollection(stop))).cast("double") / size(t)
  }

  /** Cosine similarity of two float vectors, computed as a sequential
    * double-precision fold (deterministic, matches an in-order oracle). */
  def cosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (u, v) => u.cast("double") * v.cast("double")),
        lit(0.0), (acc, e) => acc + e)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  /** 16-bit SimHash from md5 hex-digit top bits: bit i is the sign of the
    * sum over tokens of ±1 per hex digit i of md5(token). Fully
    * deterministic and engine-portable (no native hash needed). */
  def simhashBitContribution(token: Column, i: Int): Column =
    when(substring(md5(token.cast("binary")), i, 1).isin("8", "9", "a", "b", "c", "d", "e", "f"), 1L)
      .otherwise(-1L)

  /** Rolling-hash document fingerprint: min md5 over char 32-grams sampled
    * every 16 chars (winnowing-style), or md5(text) for short docs. */
  def rollingFingerprint(c: Column): Column =
    when(length(c) < 32, md5(c.cast("binary")))
      .otherwise(array_min(transform(
        sequence(lit(1), greatest(length(c) - 31, lit(1)), lit(16)),
        i => md5(c.substr(i, lit(32)).cast("binary")))))
}
