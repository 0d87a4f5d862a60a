package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines:
  * tokenization, quality scoring, language-ID, fingerprinting. All are
  * pure `functions._` column compositions — no UDFs — so they stay inside
  * whole-stage codegen and scale linearly with the scan; every double is
  * produced by a fixed-order arithmetic tree so the DuckDB oracle matches
  * bit-for-bit.
  */
object TextAnalysis {

  /** Whitespace tokens, empties dropped (robust to repeated spaces). */
  def tokens(text: Column): Column =
    filter(split(text, " "), t => t =!= "")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Distinct-token count — the numerator of type/token ratio. */
  def distinctTokenCount(text: Column): Column = size(array_distinct(tokens(text)))

  /** Sum of token lengths (chars excluding spaces). */
  def tokenCharCount(text: Column): Column =
    aggregate(tokens(text), lit(0L), (acc, t) => acc + length(t).cast("long"))

  /** Tokens matching a BPE-ish word shape (pure lowercase alpha runs vs
    * anything else) — a cheap proxy for subword-friendliness.
    */
  def alphaTokenCount(text: Column): Column =
    size(filter(tokens(text), t => t.rlike("^[a-z]+$")))

  /** GPT-2-style pre-tokenizer shape, restricted to the regex subset
    * java.util.regex and RE2 (DuckDB) evaluate identically — character
    * classes and alternation only, no lookaround: a piece is an optional
    * leading space glued to a letter run, a digit run, or a punctuation
    * run. Piece count is the standard proxy for "how many subword tokens
    * will a BPE tokenizer emit" when the real merges table isn't in the
    * pipeline; pieces-per-word (fertility) and chars-per-piece are the
    * two curation signals derived from it.
    */
  final val BpePieceRe = " ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+"

  /** BPE-ish pieces (group-0 matches of [[BpePieceRe]], left to right,
    * non-overlapping). Codegen'd `RegExpExtractAll` — row-local, no
    * shuffle, the same scan shape as the other text kernels.
    */
  def bpePieces(text: Column): Column =
    regexp_extract_all(text, lit(BpePieceRe), lit(0))

  /** PII patterns, shared between the Spark side and the DuckDB oracle.
    * Restricted to the regex subset both engines (java.util.regex, RE2)
    * evaluate identically — character classes, bounded repeats, word
    * boundaries; no lookaround, no backrefs.
    */
  final val EmailRe = """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"""
  final val PhoneRe = """\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b"""
  final val IpRe = """\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"""

  /** Redact all three PII classes, email -> phone -> ip — the fixed
    * order matters where patterns could overlap and is mirrored by the
    * oracle SQL. Pure regexp_replace chain: codegen, row-local.
    */
  def piiRedact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, lit(EmailRe), lit("<EMAIL>")),
        lit(PhoneRe), lit("<PHONE>")),
      lit(IpRe), lit("<IP>"))

  /** Count matches of one PII pattern (use [[EmailRe]]/[[PhoneRe]]/
    * [[IpRe]] or any engine-portable regex).
    */
  def piiCount(text: Column, pattern: String): Column =
    regexp_count(text, lit(pattern)).cast("long")

  /** Small multilingual stopword profiles for the n-gram/stopword
    * language-ID heuristic. Deterministic, alphabetical language order.
    */
  val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein"),
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is", "it"),
    "es" -> Seq("el", "la", "los", "de", "que", "y", "en", "un"),
    "fr" -> Seq("le", "les", "et", "est", "une", "dans", "pour", "que"),
    "zh" -> Seq("de_zh", "shi", "bu", "wo", "le_zh", "ren", "you", "ta"))

  /** Hits of one stopword profile in the token stream (with repeats —
    * frequency matters, unlike array_intersect).
    */
  def profileHits(text: Column, words: Seq[String]): Column =
    size(filter(tokens(text), t => t.isin(words: _*)))

  /** Predicted language: argmax of profile hits, ties broken by
    * alphabetical language code (fixed evaluation order).
    */
  def langId(text: Column): Column = {
    val scored = LangProfiles.map { case (lang, words) =>
      struct(profileHits(text, words).as("hits"), lit(lang).as("lang"))
    }
    // array_max on struct(hits, lang): max hits, then max lang — to get
    // alphabetical-FIRST tie-break, compare on (hits, reversed-rank) via
    // explicit fold keeping the earlier element on ties.
    val folded = scored.reduceLeft { (best, cand) =>
      when(cand.getField("hits") > best.getField("hits"), cand).otherwise(best)
    }
    folded.getField("lang")
  }

  def langIdScore(text: Column): Column = {
    val scored = LangProfiles.map { case (_, words) =>
      profileHits(text, words)
    }
    greatest(scored: _*)
  }

  /** Quality score in [0,1]: weighted blend of stopword ratio, mean token
    * length band, and type/token ratio — the standard cheap heuristics
    * (length/punct/stopword) for filtering web-scale corpora. Fixed
    * parenthesization; mirror it exactly in oracle SQL.
    */
  def qualityScore(text: Column): Column = {
    val toks = tokenCount(text).cast("double")
    val stopRatio = profileHits(text, LangProfiles.toMap.apply("en")).cast("double") / toks
    val ttr = distinctTokenCount(text).cast("double") / toks
    val meanLen = tokenCharCount(text).cast("double") / toks
    // band score: 1 when mean token length in [3, 8], linearly less outside
    val lenScore = greatest(lit(0.0), lit(1.0) - abs(meanLen - lit(5.5)) / lit(5.5))
    (stopRatio * lit(0.25)) + (ttr * lit(0.35)) + (lenScore * lit(0.4))
  }

  /** Word n-gram shingles (default 3). Shorter docs fall back to the whole
    * text as a single shingle (keeps the column total and ANSI-safe —
    * Spark 4's element_at throws on out-of-bounds).
    */
  def shingles(text: Column, n: Int = 3): Column = {
    val toks = tokens(text)
    val idx = sequence(lit(1), size(toks) - lit(n - 1))
    val grams = transform(idx, i =>
      concat_ws(" ", (0 until n).map(o => element_at(toks, i + lit(o))): _*))
    when(size(toks) < n, array(text)).otherwise(grams)
  }

  /** Whole-document fingerprint: md5 of the space-normalized text.
    * Native kernel ([[graft.functions.NormalizedMd5Expr]]) — the column
    * algebra `md5(concat_ws(" ", tokens(text)))` carries an interpreted
    * `filter` HOF; the kernel is one codegen call per document.
    */
  def fingerprint(text: Column): Column =
    graft.functions.NormalizedMd5Expr(text)

  /** Locality-sensitive document fingerprint: the minimum md5 over word
    * 3-gram shingles (a 1-permutation MinHash). Documents sharing their
    * rarest shingle collide — a rolling-hash-style near-dup key.
    * Native kernel ([[graft.functions.MinShingleFpExpr]]): the algebra
    * form `array_min(transform(shingles(text, n), md5))` evaluates one
    * md5 per shingle INTERPRETED inside the transform lambda (HOF lambda
    * bodies never enter codegen) — the dominant cost of the whole
    * text_fingerprint query before the kernel.
    */
  def minShingleFingerprint(text: Column, n: Int = 3): Column =
    graft.functions.MinShingleFpExpr(text, n)

  /** The pre-kernel column-algebra form of [[minShingleFingerprint]] —
    * kept as the equivalence oracle for the kernel (HashExprsSpec).
    */
  def minShingleFingerprintAlgebra(text: Column, n: Int = 3): Column =
    array_min(transform(shingles(text, n), s => md5(s)))

  /** True rolling-hash fingerprint (winnowing): min over all length-`w`
    * token windows of a base-257 polynomial hash of the tokens' 60-bit
    * hashes. Native kernel ([[graft.functions.RollingFingerprintExpr]]),
    * O(tokens) per document.
    */
  def rollingFingerprint(text: Column, w: Int = 4): Column =
    graft.functions.RollingFingerprintExpr(text, w)
}
