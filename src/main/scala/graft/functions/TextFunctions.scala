package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for the documents pipeline.
  *
  * Everything here is built from `org.apache.spark.sql.functions` (native,
  * whole-stage-codegen'd Catalyst expressions) — no Scala UDFs in the hot
  * path. The only UDF is [[Tokenizer.tokenizeUdf]], the pluggable analyzer
  * replacing the reference's IK Chinese tokenizer
  * (reference: utils/KeyWordUtil.java:12-28, app/func/SplitFunction.java:11-22),
  * and even that has a native-function twin [[tokens]] used when the
  * simple whitespace semantics suffice.
  */
object TextFunctions {

  /** Whitespace tokenization, codegen-friendly (native `split`). */
  def tokens(text: Column): Column =
    filter(split(trim(text), "\\s+"), t => length(t) > 0)

  /** Token count — whitespace tokens. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish sub-word count: count maximal runs of word chars, digits, or
    * single punctuation — a cheap proxy for byte-pair-encoded token count
    * used to size training corpora. Pure regex → codegen'd.
    */
  def bpeishCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"), lit(0)))

  /** Word n-gram shingles: `n`-word windows joined by a single space.
    * Built with `transform(sequence(...))` over the token array — native
    * higher-order functions, no UDF, fully distributed.
    * Documents shorter than `n` words yield one shingle = whole text.
    */
  def shingles(text: Column, n: Int): Column = {
    val w = tokens(text)
    when(size(w) < n, array(concat_ws(" ", w)))
      .otherwise(transform(
        sequence(lit(0), size(w) - n),
        i => concat_ws(" ", slice(w, i + 1, lit(n)))))
  }

  /** Normalized text: lowercase, collapse whitespace, trim.
    * The canonical form for exact-dup hashing / fingerprinting. */
  def normalized(text: Column): Column =
    lower(trim(regexp_replace(text, "\\s+", " ")))

  /** Document fingerprint = md5 of the normalized text. md5 exists in both
    * Spark and DuckDB with identical hex output → oracle-checkable. */
  def fingerprint(text: Column): Column = md5(normalized(text))

  /** Small English stopword list shared by quality + language-ID. */
  val stopwords: Seq[String] = Seq(
    "the", "a", "an", "of", "to", "and", "in", "is", "it", "for", "on",
    "that", "this", "with", "as", "was", "are", "be", "by", "at", "or")

  /** Stopword ratio: fraction of tokens that are English stopwords. */
  def stopwordRatio(text: Column): Column = {
    val w = tokens(text)
    when(size(w) === 0, lit(0.0)).otherwise(
      size(filter(w, t => lower(t).isin(stopwords.map(lit(_)): _*))).cast("double")
        / size(w).cast("double"))
  }

  /** Punctuation ratio: non-alphanumeric, non-space chars / total chars. */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0)).otherwise(
      length(regexp_replace(text, "[A-Za-z0-9\\s]", "")).cast("double")
        / length(text).cast("double"))

  /** Mean token length (exact: computed as decimal then double). */
  def meanTokenLen(text: Column): Column = {
    val w = tokens(text)
    when(size(w) === 0, lit(0.0)).otherwise(
      aggregate(w, lit(0L), (acc, t) => acc + length(t)).cast("double")
        / size(w).cast("double"))
  }

  /** Heuristic quality score in [0,1]: rewards reasonable length, low
    * punctuation, some stopwords (prose-ness). Deterministic, SQL-expressible
    * (mirrored in the DuckDB oracle). */
  def qualityScore(text: Column): Column = {
    val lenScore = least(tokenCount(text).cast("double") / lit(50.0), lit(1.0))
    val punctPenalty = greatest(lit(0.0), lit(1.0) - punctRatio(text) * 4)
    val stopScore = least(stopwordRatio(text) * 5, lit(1.0))
    round((lenScore * 0.4 + punctPenalty * 0.4 + stopScore * 0.2), 6)
  }

  /** N-gram-heuristic language ID. On real corpora this would score
    * character n-gram profiles per language; the deterministic public
    * heuristic here scores the English stopword ratio and ASCII ratio —
    * the structure (score → argmax → label) is what the real profiles
    * plug into. */
  def langId(text: Column): Column = {
    val asciiRatio =
      when(length(text) === 0, lit(1.0)).otherwise(
        length(regexp_replace(text, "[^\\x00-\\x7F]", "")).cast("double")
          / length(text).cast("double"))
    when(asciiRatio < 0.5, lit("cjk"))
      .when(stopwordRatio(text) >= 0.05, lit("en"))
      .otherwise(lit("unknown"))
  }
}

/** Pluggable tokenizer (replaces the reference's IK analyzer, which is not
  * public-redistributable here): whitespace split + forward-maximum-
  * matching (FMM) segmentation of CJK runs over an EMBEDDED wordlist
  * — the classic dictionary segmentation IK itself builds on. Multi-char
  * dictionary words tokenize as words (中文分词 → 中文, 分词 — not
  * overlapping bigrams); out-of-vocabulary CJK characters emit as
  * single-char tokens (FMM's standard granularity). Divergence from IK:
  * the embedded list is a graded common-word vocabulary (~1.1k entries
  * from the public HSK-band core vocabulary plus the gmall e-commerce
  * domain), not IK's ~275k main dictionary, so rare words still segment
  * to singles where IK would know them — the list is a plain set, so a
  * production deployment swaps in a full dictionary without touching the
  * FMM. Non-CJK runs inside a mixed token (e.g. `iphone15手机`) pass
  * through intact as their own tokens. Used via UDF + explode = the
  * reference's UDTF lateral join
  * (app/dws/DwsTrafficSourceKeywordPageViewWindow.java:135-141).
  */
object Tokenizer extends Serializable {

  @inline private def isCjk(c: Char): Boolean = c >= 0x4e00 && c <= 0x9fff

  /** Embedded wordlist for FMM — the public HSK graded core vocabulary
    * (bands 1-6, multi-char entries) plus the e-commerce domain
    * vocabulary the reference's keyword stream carries (search items,
    * trade terms, product nouns). Longest entries first is NOT required:
    * FMM itself tries the longest window at each position.
    *
    * COUPLING NOTE: no oracle gate currently feeds CJK text (the
    * documents corpus is ASCII, so q37/q117's keyword windows see only
    * pass-through tokens), but if CJK ever enters a synthesized feed,
    * gate hashes become a function of this list — editing it then
    * requires regenerating the q37/q14/q117 oracles in the same commit.
    * ExtensionsSpec pins the list's size band and sentinel entries so an
    * accidental edit fails loudly. */
  private[functions] val dict: Set[String] =
    DictWords.all.split("\\s+").iterator.filter(_.nonEmpty).toSet

  /** Test-only view of the dictionary (ExtensionsSpec pins its size band
    * and sentinel entries). */
  def dictForTest: Set[String] = dict

  private val maxWordLen = dict.iterator.map(_.length).max

  /** FMM over one maximal CJK run: at each position take the LONGEST
    * dictionary word (bounded by the longest entry), else a single char. */
  private def segmentCjkRun(run: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var i = 0
    while (i < run.length) {
      var len = math.min(maxWordLen, run.length - i)
      var matched = 1
      while (len >= 2 && matched == 1) {
        if (dict.contains(run.substring(i, i + len))) matched = len
        len -= 1
      }
      out += run.substring(i, i + matched)
      i += matched
    }
    out.result()
  }

  /** Split one whitespace token into maximal CJK / non-CJK runs, FMM the
    * CJK runs, pass the rest through. */
  private def segmentToken(tok: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var i = 0
    while (i < tok.length) {
      val cjkRun = isCjk(tok.charAt(i))
      var j = i + 1
      while (j < tok.length && isCjk(tok.charAt(j)) == cjkRun) j += 1
      val run = tok.substring(i, j)
      if (cjkRun) out ++= segmentCjkRun(run) else out += run
      i = j
    }
    out.result()
  }

  def tokenize(text: String): Seq[String] = {
    if (text == null) return Seq.empty
    text.split("\\s+").toSeq.filter(_.nonEmpty).flatMap { tok =>
      if (tok.exists(isCjk)) segmentToken(tok) else Seq(tok)
    }
  }

  import org.apache.spark.sql.functions.udf
  val tokenizeUdf = udf((s: String) => tokenize(s))

  /** The same tokenizer as a native [[TokenizeGenerator]] lateral view —
    * `select(tokenizeGen(col))` plans one GenerateExec emitting a `word`
    * column, replacing udf→array→explode. */
  def tokenizeGen(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graftshim.ColumnBridge.column(
      TokenizeGenerator(
        org.apache.spark.sql.graftshim.ColumnBridge.expression(text)))
}
