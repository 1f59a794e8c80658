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
  * public-redistributable here): whitespace split + CJK bigram segmentation.
  * Used via UDF + explode = the reference's UDTF lateral join
  * (app/dws/DwsTrafficSourceKeywordPageViewWindow.java:135-141).
  */
object Tokenizer extends Serializable {
  private val cjk = "[\\u4e00-\\u9fff]".r

  def tokenize(text: String): Seq[String] = {
    if (text == null) return Seq.empty
    text.split("\\s+").toSeq.filter(_.nonEmpty).flatMap { tok =>
      if (cjk.findFirstIn(tok).isDefined && tok.length > 1)
        // CJK bigrams, mirroring IK's fine-grained mode on CJK runs
        (0 until tok.length - 1).map(i => tok.substring(i, i + 2))
      else Seq(tok)
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
