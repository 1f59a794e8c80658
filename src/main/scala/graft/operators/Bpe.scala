package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-trained byte-pair encoding — SUBWORD token accounting for LLM
  * data budgets (round-15 verdict #3). Whitespace/dict token counts
  * (TextFunctions.tokens, q135/q139) are not what a training run pays
  * for; BPE subword counts are. This is the public algorithm (Sennrich,
  * Haddow, Birch 2016, "Neural Machine Translation of Rare Words with
  * Subword Units"): start from characters, repeatedly merge the
  * highest-frequency adjacent symbol pair, N times, with a FIXED tie
  * order (count desc, then lexicographic pair) — so the merge table is a
  * pure deterministic function of the corpus and the whole chain is
  * DuckDB-replayable.
  *
  * Training runs on the WORD-FREQUENCY VOCAB (distinct word, count),
  * the classic formulation: pair statistics are identical to corpus
  * grain (weighted by word count) while each round touches O(|vocab|)
  * rows, not O(corpus). No end-of-word marker: merges stay intra-word
  * (documented divergence from tokenizers that mark word ends — the
  * accounting is per-word either way).
  *
  * ORACLE-REPLAYABLE MERGE APPLICATION: a word's symbol sequence is kept
  * as a SENTINEL-WRAPPED STRING — every symbol wrapped in U+0001, e.g.
  * "abc" → ␁a␁␁b␁␁c␁ — so applying merge (l, r) is ONE
  * `replace(s, ␁l␁␁r␁, ␁lr␁)`: both Spark's and DuckDB's replace() scan
  * left-to-right non-overlapping, which is exactly BPE's application
  * order, and the per-symbol wrapping means adjacent matches share no
  * characters (no missed second occurrence) and a pattern can never
  * match a symbol SUFFIX (no false merges). U+0001 cannot appear in a
  * whitespace token of real text; both engines would follow the same
  * path even if it did.
  *
  * Scale: each round is one aggregation over the vocab (map-side
  * combined) + one narrow replace; the single driver-visible value per
  * round is the best (pair, count) row — bounded metadata, like the
  * bucket-id collects. Vocab state is localCheckpoint'ed per round so
  * round r never re-runs rounds 1..r-1 (the iterative-loop discipline of
  * kmeansCentroids / connectedComponents). Encoding never re-applies
  * merges per document: the trained vocab IS the encoding (word → final
  * symbols), so corpus-grain encoding is a word join — at 100 TB the
  * vocab side is orders of magnitude smaller than the corpus and AQE
  * picks the join strategy. */
object Bpe {

  /** Symbol sentinel (see class doc). */
  private[graft] val Sep = "\u0001"

  /** tokens(text) — the same whitespace tokenization as every other
    * token-accounting operator, so BPE counts compose with them. */
  private def tokens(text: Column): Column =
    graft.functions.TextFunctions.tokens(text)

  /** One learned merge. */
  final case class Merge(rank: Long, lhs: String, rhs: String, pairCount: Long)

  /** Train `nMerges` rounds; returns (merge table, final vocab state
    * (word, cnt, s)) where `s` is the sentinel-wrapped symbol string. */
  private def trainCore(docs: DataFrame, nMerges: Int, textCol: String)
      : (Seq[Merge], DataFrame) = {
    require(nMerges >= 1 && nMerges <= 256, s"nMerges out of range: $nMerges")
    val chars = expr(
      "transform(sequence(1, length(word)), i -> substring(word, CAST(i AS INT), 1))")
    var state = docs
      .select(explode(tokens(col(textCol))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .select(col("word"), col("cnt"),
        concat(lit(Sep), concat_ws(Sep + Sep, chars), lit(Sep)).as("s"))
      .localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer[Merge]()
    for (r <- 1 to nMerges) {
      val pairs = state
        .select(col("cnt"),
          split(expr("substring(s, 2, length(s) - 2)"), Sep + Sep).as("a"))
        .where(size(col("a")) >= 2)
        .select(col("cnt"), explode(expr(
          "transform(sequence(1, size(a) - 1), " +
            "i -> struct(element_at(a, CAST(i AS INT)) AS l, " +
            "element_at(a, CAST(i + 1 AS INT)) AS r))")).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("cnt")).as("c"))
      // ONE driver-visible row per round: the winning pair under the
      // deterministic (count desc, lhs, rhs) tie order
      val best = pairs.orderBy(col("c").desc, col("l"), col("r")).limit(1).collect()
      require(best.nonEmpty,
        s"BPE training exhausted adjacent pairs before merge $r of $nMerges")
      val (l, rr, c) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
      merges += Merge(r.toLong, l, rr, c)
      state = state
        .withColumn("s", replace(col("s"),
          lit(Sep + l + Sep + Sep + rr + Sep), lit(Sep + l + rr + Sep)))
        .localCheckpoint(true)
    }
    (merges.toSeq, state)
  }

  /** The learned merge table: (rank, lhs, rhs, pair_count), rank 1..N in
    * learning order. */
  def bpeMerges(docs: DataFrame, nMerges: Int, textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val (merges, _) = trainCore(docs, nMerges, textCol)
    merges.toDF("rank", "lhs", "rhs", "pair_count")
  }

  /** The encoded vocab: (word, cnt, n_sub, subwords) with `subwords` the
    * space-joined final symbol sequence — the word→subwords dictionary a
    * corpus-grain encode joins against. */
  def bpeVocab(docs: DataFrame, nMerges: Int, textCol: String = "text"): DataFrame =
    vocabOf(trainCore(docs, nMerges, textCol)._2)

  /** ONE training run, BOTH artifacts: the merge table rows
    * (kind = 'm') unioned with the vocab rows (kind = 'v') under a
    * common schema — the cacheable form (SessionCache holds single
    * DataFrames), so a gate run that needs the merge table AND the
    * vocab trains once, not twice. */
  def trainedTable(docs: DataFrame, nMerges: Int,
      textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val (merges, state) = trainCore(docs, nMerges, textCol)
    val m = merges.toDF("rank", "lhs", "rhs", "pair_count")
      .select(lit("m").as("kind"), col("rank"), col("lhs"), col("rhs"),
        col("pair_count"), lit(null).cast("string").as("word"),
        lit(null).cast("long").as("cnt"), lit(null).cast("long").as("n_sub"),
        lit(null).cast("string").as("subwords"))
    val v = vocabOf(state)
      .select(lit("v").as("kind"), lit(null).cast("long").as("rank"),
        lit(null).cast("string").as("lhs"), lit(null).cast("string").as("rhs"),
        lit(null).cast("long").as("pair_count"),
        col("word"), col("cnt"), col("n_sub"), col("subwords"))
    m.unionByName(v)
  }

  private def vocabOf(state: DataFrame): DataFrame =
    state.select(col("word"), col("cnt"),
      split(expr("substring(s, 2, length(s) - 2)"), Sep + Sep).as("sy"))
      .select(col("word"), col("cnt"),
        size(col("sy")).cast("long").as("n_sub"),
        concat_ws(" ", col("sy")).as("subwords"))

  /** Per-document subword token accounting: (idCol, n_words,
    * n_bpe_tokens) — every word OCCURRENCE joined to the trained vocab's
    * subword count. The real token-budget metric for q135/q139-class
    * operators. */
  def bpeTokenCounts(
      docs: DataFrame,
      nMerges: Int,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    tokenCountsFromVocab(docs, bpeVocab(docs, nMerges, textCol), idCol, textCol)

  /** [[bpeTokenCounts]] against an ALREADY-TRAINED vocab — the form a
    * pipeline uses when several consumers share one training run (the
    * gates cache the trained vocab per (session, corpus)). A word
    * MISSING from the vocab fails LOUDLY per row (the KnIngest
    * missing-symbol contract): silently dropping OOV occurrences would
    * under-count token budgets with no error. Scoring a DIFFERENT corpus
    * than the vocab was trained on therefore needs an explicit OOV
    * policy first (char-fallback or merge replay) — this form refuses to
    * guess. */
  def tokenCountsFromVocab(
      docs: DataFrame,
      vocab: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs.select(col(idCol), explode(tokens(col(textCol))).as("word"))
      .join(vocab.select(col("word"), col("n_sub")), Seq("word"), "left")
      .withColumn("n_sub", when(col("n_sub").isNull,
        raise_error(concat(lit("Bpe: word missing from the trained vocab "
          + "(OOV under a frozen vocab needs an explicit policy): "),
          col("word")))).otherwise(col("n_sub")))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"), sum(col("n_sub")).as("n_bpe_tokens"))

  /** chunkByTokens on the SUBWORD stream: each doc's words are replaced
    * by their trained subword sequences (in word order), then the same
    * clamped-tail sliding windows as Corpus.chunkByTokens run over the
    * subword array. Zero-token docs drop (no subwords to chunk).
    *
    * Scale: one word-grain join against the vocab + one doc-grain
    * reassembly shuffle; the chunk math itself is the doc-local
    * zero-shuffle explode. */
  def bpeChunks(
      docs: DataFrame,
      nMerges: Int,
      idCol: String = "doc_id",
      textCol: String = "text",
      chunkSize: Int = 32,
      stride: Int = 24): DataFrame =
    chunksFromVocab(docs, bpeVocab(docs, nMerges, textCol),
      idCol, textCol, chunkSize, stride)

  /** [[bpeChunks]] against an already-trained vocab (see
    * [[tokenCountsFromVocab]]). */
  def chunksFromVocab(
      docs: DataFrame,
      trainedVocab: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      chunkSize: Int = 32,
      stride: Int = 24): DataFrame = {
    require(chunkSize > 0 && stride > 0 && stride <= chunkSize,
      "need 0 < stride <= chunkSize")
    val vocab = trainedVocab.select(col("word"), col("subwords"))
    val docSubs = docs
      .select(col(idCol), posexplode(tokens(col(textCol))).as(Seq("ord", "word")))
      .join(vocab, Seq("word"), "left")
      // loud on OOV, exactly as tokenCountsFromVocab: a silently dropped
      // word would splice the chunk stream with no error
      .withColumn("subwords", when(col("subwords").isNull,
        raise_error(concat(lit("Bpe: word missing from the trained vocab "
          + "(OOV under a frozen vocab needs an explicit policy): "),
          col("word")))).otherwise(col("subwords")))
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(struct(col("ord"), col("subwords")))).as("ps"))
      .select(col(idCol),
        flatten(expr("transform(ps, x -> split(x.subwords, ' '))")).as("_w"))
    docSubs
      .withColumn("_n", size(col("_w")).cast("long"))
      .withColumn("_k",
        floor(greatest(lit(0L), col("_n") - chunkSize + (stride - 1)) / stride)
          .cast("long"))
      .select(col(idCol), col("_w"), col("_n"),
        explode(sequence(lit(0L), col("_k"))).as("chunk_id"))
      .withColumn("start_tok",
        least(col("chunk_id") * stride, greatest(lit(0L), col("_n") - chunkSize)))
      .select(
        col(idCol), col("chunk_id"), col("start_tok"),
        least(lit(chunkSize.toLong), col("_n") - col("start_tok")).as("n_tok_chunk"),
        md5(concat_ws(" ",
          slice(col("_w"), (col("start_tok") + 1).cast("int"), lit(chunkSize))))
          .as("chunk_fp"))
  }
}
