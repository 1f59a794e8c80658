package graft.entry

import java.sql.Timestamp
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Envelopes, Tables, TopicDb}
import graft.apps.{GmallApp, GmallPipelines}
import graft.operators.{Dedup, EventOps, Multimodal, Relational, Similarity, Sketches, TextProfile}
import graft.functions.TextFunctions
import graft.streaming.{DimSink, SketchStream, StatefulOps, StreamHarness}

import GateSupport._
import OracleSupport._

/** Per-document text analysis: tokens, language, quality, surprisal.
  *
  * One gate family of [[graft.SparkEntry]]: `queries` runs each operator
  * over the driver's parquet tables; `oracleSql` is the DuckDB twin the
  * driver hash-compares against (columns aliased identically on both
  * sides — the compare sorts columns by name before hashing). */
private[graft] object TextGates {

  /** The KN bigram stream / trained model over `d`'s documents, cached
    * per (session, dir) — ONE training run serves q184 and q185 (the
    * BPE-vocab caching discipline). */
  private def knStreamCached(s: SparkSession, d: String): DataFrame =
    graft.core.SessionCache(s, s"knstream|$d")(
      graft.operators.NgramLm.bigramStream(Tables.documents(s, d)))
  private def knModelCached(s: SparkSession, d: String): DataFrame =
    graft.core.SessionCache(s, s"knmodel|$d")(
      graft.operators.NgramLm.knModel(knStreamCached(s, d)))

  /** The trigram twins (round-17, VERDICT r16 #5) — same caching
    * discipline, q194 pays the training in name-sorted gate order. */
  private def kn3StreamCached(s: SparkSession, d: String): DataFrame =
    graft.core.SessionCache(s, s"kn3stream|$d")(
      graft.operators.NgramLm.trigramStream(Tables.documents(s, d)))
  private def kn3ModelCached(s: SparkSession, d: String): DataFrame =
    graft.core.SessionCache(s, s"kn3model|$d")(
      graft.operators.NgramLm.kn3Model(kn3StreamCached(s, d)))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "q14_top_tokens" -> ((s, d) =>
      Tables.documents(s, d)
        .select(explode(TextFunctions.tokens(col("text"))).as("word"))
        .groupBy(col("word")).agg(count(lit(1)).as("n_hits"))
        .orderBy(col("n_hits").desc, col("word")).limit(50)),

    "q15_text_stats" -> ((s, d) =>
      Tables.documents(s, d).select(
        col("doc_id"),
        TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"),
        TextFunctions.bpeishCount(col("text")).cast("long").as("n_bpeish"),
        round(TextFunctions.punctRatio(col("text")), 6).as("punct_ratio"),
        round(TextFunctions.stopwordRatio(col("text")), 6).as("stop_ratio"),
        round(TextFunctions.meanTokenLen(col("text")), 6).as("mean_tok_len"),
        TextFunctions.qualityScore(col("text")).as("quality"),
        TextFunctions.langId(col("text")).as("lang_pred"))
        .orderBy(col("doc_id"))),

    "q16_lang_dist" -> ((s, d) =>
      Tables.documents(s, d)
        .select(TextFunctions.langId(col("text")).as("lang_pred"))
        .groupBy(col("lang_pred")).agg(count(lit(1)).as("n_docs"))
        .orderBy(col("lang_pred"))),

    // ------------- per-doc profiling / sessionization (round 3) ------------

    // PII redaction over deterministically PII-augmented text (the raw
    // corpus carries no PII; the augmentation is mirrored verbatim in the
    // oracle, so the thing under test is the redaction itself).
    "q67_pii_redact" -> ((s, d) => {
      val aug = concat(col("text"), lit(" contact user"),
        col("doc_id").cast("string"), lit("@mail.example.com or 10."),
        pmod(col("doc_id"), lit(200)).cast("string"), lit(".0."),
        pmod(col("doc_id"), lit(256)).cast("string"), lit(" now"))
      TextProfile.piiProfile(
          Tables.documents(s, d).select(col("doc_id"), aug.as("text")))
        .orderBy(col("doc_id"))
    }),

    // C4/Gopher-style intra-document repetition quality signals.
    "q68_repetition" -> ((s, d) =>
      TextProfile.repetitionProfile(Tables.documents(s, d))
        .orderBy(col("doc_id"))),

    // TF-IDF top-3 terms per document (smoothed idf, lexicographic ties).
    "q69_tfidf" -> ((s, d) =>
      TextProfile.tfIdfTopK(Tables.documents(s, d), 3)
        .orderBy(col("doc_id"), col("rank"))),

    // n-gram LM quality screen (TextProfile.oovProfile): candidate docs
    // (id ≥ 50) scored for unigram+bigram vocabulary coverage against the
    // reference corpus (id < 50) — the integer/ratio form of a backoff-LM
    // perplexity filter (same split as the q77 contamination audit).
    "q96_oov_quality" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      TextProfile.oovProfile(
          docs.where(col("doc_id") >= 50), docs.where(col("doc_id") < 50))
        .orderBy(col("doc_id"))
    }),

    // Unigram-LM surprisal — the perplexity-proxy quality filter
    // (CCNet/Gopher-style, self-trained): per doc, the mean −ln p(token)
    // under corpus unigram frequencies; production drops both tails.
    // Per-token surprisals round to 6 dp before an exact DECIMAL
    // summation, so the oracle compares bit-for-bit.
    "q128_unigram_surprisal" -> ((s, d) =>
      graft.operators.TextProfile.unigramSurprisal(Tables.documents(s, d))
        .orderBy(col("doc_id"))),

    // Gopher-rule keep/drop filter: the decision layer over the quality
    // signals (word-count bounds, mean-word-length bounds, ≥2 distinct
    // stopwords, q68's repetition caps), with auditable per-rule reasons.
    "q131_gopher_filter" -> ((s, d) =>
      TextProfile.gopherFilter(Tables.documents(s, d))
        .orderBy(col("doc_id"))),

    // DSIR-style importance weight: mean log-likelihood ratio of each
    // doc's tokens under the target LM (en slice) vs the background LM
    // (whole corpus), add-1 smoothed — the data-selection score next to
    // q128's surprisal.
    "q132_importance_weight" -> ((s, d) =>
      TextProfile.importanceWeight(
          Tables.documents(s, d), col("lang") === "en")
        .orderBy(col("doc_id"))),

    // CCNet perplexity banding: q128's surprisal ranked by the
    // range-partitioned exact global rank (no single-task window), cut
    // into equal-population head/middle/tail bands.
    "q143_perplexity_bands" -> ((s, d) =>
      TextProfile.perplexityBands(Tables.documents(s, d))
        .orderBy(col("doc_id"))),

    // Interpolated Kneser–Ney bigram LM, self-trained with min-count-2
    // unk pooling (structurally ACTIVE — hapaxes exist at every SF):
    // q184 inspects the model head (top-200 bigram types by probability
    // under the (p, u, w) total order), q185 is the scoring pass — the
    // word-ORDER-aware upgrade of q128's unigram surprisal; the oracle
    // replays vocab → unk mapping → all four count tables → the
    // probability chain bit-for-bit.
    "q184_kn_bigram_model" -> ((s, d) =>
      graft.operators.NgramLm.knModelTopFrom(knModelCached(s, d), 200)),

    "q185_kn_xent" -> ((s, d) =>
      graft.operators.NgramLm.knScoreFrom(
          knStreamCached(s, d), knModelCached(s, d))
        .orderBy(col("doc_id"))),

    // Interpolated Kneser–Ney TRIGRAM LM (round-17, VERDICT r16 #5 —
    // one order up the same type-table design, toward the CCNet-family
    // 5-gram screens): double-BOS framing, lower orders from
    // CONTINUATION counts (Chen & Goodman 1998's interpolated form),
    // min-count-2 unk pooling by vocab membership with positional frame
    // exemption. q194 inspects the model head (top-200 trigram types),
    // q195 is the per-doc cross-entropy in integer µ-nats (q185's
    // discipline at order 3). The oracle replays vocab → pooling → the
    // trigram type table → all five count tables → both probability
    // levels bit-for-bit.
    "q194_kn3_model" -> ((s, d) =>
      graft.operators.NgramLm.kn3ModelTopFrom(kn3ModelCached(s, d), 200)),

    "q195_kn3_xent" -> ((s, d) =>
      graft.operators.NgramLm.kn3ScoreFrom(
          kn3StreamCached(s, d), kn3ModelCached(s, d))
        .orderBy(col("doc_id"))),

    // KN scoring ON INGEST (KnIngest): the model frozen offline (vocab +
    // bigram counts persisted), then two ascending micro-batches of
    // documents scored against it through real checkpointed epochs with
    // idempotent epoch-dir writes — the CCNet deployment shape. The
    // accreted scores must equal the batch q185 bit-for-bit (the feed
    // covers the training corpus, so no unseen pairs — those are
    // spec-planted); shares q185's oracle verbatim.
    "q188_stream_kn_score" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val mid = midOf(docs.agg(min(col("doc_id")), max(col("doc_id"))).head(),
        "documents (q188)")
      val root =
        java.nio.file.Files.createTempDirectory("graft_kn_ingest_").toString
      graft.streaming.KnIngest.freezeModel(Tables.documents(s, d), root)
      import s.implicits._
      StreamHarness.runFilesSink(s,
          Seq(docs.where(col("doc_id") <= mid).as[(Long, String)],
            docs.where(col("doc_id") > mid).as[(Long, String)])) {
        (ds, ckpt) =>
          ds.toDF("doc_id", "text").writeStream
            .option("checkpointLocation", ckpt)
            .foreachBatch { (b: DataFrame, epochId: Long) =>
              graft.streaming.KnIngest.processBatch(
                b.toDF("doc_id", "text"), root, epochId)
            }.start()
      }
      val out = graft.streaming.KnIngest.readScores(s, root)
        .orderBy(col("doc_id"))
        .localCheckpoint(true) // materialize before the store dir vanishes
      org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(root))
      out
    }),

    // Distributed CART distillation (round-17): the PLANET-style
    // level-wise exact split search trains a depth-3 tree on the
    // hash-gated 40 % seed slice — teacher = the Gopher-style integer
    // quality rule, features = the 3 engineered quality stats + 8
    // hashed-noise buckets. The gated model table shows the split
    // search selecting the signal features and rejecting all 8 noise
    // buckets; every candidate count, the IEEE split score, and the
    // (score, feat, thr) tie order are replayed by the oracle.
    "q198_cart_distill_model" -> ((s, d) =>
      cartTreeTableCached(s, d).orderBy(col("node"))),

    // Corpus-wide scoring under the frozen tree — zero-shuffle nested-
    // CASE projection (the distilled model's point at 100 TB): per doc,
    // the landed leaf, the prediction, the teacher's own label, seed
    // membership.
    "q199_cart_distill_score" -> ((s, d) =>
      graft.operators.Classifier.scoreTree(
          graft.operators.Classifier.labeledFeatures(Tables.documents(s, d)),
          cartTreeCached(s, d))
        .orderBy(col("doc_id"))),

    // The distillation's measured worth (the capRecallAudit spirit):
    // teacher agreement split by seed membership — held-out
    // generalization as a GATED NUMBER (sf0.01: 296/296 held-out docs
    // agree; sf0.001: 295/296).
    "q200_cart_distill_summary" -> ((s, d) =>
      graft.operators.Classifier.scoreSummary(
          graft.operators.Classifier.scoreTree(
            graft.operators.Classifier.labeledFeatures(Tables.documents(s, d)),
            cartTreeCached(s, d)))
        .orderBy(col("is_seed"), col("teacher"), col("pred"))),

    // CART scoring ON INGEST (CartIngest): the tree frozen offline, then
    // two ascending micro-batches routed through it via real
    // checkpointed epochs with idempotent epoch-dir writes — the
    // FineWeb deployment shape (q188's contract with the distilled tree
    // as the frozen model). The accreted scores must equal the batch
    // q199 bit-for-bit; shares q199's oracle verbatim.
    "q201_stream_cart_score" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val mid = midOf(docs.agg(min(col("doc_id")), max(col("doc_id"))).head(),
        "documents (q201)")
      val root =
        java.nio.file.Files.createTempDirectory("graft_cart_ingest_").toString
      graft.streaming.CartIngest.freezeModel(Tables.documents(s, d), root)
      import s.implicits._
      StreamHarness.runFilesSink(s,
          Seq(docs.where(col("doc_id") <= mid).as[(Long, String)],
            docs.where(col("doc_id") > mid).as[(Long, String)])) {
        (ds, ckpt) =>
          ds.toDF("doc_id", "text").writeStream
            .option("checkpointLocation", ckpt)
            .foreachBatch { (b: DataFrame, epochId: Long) =>
              graft.streaming.CartIngest.processBatch(
                b.toDF("doc_id", "text"), root, epochId)
            }.start()
      }
      val out = graft.streaming.CartIngest.readScores(s, root)
        .orderBy(col("doc_id"))
        .localCheckpoint(true) // materialize before the store dir vanishes
      org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(root))
      out
    }),

    // The PLANET candidate-binning arm (maxBins = 8, LIVE at the gated
    // SFs: distinct ntok values ≫ 8 → step > 1 in every level): the
    // 100 TB split-search shape, where the per-(node, feat) argmin
    // grain is capped at maxBins regardless of how many distinct
    // values the seed holds. Left stats stay exact — binning coarsens
    // WHERE the tree may cut, never the counts at a cut.
    "q202_cart_binned_model" -> ((s, d) =>
      cartBinnedTreeTableCached(s, d).orderBy(col("node"))),

    // The binning trade as a gated number (the q200 discipline): at
    // sf0.001 the coarser grid lands different cuts — held-out 292/296
    // vs the exact arm's 295/296; at sf0.01 the filter is live but the
    // rule thresholds sit on kept ranks, so the trees coincide.
    "q203_cart_binned_summary" -> ((s, d) =>
      graft.operators.Classifier.scoreSummary(
          graft.operators.Classifier.scoreTree(
            graft.operators.Classifier.labeledFeatures(Tables.documents(s, d)),
            graft.operators.Classifier.nodesFrom(cartBinnedTreeTableCached(s, d))))
        .orderBy(col("is_seed"), col("teacher"), col("pred"))),
  )

  /** The trained CART tree, cached per (session, dir) — ONE level-wise
    * training serves q198/q199/q200 (the BPE caching discipline). The
    * cached artifact is the model TABLE (≤ 2^depth rows); the driver-side
    * Node view is a bounded collect off it. */
  private def cartTreeTableCached(s: SparkSession, d: String): DataFrame =
    graft.core.SessionCache(s, s"carttree|$d")(
      graft.operators.Classifier.treeTable(s,
        graft.operators.Classifier.trainTree(
          graft.operators.Classifier.labeledFeatures(Tables.documents(s, d)))))

  private def cartTreeCached(s: SparkSession, d: String)
      : Seq[graft.operators.Classifier.Node] =
    graft.operators.Classifier.nodesFrom(cartTreeTableCached(s, d))

  /** The 8-bin tree (q202/q203), cached like the exact one. */
  private def cartBinnedTreeTableCached(s: SparkSession, d: String): DataFrame =
    graft.core.SessionCache(s, s"carttree8|$d")(
      graft.operators.Classifier.treeTable(s,
        graft.operators.Classifier.trainTree(
          graft.operators.Classifier.labeledFeatures(Tables.documents(s, d)),
          maxBins = 8L)))

  def oracleSql: Map[String, String] = Map(

    "q14_top_tokens" ->
      s"""SELECT word, count(*) AS n_hits FROM (
         | SELECT unnest($toksSql) AS word FROM documents)
         |GROUP BY word ORDER BY n_hits DESC, word LIMIT 50""".stripMargin,

    "q15_text_stats" ->
      s"""WITH t AS (SELECT doc_id, text, $toksSql AS toks FROM documents),
         |s AS (SELECT doc_id, text, toks,
         |  $punctRawSql AS punct_raw,
         |  $stopRawSql AS stop_raw,
         |  $meanRawSql AS mean_raw,
         |  $asciiRawSql AS ascii_raw
         | FROM t)
         |SELECT doc_id,
         | CAST(len(toks) AS BIGINT) AS n_tokens,
         | CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]')) AS BIGINT) AS n_bpeish,
         | round(punct_raw, 6) AS punct_ratio,
         | round(stop_raw, 6) AS stop_ratio,
         | round(mean_raw, 6) AS mean_tok_len,
         | round(least(CAST(len(toks) AS DOUBLE) / 50.0, 1.0) * 0.4
         |   + greatest(0.0, 1.0 - punct_raw * 4) * 0.4
         |   + least(stop_raw * 5, 1.0) * 0.2, 6) AS quality,
         | $langSql AS lang_pred
         |FROM s ORDER BY doc_id""".stripMargin,

    "q16_lang_dist" ->
      s"""WITH t AS (SELECT doc_id, text, $toksSql AS toks FROM documents),
         |s AS (SELECT $stopRawSql AS stop_raw, $asciiRawSql AS ascii_raw FROM t)
         |SELECT $langSql AS lang_pred, count(*) AS n_docs
         |FROM s GROUP BY 1 ORDER BY 1""".stripMargin,

    // ------------- per-doc profiling / sessionization (round 3) ------------

    "q67_pii_redact" ->
      s"""WITH a AS (SELECT doc_id, text || ' contact user' || CAST(doc_id AS VARCHAR)
         |  || '@mail.example.com or 10.' || CAST(doc_id % 200 AS VARCHAR)
         |  || '.0.' || CAST(doc_id % 256 AS VARCHAR) || ' now' AS text FROM documents),
         |e AS (SELECT doc_id,
         |  regexp_replace(text, '${TextProfile.EmailRe}', '<EMAIL>', 'g') AS t1,
         |  len(regexp_extract_all(text, '${TextProfile.EmailRe}')) AS n_email FROM a)
         |SELECT doc_id, CAST(n_email AS BIGINT) AS n_email,
         | CAST(len(regexp_extract_all(t1, '${TextProfile.Ipv4Re}')) AS BIGINT) AS n_ip,
         | md5(regexp_replace(t1, '${TextProfile.Ipv4Re}', '<IP>', 'g')) AS redacted_fp
         |FROM e ORDER BY doc_id""".stripMargin,

    "q68_repetition" ->
      s"""WITH toks2 AS (SELECT doc_id, $toksSql AS w FROM documents),
         |g3 AS (SELECT doc_id, unnest($sh3Sql) AS sh FROM toks2),
         |d3 AS (SELECT doc_id,
         |  round(1.0 - CAST(count(DISTINCT sh) AS DOUBLE) / count(*), 6) AS dup_3gram_frac
         | FROM g3 GROUP BY 1),
         |g2 AS (SELECT doc_id, unnest($sh2Sql) AS sh FROM toks2),
         |c2 AS (SELECT doc_id, sh, count(*) AS c FROM g2 GROUP BY 1, 2),
         |t2 AS (SELECT doc_id,
         |  round(CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE), 6) AS top_2gram_frac
         | FROM c2 GROUP BY 1)
         |SELECT doc_id, dup_3gram_frac, top_2gram_frac
         |FROM d3 JOIN t2 USING (doc_id) ORDER BY doc_id""".stripMargin,

    "q69_tfidf" ->
      s"""WITH t AS (SELECT doc_id, unnest($toksSql) AS term FROM documents),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY 1, 2),
         |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
         |n AS (SELECT count(*) AS n_docs FROM documents),
         |sc AS (SELECT doc_id, term, CAST(tf AS DOUBLE) *
         |   (ln((CAST(n_docs AS DOUBLE) + 1.0) / (CAST(df AS DOUBLE) + 1.0)) + 1.0) AS score
         | FROM tf JOIN df USING (term) CROSS JOIN n),
         |r AS (SELECT doc_id, term, score,
         |  row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rank FROM sc)
         |SELECT doc_id, term, round(score, 6) AS score, rank
         |FROM r WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,

    // unigram/bigram vocabulary coverage, token-for-token with
    // TextProfile.oovProfile (0-token docs collapse identically: empty
    // unigrams, one empty-string bigram shingle, dropped by the a1⋈a2)
    "q96_oov_quality" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS w FROM documents),
         |tok1 AS (SELECT doc_id, unnest(w) AS g FROM t WHERE doc_id >= 50),
         |v1 AS (SELECT DISTINCT unnest(w) AS g FROM t WHERE doc_id < 50),
         |a1 AS (SELECT doc_id, count(*) AS n_tok,
         |  CAST(sum(CASE WHEN v1.g IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_tok_oov
         | FROM tok1 LEFT JOIN v1 ON tok1.g = v1.g GROUP BY 1),
         |tok2 AS (SELECT doc_id, unnest(${shNSql(2)}) AS g FROM t WHERE doc_id >= 50),
         |v2 AS (SELECT DISTINCT unnest(${shNSql(2)}) AS g FROM t WHERE doc_id < 50),
         |a2 AS (SELECT doc_id, count(*) AS n_bigram,
         |  CAST(sum(CASE WHEN v2.g IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_bigram_oov
         | FROM tok2 LEFT JOIN v2 ON tok2.g = v2.g GROUP BY 1)
         |SELECT a1.doc_id, n_tok, n_tok_oov,
         |  round(CAST(n_tok_oov AS DOUBLE) / n_tok, 6) AS tok_oov_frac,
         |  n_bigram, n_bigram_oov,
         |  round(CAST(n_bigram_oov AS DOUBLE) / n_bigram, 6) AS bigram_oov_frac
         |FROM a1 JOIN a2 ON a1.doc_id = a2.doc_id ORDER BY 1""".stripMargin,

    // Same whitespace tokens, same corpus unigram p, same per-token
    // 6 dp rounding before exact DECIMAL summation as
    // TextProfile.unigramSurprisal.
    "q128_unigram_surprisal" ->
      s"""WITH $surprisalCtes
         |SELECT doc_id, n_toks, surprisal_u FROM srp ORDER BY doc_id""".stripMargin,

    // q128's surprisal ranked by (surprisal, doc_id) — a total order, so
    // row_number is deterministic — then equal-population integer banding
    "q143_perplexity_bands" ->
      s"""WITH $surprisalCtes,
         |r AS (SELECT doc_id, surprisal_u,
         |    row_number() OVER (ORDER BY surprisal_u, doc_id) AS rank,
         |    count(*) OVER () AS n FROM srp)
         |SELECT doc_id, surprisal_u, rank, 1 + ((rank - 1) * 3) // n AS band
         |FROM r ORDER BY doc_id""".stripMargin,

    // signals mirror TextFunctions / q68's CTEs; every threshold compares
    // the 6-dp-ROUNDED signal, same as the Spark side
    "q131_gopher_filter" ->
      s"""WITH $gopherCtes
         |SELECT doc_id, n_words, mean_word_len, n_stop_distinct,
         | dup_3gram_frac, top_2gram_frac,
         | (ok_words AND ok_word_len AND ok_stopwords AND ok_dup AND ok_top) AS keep,
         | CASE WHEN ok_words AND ok_word_len AND ok_stopwords AND ok_dup AND ok_top THEN '-'
         |  ELSE array_to_string(list_filter(
         |   [CASE WHEN NOT ok_words THEN 'words' END,
         |    CASE WHEN NOT ok_word_len THEN 'word_len' END,
         |    CASE WHEN NOT ok_stopwords THEN 'stopwords' END,
         |    CASE WHEN NOT ok_dup THEN 'dup_3gram' END,
         |    CASE WHEN NOT ok_top THEN 'top_2gram' END], x -> x IS NOT NULL), ',')
         | END AS reasons
         |FROM r ORDER BY doc_id""".stripMargin,

    // one fixed parenthesization of the smoothed ratio; per-token ln
    // rounded to 6 dp then DECIMAL-summed — q128's exactness trick; the
    // mean emitted as a TRUNCATED signed µ-nat integer (div/// truncate
    // identically), which closed the former sf0.1 round()-tie edge
    "q132_importance_weight" ->
      s"""$importanceCtes
         |SELECT doc_id, n_toks, importance_u FROM iw ORDER BY doc_id""".stripMargin,

    // the full KN training chain (vocab → unk pooling → bigram/context/
    // continuation counts → interpolated probability) replayed; head
    // under the (floored nano-p desc, u, w) total order — ordinal ORDER
    // BY so the aliases, not pm's raw columns, drive the sort
    "q184_kn_bigram_model" ->
      s"""WITH $knCtes
         |SELECT ${knRenderSql("u")} AS u, ${knRenderSql("w")} AS w,
         |  c, CAST(floor(p * 1000000000.0) AS BIGINT) AS p_nano
         |FROM pm ORDER BY 4 DESC, 1, 2 LIMIT 200""".stripMargin,

    // same chain, scoring side: per-bigram −ln p rounded to 6 dp,
    // DECIMAL-summed per doc, mean emitted as a FLOORED micro-nat
    // integer — integer ratios land on exact .5s where the engines'
    // round() disagree (NgramLm.knScore doc)
    "q185_kn_xent" -> knXentOracle,

    // the ingest-accreted scores must equal the batch scoring pass —
    // ONE oracle text shared with q185 so the twins can never silently
    // diverge
    "q188_stream_kn_score" -> knXentOracle,

    // trigram model head: same total order and floored nano-probability
    // as q184, one order up
    "q194_kn3_model" ->
      s"""WITH $kn3Ctes
         |SELECT ${knRenderSql("u1")} AS u1, ${knRenderSql("u2")} AS u2,
         |  ${knRenderSql("w")} AS w,
         |  c3, CAST(floor(p * 1000000000.0) AS BIGINT) AS p_nano
         |FROM pm3 ORDER BY 5 DESC, 1, 2, 3 LIMIT 200""".stripMargin,

    // trigram scoring: per-trigram −ln p rounded to 6 dp, DECIMAL-summed
    // per doc, floored µ-nat integer — q185's tie-free discipline
    "q195_kn3_xent" ->
      s"""WITH $kn3Ctes,
         |sc AS (SELECT doc_id, CAST(round(-ln(p), 6) AS DECIMAL(28,6)) AS s
         |  FROM tgs JOIN pm3 USING (u1, u2, w))
         |SELECT doc_id, count(*) AS n_trigrams,
         |  CAST(sum(s) * 1000000 AS BIGINT) // count(*) AS xent_unats
         |FROM sc GROUP BY 1 ORDER BY 1""".stripMargin,

    // The full level-wise CART build replayed: per level, candidate
    // (node, feat, value) class counts, the windowed cumulative left
    // stats, the IEEE split score on exact-integer operands, the
    // (score, feat, thr) argmin, and the re-assignment — then splits ∪
    // leaves as the model table. Mirrors Classifier.trainTree
    // level-for-level.
    "q198_cart_distill_model" -> cartModelSql(0),

    // the PLANET candidate-binning arm replayed: same chain with the
    // rank % ceil-div(distinct, 8) filter live in every level
    "q202_cart_binned_model" -> cartModelSql(8),

    // All docs routed through the trained splits (the same b1/b2/b3),
    // prediction = landed leaf's majority label.
    "q199_cart_distill_score" -> cartScoreSql,

    // the ingest twin accretes the SAME rows (q188's shared-oracle
    // contract applied to the frozen tree)
    "q201_stream_cart_score" -> cartScoreSql,

    // q199 aggregated to the gated generalization number.
    "q200_cart_distill_summary" -> cartSummarySql(0),

    // the binning trade measured: same summary under the 8-bin tree
    // (sf0.001: held-out 292/296 vs the exact arm's 295/296 — a real
    // coarsening cost; sf0.01: the filter is live but the tree lands
    // on the same cuts)
    "q203_cart_binned_summary" -> cartSummarySql(8),
  )

  /** One CART level: candidates over the frontier (node ∈ [2^(k−1), 2^k)),
    * cumulative left stats, per-node (score, feat, thr) argmin, then the
    * next assignment. `a1` is seeded by [[cartCtes]]. `bins > 0` adds the
    * PLANET candidate-binning filter (rank % ⌈distinct/bins⌉ = 0 —
    * mirrors Classifier.trainTree's maxBins arm; left stats stay exact,
    * computed before the filter). */
  private def cartLevel(k: Int, bins: Int = 0): String = {
    val lo = 1 << (k - 1)
    val hi = 1 << k
    val binf = if (bins > 0) s" AND rn % ((nv + $bins - 1) // $bins) = 0" else ""
    s"""c$k AS (SELECT node, j, v,
       |    CAST(sum(CASE WHEN label = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cp,
       |    CAST(sum(CASE WHEN label = -1 THEN 1 ELSE 0 END) AS BIGINT) AS cn
       |  FROM (SELECT a.node, u.j AS j, a.feats[u.j + 1] AS v, a.label
       |        FROM a$k a CROSS JOIN range(11) u(j)
       |        WHERE a.node >= $lo AND a.node < $hi)
       |  GROUP BY 1, 2, 3),
       |m$k AS (SELECT node, j, v,
       |    sum(cp) OVER w AS pL, sum(cn) OVER w AS nL,
       |    sum(cp) OVER wa AS p, sum(cn) OVER wa AS n,
       |    max(v) OVER wa AS vmax,
       |    row_number() OVER (PARTITION BY node, j ORDER BY v) AS rn,
       |    count(*) OVER wa AS nv
       |  FROM c$k
       |  WINDOW w AS (PARTITION BY node, j ORDER BY v ROWS UNBOUNDED PRECEDING),
       |         wa AS (PARTITION BY node, j)),
       |b$k AS (SELECT node, j, v, p, n FROM (
       |    SELECT node, j, v, p, n,
       |      row_number() OVER (PARTITION BY node ORDER BY
       |        CAST((sL*sL - pL*pL - nL*nL) * sR + (sR*sR - pR*pR - nR*nR) * sL AS DOUBLE)
       |          / CAST(sL * sR AS DOUBLE), j, v) AS rk
       |    FROM (SELECT node, j, v, pL, nL, p, n,
       |        pL + nL AS sL, (p + n) - (pL + nL) AS sR,
       |        p - pL AS pR, n - nL AS nR
       |      FROM m$k WHERE v < vmax AND p > 0 AND n > 0$binf))
       |  WHERE rk = 1),
       |a${k + 1} AS (SELECT a.doc_id, a.feats, a.label,
       |    CASE WHEN b.node IS NULL THEN a.node
       |         WHEN a.feats[b.j + 1] <= b.v THEN 2 * a.node
       |         ELSE 2 * a.node + 1 END AS node
       |  FROM a$k a LEFT JOIN b$k b ON a.node = b.node)""".stripMargin
  }

  /** Features + teacher + seed gate + the three training levels. The
    * feature plan mirrors Classifier.labeledFeatures: [ntok,
    * 10·nstop−ntok, 8·ntok−sumlen] ++ 8 md5-hashed bucket counts. */
  private lazy val cartCtes: String = cartCtesWith(0)

  private def cartCtesWith(bins: Int): String =
    s"""t AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |tb AS (SELECT doc_id,
       |  CAST(len(toks) AS BIGINT) AS ntok,
       |  CAST(coalesce(list_sum(list_transform(toks, x -> CAST(len(x) AS BIGINT))), 0) AS BIGINT) AS sumlen,
       |  CAST(len(list_filter(toks, x -> lower(x) IN $stopListSql)) AS BIGINT) AS nstop,
       |  list_transform(toks, tk -> ${hexLongSql("tk")} % 8) AS bks
       |  FROM t),
       |f AS (SELECT doc_id,
       |  [ntok, 10 * nstop - ntok, 8 * ntok - sumlen] ||
       |    list_transform(range(8), j -> CAST(len(list_filter(bks, b -> b = j)) AS BIGINT)) AS feats,
       |  CAST(CASE WHEN ntok >= 20 AND nstop * 10 >= ntok AND sumlen <= ntok * 8
       |       THEN 1 ELSE -1 END AS BIGINT) AS label,
       |  CAST(${hexLongSql("CAST(doc_id AS VARCHAR)")} % 1000000 < 400000 AS BIGINT) AS is_seed
       |  FROM tb),
       |a1 AS (SELECT doc_id, feats, label, CAST(1 AS BIGINT) AS node
       |  FROM f WHERE is_seed = 1),
       |${cartLevel(1, bins)},
       |${cartLevel(2, bins)},
       |${cartLevel(3, bins)}""".stripMargin

  /** `lv(node, p, n)` — per-leaf class totals off the final seed
    * assignment (every node surviving in a4 is a leaf: split nodes'
    * rows all moved to children). */
  private lazy val cartLeafCte: String =
    s"""lv AS (SELECT node,
       |  CAST(sum(CASE WHEN label = 1 THEN 1 ELSE 0 END) AS BIGINT) AS p,
       |  CAST(sum(CASE WHEN label = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n
       |  FROM a4 GROUP BY node)""".stripMargin

  private lazy val cartSplitRowsSql: String =
    (1 to 3).map(k =>
      s"""SELECT node, 'split' AS kind, CAST(j AS BIGINT) AS feat,
         |    v AS thr, CAST(NULL AS BIGINT) AS label,
         |    CAST(p AS BIGINT) AS n_pos, CAST(n AS BIGINT) AS n_neg FROM b$k""".stripMargin)
      .mkString("\n  UNION ALL\n  ")

  /** Model-table oracle for the exact (bins = 0) and binned arms. */
  private def cartModelSql(bins: Int): String =
    s"""WITH ${cartCtesWith(bins)},
       |$cartLeafCte
       |SELECT node, kind, feat, thr, label, n_pos, n_neg FROM (
       |  ${cartSplitRowsSql}
       |  UNION ALL
       |  SELECT node, 'leaf' AS kind, CAST(NULL AS BIGINT) AS feat,
       |    CAST(NULL AS BIGINT) AS thr,
       |    CAST(CASE WHEN 2 * p > p + n THEN 1 ELSE -1 END AS BIGINT) AS label,
       |    p AS n_pos, n AS n_neg FROM lv)
       |ORDER BY node""".stripMargin

  /** Agreement-summary oracle for the exact and binned arms. */
  private def cartSummarySql(bins: Int): String =
    s"""WITH ${cartCtesWith(bins)},
       |$cartLeafCte,
       |$cartScoreCtes
       |SELECT s.is_seed, s.label AS teacher,
       |  CAST(CASE WHEN 2 * lv.p > lv.p + lv.n THEN 1 ELSE -1 END AS BIGINT) AS pred,
       |  count(*) AS n_docs, CAST(sum(s.doc_id) AS BIGINT) AS sum_ids
       |FROM s4 s JOIN lv ON s.node = lv.node
       |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin

  /** ONE scoring oracle shared verbatim by q199 (batch) and q201 (the
    * ingest twin) — the q185/q188 contract. */
  private lazy val cartScoreSql: String =
    s"""WITH $cartCtes,
       |$cartLeafCte,
       |$cartScoreCtes
       |SELECT s.doc_id, s.node AS leaf,
       |  CAST(CASE WHEN 2 * lv.p > lv.p + lv.n THEN 1 ELSE -1 END AS BIGINT) AS pred,
       |  s.label AS teacher, s.is_seed
       |FROM s4 s JOIN lv ON s.node = lv.node
       |ORDER BY s.doc_id""".stripMargin

  /** ALL docs routed through b1/b2/b3 — the corpus-wide scoring walk. */
  private lazy val cartScoreCtes: String = {
    def step(k: Int) =
      s"""s${k + 1} AS (SELECT s.doc_id, s.feats, s.label, s.is_seed,
         |    CASE WHEN b.node IS NULL THEN s.node
         |         WHEN s.feats[b.j + 1] <= b.v THEN 2 * s.node
         |         ELSE 2 * s.node + 1 END AS node
         |  FROM s$k s LEFT JOIN b$k b ON s.node = b.node)""".stripMargin
    s"""s1 AS (SELECT doc_id, feats, label, is_seed, CAST(1 AS BIGINT) AS node FROM f),
       |${step(1)},
       |${step(2)},
       |${step(3)}""".stripMargin
  }

  private lazy val knXentOracle: String =
    s"""WITH $knCtes,
       |sc AS (SELECT doc_id, CAST(round(-ln(p), 6) AS DECIMAL(28,6)) AS s
       |  FROM bgs JOIN pm USING (u, w))
       |SELECT doc_id, count(*) AS n_bigrams,
       |  CAST(sum(s) * 1000000 AS BIGINT) // count(*) AS xent_unats
       |FROM sc GROUP BY 1 ORDER BY 1""".stripMargin
}
