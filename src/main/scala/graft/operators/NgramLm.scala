package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-trained interpolated Kneser–Ney BIGRAM language model — the
  * real perplexity quality filter of the CCNet family, one model order up
  * from [[TextProfile.unigramSurprisal]] (q128). CCNet scores documents
  * with an n-gram LM and drops the tails; the unigram surprisal proxy
  * cannot see word ORDER ("the the the the" scores as well as fluent
  * text built from the same words). This is the public formulation
  * (Kneser & Kneser–Ney 1995; Chen & Goodman 1998, interpolated form
  * with one fixed discount):
  *
  *   p(w|u) = max(c(u,w) − D, 0) / c(u)  +  λ(u) · p_cont(w)
  *   λ(u)   = D · N1+(u,·) / c(u)
  *   p_cont(w) = N1+(·,w) / B
  *
  * with c(u,w) the bigram count, N1+(u,·) the number of distinct
  * continuations of u, N1+(·,w) the number of distinct contexts w
  * follows, B the number of distinct bigram types and D = 0.75 (the
  * textbook discount). Self-trained on the scored corpus itself — the
  * same no-external-model stance as q128/q132.
  *
  * VOCABULARY PRUNING (min-count): tokens with corpus count < `minCount`
  * pool into one `<unk>` symbol BEFORE counting, the standard LM recipe
  * and this operator's cap discipline — the model's term space is
  * bounded by the observed-twice vocabulary, never the raw token space,
  * and hapax noise (OCR junk, random ids) shares one distribution.
  * Hapaxes exist at every corpus scale, so the pruning is structurally
  * ACTIVE at the gated SFs. Each document is one <s> … </s> sequence, so
  * every document produces n_tokens+1 scored bigrams (an empty document
  * still scores the single (<s>,</s>) event).
  *
  * Sentinels are control characters (U+0001 unk / U+0002 bos /
  * U+0003 eos — the [[Bpe]] sentinel argument: they cannot appear in a
  * whitespace token of real text, and both engines treat them as plain
  * one-char strings even if they did). Outputs render them as `<unk>`,
  * `<s>`, `</s>`.
  *
  * CROSS-ENGINE EXACTNESS (the DuckDB oracle compares hashes): every
  * count is an exact BIGINT below 2^53, so the probability — assembled
  * with ONE fixed parenthesization of IEEE double ops — is bit-identical
  * in Spark and DuckDB; each bigram's −ln p rounds to 6 dp before an
  * exact DECIMAL per-document summation (q128's discipline — double
  * summation order never matters), and every RATIO of those exact
  * integers is emitted as an integer floor, never a rounded double
  * (integer ratios land on exact decimal .5s, where the engines' round()
  * disagree — see [[knScore]]).
  *
  * Scale: the model is three aggregates OF the bigram-type table (bg is
  * (u,w)-grain, map-side combined from the corpus stream; ctx/cont/B are
  * aggregates of bg — term-grain, tiny). Scoring is ONE equi-join of the
  * corpus bigram stream against the assembled bigram-grain model
  * (Catalyst broadcasts it when it fits, hash-joins on (u,w) past that;
  * a hot bigram costs one fat reduce task at worst — model rows are one
  * per type), then a doc-grain aggregate out. Never doc×doc, no global
  * sort, linear in corpus tokens. The model table is localCheckpoint'ed:
  * scoring and the model head both read it, and un-materialized each
  * consumer would re-run the corpus explode + three aggregates. */
object NgramLm {

  private[graft] val Unk = "\u0001"
  private[graft] val Bos = "\u0002"
  private[graft] val Eos = "\u0003"

  /** Textbook discount; exactly representable in binary, so the double
    * chain stays engine-exact. */
  val Discount = 0.75

  private def tokens(text: Column): Column =
    graft.functions.TextFunctions.tokens(text)

  /** The corpus bigram stream (doc_id, u, w) with min-count unk pooling:
    * raw <s>-…-</s> bigrams, each real-token side left-joined against the
    * count ≥ minCount vocabulary and pooled to `<unk>` on a miss.
    * localCheckpointed — ONE artifact feeding both the model counts and
    * the scoring join (and cacheable per (session, dir) by gate runners,
    * the BPE-vocab discipline: train once, serve every consumer). */
  def bigramStream(docs: DataFrame, minCount: Long = 2,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    mappedBigrams(docs, minCount, idCol, textCol).localCheckpoint(true)

  private def mappedBigrams(docs: DataFrame, minCount: Long,
      idCol: String, textCol: String): DataFrame =
    bigramStreamWith(docs, trainVocab(docs, minCount, textCol), idCol, textCol)

  /** The count ≥ minCount vocabulary (tok) — the model's term space; a
    * frozen model persists this next to its bigram counts so arriving
    * text unk-pools under the SAME rule it was trained with. */
  def trainVocab(docs: DataFrame, minCount: Long = 2,
      textCol: String = "text"): DataFrame =
    docs.select(explode(tokens(col(textCol))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      .where(col("cnt") >= minCount)
      .select(col("tok"))
      .localCheckpoint(true)

  /** The bigram stream of `docs` unk-pooled under a GIVEN vocabulary —
    * the scoring-side mapper of a frozen model ([[graft.streaming
    * .KnIngest]] maps each arriving micro-batch with the trained
    * vocab); [[bigramStream]] is the self-trained composition. */
  def bigramStreamWith(docs: DataFrame, vocab: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    // the frame symbols are exempt from unk pooling BY POSITION, never by
    // VALUE (ADVICE r16): a data token that happens to contain U+0002/
    // U+0003 (not whitespace, so the tokenizer passes it through) must
    // pool by vocab membership exactly like any other token — the oracle
    // pools data tokens before concatenating the frame, and a value-based
    // escape let input data claim sentinel identity and diverge. Position
    // 1's u is the frame <s> and the last position's w is the frame </s>;
    // every other side is a data token.
    val sq = concat(array(lit(Bos)), tokens(col(textCol)), array(lit(Eos)))
    val raw = docs.select(col(idCol),
        explode(transform(sequence(lit(1), size(sq) - 1),
          j => struct(element_at(sq, j).as("u"), element_at(sq, j + 1).as("w"),
            (j === 1).as("f"), (j === size(sq) - 1).as("l"))))
          .as("p"))
      .select(col(idCol), col("p.u").as("u_raw"), col("p.w").as("w_raw"),
        col("p.f").as("_u_frame"), col("p.l").as("_w_frame"))
    raw
      .join(vocab.select(col("tok").as("u_raw"), lit(1).as("_u_in")),
        Seq("u_raw"), "left")
      .join(vocab.select(col("tok").as("w_raw"), lit(1).as("_w_in")),
        Seq("w_raw"), "left")
      .select(col(idCol),
        when(col("_u_frame") || col("_u_in").isNotNull, col("u_raw"))
          .otherwise(lit(Unk)).as("u"),
        when(col("_w_frame") || col("_w_in").isNotNull, col("w_raw"))
          .otherwise(lit(Unk)).as("w"))
  }

  /** The assembled bigram-grain model (u, w, c, cu, n1f, n1p, b, p)
    * over a [[bigramStream]] — materialized once; [[knScoreFrom]] and
    * [[knModelTopFrom]] both read it. */
  def knModel(stream: DataFrame, discount: Double = Discount): DataFrame = {
    val bg = stream.groupBy(col("u"), col("w"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    val ctx = bg.groupBy(col("u"))
      .agg(sum(col("c")).as("cu"), count(lit(1)).as("n1f"))
    val cont = bg.groupBy(col("w")).agg(count(lit(1)).as("n1p"))
    val btot = bg.agg(count(lit(1)).as("b"))
    bg.join(ctx, Seq("u")).join(cont, Seq("w"))
      .crossJoin(broadcast(btot))
      .withColumn("p", knProb(col("c"), discount))
      .localCheckpoint(true)
  }

  /** The interpolated-KN probability with ONE pinned parenthesization —
    * shared by the self-trained model and the frozen-model scorer so the
    * double chain can never fork. Reads cu/n1f/n1p/b from the enclosing
    * plan's columns. */
  private def knProb(c: Column, discount: Double): Column = {
    val d = lit(discount)
    (greatest(c.cast("double") - d, lit(0.0))
        / col("cu").cast("double")) +
      (((d * col("n1f").cast("double")) / col("cu").cast("double"))
        * (col("n1p").cast("double") / col("b").cast("double")))
  }

  /** Score a bigram stream against FROZEN bigram counts (u, w, c) — the
    * ingest-side scorer: the context/continuation/total tables are
    * re-derived from the frozen counts (type-grain, cheap), the pair
    * join is LEFT (an unseen pair carries the backoff mass alone:
    * max(0−D, 0) = 0, so p = λ(u)·p_cont(w) — real interpolated KN, not
    * a special case), and an arriving context or continuation symbol
    * missing from the model fails LOUDLY per row instead of silently
    * dropping the bigram (only possible when the training corpus had no
    * hapax, i.e. no `<unk>` state — a misuse, not a data condition). */
  def knScoreAgainst(stream: DataFrame, bg: DataFrame,
      discount: Double = Discount, idCol: String = "doc_id"): DataFrame = {
    val ctx = bg.groupBy(col("u"))
      .agg(sum(col("c")).as("cu"), count(lit(1)).as("n1f"))
    val cont = bg.groupBy(col("w")).agg(count(lit(1)).as("n1p"))
    val btot = bg.agg(count(lit(1)).as("b"))
    val guard = (side: String, c: Column) => when(c.isNull,
      raise_error(lit(s"KnIngest: $side symbol missing from the frozen " +
        "model (trained without <unk>?)"))).otherwise(c)
    stream.join(bg, Seq("u", "w"), "left")
      .join(ctx, Seq("u"), "left")
      .join(cont, Seq("w"), "left")
      .crossJoin(broadcast(btot))
      .withColumn("cu", guard("context", col("cu")))
      .withColumn("n1p", guard("continuation", col("n1p")))
      .withColumn("p", knProb(coalesce(col("c"), lit(0L)), discount))
      .withColumn("s", round(-log(col("p")), 6).cast("decimal(28,6)"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("s")).as("sum_s"))
      .select(col(idCol), col("n_bigrams"),
        expr("CAST(sum_s * 1000000 AS BIGINT) div n_bigrams")
          .as("xent_unats"))
  }

  /** Per-document KN cross-entropy (doc_id, n_bigrams, xent_unats): the
    * mean over the document's <s>…</s> bigrams of −ln p(w|u), in
    * MICRO-NATS, floored — LOW = fluent/templated, HIGH = disordered or
    * rare-token soup; production screens band on this column exactly as
    * q143 bands q128.
    *
    * Why an integer, not a rounded double: the per-bigram 6 dp surprisal
    * sum is an exact micro-nat integer, so the mean is a RATIONAL whose
    * decimal expansion routinely lands on an exact .5 at any rounding
    * scale — and Spark rounds the binary double down where DuckDB rounds
    * the decimal view up (measured: 94940034/28 µnats → 3.390715 vs
    * 3.390716). Integer floor division has no tie to disagree on. */
  def knScore(docs: DataFrame, minCount: Long = 2, discount: Double = Discount,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val stream = bigramStream(docs, minCount, idCol, textCol)
    knScoreFrom(stream, knModel(stream, discount), idCol)
  }

  /** [[knScore]] over a prebuilt stream + model (so gate runners can
    * train once per corpus and serve both the head and the scoring
    * gate). */
  def knScoreFrom(stream: DataFrame, model: DataFrame,
      idCol: String = "doc_id"): DataFrame =
    stream.join(model.select(col("u"), col("w"), col("p")), Seq("u", "w"))
      // inner: self-trained, every stream bigram is a model type
      .withColumn("s", round(-log(col("p")), 6).cast("decimal(28,6)"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("s")).as("sum_s"))
      .select(col(idCol), col("n_bigrams"),
        expr("CAST(sum_s * 1000000 AS BIGINT) div n_bigrams")
          .as("xent_unats"))

  // ------------------------------------------------ trigram KN (order 3) --

  /** The corpus TRIGRAM stream (doc_id, u1, u2, w) — the order-3 twin of
    * [[bigramStreamWith]] (round-17, VERDICT r16 #5: the CCNet-family
    * screens run KenLM at order 5; this is one order up the same
    * type-table design). Framing is the standard DOUBLE-BOS sentence:
    * (<s>, <s>, w1), (<s>, w1, w2), …, (w_{n−1}, w_n, </s>) — n+1 events
    * per document, an empty document scoring the single
    * (<s>, <s>, </s>) event. Frame symbols are exempt from unk pooling
    * BY POSITION (u1 at j ≤ 2, u2 at j = 1, w at the last slot), data
    * tokens pool purely by vocab membership — the bigram fix's contract,
    * applied from birth here. */
  def trigramStreamWith(docs: DataFrame, vocab: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val sq = concat(array(lit(Bos), lit(Bos)), tokens(col(textCol)),
      array(lit(Eos)))
    val raw = docs.select(col(idCol),
        explode(transform(sequence(lit(1), size(sq) - 2),
          j => struct(
            element_at(sq, j).as("u1"), element_at(sq, j + 1).as("u2"),
            element_at(sq, j + 2).as("w"),
            (j <= 2).as("f1"), (j === 1).as("f2"),
            (j === size(sq) - 2).as("fw"))))
          .as("p"))
      .select(col(idCol),
        col("p.u1").as("u1_raw"), col("p.u2").as("u2_raw"),
        col("p.w").as("w_raw"),
        col("p.f1").as("_u1_frame"), col("p.f2").as("_u2_frame"),
        col("p.fw").as("_w_frame"))
    raw
      .join(vocab.select(col("tok").as("u1_raw"), lit(1).as("_u1_in")),
        Seq("u1_raw"), "left")
      .join(vocab.select(col("tok").as("u2_raw"), lit(1).as("_u2_in")),
        Seq("u2_raw"), "left")
      .join(vocab.select(col("tok").as("w_raw"), lit(1).as("_w_in")),
        Seq("w_raw"), "left")
      .select(col(idCol),
        when(col("_u1_frame") || col("_u1_in").isNotNull, col("u1_raw"))
          .otherwise(lit(Unk)).as("u1"),
        when(col("_u2_frame") || col("_u2_in").isNotNull, col("u2_raw"))
          .otherwise(lit(Unk)).as("u2"),
        when(col("_w_frame") || col("_w_in").isNotNull, col("w_raw"))
          .otherwise(lit(Unk)).as("w"))
  }

  /** Self-trained composition (train vocab + map), localCheckpointed —
    * ONE artifact feeding the model counts and the scoring join. */
  def trigramStream(docs: DataFrame, minCount: Long = 2,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    trigramStreamWith(docs, trainVocab(docs, minCount, textCol),
      idCol, textCol).localCheckpoint(true)

  /** The assembled trigram-grain interpolated-KN model over a
    * [[trigramStream]] — Chen & Goodman 1998's interpolated form with
    * one fixed discount at both backoff orders, LOWER ORDERS FROM
    * CONTINUATION COUNTS (the defining KN property):
    *
    *   p₃(w|u1,u2) = max(c₃−D,0)/c₁₂ + (D·N1+(u1,u2,·)/c₁₂) · p₂(w|u2)
    *   p₂(w|u2)    = max(c₂'−D,0)/t₂ + (D·N1+(u2,·)'/t₂) · p₁(w)
    *   p₁(w)       = N1+(·,·,w)' / B₁
    *
    * with c₃ the trigram count, c₁₂ = Σ_w c₃(u1,u2,w), c₂'(u2,w) =
    * |{u1 : c₃(u1,u2,w)>0}| (continuation count = rows of the trigram
    * TYPE table per (u2,w)), t₂(u2) = Σ_w c₂', and B₁ = |{(u2,w)}| the
    * bigram-type total. Every count is an exact BIGINT; the probability
    * is ONE pinned parenthesization of IEEE doubles (the q184/q185
    * cross-engine discipline).
    *
    * Scale — the point the ×10/×100 legs measure: the model is
    * aggregates OF the (u1,u2,w) TYPE table (tg is map-side combined
    * from the corpus stream; ctx3/c2p/ctx2/uni/B₁ are type-grain, each
    * strictly smaller), so model size grows with trigram TYPES (heavily
    * sublinear in corpus tokens), not with the corpus. Scoring is one
    * (u1,u2,w) equi-join + a doc-grain aggregate, linear in tokens. */
  def kn3Model(stream: DataFrame, discount: Double = Discount): DataFrame = {
    val d = lit(discount)
    val tg = stream.groupBy(col("u1"), col("u2"), col("w"))
      .agg(count(lit(1)).as("c3"))
      .localCheckpoint(true)
    val ctx3 = tg.groupBy(col("u1"), col("u2"))
      .agg(sum(col("c3")).as("c12"), count(lit(1)).as("n1f3"))
    val c2p = tg.groupBy(col("u2"), col("w"))
      .agg(count(lit(1)).as("c2p"))
      .localCheckpoint(true)
    val ctx2 = c2p.groupBy(col("u2"))
      .agg(sum(col("c2p")).as("t2"), count(lit(1)).as("n1f2"))
    val uni = c2p.groupBy(col("w")).agg(count(lit(1)).as("c1p"))
    val b1 = c2p.agg(count(lit(1)).as("b1"))
    val p2 = (greatest(col("c2p").cast("double") - d, lit(0.0))
        / col("t2").cast("double")) +
      (((d * col("n1f2").cast("double")) / col("t2").cast("double"))
        * (col("c1p").cast("double") / col("b1").cast("double")))
    tg.join(ctx3, Seq("u1", "u2")).join(c2p, Seq("u2", "w"))
      .join(ctx2, Seq("u2")).join(uni, Seq("w"))
      .crossJoin(broadcast(b1))
      .withColumn("p2", p2)
      .withColumn("p",
        (greatest(col("c3").cast("double") - d, lit(0.0))
            / col("c12").cast("double")) +
          (((d * col("n1f3").cast("double")) / col("c12").cast("double"))
            * col("p2")))
      .localCheckpoint(true)
  }

  /** Per-document trigram-KN cross-entropy (doc_id, n_trigrams,
    * xent_unats) over a prebuilt stream + model — q185's integer-µ-nat
    * discipline at order 3 (inner join: self-trained, every stream
    * trigram is a model type). */
  def kn3ScoreFrom(stream: DataFrame, model: DataFrame,
      idCol: String = "doc_id"): DataFrame =
    stream.join(model.select(col("u1"), col("u2"), col("w"), col("p")),
        Seq("u1", "u2", "w"))
      .withColumn("s", round(-log(col("p")), 6).cast("decimal(28,6)"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_trigrams"), sum(col("s")).as("sum_s"))
      .select(col(idCol), col("n_trigrams"),
        expr("CAST(sum_s * 1000000 AS BIGINT) div n_trigrams")
          .as("xent_unats"))

  /** The `k` highest-probability trigram types (u1, u2, w, c3, p_nano)
    * under the (p_nano desc, u1, u2, w) total order — floored
    * nano-probability, TakeOrderedAndProject plan (never a full global
    * sort). */
  def kn3ModelTopFrom(model: DataFrame, k: Int): DataFrame =
    model.select(rendered(col("u1")).as("u1"), rendered(col("u2")).as("u2"),
        rendered(col("w")).as("w"), col("c3"),
        floor(col("p") * lit(1000000000.0)).as("p_nano"))
      .orderBy(col("p_nano").desc, col("u1"), col("u2"), col("w"))
      .limit(k)

  private def rendered(c: Column): Column =
    when(c === Unk, "<unk>").when(c === Bos, "<s>").when(c === Eos, "</s>")
      .otherwise(c)

  /** The `k` highest-probability bigram types (u, w, c, p_nano) under
    * the (p_nano desc, u, w) total order — the model-inspection head;
    * `orderBy + limit` plans as TakeOrderedAndProject (per-partition
    * top-k + one k-row merge), never a full global sort. p is emitted in
    * floored NANO-probability (floor(double) is tie-free across engines,
    * unlike round — see [[knScore]]). */
  def knModelTop(docs: DataFrame, k: Int, minCount: Long = 2,
      discount: Double = Discount,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    knModelTopFrom(
      knModel(bigramStream(docs, minCount, idCol, textCol), discount), k)

  /** [[knModelTop]] over a prebuilt model. */
  def knModelTopFrom(model: DataFrame, k: Int): DataFrame =
    model.select(rendered(col("u")).as("u"), rendered(col("w")).as("w"),
        col("c"), floor(col("p") * lit(1000000000.0)).as("p_nano"))
      .orderBy(col("p_nano").desc, col("u"), col("w"))
      .limit(k)
}
