package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.functions.TextFunctions

/** Quality-classifier distillation — the FineWeb-Edu shape (Penedo et al.
  * 2024: expensive teacher labels exist only on a seed slice → a cheap
  * model scores the whole corpus) realized as a DISTRIBUTED DECISION-TREE
  * trainer with exact split search — the PLANET plan (Panda et al. 2009:
  * level-wise candidate-split statistics as one distributed aggregation
  * per tree level, split choice on the driver). CART split criterion
  * (Breiman et al. 1984: weighted Gini), axis-parallel thresholds.
  *
  * No counterpart in the reference repo — a training-data-pipeline
  * extension. The teacher here is a Gopher-style integer quality rule
  * (token count, stopword density, mean token length — the same screens
  * TextProfile gates) on a hash-gated seed slice; the features hand the
  * tree the three engineered quality stats PLUS `NoiseBuckets` hashed
  * token-count buckets carrying no rule signal, so the gated model table
  * SHOWS the split search selecting signal and rejecting noise.
  *
  * Cross-engine exactness (the DuckDB oracle replays the full build):
  * all counts are integers; the only double is the split score
  * (A·sR + B·sL) / (sL·sR) with A = sL²−ΣpL², B likewise — both engines
  * compute the SAME division on the SAME exact-integer operands, and ties
  * break on the deterministic (score, feat, thr) order. The numerator is
  * bounded by s³ (s = seed rows), kept exactly representable by the
  * [[MaxSeedRows]] guard — past it, bin candidates or thin the seed (the
  * seed is bounded BY PREMISE: teacher labels are the expensive thing).
  *
  * Scale shape: per level, ONE shuffle keyed (node, feat, value) with
  * map-side partial aggregation + a (node, feat)-windowed cumulative sum
  * over candidate grain (≤ seed rows × Width); the driver holds ≤ 2^depth
  * node stats. Scoring is a ZERO-SHUFFLE projection — the tree folds into
  * a nested CASE of plan literals, the distilled model's whole point at
  * 100 TB.
  */
object Classifier {

  /** Hashed token-count buckets with no teacher signal — the noise the
    * split search must reject (and measurably does: the gated model). */
  val NoiseBuckets = 8

  /** ntok, 10·nstop−ntok, 8·ntok−sumlen — the teacher's decision surface
    * is axis-parallel in these (a quality screen IS threshold rules over
    * engineered stats; the trainer recovers the thresholds from labels
    * alone). */
  val QualityFeats = 3

  val Width: Int = QualityFeats + NoiseBuckets

  val DefaultDepth = 3

  /** Seed-slice gate in ppm of the doc_id hash — the "labeled 40 %". */
  val DefaultSeedPpm = 400000L

  /** s³ must stay under 2^53 so the split score's numerator is an exact
    * double; 200k labeled seed docs is far past any affordable teacher. */
  val MaxSeedRows = 200000L

  /** One trained node. `feat`/`thr` set on splits (go left iff
    * feats(feat) ≤ thr, children 2·id / 2·id+1); `label` set on leaves
    * (majority, tie → −1: abstention is rejection in a quality screen). */
  final case class Node(id: Long, kind: String, feat: Option[Long],
      thr: Option[Long], label: Option[Long], nPos: Long, nNeg: Long)

  private def toks(textCol: Column): Column = TextFunctions.tokens(textCol)

  /** The deterministic teacher — ±1, integer-only (density and mean-length
    * screens cross-multiplied so no ratio materializes). */
  def teacherLabel(textCol: Column): Column = {
    val t = toks(textCol)
    val ntok = size(t).cast("long")
    val sumlen = aggregate(t, lit(0L), (acc, x) => acc + length(x).cast("long"))
    val stopArr = array(TextFunctions.stopwords.map(lit): _*)
    val nstop = size(filter(t, x => array_contains(stopArr, lower(x)))).cast("long")
    when(ntok >= 20L && nstop * 10L >= ntok && sumlen <= ntok * 8L, 1L)
      .otherwise(-1L)
  }

  /** (doc_id, feats[Width], label, is_seed) over a documents frame —
    * narrow, shuffle-free, one md5 per token (the engine-portable
    * [[Dedup.md5Long]] the oracle's hex-fold mirrors). */
  def labeledFeatures(
      docs: DataFrame,
      seedPpm: Long = DefaultSeedPpm,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val t = toks(col(textCol))
    val ntok = size(t).cast("long")
    val sumlen = aggregate(t, lit(0L), (acc, x) => acc + length(x).cast("long"))
    val stopArr = array(TextFunctions.stopwords.map(lit): _*)
    val nstop = size(filter(t, x => array_contains(stopArr, lower(x)))).cast("long")
    val bks = transform(t, tok => pmod(Dedup.md5Long(tok), lit(NoiseBuckets.toLong)))
    val noise = transform(sequence(lit(0), lit(NoiseBuckets - 1)),
      j => size(filter(bks, b => b === j.cast("long"))).cast("long"))
    docs.select(col(idCol),
      concat(array(ntok, nstop * 10L - ntok, ntok * 8L - sumlen), noise).as("feats"),
      teacherLabel(col(textCol)).as("label"),
      (pmod(Dedup.md5Long(col(idCol).cast("string")), lit(1000000L)) < seedPpm)
        .cast("long").as("is_seed"))
  }

  /** Level-wise CART build over the seed slice of a [[labeledFeatures]]
    * frame. Per level: one (node, feat, value)-grain aggregate with a
    * windowed cumulative count turning value counts into left-split
    * stats, a per-node lexicographic-min over (score, feat, thr), and a
    * bounded driver collect of ≤ 2^depth winners. Nodes split while they
    * hold both classes and a non-degenerate candidate; everything else
    * leafs out at majority (tie → −1). */
  /** @param maxBins 0 = EXACT search (every distinct value in the node
    * is a candidate — right while the seed is bounded); > 0 = the
    * PLANET/MLlib binning path for large seeds: per (node, feat), only
    * every `step`-th distinct value (step = ⌈distinct/maxBins⌉, ranks
    * `step, 2·step, …` under value-asc order) survives as a candidate,
    * so the argmin grain is ≤ maxBins rows per (node, feat) no matter
    * how many distinct values the seed holds. Left-stats stay EXACT
    * (the cumulative window runs before the bin filter) — binning
    * coarsens WHERE the tree may cut, never the counts at a cut; the
    * q203 gate measures the coarsening's agreement cost against the
    * exact q200. Deterministic: rank and step are integers in both
    * engines. */
  def trainTree(
      labeled: DataFrame,
      maxDepth: Int = DefaultDepth,
      maxBins: Long = 0L): Seq[Node] = {
    require(maxDepth >= 1 && maxDepth <= 10, s"maxDepth out of range: $maxDepth")
    val seed = labeled.where(col("is_seed") === 1L)
      .select(col("feats"), col("label")).localCheckpoint(true)
    val nSeed = seed.count()
    require(nSeed >= 1, "empty seed slice — nothing to train on")
    require(nSeed <= MaxSeedRows,
      s"seed rows $nSeed > $MaxSeedRows: split-score numerator would lose " +
        "exactness — bin candidates or thin the seed")

    val splits = scala.collection.mutable.Map[Long, (Long, Long)]() // id -> (feat, thr)
    val nodes = scala.collection.mutable.ArrayBuffer[Node]()

    // assignment expression under the splits chosen so far
    def nodeExpr(): Column = {
      var e: Column = lit(1L)
      var depth = 0
      while (depth < maxDepth) {
        val frontier = splits.filter { case (id, _) =>
          id >= (1L << depth) && id < (2L << depth) }
        if (frontier.nonEmpty) {
          e = frontier.foldLeft(e) { case (acc, (id, (j, v))) =>
            when(acc === id,
              when(element_at(col("feats"), (j + 1).toInt) <= v,
                lit(2 * id)).otherwise(lit(2 * id + 1)))
              .otherwise(acc)
          }
        }
        depth += 1
      }
      e
    }

    var level = 0
    var frontierIds = Seq(1L)
    while (level < maxDepth && frontierIds.nonEmpty) {
      val asn = seed.withColumn("node", nodeExpr())
        .where(col("node").isin(frontierIds: _*))
      // per-node class totals (bounded collect: |frontier| rows)
      val totals: Map[Long, (Long, Long)] = asn.groupBy(col("node"))
        .agg(sum(when(col("label") === 1L, 1L).otherwise(0L)).as("p"),
          sum(when(col("label") === -1L, 1L).otherwise(0L)).as("n"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      val eligible = frontierIds.filter(id =>
        totals.get(id).exists { case (p, n) => p > 0 && n > 0 })

      val winners: Map[Long, (Long, Long)] =
        if (eligible.isEmpty) Map.empty
        else {
          val cnt = asn.where(col("node").isin(eligible: _*))
            .select(col("node"), col("label"),
              posexplode(col("feats")).as(Seq("j", "v")))
            .groupBy(col("node"), col("j"), col("v"))
            .agg(sum(when(col("label") === 1L, 1L).otherwise(0L)).as("cp"),
              sum(when(col("label") === -1L, 1L).otherwise(0L)).as("cn"))
          val wCum = Window.partitionBy(col("node"), col("j")).orderBy(col("v"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
          val wAll = Window.partitionBy(col("node"), col("j"))
          val binFilter =
            if (maxBins <= 0) lit(true)
            else {
              val rk = row_number().over(
                Window.partitionBy(col("node"), col("j")).orderBy(col("v")))
              val nv = count(lit(1)).over(wAll)
              // integer ceil-div: Column `/` is double division, so floor
              // the exact-in-double quotient back to Long (nv bounded by
              // the seed guard)
              val step = floor((nv + lit(maxBins) - 1L) / lit(maxBins))
              rk % step === 0L
            }
          val cum = cnt
            .withColumn("pL", sum(col("cp")).over(wCum))
            .withColumn("nL", sum(col("cn")).over(wCum))
            .withColumn("p", sum(col("cp")).over(wAll))
            .withColumn("n", sum(col("cn")).over(wAll))
            .withColumn("vmax", max(col("v")).over(wAll))
            .withColumn("keep", binFilter)
            .where(col("v") < col("vmax") && col("keep"))
          val sL = col("pL") + col("nL")
          val sR = col("p") + col("n") - sL
          val pR = col("p") - col("pL")
          val nR = col("n") - col("nL")
          val a = sL * sL - col("pL") * col("pL") - col("nL") * col("nL")
          val b = sR * sR - pR * pR - nR * nR
          val score = (a * sR + b * sL).cast("double") / (sL * sR).cast("double")
          cum.groupBy(col("node"))
            .agg(min(struct(score.as("score"), col("j"), col("v"))).as("best"))
            .select(col("node"), col("best.j"), col("best.v"))
            .collect().map(r => r.getLong(0) -> (r.getInt(1).toLong, r.getLong(2)))
            .toMap
        }

      val nextFrontier = scala.collection.mutable.ArrayBuffer[Long]()
      frontierIds.foreach { id =>
        val (p, n) = totals.getOrElse(id, (0L, 0L))
        winners.get(id) match {
          case Some((j, v)) =>
            splits(id) = (j, v)
            nodes += Node(id, "split", Some(j), Some(v), None, p, n)
            nextFrontier += 2 * id
            nextFrontier += 2 * id + 1
          case None if p + n > 0 =>
            nodes += Node(id, "leaf", None, None,
              Some(if (2 * p > p + n) 1L else -1L), p, n)
          case None => // empty child cannot occur (candidates keep both sides non-empty)
        }
      }
      frontierIds = nextFrontier.toSeq
      level += 1
    }
    // depth-capped frontier leafs out at majority
    if (frontierIds.nonEmpty) {
      val asn = seed.withColumn("node", nodeExpr())
        .where(col("node").isin(frontierIds: _*))
      val totals = asn.groupBy(col("node"))
        .agg(sum(when(col("label") === 1L, 1L).otherwise(0L)).as("p"),
          sum(when(col("label") === -1L, 1L).otherwise(0L)).as("n"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      frontierIds.sorted.foreach { id =>
        totals.get(id).foreach { case (p, n) =>
          nodes += Node(id, "leaf", None, None,
            Some(if (2 * p > p + n) 1L else -1L), p, n)
        }
      }
    }
    nodes.sortBy(_.id).toSeq
  }

  /** The trained tree as the gate's model table. */
  def treeTable(spark: SparkSession, tree: Seq[Node]): DataFrame = {
    val rows = tree.map(nd => Row(nd.id, nd.kind,
      nd.feat.map(Long.box).orNull, nd.thr.map(Long.box).orNull,
      nd.label.map(Long.box).orNull, nd.nPos, nd.nNeg))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(
        StructField("node", LongType, nullable = false),
        StructField("kind", StringType, nullable = false),
        StructField("feat", LongType, nullable = true),
        StructField("thr", LongType, nullable = true),
        StructField("label", LongType, nullable = true),
        StructField("n_pos", LongType, nullable = false),
        StructField("n_neg", LongType, nullable = false))))
  }

  /** A [[treeTable]] frame back as driver-side nodes — bounded collect
    * (≤ 2^depth rows); the inverse of [[treeTable]], shared by the gate
    * cache and the ingest twin's frozen-model load. */
  def nodesFrom(table: DataFrame): Seq[Node] =
    table.collect().map { r =>
      Node(r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4)),
        r.getLong(5), r.getLong(6))
    }.sortBy(_.id).toSeq

  /** Corpus-wide scoring under the frozen tree: (doc_id, leaf, pred,
    * teacher, is_seed). The tree folds into nested CASE literals — a
    * zero-shuffle map-only projection; every routable doc lands on a
    * trained leaf (splits keep both sides seed-non-empty by
    * construction). */
  def scoreTree(
      labeled: DataFrame,
      tree: Seq[Node],
      idCol: String = "doc_id"): DataFrame = {
    val byId = tree.map(nd => nd.id -> nd).toMap
    def leafOf(id: Long): Column = byId(id) match {
      case Node(_, "split", Some(j), Some(v), _, _, _) =>
        when(element_at(col("feats"), (j + 1).toInt) <= v, leafOf(2 * id))
          .otherwise(leafOf(2 * id + 1))
      case Node(lid, _, _, _, _, _, _) => lit(lid)
    }
    def predOf(id: Long): Column = byId(id) match {
      case Node(_, "split", Some(j), Some(v), _, _, _) =>
        when(element_at(col("feats"), (j + 1).toInt) <= v, predOf(2 * id))
          .otherwise(predOf(2 * id + 1))
      case Node(_, _, _, _, Some(l), _, _) => lit(l)
      case nd => throw new IllegalStateException(s"malformed node $nd")
    }
    labeled.select(col(idCol), leafOf(1L).as("leaf"), predOf(1L).as("pred"),
      col("label").as("teacher"), col("is_seed"))
  }

  /** The distillation's measured worth — the capRecallAudit spirit:
    * teacher agreement split by seed membership, so held-out
    * generalization is a GATED NUMBER. */
  def scoreSummary(scored: DataFrame): DataFrame =
    scored.groupBy(col("is_seed"), col("teacher"), col("pred"))
      .agg(count(lit(1)).as("n_docs"), sum(col("doc_id")).as("sum_ids"))
      .select(col("is_seed"), col("teacher"), col("pred"), col("n_docs"),
        col("sum_ids"))
}
