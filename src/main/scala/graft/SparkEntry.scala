package graft

import java.sql.Timestamp
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Envelopes, Tables, TopicDb}
import graft.apps.{GmallApp, GmallPipelines}
import graft.operators.{Dedup, EventOps, Multimodal, Relational, Similarity, Sketches, TextProfile}
import graft.functions.TextFunctions
import graft.streaming.{DimSink, SketchStream, StatefulOps, StreamHarness}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] is one operator family from SURVEY.md §2 (or a
  * training-data-pipeline extension) run over the driver's parquet tables;
  * [[oracleSql]] carries the DuckDB-equivalent SQL for the hash-compare gate.
  *
  * Determinism contract with the oracle (see graft.operators.Relational):
  * money doubles in the test data are exact 2-decimal values → decimal casts
  * are lossless and decimal sums bit-exact in both engines; derived per-row
  * doubles are identical IEEE ops in both engines, rounded before exact
  * decimal summation; timestamps are emitted as formatted strings.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    val d = "/root/testdata/sf0.001"
    Relational.customerByRegion(
      Tables.customer(spark, d), Tables.nation(spark, d), Tables.region(spark, d))
  }

  // Streaming-gate feeds are DATASETS end to end (StreamHarness.runFiles):
  // batch composition is declared as filters and the rows never pass
  // through the driver — the r5 review measured the old collect()-fed
  // MemoryStream closures at 9.3 MiB per task at sf0.1, growing linearly
  // with SF. Every StatefulOps processor re-sorts its group by (µs, id)
  // per batch, so only batch COMPOSITION matters, not row order.

  /** Two micro-batches for the dedup gates: even UTC epoch-days first, odd
    * second — so a user's EARLIER day can arrive in the LATER micro-batch
    * while each (user, day) stays within one batch. Arithmetic on epoch-µs
    * (not `dayofmonth`) so the split is session-timezone independent. */
  private def disorderedDayBatchesDs(
      ev: Dataset[StatefulOps.Event]): Seq[Dataset[StatefulOps.Event]] = {
    val parity = pmod(floor(unix_micros(col("ts")) / 86400000000L), lit(2))
    Seq(ev.where(parity === 0), ev.where(parity === 1))
  }

  /** Two time-ordered micro-batches split at the midpoint of the observed
    * `tsCol` range — the Dataset form of the old sorted-splitAt(n/2) feed:
    * every batch-2 event is later than every batch-1 event, so watermarks
    * never late-drop across the boundary. */
  private def timeSplitDs[T](ds: Dataset[T], tsCol: String): Seq[Dataset[T]] = {
    val mm = ds.agg(
      min(unix_micros(col(tsCol))), max(unix_micros(col(tsCol)))).head()
    require(!mm.isNullAt(0),
      s"timeSplitDs: empty feed — no rows with a non-null '$tsCol' to split on")
    val mid = mm.getLong(0) / 2 + mm.getLong(1) / 2
    Seq(ds.where(unix_micros(col(tsCol)) <= mid),
      ds.where(unix_micros(col(tsCol)) > mid))
  }

  /** Midpoint of an already-computed (min, max) aggregate row, with the
    * empty-feed guard the raw `getLong` lacks (a null aggregate would
    * otherwise surface as an opaque NPE): `what` names the feed in the
    * failure message. */
  private def midOf(mm: org.apache.spark.sql.Row, what: String): Long = {
    require(!mm.isNullAt(0), s"empty feed — $what produced no rows to split")
    mm.getLong(0) / 2 + mm.getLong(1) / 2
  }

  /** Max event time of `ds.tsCol` in epoch millis (one scalar aggregate —
    * the only driver-side value a sentinel batch needs). */
  private def maxTsMillis(ds: Dataset[_], tsCol: String): Long = {
    val mm = ds.agg(max(unix_millis(col(tsCol)))).head()
    require(!mm.isNullAt(0),
      s"maxTsMillis: empty feed — no rows with a non-null '$tsCol'")
    mm.getLong(0)
  }

  /** One-row far-future flush sentinel batch (advances the watermark past
    * every real window/timeout so append mode emits the tail). */
  private def sentinelBatch(
      s: SparkSession, tsMillis: Long): Dataset[StatefulOps.Event] = {
    import s.implicits._
    Seq(StatefulOps.Event(-1L, new Timestamp(tsMillis), -1L, "flush", 0.0, "{}"))
      .toDS()
  }

  /** (band, bandkey) bucket df cap shared by the q112 gate and its oracle
    * — chosen ACTIVE at the gate SFs (sf0.01 has 7 buckets of 3 docs). */
  private val LshBucketCap = 2

  /** events → behavior-log JSON (event_id, value) rows — ONE synthesis
    * shared by the q40 harness gate and the q110/q114 warehouse-DAG feed,
    * so their traffic windows can share one oracle. to_json(struct(...)),
    * not string concat: null fields drop and escaping is handled. */
  private def trafficLogJson(df: DataFrame): DataFrame =
    df.select(col("event_id"), to_json(struct(
      struct(concat(lit("m"), col("user_id")).as("mid"),
        concat(lit("v"), col("user_id") % 3).as("vc"),
        col("event_type").as("ch"),
        (col("user_id") % 5).cast("string").as("ar"),
        (col("event_id") % 2).cast("string").as("is_new")).as("common"),
      struct(lit("home").as("page_id"),
        when(col("event_id") % 3 =!= 0, lit("search")).as("last_page_id"),
        round(col("value")).cast("long").as("during_time")).as("page"),
      unix_millis(col("ts")).as("ts"))).as("value"))

  /** documents → keyword-search log JSON (doc_id, value) rows — ONE
    * synthesis shared by the q37 harness gate and the q110/q117 DAG feed
    * (to_json escaping; no vc/ch/ar so these rows never reach the gated
    * traffic keys). */
  private def keywordLogJson(df: DataFrame): DataFrame =
    df.select(col("doc_id"), to_json(struct(
      struct(concat(lit("m"), col("doc_id")).as("mid")).as("common"),
      struct(lit("good_list").as("page_id"), lit("search").as("last_page_id"),
        concat_ws(" ", slice(TextFunctions.tokens(col("text")), 1, 3)).as("item"),
        lit("keyword").as("item_type")).as("page"),
      (col("doc_id") * 3000).as("ts"))).as("value"))

  /** Far-future keyword search hit: flushes the keyword windows; gates
    * strip `word = 'zzsentinel'`. */
  private def keywordSentinelJson(maxId: Long): String =
    s"""{"common":{"mid":"zz"},"page":{"page_id":"good_list","last_page_id":"search","item_type":"keyword","item":"zzsentinel"},"ts":${(maxId + 1000000) * 3000}}"""

  /** Sentinel-stripped column/order contract of the keyword window gates
    * (q37 + the q117 DAG replay — one oracle). */
  private def keywordWindowSelect(df: DataFrame): DataFrame =
    df.where(col("word") =!= "zzsentinel")
      .select(col("stt"), col("edt"), col("word"), col("keyword_count"))
      .orderBy(col("stt"), col("word"))

  /** Far-future (9999999999999 ms) vc="zz" log row: flushes every traffic
    * window; [[trafficWindowSelect]] excludes it from gated output. */
  private val TrafficLogSentinel: String =
    """{"common":{"mid":"zz","vc":"zz","ch":"zz","ar":"zz","is_new":"9"},"page":{"page_id":"home","during_time":0},"ts":9999999999999}"""

  /** Sentinel-stripped column/order contract of the traffic window gates
    * (q40 + the q114 DAG replay — one oracle). */
  private def trafficWindowSelect(df: DataFrame): DataFrame =
    df.where(col("vc") =!= "zz")
      .select(col("stt"), col("edt"), col("vc"), col("ch"), col("ar"),
        col("is_new"), col("pv_ct"), col("sv_ct"), col("dur_sum"))
      .orderBy(col("stt"), col("vc"), col("ch"), col("ar"), col("is_new"))

  /** The q39 aggregate over a trade-order-pre-process-shaped frame —
    * shared with the q115 DAG replay so both pin one oracle. */
  private def orderPreAgg(df: DataFrame): DataFrame =
    df.groupBy(col("op_type"), col("source_type_name"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("split_total_amount").cast("decimal(18,2)")).cast("double").as("sum_amount"),
        sum(col("total_amount").cast("decimal(18,2)")).cast("double").as("sum_oi_amount"),
        count(col("activity_id")).as("n_act"),
        count(col("coupon_id")).as("n_cpn"))
      .orderBy(col("op_type"), col("source_type_name"))

  /** q41's aggregate over a tradePaySuccess-shaped frame — shared with
    * the q119 DAG replay. */
  private def paySuccessAgg(df: DataFrame): DataFrame =
    df.groupBy(col("payment_type_name"), col("source_type_name"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("split_total_amount").cast("decimal(18,2)")).cast("double").as("sum_amount"),
        count(col("activity_id")).as("n_act"),
        count(col("coupon_id")).as("n_cpn"))
      .orderBy(col("payment_type_name"), col("source_type_name"))

  /** q42's aggregate over a tradeCancel-shaped frame — shared with the
    * q120 DAG replay. */
  private def cancelAgg(df: DataFrame): DataFrame =
    df.groupBy(col("source_type_name"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("split_total_amount").cast("decimal(18,2)")).cast("double").as("sum_amount"),
        count(col("activity_id")).as("n_act"),
        count(col("coupon_id")).as("n_cpn"))
      .orderBy(col("source_type_name"))

  /** q43/q94's aggregate over a tradeOrderRefund-shaped frame — shared
    * with the q121 DAG replay. */
  private def orderRefundAgg(df: DataFrame): DataFrame =
    df.groupBy(col("refund_type_name"), col("refund_reason_type_name"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("refund_amount").cast("decimal(18,2)")).cast("double").as("sum_amount"),
        sum(col("refund_num").cast("int")).cast("long").as("sum_num"))
      .orderBy(col("refund_type_name"), col("refund_reason_type_name"))

  /** q44's aggregate over a tradeRefundPaySuccess-shaped frame — shared
    * with the q122 DAG replay. */
  private def refundPayAgg(df: DataFrame): DataFrame =
    df.groupBy(col("payment_type_name"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("total_amount").cast("decimal(18,2)")).cast("double").as("sum_amount"),
        sum(col("refund_num").cast("int")).cast("long").as("sum_num"))
      .orderBy(col("payment_type_name"))

  /** The q36 full-select-list aggregate over a tradeCartAdd-shaped frame
    * — shared with the q113 DAG replay so both pin one oracle. */
  private def cartAddAgg(df: DataFrame): DataFrame =
    df.groupBy(col("source_type_name"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("sku_num").cast("int")).as("sum_num"),
        sum(col("cart_price").cast("decimal(18,2)")).cast("double").as("sum_price"),
        sum(col("is_checked").cast("int")).as("sum_checked"),
        sum(col("is_ordered").cast("int")).as("sum_ordered"),
        count(col("order_time")).as("n_order_time"),
        max(col("operate_time")).as("max_operate_time"),
        countDistinct(col("source_id")).as("n_sources"))
      .orderBy(col("source_type_name"))

  /** ONE full `GmallApp.startFromFiles` warehouse run per (JVM, sf dir),
    * shared by the three DAG gates (q110 DIM stores, q113 DWD topic dir,
    * q114 DWS window) — the whole ods→dwd→dws production graph executed
    * as real streaming queries over file-drop chunks, then gated against
    * composed DuckDB oracles (VERDICT r6 #2: this was spec-only).
    *
    * Feed: the full topic_db envelope stream hash-split across two
    * micro-batches (constituent rows of one order straddle the boundary —
    * the joins must carry state across it), the q40 log synthesis
    * time-split the same way, a dynamic comment_info DIM route dropped
    * BEFORE any data (next-batch visibility), then the far-future flush
    * sentinels + one inert batch so watermark tails emit. Replay
    * joinTtl = 10⁷ s covers the whole synthetic ts (= order key) span at
    * every test SF while staying below the 4·10⁹ s sentinels. */
  private object DagRun {
    private val cache = new java.util.concurrent.ConcurrentHashMap[String, String]()

    def apply(s: SparkSession, d: String): String =
      cache.computeIfAbsent(d, _ => run(s, d))

    private def sentinelEnv(table: String, typ: String, data: String,
        old: String = "null") =
      s"""{"database":"gmall","table":"$table","type":"$typ","ts":4000000000,"data":$data,"old":$old}"""

    /** One far-future row through EVERY watermarked trade side (ids join
      * nothing real). */
    private val flushSentinels: Seq[String] = Seq(
      sentinelEnv("order_detail", "insert",
        """{"id":"zzod","order_id":"zzo1","sku_id":"1","sku_num":"1","source_type":"2401","split_total_amount":"0.00"}"""),
      sentinelEnv("order_info", "update",
        """{"id":"zzo2","order_status":"1005","province_id":"1"}""",
        """{"order_status":"1001"}"""),
      sentinelEnv("order_info", "update",
        """{"id":"zzo3","order_status":"1006","user_id":"1","province_id":"1"}""",
        """{"order_status":"1001"}"""),
      sentinelEnv("order_detail_activity", "insert",
        """{"order_detail_id":"zzact","activity_id":"a","activity_rule_id":"r"}"""),
      sentinelEnv("order_detail_coupon", "insert",
        """{"order_detail_id":"zzcou","coupon_id":"c"}"""),
      sentinelEnv("payment_info", "update",
        """{"user_id":"1","order_id":"zzpay","payment_type":"1101","payment_status":"1602","callback_time":"2096-01-01 00:00:00","total_amount":"1"}""",
        """{"payment_status":"1601"}"""),
      sentinelEnv("order_refund_info", "insert",
        """{"id":"zzri","user_id":"1","order_id":"zzro","sku_id":"1","refund_type":"1501","refund_num":"1","refund_amount":"1","refund_reason_type":"1301","refund_reason_txt":"t","create_time":"2096-01-01"}"""),
      sentinelEnv("refund_payment", "update",
        """{"id":"zzrp","order_id":"zzrpo","sku_id":"1","payment_type":"1101","refund_status":"0702","callback_time":"2096-01-01 00:00:00","total_amount":"1"}""",
        """{"refund_status":"0701"}"""))

    private def run(s: SparkSession, d: String): String = {
      // same clone discipline as StreamHarness: capped shuffle partitions
      // + RocksDB, caller's session untouched
      val session = StreamHarness.prepared(s)
      import session.implicits._
      val root = java.nio.file.Files.createTempDirectory("graft_dag_").toString
      val in = s"$root/in"
      val wh = s"$root/wh"
      Seq("topic_db", "topic_log", "table_process_config").foreach(t =>
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$in/$t")))
      // executor-side chunk writes (no coalesce: the JSON synthesis stays
      // parallel; the file source takes all new files as ONE micro-batch)
      def drop(topic: String, df: DataFrame): Unit =
        df.select(col("value")).write.mode("append").parquet(s"$in/$topic")
      // typed (non-envelope) chunk for the curation feeds
      def dropDf(topic: String, df: DataFrame): Unit =
        df.write.mode("append").parquet(s"$in/$topic")
      // the curation leg's feeds: q116's paragraph instances and q118's
      // embeddings, each split at its id midpoint into two ascending
      // micro-batches exactly like the harness gates — so the DAG stores
      // share q116/q118/q102's oracles verbatim
      val paras = Dedup.explodeParagraphs(Tables.documents(session, d), 10)
        .select(Dedup.encodePos(col("doc_id"), col("pos")).as("enc"), col("para"))
      val paraMid = midOf(paras.agg(min(col("enc")), max(col("enc"))).head(),
        "exploded paragraphs (DAG curation)")
      val emb = Tables.embeddings(session, d)
        .select(col("vec_id"), col("embedding"), col("label"))
      val embMm = emb.agg(min(col("vec_id")), max(col("vec_id")),
        count(lit(1))).head()
      val embMid = midOf(embMm, "embeddings (DAG curation)")
      val queries = GmallApp.startFromFiles(session, in, wh,
        joinTtlSec = 10000000L, semCells = semDedupCells(embMm.getLong(2)))
      try {
        // parallel settle: every wire()/curation query consumes the ods
        // topic DIRS (or its own feed dir) directly — no query reads
        // another query's output — so within a drop round their
        // processAllAvailable waits are independent and can overlap. The
        // queries run on their own engine threads either way; the serial
        // foreach merely WAITED serially, leaving a 32-core host running
        // one 8-partition micro-batch at a time (measured: the whole-DAG
        // charge drops ~2× with the parallel settle). The one write-read
        // edge (configQuery's store → dimQuery's router) is already
        // serialized by the config drop's OWN sync() round below, before
        // any data chunk is dropped.
        def sync(): Unit = {
          import scala.concurrent.{Await, ExecutionContext, Future, blocking}
          import scala.concurrent.duration.Duration
          implicit val ec: ExecutionContext = ExecutionContext.global
          Await.result(
            Future.traverse(queries)(q => Future(blocking(q.processAllAvailable()))),
            Duration.Inf)
        }
        // payment_info, not e.g. comment_info: the lineitem-derived tables
        // carry COLLIDING synthetic ids (duplicate (orderkey, linenumber)
        // rows in the test data) whose equal-ts upsert tie-break is
        // partition-order dependent — an orders-derived id is unique, so
        // the dynamic store is fully value-gateable
        drop("table_process_config", Seq(
          """{"op":"c","ts_ms":10,"after":{"source_table":"payment_info","sink_table":"dim_payment_info","sink_columns":"id,payment_type"}}""")
          .toDF("value"))
        sync()
        // persist: the CPU-heavy to_json synthesis runs once, not once per
        // chunk filter (the two drops below each scan it)
        val raw = TopicDb.raw(session, d).persist()
        // keyword search hits ride the SAME topic_log stream (no vc → they
        // never reach the gated traffic keys; traffic rows carry no
        // item_type → they never reach the keyword filter)
        val kw = keywordLogJson(Tables.documents(session, d))
        val mm = kw.agg(min(col("doc_id")), max(col("doc_id"))).head()
        val (midId, maxId) =
          (midOf(mm, "documents keyword logs (DAG)"), mm.getLong(1))
        try {
          val part = pmod(hash(col("value")), lit(2))
          val logChunks = timeSplitDs(Tables.events(session, d), "ts")
            .map(trafficLogJson)
          drop("topic_db", raw.where(part === 0))
          drop("topic_log", logChunks(0).select(col("value"))
            .unionByName(kw.where(col("doc_id") <= midId).select(col("value"))))
          dropDf("doc_paras", paras.where(col("enc") <= paraMid))
          dropDf("embeddings", emb.where(col("vec_id") <= embMid))
          sync()
          drop("topic_db", raw.where(part === 1))
          drop("topic_log", logChunks(1).select(col("value"))
            .unionByName(kw.where(col("doc_id") > midId).select(col("value"))))
          dropDf("doc_paras", paras.where(col("enc") > paraMid))
          dropDf("embeddings", emb.where(col("vec_id") > embMid))
          sync()
        } finally { raw.unpersist(); () }
        drop("topic_db", flushSentinels.toDF("value"))
        drop("topic_log",
          Seq(TrafficLogSentinel, keywordSentinelJson(maxId)).toDF("value"))
        sync()
        // left-join tails emit in the watermark-advanced batch AFTER the
        // sentinels' own batch
        drop("topic_db", Seq(
          """{"database":"gmall","table":"zz_inert","type":"insert","ts":4000000001,"data":{},"old":null}""")
          .toDF("value"))
        sync(); sync()
      } finally queries.foreach(_.stop())
      wh
    }
  }

  /** SemDeDup cell count scaled with the corpus (q102/q118): ~√N cells
    * keeps docs-per-cell ~√N, so the within-cell pair space stays
    * ~O(N·√N) — the paper's clusters-grow-with-corpus regime (~10⁵ cells
    * web-scale). A FIXED cell count silently degenerates to O(N²/k) pair
    * volume at 100 TB. SimilaritySpec bounds the measured pair volume. */
  private def semDedupCells(n: Long): Int =
    math.max(4, math.ceil(math.sqrt(n.toDouble)).toInt)

  // ------------------------------------------------------------------ queries

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> ((s, d) =>
      Relational.pricingSummary(Tables.lineitem(s, d))),

    "q02_region_rollup" -> ((s, d) =>
      Relational.customerByRegion(Tables.customer(s, d), Tables.nation(s, d),
        Tables.region(s, d))),

    "q03_order_revenue" -> ((s, d) =>
      Relational.orderRevenue(Tables.orders(s, d), Tables.lineitem(s, d))),

    "q04_order_left_join" -> ((s, d) =>
      Relational.orderWithOptionalLines(Tables.orders(s, d), Tables.lineitem(s, d))),

    "q05_anti_join" -> ((s, d) =>
      Relational.customersWithoutOrders(Tables.customer(s, d), Tables.orders(s, d))),

    "q06_cond_project" -> ((s, d) =>
      Relational.conditionalProjection(Tables.events(s, d))),

    "q07_union_counters" -> ((s, d) =>
      Relational.unionCounters(Tables.events(s, d))),

    "q08_json_props" -> ((s, d) =>
      Relational.jsonPropsAgg(Tables.events(s, d))),

    "q09_hourly_window" -> ((s, d) =>
      EventOps.tumblingAgg(
        Tables.events(s, d), "1 hour", Seq(col("event_type")),
        Seq(count(lit(1)).as("n_events"),
          sum(Relational.money(col("value"))).cast("double").as("sum_value")))
        .select(col("stt"), col("edt"), col("event_type"), col("n_events"),
          col("sum_value"))
        .orderBy(col("stt"), col("event_type"))),

    "q10_dedup_daily" -> ((s, d) =>
      EventOps.dedupDaily(Tables.events(s, d))
        .select(col("user_id"), col("visit_date").cast("string").as("visit_date"),
          date_format(col("first_ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("first_ts"))
        .orderBy(col("user_id"), col("visit_date"))),

    "q11_dual_flag_uv" -> ((s, d) =>
      EventOps.dualFlagUv(Tables.events(s, d), "view", "purchase")
        .select(col("visit_date").cast("string").as("visit_date"),
          col("a_uv_ct"), col("b_uv_ct"))
        .orderBy(col("visit_date"))),

    "q12_visitor_repair" -> ((s, d) =>
      EventOps.visitorRepair(Tables.events(s, d))
        .select(col("event_id"), col("user_id"),
          to_date(col("ts")).cast("string").as("visit_date"), col("is_new"))
        .orderBy(col("event_id"))),

    "q13_jump_detect" -> ((s, d) =>
      EventOps.jumpDetect(Tables.events(s, d), col("event_type") === "view", 30L)
        .select(col("event_id"), col("user_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts_str"))
        .orderBy(col("event_id"))),

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

    "q17_dedup_exact" -> ((s, d) =>
      Dedup.exact(Tables.documents(s, d)).orderBy(col("fp"))),

    // ---- near-dup dedup stack (MinHash+LSH / SimHash / n-gram Jaccard) ----

    "q18_minhash_lsh" -> ((s, d) =>
      Dedup.lshCandidates(Dedup.minhashSignatures(Tables.documents(s, d)))
        .orderBy(col("a"), col("b"))),

    "q19_simhash_sig" -> ((s, d) =>
      Dedup.simhash(Tables.documents(s, d)).orderBy(col("doc_id"))),

    "q20_simhash_neardup" -> ((s, d) =>
      Dedup.simhashNearDups(Dedup.simhash(Tables.documents(s, d)))
        .withColumn("hamming", col("hamming").cast("long"))
        .orderBy(col("a"), col("b"))),

    "q21_jaccard_pairs" -> ((s, d) =>
      Dedup.ngramJaccardPairs(Tables.documents(s, d), threshold = 0.5)
        .orderBy(col("a"), col("b"))),

    // multi-TABLE simhash (4 rotations × 16-bit prefixes): the recall fix
    // for q20's single-table blind spot, oracle-exact because the
    // rotations are pure bit arithmetic both engines replicate.
    "q55_simhash_multi" -> ((s, d) =>
      Dedup.simhashNearDupsMulti(Dedup.simhash(Tables.documents(s, d)))
        .withColumn("hamming", col("hamming").cast("long"))
        .orderBy(col("a"), col("b"))),

    // hot-shingle-capped inverted index (df ≤ 100) + exact verification —
    // the q21 skew knob under its own gate.
    "q56_jaccard_capped" -> ((s, d) =>
      Dedup.ngramJaccardPairsCapped(Tables.documents(s, d), maxDocFreq = 100)
        .orderBy(col("a"), col("b"))),

    // hot-BUCKET-capped LSH (VERDICT r6 #4) — q18's candidate generator
    // with (band, bandkey) buckets holding more than LshBucketCap docs
    // dropped: the single-reducer pile-up guard for degenerate bands. The
    // cap is ACTIVE at this SF (buckets of 3 exist and are dropped) and
    // the oracle mirrors it; the planted degenerate-band bound lives in
    // DedupGraphSpec.
    "q112_lsh_capped" -> ((s, d) =>
      Dedup.lshCandidatesCapped(
          Dedup.minhashSignatures(Tables.documents(s, d)), LshBucketCap)
        .orderBy(col("a"), col("b"))),

    "q22_jaccard_verify" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Dedup.jaccardVerify(docs,
          Dedup.lshCandidates(Dedup.minhashSignatures(docs)), threshold = 0.5)
        .orderBy(col("a"), col("b"))
    }),

    // -------------------- embedding similarity / ANN -----------------------

    "q23_embed_neardup" -> ((s, d) =>
      Similarity.nearDupPairs(Tables.embeddings(s, d), 0.35, 64)
        .orderBy(col("a"), col("b"))),

    "q24_ann_topk" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.bruteForceTopK(emb, emb.where(col("vec_id") % 50 === 0), 10)
        .withColumn("rank", col("rank").cast("long"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // scale path: multi-probe LSH-bucketed ANN. Recall < 1 vs q24 by
    // design, but the bucketing itself is deterministic, so the oracle
    // replicates planes + probes and the result is hash-exact.
    "q25_ann_lsh" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.lshTopK(emb, emb.where(col("vec_id") % 50 === 0), 10, 64)
        .withColumn("rank", col("rank").cast("long"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // int8-quantized ANN: quantize the store (4× memory cut), dequantize
    // to float, same brute-force top-k — the oracle replicates the
    // quantize/dequantize float ops verbatim, so ranks are hash-exact.
    // Recall vs the float q24 is a SimilaritySpec assertion.
    "q89_ann_quantized" -> ((s, d) => {
      val qd = Similarity.quantizeInt8(Tables.embeddings(s, d))
      val deq = qd.select(col("vec_id"),
        Similarity.dequantizeF(col("q_vec"), col("q_scale")).as("embedding"))
      Similarity.bruteForceTopK(deq, deq.where(col("vec_id") % 50 === 0), 10)
        .withColumn("rank", col("rank").cast("long"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // Product-quantization ADC ANN: 8 subspaces × 16 codes (32×
    // compression of the scored store); codebook/assignment/LUT/ADC sum
    // all replicated verbatim by the oracle (explicit pivoted addition,
    // never an order-free float sum). Recall vs float is spec-asserted.
    "q90_ann_pq" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.pqTopK(emb, emb.where(col("vec_id") % 50 === 0), 10, 64)
        .withColumn("rank", col("rank").cast("long"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // IVF ANN scale path, oracle-gated: iterations=0 keeps the
    // deterministic lowest-id seed centroids (pure nearest-seed
    // partitioning) so DuckDB replicates assignment + probing bit-for-bit;
    // the kmeans-trained variant (iterations>0) is recall-asserted in
    // SimilaritySpec.
    "q54_ann_ivf" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.ivfTopK(emb, emb.where(col("vec_id") % 50 === 0), 10,
          nCells = 16, nProbe = 4)
        .withColumn("rank", col("rank").cast("long"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // k-means cell assignment as a first-class clustering op (corpus
    // bucketing / mixture analysis); seed centroids (iterations=0) are
    // oracle-replicable, the trained variant is recall-spec'd via q54.
    "q59_kmeans_cells" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.assignCells(emb, Similarity.kmeansCentroids(emb, 16, 0))
        .groupBy(col("cell"))
        .agg(count(lit(1)).as("n_vecs"), sum(col("vec_id")).as("sum_ids"))
        .orderBy(col("cell"))
    }),

    // ITERATED k-means (VERDICT r6 #6) — one REAL Lloyd round under the
    // oracle gate (q59/q102 run iterations=0 for determinism; the update
    // step was spec-only until now). The input embeddings are quantized to
    // INTEGER-valued floats (round(x·8)) so the Lloyd mean's sums are
    // exact in every summation order — the one float hazard that made
    // iterations un-oracle-able — while round-2 assignment's dot products
    // stay fixed-fold-order doubles both engines replay bit-equal.
    "q111_kmeans_lloyd" -> ((s, d) => {
      val q = Tables.embeddings(s, d).select(col("vec_id"),
        transform(col("embedding"),
          x => round(x.cast("double") * 8).cast("float")).as("embedding"))
      Similarity.assignCells(q, Similarity.kmeansCentroids(q, 16, 1))
        .groupBy(col("cell"))
        .agg(count(lit(1)).as("n_vecs"), sum(col("vec_id")).as("sum_ids"))
        .orderBy(col("cell"))
    }),

    // deterministic hash-gated stratified sampling (corpus mixture
    // weights): membership is a pure function of doc_id — reproducible
    // across runs/engines/retries, no RNG.
    "q60_stratified_sample" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      graft.operators.Corpus.stratifiedSample(docs, col("doc_id"),
          TextFunctions.langId(col("text")),
          Map("en" -> 0.5, "cjk" -> 1.0, "unknown" -> 0.125))
        .groupBy(TextFunctions.langId(col("text")).as("lang_pred"))
        .agg(count(lit(1)).as("n_docs"), sum(col("doc_id")).as("sum_ids"))
        .orderBy(col("lang_pred"))
    }),

    // greedy contiguous sequence packing into 2048-token bins, windowed
    // PER STRATUM (language) so packing parallelizes across strata.
    "q61_pack_sequences" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      graft.operators.Corpus.packSequences(docs, 2048,
          TextFunctions.langId(col("text")), col("doc_id"),
          TextFunctions.tokenCount(col("text")))
        .groupBy(TextFunctions.langId(col("text")).as("lang_pred"), col("bin"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("sum_tokens"),
          max(col("doc_id")).as("max_doc"))
        .orderBy(col("lang_pred"), col("bin"))
    }),

    // ------------------ envelope parse + pipeline plumbing -----------------

    // Maxwell CDC envelope → parse → type-filter → map-access projection →
    // aggregate (S3/P1/P2/P3) over the FULL synthesized topic_db stream
    // (every business table, graft.core.TopicDb): per-(table, type) route
    // counts + a lexicographic max over data['id'] + a ts checksum prove
    // the parse, the delete filter (cart_info deletes vanish), and the
    // map-access projection at once. The parse runs ONCE per session and
    // is shared by every q4x pipeline gate (SURVEY §7.3 #4).
    "q26_cdc_route" -> ((s, d) =>
      Envelopes.cdcUpserts(TopicDb(s, d))
        .groupBy(col("table"), col("type"))
        .agg(count(lit(1)).as("n_rows"),
          // coalesce: the two id-less tables would emit NULL, and a null
          // cell is the one thing the driver's pandas hasher may treat
          // differently than the local checker — keep golden outputs
          // null-free
          coalesce(max(element_at(col("data"), "id")), lit("-")).as("max_id"),
          sum(col("ts")).as("sum_ts"))
        .orderBy(col("table"), col("type"))),

    // Behavior-log envelope → parse → 5-way split → explode (P1/P6/P7):
    // JSON built deterministically from `events`.
    "q27_log_split" -> ((s, d) => {
      val env = Tables.events(s, d)
        .select(to_json(struct(
        struct(concat(lit("mid_"), col("user_id")).as("mid"),
          col("event_type").as("ch")).as("common"),
        when(col("event_id") % 7 === 0,
          struct(lit("icon").as("entry"))).as("start"),
        when(col("event_id") % 7 =!= 0, struct(
          col("event_type").as("page_id"),
          when(col("event_id") % 3 === 0, lit(null).cast("string"))
            .otherwise(lit("home")).as("last_page_id"),
          (col("value") * 1000).cast("long").as("during_time"))).as("page"),
        when(col("event_id") % 2 === 0, array(
          struct(lit("promo").as("item"), lit(0L).as("pos_id")),
          struct(lit("rec").as("item"), lit(1L).as("pos_id")))).as("displays"),
        when(col("event_id") % 11 === 0,
          struct(lit(42L).as("error_code"), lit("boom").as("msg"))).as("err"),
        unix_millis(col("ts")).as("ts"))).as("value"))
      val (clean, _) = Envelopes.cleanDirty(Envelopes.parseLog(env))
      val branches = GmallPipelines.baseLogSplit(clean)
      Seq("page", "start", "display", "action", "err")
        .map(b => branches(b).select(lit(b).as("branch")))
        .reduce(_ union _)
        .groupBy(col("branch")).agg(count(lit(1)).as("n_rows"))
        .orderBy(col("branch"))
    }),

    // ------------- streaming twins driven through real micro-batches -------

    // A4 dedup as an incremental flatMapGroupsWithState run: state must
    // carry across the micro-batch boundary; same oracle as q10.
    // The feed is DELIBERATELY disordered: batched by day parity so a
    // user's EARLIER day arrives in a LATER micro-batch — proving the
    // seen-days state doesn't swallow out-of-order days (each (user, day)
    // stays within one batch, so the per-batch µs sort still surfaces the
    // day's true first event).
    "q28_stream_dedup" -> ((s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d).as[StatefulOps.Event]
      StreamHarness.runFiles(s, disorderedDayBatchesDs(ev))(ds =>
        StatefulOps.dedupDaily(ds).toDF())
        .select(col("user_id"), to_date(col("ts")).cast("string").as("visit_date"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("first_ts"))
        .orderBy(col("user_id"), col("visit_date"))
    }),

    // A4 on the Spark 4 transformWithState API (RocksDB state store,
    // ValueState with optional 1-day TTL = reference X4); same oracle.
    "q38_stream_dedup_tws" -> ((s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d).as[StatefulOps.Event]
      s.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      try
        StreamHarness.runFiles(s, disorderedDayBatchesDs(ev))(ds =>
          StatefulOps.dedupDailyTws(ds).toDF())
          .select(col("user_id"), to_date(col("ts")).cast("string").as("visit_date"),
            date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("first_ts"))
          .orderBy(col("user_id"), col("visit_date"))
      finally s.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }),

    // W8 CEP jump detection as a streaming query with event-time timeouts:
    // a sentinel batch advances the watermark to flush pending state; same
    // oracle as q13.
    "q29_stream_jump" -> ((s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d).as[StatefulOps.Event]
      val sentinel = sentinelBatch(s, maxTsMillis(ev, "ts") + 3600L * 1000L)
      StreamHarness.runFiles(s, Seq(ev, sentinel))(ds =>
        StatefulOps.jumpDetect(ds.withWatermark("ts", "2 seconds"),
          _.event_type == "view", 30L).toDF())
        .where(col("user_id") =!= -1L)
        .select(col("event_id"), col("user_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts_str"))
        .orderBy(col("event_id"))
    }),

    // J1 — watermarked stream-stream inner join with an event-time range
    // condition (the reference's TTL'd order_detail ⋈ order_info, re-keyed
    // to events): views matched to purchases by the same user ≤ 24 h later.
    // Both sides are filters of ONE MemoryStream (a stream self-join), state
    // evicted by the watermark + time bound exactly like X1.
    "q33_stream_join" -> ((s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d).as[StatefulOps.Event]
      StreamHarness.runFiles(s, timeSplitDs(ev, "ts")) { ds =>
        val views = ds.toDF().where(col("event_type") === "view")
          .select(col("event_id").as("view_id"), col("user_id"),
            col("ts").as("view_ts"))
          .withWatermark("view_ts", "10 seconds")
        val buys = ds.toDF().where(col("event_type") === "purchase")
          .select(col("event_id").as("buy_id"), col("user_id").as("b_user"),
            col("ts").as("buy_ts"))
          .withWatermark("buy_ts", "10 seconds")
        views.join(buys,
          col("user_id") === col("b_user") &&
            col("buy_ts") >= col("view_ts") &&
            col("buy_ts") <= col("view_ts") + expr("INTERVAL 24 HOURS"))
          .select(col("view_id"), col("buy_id"))
      }.orderBy(col("view_id"), col("buy_id"))
    }),

    // A1/W1/W3/W6 — streaming tumbling event-time window aggregation in
    // append mode: windows emit only once the watermark passes their end
    // (a far-future sentinel flushes the tail). Same oracle as q09.
    "q34_stream_window" -> ((s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d).as[StatefulOps.Event]
      val sentinel = sentinelBatch(s, maxTsMillis(ev, "ts") + 7200L * 1000L)
      StreamHarness.runFiles(s, timeSplitDs(ev, "ts") :+ sentinel) { ds =>
        graft.streaming.Windows.tumblingAgg(ds.toDF(), "ts", "1 hour", "10 seconds",
          Seq(col("event_type")),
          Seq(count(lit(1)).as("n_events"),
            sum(Relational.money(col("value"))).cast("double").as("sum_value")))
      }.where(col("event_type") =!= "flush")
        .select(col("stt"), col("edt"), col("event_type"), col("n_events"),
          col("sum_value"))
        .orderBy(col("stt"), col("event_type"))
    }),

    // --------------------------- multimodal --------------------------------

    "q30_media_meta" -> ((s, d) =>
      Multimodal.resizePlan(Multimodal.decodeMeta(
          Multimodal.ingestDocsAsMedia(Tables.documents(s, d))))
        .select(col("media_id"), col("mime"), col("n_bytes"), col("width"),
          col("height"), col("out_w"), col("out_h"), col("duration_ms"))
        .orderBy(col("media_id"))),

    "q31_media_frames" -> ((s, d) =>
      Multimodal.sampleFrames(Multimodal.decodeMeta(
          Multimodal.ingestDocsAsMedia(Tables.documents(s, d))))
        .orderBy(col("media_id"), col("frame_no"))),

    // batched per-partition decode (mapInPandas analogue). The raw
    // array<float> features column is not hashable by the driver's oracle
    // (pandas can't sort ndarray cells), so the gate projects each feature
    // to a rounded scalar column; the DuckDB oracle replicates
    // StubDecoder's byte statistics from hex(encode(text)).
    "q32_media_features" -> ((s, d) => {
      val feats = Multimodal.extractFeatures(
        Multimodal.ingestDocsAsMedia(Tables.documents(s, d)))
      val fCols = (0 until 8).map(i =>
        round(element_at(col("features"), i + 1).cast("double"), 6).as(s"f$i"))
      feats.select((col("media_id") +: col("mime") +: fCols): _*)
        .orderBy(col("media_id"))
    }),

    // DwdTradeOrderPreProcess end-to-end (the reference's most complex app:
    // od ⋈ oi LEFT⋈ activity LEFT⋈ coupon ⋈ dic, J1/J2/J4) over the ONE
    // shared topic_db stream — all four views carved out of the same
    // persisted parse every other pipeline gate reads, exactly like the
    // reference's apps all consuming one Kafka topic. The wide result is
    // itself materialized once per session (tradeOrderPreProcessCached):
    // the reference writes it to the dwd_trade_order_pre_process topic
    // ONCE (DwdTradeOrderPreProcess.java:275) and q41/q42 consume it.
    "q39_dwd_order_pre" -> ((s, d) =>
      orderPreAgg(GmallPipelines.tradeOrderPreProcessCached(s, d))),

    // DWS keyword window end-to-end (the reference's flagship hybrid app,
    // SURVEY §3.3): behavior-log JSON → parse → search-hit filter →
    // tokenizer UDF + explode (U1/J5) → 10 s tumbling event-time window
    // count (A1/W1/W3/W6), run as a REAL streaming query; a far-future
    // sentinel search hit flushes the append-mode tail windows.
    "q37_dws_keyword" -> ((s, d) => {
      import s.implicits._
      // to_json(struct(...)), not string concat: a token containing a quote
      // or backslash must be escaped, or Spark would route the row to the
      // dirty stream while the DuckDB oracle still counts it
      val logs = keywordLogJson(Tables.documents(s, d)).as[(Long, String)]
      // event time is doc_id·3000 — an id-midpoint split IS a time split
      val mm = logs.agg(min(col("doc_id")), max(col("doc_id"))).head()
      val (midId, maxId) = (mm.getLong(0) / 2 + mm.getLong(1) / 2, mm.getLong(1))
      val sentinel = Seq((maxId + 1, keywordSentinelJson(maxId))).toDS()
      val batches = Seq(logs.where(col("doc_id") <= midId),
        logs.where(col("doc_id") > midId), sentinel)
      keywordWindowSelect(StreamHarness.runFiles(s, batches) { ds =>
        val (clean, _) = Envelopes.cleanDirty(Envelopes.parseLog(ds.toDF()
          .withColumnRenamed("_2", "value")))
        graft.streaming.Windows.keywordCount(GmallPipelines.keywordHits(clean))
      })
    }),

    // DWS traffic page-view window (A2/X7/W9): behavior-log JSON → page
    // branch → 0/1 counter encode (pv/sv/dur) → multi-key 1 h tumbling
    // event-time window sums, streamed with a sentinel-flushed tail.
    "q40_dws_traffic" -> ((s, d) => {
      import s.implicits._
      def toLogs(df: DataFrame): Dataset[(Long, String)] =
        trafficLogJson(df).as[(Long, String)]
      val sentinel = Seq((-1L, TrafficLogSentinel)).toDS()
      val batches = timeSplitDs(Tables.events(s, d), "ts").map(toLogs) :+ sentinel
      trafficWindowSelect(StreamHarness.runFiles(s, batches) { ds =>
        val (clean, _) = Envelopes.cleanDirty(Envelopes.parseLog(
          ds.toDF().withColumnRenamed("_2", "value")))
        val page = GmallPipelines.baseLogSplit(clean)("page")
        graft.streaming.Windows.tumblingAgg(
          GmallPipelines.trafficCounters(page), "rt", "1 hour", "14 seconds",
          Seq(col("vc"), col("ch"), col("ar"), col("is_new")),
          Seq(sum(col("pv")).as("pv_ct"), sum(col("sv")).as("sv_ct"),
            sum(col("dur")).as("dur_sum")))
      })
    }),

    // ---------------------- skew + full DWD pipeline -----------------------

    // Two-phase salted aggregation (hot-key mitigation): results must be
    // row-identical to the direct groupBy the oracle runs.
    "q35_salted_agg" -> ((s, d) =>
      graft.operators.Skew.saltedSumCount(Tables.events(s, d),
          Seq(col("user_id")), Relational.money(col("value")))
        .select(col("user_id"), col("sum_value").cast("double").as("sum_value"),
          col("cnt"))
        .orderBy(col("user_id"))),

    // DwdTradeCartAdd end-to-end over the shared topic_db cart_info stream
    // (insert + quantity-delta update + delete filtering, P4/P5 + the J4
    // dic join). The aggregation touches every column of the full
    // 14-column reference projection (DwdTradeCartAdd.java:58-76) so the
    // oracle gates the whole select-list, not a slice.
    "q36_dwd_cart" -> ((s, d) =>
      cartAddAgg(GmallPipelines.tradeCartAdd(TopicDb(s, d), TopicDb.baseDic(s)))),

    // ------- the remaining reference DWD apps, all over the ONE shared ----
    // ------- persisted topic_db parse (graft.core.TopicDb)            ----

    // DwdTradePayDetailSuc (DwdTradePayDetailSuc.java:23-34,94-98):
    // successful payments ⋈ the pre-process wide table ⋈ dic. The wide
    // table comes from the session cache — the reference's apps consume
    // the materialized dwd_trade_order_pre_process topic, they don't
    // re-run the 5-way join.
    "q41_dwd_pay_success" -> ((s, d) =>
      paySuccessAgg(GmallPipelines.tradePaySuccess(TopicDb(s, d),
        GmallPipelines.tradeOrderPreProcessCached(s, d), TopicDb.baseDic(s)))),

    // DwdTradeOrderDetail (DwdTradeOrderDetail.java:91-92): order detail
    // facts = inserts from the session-cached pre-process wide table.
    "q92_dwd_order_detail" -> ((s, d) =>
      GmallPipelines.tradeOrderDetail(
          GmallPipelines.tradeOrderPreProcessCached(s, d))
        .groupBy(col("source_type_name"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("split_total_amount").cast("decimal(18,2)")).cast("double").as("sum_amount"),
          count(col("activity_id")).as("n_act"),
          count(col("coupon_id")).as("n_cpn"))
        .orderBy(col("source_type_name"))),

    // DwdTradeCancelDetail (DwdTradeCancelDetail.java:65-92): cancelled
    // orders filtered from the session-cached pre-process wide table.
    "q42_dwd_cancel" -> ((s, d) =>
      cancelAgg(GmallPipelines.tradeCancel(
        GmallPipelines.tradeOrderPreProcessCached(s, d)))),

    // DwdTradeOrderRefund (DwdTradeOrderRefund.java:53-114): refund
    // requests ⋈ order_info(1005) ⋈ dic twice.
    "q43_dwd_order_refund" -> ((s, d) =>
      orderRefundAgg(GmallPipelines.tradeOrderRefund(
        TopicDb(s, d), TopicDb.baseDic(s)))),

    // DwdTradeRefundPaySuc (DwdTradeRefundPaySuc.java:54-130): refund
    // payments done — two-key (order_id, sku_id) join.
    "q44_dwd_refund_pay_suc" -> ((s, d) =>
      refundPayAgg(GmallPipelines.tradeRefundPaySuccess(
        TopicDb(s, d), TopicDb.baseDic(s)))),

    // DwdToolCouponGet (DwdToolCouponGet.java:51-52).
    "q45_dwd_coupon_get" -> ((s, d) =>
      GmallPipelines.couponGet(TopicDb(s, d))
        .groupBy(col("coupon_id"))
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(col("user_id")).as("n_users"),
          max(col("date_id")).as("max_date"))
        .orderBy(col("coupon_id"))),

    // DwdToolCouponOrder (DwdToolCouponOrder.java:52-64): 1401→1402.
    "q46_dwd_coupon_order" -> ((s, d) =>
      GmallPipelines.couponOrder(TopicDb(s, d))
        .groupBy(col("coupon_id"))
        .agg(count(lit(1)).as("n_rows"), sum(col("ts")).as("sum_ts"))
        .orderBy(col("coupon_id"))),

    // DwdToolCouponPay (DwdToolCouponPay.java:45-56): used_time set.
    "q47_dwd_coupon_pay" -> ((s, d) =>
      GmallPipelines.couponPay(TopicDb(s, d))
        .groupBy(col("coupon_id"))
        .agg(count(lit(1)).as("n_rows"), sum(col("ts")).as("sum_ts"))
        .orderBy(col("coupon_id"))),

    // DwdInteractionFavorAdd (DwdInteractionFavorAdd.java:54-56).
    "q48_dwd_favor_add" -> ((s, d) =>
      GmallPipelines.favorAdd(TopicDb(s, d))
        .groupBy(col("create_time"))
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("create_time"))),

    // DwdInteractionComment (DwdInteractionComment.java:56-87): appraise
    // dictionary lookup join.
    "q49_dwd_comment" -> ((s, d) =>
      GmallPipelines.comment(TopicDb(s, d), TopicDb.baseDic(s))
        .groupBy(col("appraise_name"))
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(col("user_id")).as("n_users"),
          countDistinct(col("order_id")).as("n_orders"),
          max(col("date_id")).as("max_date"))
        .orderBy(col("appraise_name"))),

    // DwdUserRegister (DwdUserRegister.java:54-55).
    "q50_dwd_user_register" -> ((s, d) =>
      GmallPipelines.userRegister(TopicDb(s, d))
        .groupBy(col("date_id")).agg(count(lit(1)).as("n_rows"))
        .orderBy(col("date_id"))),

    // DimApp config router (J3/P8/P9, DimApp.java:178-187 +
    // TableProcessFunction.java:169-324): broadcast-config routing +
    // sink-column pruning over the shared CDC stream; the (sink_table,
    // type) counts plus pruned-map width sum and max id prove both the
    // route and the map_filter pruning.
    "q51_dim_router" -> ((s, d) => {
      import s.implicits._
      val config = Seq(
        ("user_info", "dim_user_info", "id,name"),
        ("order_info", "dim_order_info", "id,user_id,total_amount,order_status"),
        ("cart_info", "dim_cart_info", "id,sku_id,sku_num"),
        ("comment_info", "dim_comment_info", "id,appraise"),
      ).toDF("source_table", "sink_table", "sink_columns")
      GmallPipelines.dimRouter(TopicDb(s, d), config)
        .groupBy(col("sink_table"), col("type"))
        .agg(count(lit(1)).as("n_rows"),
          sum(size(col("data"))).as("sum_cols"),
          max(element_at(col("data"), "id")).as("max_id"))
        .orderBy(col("sink_table"), col("type"))
    }),

    // The SCALE path of q23: same-bucket candidate pairs only (16
    // hyperplane-LSH buckets) — the plan you'd run at 100 TB. The oracle
    // replicates the deterministic plane matrix bit-for-bit (inlined as
    // DOUBLE[] literals), so candidate scores are exact-checked; recall vs
    // the exact q23 pair set is asserted in SimilaritySpec (single-table
    // LSH recall < 1 by construction).
    "q53_embed_neardup_lsh" -> ((s, d) =>
      Similarity.nearDupPairs(Tables.embeddings(s, d), 0.35, 64, nPlanes = 4)
        .orderBy(col("a"), col("b"))),

    // A6 streaming twin: visitor-flag repair through real micro-batches —
    // first-seen-day ValueState demotes revisits, state carries across the
    // batch boundary; time-ordered feed (the reference's operating
    // assumption: days arrive in order, watermark bounds within-day
    // disorder). Same oracle as q12.
    "q57_stream_visitor_repair" -> ((s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d).as[StatefulOps.Event]
      StreamHarness.runFiles(s, timeSplitDs(ev, "ts")) { ds =>
        import ds.sparkSession.implicits._
        StatefulOps.visitorRepair(ds)
          .map { case (e, f) => (e.event_id, e.user_id, e.ts, f) }.toDF()
      }
        .select(col("_1").as("event_id"), col("_2").as("user_id"),
          to_date(col("_3")).cast("string").as("visit_date"),
          col("_4").as("is_new"))
        .orderBy(col("event_id"))
    }),

    // X-family salted replicate-small join: row-identical to the plain
    // inner join the oracle runs, but a hot key's probe work splits
    // across salt buckets.
    "q58_salted_join" -> ((s, d) => {
      import s.implicits._
      val dim = Seq(("view", "V"), ("click", "C"), ("purchase", "P"))
        .toDF("event_type", "type_code")
      graft.operators.Skew.saltedBroadcastableJoin(Tables.events(s, d), dim, "event_type")
        .groupBy(col("event_type"), col("type_code"))
        .agg(count(lit(1)).as("n_rows"),
          sum(Relational.money(col("value"))).cast("double").as("sum_value"))
        .orderBy(col("event_type"))
    }),

    // "User register window" — a staple DWS app of the gmall curriculum
    // this reference belongs to (its own app/dws/ stops at the 3 traffic
    // windows): user_info inserts → 10 s tumbling register count, run as a
    // REAL append-mode streaming window (sentinel-flushed tail like q34).
    "q62_dws_register_window" -> ((s, d) => {
      import s.implicits._
      val regs = Tables.customer(s, d).select(
          col("c_custkey").as("event_id"),
          timestamp_millis((col("c_custkey") + 1) * 1000L).as("ts"),
          col("c_custkey").as("user_id"), lit("register").as("event_type"),
          lit(0.0).as("value"), lit("{}").as("props"))
        .as[StatefulOps.Event]
      val sentinel = sentinelBatch(s,
        maxTsMillis(regs, "ts") + 100000L * 1000L)
      val batches = timeSplitDs(regs, "ts") :+ sentinel
      StreamHarness.runFiles(s, batches) { ds =>
        graft.streaming.Windows.tumblingAgg(ds.toDF(), "ts", "10 seconds", "2 seconds",
          Seq(col("event_type")), Seq(count(lit(1)).as("register_ct")))
      }.where(col("event_type") =!= "flush")
        .select(col("stt"), col("edt"), col("register_ct"))
        .orderBy(col("stt"))
    }),

    // "Cart-add unique-user window" — the gmall-curriculum DWS pattern
    // (not in this reference's app/dws/, which has only traffic windows);
    // built from its cited primitives A4+W1: cart adds → per-user
    // first-of-day dedup state → 10 s tumbling UU count — the dedup and
    // the window CHAINED in one streaming query.
    // Users are split across micro-batches by hash (a user's rows stay
    // together; the A4 state is arrival-order per user, as in q28).
    "q63_dws_cart_uu" -> ((s, d) => {
      import s.implicits._
      val ev = GmallPipelines.tradeCartAdd(TopicDb(s, d), TopicDb.baseDic(s))
        .select(
          (col("ts") * 8 + split(col("id"), "-").getItem(1).cast("long")).as("event_id"),
          timestamp_millis((col("ts") + 1) * 1000L).as("ts"),
          col("user_id").cast("long").as("user_id"),
          lit("cart").as("event_type"), lit(0.0).as("value"), lit("{}").as("props"))
        .as[StatefulOps.Event]
      val userHash = pmod(hash(col("user_id")), lit(2))
      // the two user-batches are NOT time-ordered relative to each other,
      // so the watermark delay must span the whole OBSERVED key range
      // (otherwise batch-2 windows below batch-1's watermark drop as
      // late) — derived from the data, not a constant, so the gate holds
      // at every SF; the sentinel then sits beyond delay + every window
      val maxSec = maxTsMillis(ev, "ts") / 1000L
      val delaySec = maxSec + 10L
      val sentinel = sentinelBatch(s, (maxSec + delaySec + 20L) * 1000L)
      val batches = Seq(ev.where(userHash === 0), ev.where(userHash === 1), sentinel)
      StreamHarness.runFiles(s, batches) { ds =>
        graft.streaming.Windows.tumblingAgg(
          StatefulOps.dedupDaily(ds).toDF(), "ts", "10 seconds", s"$delaySec seconds",
          Seq(col("event_type")), Seq(count(lit(1)).as("uu_ct")))
      }.where(col("event_type") =!= "flush")
        .select(col("stt"), col("edt"), col("uu_ct"))
        .orderBy(col("stt"))
    }),

    // "Payment-success unique-user window" — gmall-curriculum DWS pattern
    // (beyond this reference's 3 traffic windows): successful payments →
    // per-user first-of-day state → 10 s tumbling payment-UU count, dedup
    // chained into the window like q63.
    "q64_dws_pay_suc_uu" -> ((s, d) => {
      import s.implicits._
      val ev = TopicDb(s, d).where(col("table") === "payment_info" &&
          element_at(col("data"), "payment_status") === "1602")
        .select(col("ts").as("event_id"),
          timestamp_millis((col("ts") + 1) * 1000L).as("ts"),
          element_at(col("data"), "user_id").cast("long").as("user_id"),
          lit("pay").as("event_type"), lit(0.0).as("value"), lit("{}").as("props"))
        .as[StatefulOps.Event]
      val userHash = pmod(hash(col("user_id")), lit(2))
      // delay spans the observed key range (see q63) so the gate holds at
      // every SF, not just where all keys fit one watermark window
      val maxSec = maxTsMillis(ev, "ts") / 1000L
      val delaySec = maxSec + 10L
      val sentinel = sentinelBatch(s, (maxSec + delaySec + 20L) * 1000L)
      StreamHarness.runFiles(s,
          Seq(ev.where(userHash === 0), ev.where(userHash === 1), sentinel)) { ds =>
        graft.streaming.Windows.tumblingAgg(
          StatefulOps.dedupDaily(ds).toDF(), "ts", "10 seconds", s"$delaySec seconds",
          Seq(col("event_type")), Seq(count(lit(1)).as("uu_ct")))
      }.where(col("event_type") =!= "flush")
        .select(col("stt"), col("edt"), col("uu_ct"))
        .orderBy(col("stt"))
    }),

    // "SKU order window" — the heaviest DWS shape in the gmall curriculum
    // (this reference's app/dws/ carries only the 3 traffic windows; the
    // X7 keyed-reduce shape is the one in
    // app/dws/DwsTrafficVcChArIsNewPageViewWindow.java:97-130):
    // order_detail stream → sku-keyed 10 s tumbling windows summing order
    // count / quantity / amount, run as a real append-mode streaming
    // window.
    "q66_dws_sku_order_window" -> ((s, d) => {
      import s.implicits._
      // ⅛ key sample: the window-state machinery is the thing under test,
      // not the feed volume (oracle mirrors)
      val rows = GmallPipelines.orderDetail(TopicDb(s, d))
        .where(col("ts") % 8 === 0)
        .select(timestamp_millis((col("ts") + 1) * 1000L).as("ts"),
          col("sku_id"), col("sku_num").cast("long").as("num"),
          col("split_total_amount"))
        .as[(Timestamp, String, Long, String)]
      val sentinel = Seq((
        new Timestamp(maxTsMillis(rows, "ts") + 7200L * 1000L), "zz", 0L, "0.00"))
        .toDS()
      StreamHarness.runFiles(s, timeSplitDs(rows, "ts") :+ sentinel) { ds =>
        graft.streaming.Windows.tumblingAgg(
          ds.toDF("ts", "sku_id", "num", "amt"), "ts", "10 seconds", "10 seconds",
          Seq(col("sku_id")),
          Seq(count(lit(1)).as("order_ct"), sum(col("num")).as("sku_num_sum"),
            sum(col("amt").cast("decimal(18,2)")).cast("double").as("amount_sum")))
      }.where(col("sku_id") =!= "zz")
        .select(col("stt"), col("edt"), col("sku_id"), col("order_ct"),
          col("sku_num_sum"), col("amount_sum"))
        .orderBy(col("stt"), col("sku_id"))
    }),

    // "Order unique-user window" — gmall-curriculum DWS pattern (beyond
    // this reference's 3 traffic windows), composed from its cited A5
    // dual-flag state (DwsTrafficPageViewWindow.java:67-137): purchases →
    // per-user (first-of-day, first-ever) state pair → hourly window with
    // order-UU and NEW-order-user counts, dedup+flags chained into the
    // window over the real multi-day events table; time-ordered feed
    // (first-ever is arrival-order state, the reference's assumption).
    "q65_dws_order_window" -> ((s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d).where(col("event_type") === "purchase")
        .as[StatefulOps.Event]
      val sentinel = sentinelBatch(s, maxTsMillis(ev, "ts") + 7200L * 1000L)
      StreamHarness.runFiles(s, timeSplitDs(ev, "ts") :+ sentinel) { ds =>
        import ds.sparkSession.implicits._
        val flagged = StatefulOps.dedupDailyFlags(ds)
          .map { case (e, isNew) => (e.ts, e.event_type, isNew.toLong) }
          .toDF("ts", "event_type", "is_new")
        graft.streaming.Windows.tumblingAgg(flagged, "ts", "1 hour", "10 seconds",
          Seq(col("event_type")),
          Seq(count(lit(1)).as("uu_ct"), sum(col("is_new")).as("new_ct")))
      }.where(col("event_type") =!= "flush")
        .select(col("stt"), col("edt"), col("uu_ct"), col("new_ct"))
        .orderBy(col("stt"))
    }),

    // A5 streaming twin (two seen-day states per user, the reference's
    // two-ValueState pattern) driven through real micro-batches on RocksDB
    // state, disordered feed like q28/q38; summed flags = q11's
    // count-distinct oracle.
    "q52_stream_dual_flag" -> ((s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d).as[StatefulOps.Event]
      s.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      try
        StreamHarness.runFiles(s, disorderedDayBatchesDs(ev))(ds =>
          StatefulOps.dualFlagUv(ds, "view", "purchase").toDF())
          .groupBy(col("_1").as("visit_date"))
          .agg(sum(col("_2")).as("a_uv_ct"), sum(col("_3")).as("b_uv_ct"))
          .orderBy(col("visit_date"))
      finally s.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }),

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

    // SESSION windows (beyond the reference's window surface): per-user
    // 4 h-gap sessions over the real multi-day events table, batch form.
    "q70_session_window" -> ((s, d) =>
      graft.streaming.Windows.sessionAgg(Tables.events(s, d), "ts",
          "4 hours", "2 seconds",
          Seq(col("user_id")), Seq(count(lit(1)).as("n_events")))
        .select(col("user_id"), col("stt"), col("edt"), col("n_events"))
        .orderBy(col("user_id"), col("stt"))),

    // Streaming twin of q70: the same session_window plan run as real
    // micro-batches — sessions spanning the batch split must MERGE in the
    // state store; the flush sentinel (max ts + gap + margin) advances the
    // watermark past every session end so append mode emits them all.
    "q71_stream_session" -> ((s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d).as[StatefulOps.Event]
      val sentinel = sentinelBatch(s, maxTsMillis(ev, "ts") + 5L * 3600L * 1000L)
      StreamHarness.runFiles(s, timeSplitDs(ev, "ts") :+ sentinel) { ds =>
        graft.streaming.Windows.sessionAgg(ds.toDF(), "ts", "4 hours",
          "2 seconds", Seq(col("user_id")), Seq(count(lit(1)).as("n_events")))
      }.where(col("user_id") =!= -1L)
        .select(col("user_id"), col("stt"), col("edt"), col("n_events"))
        .orderBy(col("user_id"), col("stt"))
    }),

    // HOPPING windows (1 h / 30 min): each event lands in exactly two
    // overlapping windows — the window-family completion next to tumbling
    // (q34/q37) and session (q70/q71).
    "q72_sliding_window" -> ((s, d) =>
      graft.streaming.Windows.slidingAgg(Tables.events(s, d), "ts",
          "1 hour", "30 minutes", "2 seconds",
          Seq(col("event_type")),
          Seq(count(lit(1)).as("n_events"),
            count_distinct(col("user_id")).as("n_users")))
        .select(col("stt"), col("edt"), col("event_type"),
          col("n_events"), col("n_users"))
        .orderBy(col("stt"), col("event_type"))),

    // Bloom-prefiltered incremental dedup: store = fingerprints of docs
    // 0..249, batch = the rest; the bloom screen is an optimization the
    // oracle can't see — output is exact not-in-store firsts.
    "q73_bloom_dedup" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val store = docs.where(col("doc_id") < 250)
        .select(TextFunctions.fingerprint(col("text")).as("fp")).distinct()
      Dedup.incrementalDedup(docs.where(col("doc_id") >= 250), store)
        .select(col("doc_id"), col("fp")).orderBy(col("doc_id"))
    }),

    // EXACT percentiles (sort-based, linear interpolation) per group —
    // the latency/size-distribution profile every corpus audit needs;
    // Spark `percentile` and DuckDB `quantile_cont` share the
    // rank = p·(n−1) interpolation definition.
    "q74_percentile" -> ((s, d) =>
      Tables.events(s, d).groupBy(col("event_type"))
        .agg(
          round(expr("percentile(value, 0.5)"), 6).as("p50"),
          round(expr("percentile(value, 0.9)"), 6).as("p90"),
          round(expr("percentile(value, 0.99)"), 6).as("p99"),
          count(lit(1)).as("n"))
        .orderBy(col("event_type"))),

    // ROLLUP subtotal hierarchy (reference has no grouping sets at all):
    // per (status, priority) + per status + grand total in one pass.
    "q75_rollup" -> ((s, d) =>
      Tables.orders(s, d)
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("revenue"))
        .orderBy(col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first)),

    // Dedup GROUP resolution: q20's simhash near-dup pairs collapsed into
    // connected components (min-label propagation); comp = canonical
    // (minimum) doc id per near-dup group.
    "q76_dedup_groups" -> ((s, d) =>
      Dedup.connectedComponents(
          Dedup.simhashNearDups(Dedup.simhash(Tables.documents(s, d))))
        .orderBy(col("id"))),

    // Same components via alternating large-star/small-star (Kiveris et
    // al. SoCC'14) — O(log n) rounds regardless of graph diameter, the
    // scale path when dup groups chain instead of forming quasi-cliques.
    // Identical output contract, so the q76 oracle is shared verbatim.
    "q84_dedup_groups_star" -> ((s, d) =>
      Dedup.connectedComponentsStar(
          Dedup.simhashNearDups(Dedup.simhash(Tables.documents(s, d))))
        .orderBy(col("id"))),

    // Streaming histogram twin: per-group fixed-width bin counts as
    // transformWithState registers (counts ADD across micro-batches),
    // digested with the same interpolation — q82's oracle verbatim.
    "q91_hist_quantile_stream" -> ((s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d)
      val Row2 = ev.agg(min(col("value")).cast("double"),
        max(col("value")).cast("double")).head()
      val (lo, hi) = (Row2.getDouble(0), Row2.getDouble(1))
      if (hi == lo) {
        // degenerate range: every quantile = lo — the same early return as
        // the batch guard (Sketches.histogramQuantiles); binOf would
        // divide by (hi − lo) and cast NaN
        ev.groupBy(col("event_type"))
          .agg(round(max(lit(lo)), 6).as("p50"), round(max(lit(lo)), 6).as("p90"),
            round(max(lit(lo)), 6).as("p99"))
          .orderBy(col("event_type"))
      } else {
        val obs = ev.select(col("event_type").as("g"),
            Sketches.binOf(col("value"), lo, hi, 128).cast("int").as("bin"),
            pmod(col("event_id"), lit(3)).as("slice"))
        // split on the source key so the same (g, bin) register keeps
        // ADDING across batches (see q83)
        val batches = (0 to 2).map(i => obs.where(col("slice") === i)
          .select(col("g"), col("bin")).as[SketchStream.BinRow])
        s.conf.set("spark.sql.streaming.stateStore.providerClass",
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
        try {
          val snaps = StreamHarness.runFiles(s, batches)(ds =>
            SketchStream.histSketchStream(ds, 128).toDF())
          val counted = snaps.groupBy(col("_1").as("event_type"))
            .agg(max_by(col("_3"), col("_2")).as("counts"))
            .select(col("event_type"), posexplode(col("counts")).as(Seq("bin", "c")))
            .where(col("c") > 0)
            .select(col("event_type"), col("bin").cast("long").as("bin"), col("c"))
          Sketches.quantilesFromBinCounts(counted, "event_type", lo, hi, 128,
              Seq(0.5, 0.9, 0.99))
            .orderBy(col("event_type"))
        } finally s.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }),

    // The DWS-UU-window shape at 100 TB (VERDICT r3 "missing" #2): unique
    // users per (hourly window, event_type) as HLL registers in
    // transformWithState — constant 64 ints per (window, group) key vs the
    // exact seen-set state of q63-q66, mergeable across micro-batches.
    // The register math is oracle-replicated per window exactly like q81.
    "q85_dws_uu_hll_window" -> ((s, d) => {
      import s.implicits._
      val (bucket, rho) = Sketches.hllObs(col("user_id").cast("string"))
      val obs = Tables.events(s, d)
        .select(concat(
            date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss"),
            lit("|"), col("event_type")).as("g"),
          bucket.as("bucket"), rho.as("rho"),
          pmod(col("event_id"), lit(3)).as("slice"))
      val batches = (0 to 2).map(i => obs.where(col("slice") === i)
        .select(col("g"), col("bucket"), col("rho")).as[SketchStream.HllRow])
      s.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      try {
        val snaps = StreamHarness.runFiles(s, batches)(ds =>
          SketchStream.hllSketchStream(ds).toDF())
        val latest = snaps.groupBy(col("_1").as("g"))
          .agg(max_by(col("_3"), col("_2")).as("regs"))
        Sketches.hllStats(latest, col("regs"))
          .select(substring_index(col("g"), "|", 1).as("stt"),
            substring_index(col("g"), "|", -1).as("event_type"),
            col("n_buckets_hit"), col("reg_sum"), col("est_distinct"))
          .orderBy(col("stt"), col("event_type"))
      } finally s.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }),

    // Funnel conversion (EventOps.funnel): view → click → purchase with a
    // 7-day per-step horizon — ordered min-time chaining per user, one
    // keyed join per step, no sequence sort.
    "q93_funnel" -> ((s, d) =>
      EventOps.funnel(Tables.events(s, d), Seq("view", "click", "purchase"),
          horizonSec = Some(7L * 86400L))
        .orderBy(col("step_idx"))),

    // Mixture interleave (Corpus.mixtureInterleave): the training-order
    // schedule after sampling — per-stratum rank / weight as the merged
    // position key (weight-3 'en' appears 3× as densely as weight-1
    // strata). Range-sort by the key, never a global row_number.
    "q88_mixture_interleave" -> ((s, d) =>
      graft.operators.Corpus.mixtureInterleave(
          Tables.documents(s, d), col("lang"), col("doc_id"),
          Map("en" -> 3.0, "zh" -> 2.0))
        .select(col("doc_id"), col("lang"), col("mix_pos"))
        .orderBy(col("mix_pos"), col("lang"), col("doc_id"))),

    // q80's TopN as a STREAMING pipeline: per-window counts from a real
    // watermark-flushed micro-batch window agg, then the bounded-heap
    // ranking over the finalized counts — the DWS "hot items" chain the
    // gmall curriculum runs on Flink. Shares q80's oracle verbatim.
    "q87_topn_window_stream" -> ((s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d).where(col("event_type") === "view")
        .select(col("ts"), col("user_id")).as[(Timestamp, Long)]
      val sentinel = Seq((
        new Timestamp(maxTsMillis(ev, "ts") + 7200L * 1000L), -1L)).toDS()
      val counted = StreamHarness.runFiles(s,
          timeSplitDs(ev, "ts") :+ sentinel) { ds =>
        graft.streaming.Windows.tumblingAgg(
          ds.toDF("ts", "item"), "ts", "1 hour", "14 seconds",
          Seq(col("item")), Seq(count(lit(1)).as("ct")))
      }.where(col("item") =!= -1L)
      EventOps.topNOfCounts(counted.select(col("stt"), col("item"), col("ct")), 3)
        .select(col("stt"), col("item"), col("ct"), col("rnk"))
        .orderBy(col("stt"), col("rnk"))
    }),

    // Contamination n-gram sweep point (VERDICT r3 stretch): the q77 audit
    // at shingleN=5 — longer n-grams are the stricter leak test (fewer
    // incidental collisions); same inverted-index semi-join shape.
    "q86_contamination_n5" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Dedup.contaminationProfile(
          docs.where(col("doc_id") >= 50), docs.where(col("doc_id") < 50),
          shingleN = 5)
        .orderBy(col("doc_id"))
    }),

    // Decontamination: per candidate doc (id ≥ 50), the fraction of its
    // distinct 3-gram shingles that occur anywhere in the benchmark set
    // (id < 50) — the train/test-leakage audit.
    "q77_contamination" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Dedup.contaminationProfile(
          docs.where(col("doc_id") >= 50), docs.where(col("doc_id") < 50))
        .orderBy(col("doc_id"))
    }),

    // AS-OF join (composed piecewise-merge, Relational.asOfJoin): every
    // order picks the customer's latest k%3==0 "version" order at or
    // before its own key-time; DuckDB's native ASOF LEFT JOIN is the
    // oracle.
    "q78_asof_join" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val left = o.select(col("o_orderkey").as("k"), col("o_custkey").as("cust"))
        .withColumn("ts", col("k"))
      val right = o.where(col("o_orderkey") % 3 === 0)
        .select(col("o_custkey").as("cust"), col("o_orderkey").as("ts"),
          col("o_orderkey").as("ref_k"),
          col("o_totalprice").cast("decimal(18,2)").cast("double").as("ref_price"))
      Relational.asOfJoin(left, right, "cust", "ts", Seq("ref_k", "ref_price"))
        .select(col("k"), col("cust"), col("ref_k"), col("ref_price"))
        .orderBy(col("k"))
    }),

    // Binned range join (Relational.rangeJoinBinned): first-line lineitem
    // points against ±8 intervals around every 10th order key — the
    // equi-join-on-bin plan vs DuckDB's native inequality join.
    "q79_range_join" -> ((s, d) => {
      val pts = Tables.lineitem(s, d).where(col("l_linenumber") === 1)
        .select(col("l_orderkey").as("p"))
      val iv = Tables.orders(s, d).where(col("o_orderkey") % 10 === 0)
        .select(col("o_orderkey").as("ik"),
          (col("o_orderkey") - 8).as("lo"), (col("o_orderkey") + 8).as("hi"))
      Relational.rangeJoinBinned(pts, iv, "p", "lo", "hi", 16L)
        .select(col("p"), col("ik")).orderBy(col("p"), col("ik"))
    }),

    // "TopN hot items" (EventOps.topNPerWindow): hottest viewers per
    // hourly window, rank by count with deterministic ties.
    "q80_topn_window" -> ((s, d) =>
      EventOps.topNPerWindow(
          Tables.events(s, d).where(col("event_type") === "view"),
          "1 hour", col("user_id"), 3)
        .select(col("stt"), col("item"), col("ct"), col("rnk"))
        .orderBy(col("stt"), col("rnk"))),

    // HLL distinct-count sketch (Sketches.hllDistinct): 64 md5-derived
    // registers per group, integer-exact digests + the standard estimate —
    // the constant-bytes-per-group answer to count_distinct at 100 TB.
    "q81_hll_distinct" -> ((s, d) =>
      Sketches.hllDistinct(
          Tables.lineitem(s, d),
          Seq(col("l_returnflag")),
          col("l_orderkey").cast("string"))
        .select(col("l_returnflag"), col("n_buckets_hit"), col("reg_sum"),
          col("est_distinct"))
        .orderBy(col("l_returnflag"))),

    // Histogram-CDF quantile sketch (Sketches.histogramQuantiles): q74's
    // percentiles from ONE mergeable 128-bin pass instead of a per-group
    // sort — exact same output shape so the two plans compare directly.
    "q82_hist_quantile" -> ((s, d) =>
      Sketches.histogramQuantiles(
          Tables.events(s, d), col("event_type"), "event_type",
          col("value"), 128, Seq(0.5, 0.9, 0.99))
        .orderBy(col("event_type"))),

    // Streaming HLL twin (SketchStream.hllSketchStream): the SAME 64
    // registers as q81, but maintained as per-group transformWithState
    // state across 3 micro-batches (RocksDB) — constant bytes per key,
    // the 100 TB replacement for exact seen-key dedup state in the DWS
    // UU windows. Latest snapshot per group digested with the identical
    // hllStats math → gated against the identical DuckDB oracle.
    "q83_hll_distinct_stream" -> ((s, d) => {
      import s.implicits._
      val (bucket, rho) = Sketches.hllObs(col("l_orderkey").cast("string"))
      val obs = Tables.lineitem(s, d)
        .select(col("l_returnflag").as("g"), bucket.as("bucket"), rho.as("rho"),
          pmod(col("l_orderkey"), lit(3)).as("slice"))
      // 3-way split on the SOURCE key, not the register fields: the same
      // (g, bucket) register must keep point-maxing across batches
      val batches = (0 to 2).map(i => obs.where(col("slice") === i)
        .select(col("g"), col("bucket"), col("rho")).as[SketchStream.HllRow])
      s.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      try {
        val snaps = StreamHarness.runFiles(s, batches)(ds =>
          SketchStream.hllSketchStream(ds).toDF())
        val latest = snaps.groupBy(col("_1").as("l_returnflag"))
          .agg(max_by(col("_3"), col("_2")).as("regs"))
        Sketches.hllStats(latest, col("regs"))
          .select(col("l_returnflag"), col("n_buckets_hit"), col("reg_sum"),
            col("est_distinct"))
          .orderBy(col("l_returnflag"))
      } finally s.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }),

    // q43's refund pipeline on the SHUFFLE lookup-join strategy
    // (Relational.lookupJoin): the J4 plan for a dim PAST the broadcast
    // threshold — both dic enrichments hash-partition the dim instead of
    // broadcasting it (PlanSpec pins "no BroadcastExchange" for the dic
    // joins even at autoBroadcastJoinThreshold defaults). Shares q43's
    // oracle verbatim: the strategy must not change a single row.
    "q94_lookup_join_shuffle" -> ((s, d) =>
      orderRefundAgg(GmallPipelines.tradeOrderRefund(
        TopicDb(s, d), TopicDb.baseDic(s), GmallPipelines.shuffleDim))),

    // q93's funnel as a STREAMING pipeline (StatefulOps.FunnelProcessor):
    // per-user pruned candidate-list state recomputes the min-time
    // conversion chain across two disordered micro-batches (later days
    // arrive FIRST — the chain is not monotone under disorder, so this
    // feed breaks any one-scalar-per-step shortcut). Latest per-user
    // snapshot wins; counting max_step ≥ i reproduces the batch counts.
    // Shares q93's oracle verbatim.
    "q95_funnel_stream" -> ((s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d)
        .where(col("event_type").isin("view", "click", "purchase"))
        .as[StatefulOps.Event]
      s.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      val latest =
        try {
          val snaps = StreamHarness.runFiles(s, disorderedDayBatchesDs(ev))(ds =>
            StatefulOps.funnelStream(ds, Seq("view", "click", "purchase"),
              horizonSec = Some(7L * 86400L)).toDF())
          snaps.groupBy(col("_1").as("user_id"))
            .agg(max_by(col("_3"), col("_2")).as("max_step"))
        } finally s.conf.unset("spark.sql.streaming.stateStore.providerClass")
      Seq("view", "click", "purchase").zipWithIndex.map { case (step, i) =>
        latest.agg(count(when(col("max_step") >= i + 1, 1)).as("n_users"))
          .select(lit(i + 1).cast("long").as("step_idx"),
            lit(step).as("step"), col("n_users"))
      }.reduce(_ unionByName _).orderBy(col("step_idx"))
    }),

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

    // Dedup APPLY (Dedup.applyDedup): the surviving corpus after
    // collapsing q20's simhash near-dup groups (q84's star components) to
    // their canonical min-id docs — the step that turns pair/component
    // ANALYSIS into the actual deduped training corpus.
    "q97_dedup_apply" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Dedup.applyDedup(docs,
          Dedup.connectedComponentsStar(
            Dedup.simhashNearDups(Dedup.simhash(docs))))
        .select(col("doc_id"), col("lang"))
        .orderBy(col("doc_id"))
    }),

    // Per-source curation profile (Corpus.sourceProfile): the
    // domain-level keep/downsample decision input — volumes, language
    // spread, intra-source exact-dup volume per source.
    "q98_source_profile" -> ((s, d) =>
      graft.operators.Corpus.sourceProfile(Tables.documents(s, d))
        .orderBy(col("source"))),

    // kNN label purity — the standard embedding-quality probe over the
    // labeled embeddings table: fraction of each query's exact top-10
    // cosine neighbors sharing its label, aggregated per label. Reuses
    // q24's bit-exact scoring/ranking (bounded TopKAggregator); the
    // purity itself is a ratio of integer counts → oracle-safe.
    "q99_knn_label_purity" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val lbl = emb.select(col("vec_id"), col("label"))
      Similarity.bruteForceTopK(emb, emb.where(col("vec_id") % 50 === 0), 10)
        .join(lbl.select(col("vec_id").as("query_id"), col("label").as("q_lbl")),
          Seq("query_id"))
        .join(lbl.select(col("vec_id").as("neighbor_id"), col("label").as("n_lbl")),
          Seq("neighbor_id"))
        .groupBy(col("q_lbl").as("label"))
        .agg(countDistinct(col("query_id")).as("n_queries"),
          count(when(col("n_lbl") === col("q_lbl"), 1)).as("n_match"),
          count(lit(1)).as("n_pairs"))
        .withColumn("purity",
          round(col("n_match").cast("double") / col("n_pairs"), 6))
        .orderBy(col("label"))
    }),

    // S4 DATA PLANE (VERDICT r5 #2) — per-record Debezium CDC dim
    // maintenance: a full insert/update/delete changelog of a real
    // dimension (customer), synthesized as Debezium row envelopes, parsed
    // by the REAL envelope parser (Envelopes.parseDebeziumRows) and
    // maintained through the checkpointed streaming binding
    // DimSink.cdcSink → DeltaStore across three file-fed micro-batches:
    // inserts split across epochs 0/1, updates (later ts_ms) riding with
    // epoch 1, deletes last. A crash is then simulated by re-delivering
    // epoch 1 verbatim (the foreachBatch replay contract: same epochId →
    // overwrite its own delta dir): the replay must neither double rows
    // nor resurrect the epoch-2 delete tombstones. The oracle replays the
    // same changelog relationally.
    "q100_cdc_dim_maintain" -> ((s, d) => {
      import s.implicits._
      val root = java.nio.file.Files.createTempDirectory("graft_cdc_dim_").toString
      val cust = Tables.customer(s, d).select(col("c_custkey").as("k"),
        col("c_name").as("nm"), col("c_mktsegment").as("seg"))
      val maxK = cust.agg(max(col("k"))).head().getLong(0)
      val noMap = lit(null).cast("map<string,string>")
      def env(op: String, before: Column, after: Column, ts: Column): Column =
        to_json(struct(before.as("before"), after.as("after"),
          struct(lit("user_dim").as("table")).as("source"),
          lit(op).as("op"), ts.as("ts_ms"))).as("value")
      val fullRow = map(lit("id"), col("k").cast("string"),
        lit("uname"), col("nm"), lit("city"), col("seg"))
      def inserts(p: Int) = cust.where(pmod(col("k"), lit(2)) === p)
        .select(env("c", noMap, fullRow, col("k"))).as[String]
      val updates = cust.where(col("k") % 3 === 0)
        .select(env("u", noMap,
          map(lit("id"), col("k").cast("string"),
            lit("uname"), concat(col("nm"), lit("_v2")), lit("city"), col("seg")),
          col("k") + maxK)).as[String]
      val deletes = cust.where(col("k") % 5 === 0)
        .select(env("d", map(lit("id"), col("k").cast("string")), noMap,
          col("k") + 2L * maxK)).as[String]
      val epoch1 = inserts(1).unionByName(updates)
      val cfg = DimSink.TableConfig("dim_user", Seq("id", "uname", "city"), "id")
      val routes = Map("user_dim" -> cfg)
      // the engine's REAL epochIds, observed in commit order — the crash
      // replay below re-delivers the second feed chunk under the id it was
      // actually processed as (never assumes chunk i ⇒ batchId i)
      val epochs = scala.collection.mutable.ArrayBuffer.empty[Long]
      StreamHarness.runFilesSink(s, Seq(inserts(0), epoch1, deletes)) {
        (ds, ckpt) =>
          DimSink.cdcSink(Envelopes.parseDebeziumRows(ds.toDF()), root, routes,
            ckpt, onEpoch = epochs.append(_))
      }
      require(epochs.size == 3,
        s"q100: expected 3 micro-batches (one per feed chunk), saw $epochs — " +
          "the harness's chunk-per-trigger contract changed")
      // simulated crash replay of the second chunk (idempotent overwrite
      // of its own epoch dir)
      DimSink.processBatchCdc(
        Envelopes.parseDebeziumRows(epoch1.toDF()), root, routes, epochs(1))
      val out = DimSink.readDelta(s, root, cfg)
        .orderBy(col("id").cast("long"))
        .localCheckpoint(true) // materialize before the store dir vanishes
      org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(root))
      out
    }),

    // SUB-document dedup (VERDICT r5 #3) — paragraph-grain exact dedup:
    // docs explode into 10-word paragraphs, only the corpus-wide first
    // occurrence of each distinct paragraph survives (min (doc, pos)),
    // docs reassemble from their survivors (C4's repeated-lines rule /
    // RefinedWeb line-wise filtering, at paragraph grain). One
    // paragraph-grain min-agg shuffle + join back — never doc×doc.
    "q101_paragraph_dedup" -> ((s, d) =>
      Dedup.paragraphDedup(Tables.documents(s, d), 10)
        .orderBy(col("doc_id"))),

    // SemDeDup (VERDICT r5 #4) — semantic dedup over the embeddings table:
    // ~√N seed-centroid k-means cells (the paper's docs-per-cell-constant
    // regime — a FIXED cell count degenerates to O(N²/k) pair volume at
    // scale; iterations=0 ⇒ the oracle replays assignment bit-exactly via
    // the shared seed CTE at the same √N), near-dup pairs WITHIN cells
    // only (PlanSpec pins no cartesian/nested-loop in the pair join),
    // components collapsed to min-id canonicals, survivors passed through
    // — kmeansCentroids + cellNearDupPairs + connectedComponentsStar +
    // applyDedup composed.
    "q102_semdedup" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.semDedup(emb, semDedupCells(emb.count()), 0, 0.35)
        .select(col("vec_id"), col("label"))
        .orderBy(col("vec_id"))
    }),

    // q102's SEMANTIC grouping ON INGEST — SemDeDup's streaming twin
    // (FuzzyIngest's design with k-means cells for LSH bands): vectors
    // stream id-ascending across two file-fed micro-batches; centroids
    // freeze from batch 1's lowest ids (== the batch operator's seeds
    // under the ascending feed), a batch-2 near-dup of a batch-1 vector
    // collapses via the cell-indexed state, and bridging vectors relabel
    // merged groups. Shares q102's oracle verbatim.
    "q118_stream_semdedup" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
        .select(col("vec_id"), col("embedding"), col("label"))
      // cell count from the expected corpus scale (the production knob a
      // deployment sizes up front), same √N as the batch operator — the
      // ascending feed then freezes the identical corpus-lowest-id seeds
      val nCells = semDedupCells(emb.count())
      val mid = midOf(emb.agg(min(col("vec_id")), max(col("vec_id"))).head(),
        "embeddings (q118)")
      val root = java.nio.file.Files.createTempDirectory("graft_sem_ingest_").toString
      implicit val enc: org.apache.spark.sql.Encoder[(Long, Array[Float], Int)] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
      import s.implicits._
      StreamHarness.runFilesSink(s,
          Seq(emb.where(col("vec_id") <= mid).as[(Long, Array[Float], Int)],
            emb.where(col("vec_id") > mid).as[(Long, Array[Float], Int)])) {
        (ds, ckpt) =>
          ds.toDF().toDF("vec_id", "embedding", "label").writeStream
            .option("checkpointLocation", ckpt)
            .foreachBatch { (b: DataFrame, epochId: Long) =>
              graft.streaming.SemIngest.processBatch(
                b.toDF("vec_id", "embedding", "label"), root, epochId, nCells, 0.35)
            }.start()
      }
      val out = graft.streaming.SemIngest.survivors(s, root)
        .orderBy(col("vec_id"))
        .localCheckpoint(true) // materialize before the store dir vanishes
      org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(root))
      out
    }),

    // Exact dedup ON INGEST — q17's semantics as a stateful stream
    // (StatefulOps.firstPerKey): one survivor per distinct fingerprint
    // across two id-ordered file-fed micro-batches, state carrying the
    // seen-set across the boundary (a batch-2 copy of a batch-1 doc must
    // be suppressed by STATE, not by in-batch grouping). Deterministic:
    // each fingerprint's first batch contains its global min doc_id.
    "q103_stream_ingest_dedup" -> ((s, d) => {
      import s.implicits._
      val fps = Tables.documents(s, d)
        .select(TextFunctions.fingerprint(col("text")).as("fp"), col("doc_id"))
        .as[(String, Long)]
      val mid = midOf(fps.agg(min(col("doc_id")), max(col("doc_id"))).head(),
        "documents fingerprints (q103)")
      val batches = Seq(fps.where(col("doc_id") <= mid),
        fps.where(col("doc_id") > mid))
      StreamHarness.runFiles(s, batches)(ds =>
        StatefulOps.firstPerKey(ds).toDF())
        .select(col("_2").as("doc_id"), col("_1").as("fp"))
        .orderBy(col("doc_id"))
    }),

    // Boilerplate (template) profile — the cross-corpus recurrence signal
    // next to q101's removal: per doc, the fraction of its distinct
    // 10-word paragraphs occurring in ≥ 3 distinct docs.
    "q104_boilerplate_profile" -> ((s, d) =>
      Dedup.boilerplateProfile(Tables.documents(s, d), 10, 3)
        .orderBy(col("doc_id"))),

    // Bucketed co-located join (Relational.bucketize) — the storage-layout
    // half of shuffle minimization: both fact sides written bucketed +
    // sorted on the join key once, the join itself plans with NO Exchange
    // (PlanSpec pins it with broadcast disabled). Row-identical to the
    // plain join the oracle runs.
    "q105_bucketed_join" -> ((s, d) => {
      val dir = java.nio.file.Files.createTempDirectory("graft_bucket_").toString
      val o = Relational.bucketize(
        Tables.orders(s, d).select(col("o_orderkey"), col("o_orderstatus")),
        "graft_b_orders", "o_orderkey", 16, s"$dir/orders")
      val l = Relational.bucketize(
        Tables.lineitem(s, d).select(col("l_orderkey"), col("l_extendedprice")),
        "graft_b_lineitem", "l_orderkey", 16, s"$dir/lineitem")
      val out = o.df.join(l.df, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_price"))
        .orderBy(col("o_orderstatus"))
        .localCheckpoint(true) // materialize before tables/files vanish
      s.sql(s"DROP TABLE IF EXISTS `${o.table}`")
      s.sql(s"DROP TABLE IF EXISTS `${l.table}`")
      org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(dir))
      out
    }),

    // Partition-pruned layout (Relational.partitionByKey) — bucketing's
    // sibling: events re-written date-partitioned, one day read back; the
    // day filter prunes whole directories at plan time (PlanSpec pins
    // PartitionFilters on the scan). Row-identical to the plain filter
    // the oracle runs.
    "q106_partition_pruned" -> ((s, d) => {
      val dir = java.nio.file.Files.createTempDirectory("graft_part_").toString + "/ev"
      val parted = Relational.partitionByKey(
        Tables.events(s, d).withColumn("dt", to_date(col("ts")).cast("string")),
        Seq("dt"), dir)
      val minDt = parted.agg(min(col("dt")).cast("string")).head().getString(0)
      val out = parted.where(col("dt") === minDt)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("event_type"))
        .localCheckpoint(true) // materialize before the layout dir vanishes
      org.apache.hadoop.fs.FileUtil.fullyDelete(
        new java.io.File(dir).getParentFile)
      out
    }),

    // q101's keeper selection ON INGEST — the streaming twin of the
    // paragraph-dedup survivor set: paragraphs stream in doc-id order
    // across two file-fed micro-batches; firstPerKey's per-paragraph
    // state suppresses later copies ACROSS the boundary. Output =
    // (doc_id, pos) of surviving paragraphs, sharing q101's keeper CTEs
    // verbatim.
    "q108_stream_paragraph_dedup" -> ((s, d) => {
      import s.implicits._
      val paras = Dedup.explodeParagraphs(Tables.documents(s, d), 10)
        .select(col("para"),
          Dedup.encodePos(col("doc_id"), col("pos")).as("enc"))
        .as[(String, Long)]
      val mid = midOf(paras.agg(min(col("enc")), max(col("enc"))).head(),
        "exploded paragraphs (q108)")
      StreamHarness.runFiles(s,
          Seq(paras.where(col("enc") <= mid), paras.where(col("enc") > mid)))(ds =>
        StatefulOps.firstPerKey(ds).toDF())
        .select(expr(s"_2 div ${Dedup.ParaPosEncode}").as("doc_id"),
          pmod(col("_2"), lit(Dedup.ParaPosEncode)).as("pos"))
        .orderBy(col("doc_id"), col("pos"))
    }),

    // Paragraph-grain FUZZY dedup (VERDICT r6 #1) — q101's removal with
    // MinHash grouping: near-identical paragraph variants (a date or
    // username swapped — what exact hashing misses) collapse to one
    // survivor via distinct-text MinHash → LSH candidates → exact-Jaccard
    // verify (≥ 0.4) → star components; reassembly contract identical to
    // q101. With zero fuzzy groups this degrades to q101 exactly.
    "q109_paragraph_dedup_fuzzy" -> ((s, d) =>
      Dedup.paragraphDedupFuzzy(Tables.documents(s, d), 10, 0.4)
        .orderBy(col("doc_id"))),

    // FULL WAREHOUSE DAG, gate 1/3 (VERDICT r6 #2) — the whole
    // startFromFiles ods→dwd→dws graph runs ONCE per sf dir (DagRun) and
    // its outputs are hash-gated. This gate reads the DIM layer: the
    // statically-routed user store AND the comment store a Debezium
    // config row routed DYNAMICALLY mid-stream — upserted keyed stores,
    // not a batch projection.
    "q110_dag_dim_store" -> ((s, d) => {
      val wh = DagRun(s, d)
      // read through the store's RESOLVING reader (base ∪ pending deltas,
      // newest row per pk, tombstones hidden) — never the raw files, so
      // the gate exercises the store's upsert/delete semantics instead of
      // relying on the feed touching each key exactly once
      val u = DimSink.readDelta(s, s"$wh/dim",
          DimSink.TableConfig("dim_user_info", Seq("id", "name"), "id"))
        .select(lit("dim_user_info").as("store"), col("id"),
          col("name").as("v"), col("ts"))
      // ts < 4e9 strips the watermark-flush sentinel (the one payment_info
      // row with no real id), the DIM analogue of q40's vc != "zz"
      val p = DimSink.readDelta(s, s"$wh/dim",
          DimSink.TableConfig("dim_payment_info", Seq("id", "payment_type"), "id"))
        .where(col("ts") < 4000000000L)
        .select(lit("dim_payment_info").as("store"), col("id"),
          col("payment_type").as("v"), col("ts"))
      u.unionByName(p).orderBy(col("store"), col("ts"), col("id"))
    }),

    // DAG gate 2/3 — a DWD topic dir: the stateless trade_cart_add
    // pipeline's epoch=N dirs (one per micro-batch, overwrite-idempotent)
    // unioned and pushed through q36's full-select-list aggregate — the
    // STREAMED warehouse content must equal the batch pipeline's oracle.
    "q113_dag_dwd_cart" -> ((s, d) =>
      cartAddAgg(s.read.parquet(s"${DagRun(s, d)}/dwd/cart_add"))),

    // DAG gate — the TRADE family's wide table: order_pre epoch dirs
    // written by the DAG's watermarked detail⋈info⋈activity⋈coupon
    // interval-join query, with constituent rows of one order hash-split
    // ACROSS micro-batches (the join state carries the boundary), pushed
    // through q39's aggregate — the streamed cross-batch join content
    // must equal the batch wide table's oracle. Sentinel rows never
    // reach this output (the detail⋈info core is an inner join; the
    // flush rows' order ids join nothing).
    "q115_dag_dwd_order_pre" -> ((s, d) =>
      orderPreAgg(s.read.parquet(s"${DagRun(s, d)}/dwd/order_pre"))),

    // DAG gates — the remaining trade-family outputs, each the DAG's own
    // streamed parquet pushed through its batch gate's aggregate against
    // the SHARED oracle. None needs a sentinel strip: every core join is
    // inner and the flush rows' ids join nothing real.
    "q119_dag_dwd_pay_success" -> ((s, d) =>
      paySuccessAgg(s.read.parquet(s"${DagRun(s, d)}/dwd/pay_success"))),

    "q120_dag_dwd_cancel" -> ((s, d) =>
      cancelAgg(s.read.parquet(s"${DagRun(s, d)}/dwd/cancel"))),

    "q121_dag_dwd_order_refund" -> ((s, d) =>
      orderRefundAgg(s.read.parquet(s"${DagRun(s, d)}/dwd/order_refund"))),

    "q122_dag_dwd_refund_pay_suc" -> ((s, d) =>
      refundPayAgg(s.read.parquet(s"${DagRun(s, d)}/dwd/refund_pay_suc"))),

    // DAG gate 3/3 — a DWS window table: the traffic 1 h tumbling window
    // parquet written by the DAG's own streaming query, sharing q40's
    // oracle (same log synthesis, same sentinel strip).
    "q114_dag_dws_traffic" -> ((s, d) =>
      trafficWindowSelect(s.read.parquet(s"${DagRun(s, d)}/dws/traffic"))),

    // DAG gate — the OTHER DWS window: the keyword tokenizer chain
    // (UDTF explode + 10 s tumble) written by the DAG's own streaming
    // query over the same topic_log stream the traffic window reads,
    // sharing q37's oracle. The two log row families are mutually
    // invisible (keyword rows carry no vc; traffic rows no item_type).
    "q117_dag_dws_keyword" -> ((s, d) =>
      keywordWindowSelect(s.read.parquet(s"${DagRun(s, d)}/dws/keyword"))),

    // q109's FUZZY grouping ON INGEST — the streaming twin (the same
    // step up from q103/q108's exact firstPerKey that q109 is from
    // q101): paragraph instances stream enc-ascending across two
    // file-fed micro-batches through FuzzyIngest's per-epoch store — a
    // batch-2 variant of a batch-1 paragraph must collapse via the LSH
    // index in STATE, and a batch-2 text bridging two batch-1 groups
    // relabels both (incremental union). Output = the keeper keys,
    // sharing q109's oracle CTEs verbatim.
    "q116_stream_paragraph_fuzzy" -> ((s, d) => {
      import s.implicits._
      val paras = Dedup.explodeParagraphs(Tables.documents(s, d), 10)
        .select(Dedup.encodePos(col("doc_id"), col("pos")).as("enc"), col("para"))
        .as[(Long, String)]
      val mid = midOf(paras.agg(min(col("enc")), max(col("enc"))).head(),
        "exploded paragraphs (q116)")
      val root = java.nio.file.Files.createTempDirectory("graft_fuzzy_ingest_").toString
      StreamHarness.runFilesSink(s,
          Seq(paras.where(col("enc") <= mid), paras.where(col("enc") > mid))) {
        (ds, ckpt) =>
          ds.toDF().toDF("enc", "para").writeStream
            .option("checkpointLocation", ckpt)
            .foreachBatch { (b: DataFrame, epochId: Long) =>
              graft.streaming.FuzzyIngest.processBatch(
                b.toDF("enc", "para"), root, epochId, 0.4)
            }.start()
      }
      val out = graft.streaming.FuzzyIngest.survivors(s, root)
        .orderBy(col("doc_id"), col("pos"))
        .localCheckpoint(true) // materialize before the store dir vanishes
      org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(root))
      out
    }),

    // DAG gates — the CURATION leg (VERDICT r7 #6): FuzzyIngest and
    // SemIngest run as startFromFiles DAG members over the documents/
    // embeddings feeds (checkpointed foreachBatch queries into their
    // incremental bucketed stores), beside the reference warehouse graph.
    // Each store's survivor set shares its harness twin's oracle verbatim
    // (q116's keeper CTEs, q102/q118's SemDeDup oracle).
    "q123_dag_paragraph_fuzzy" -> ((s, d) =>
      graft.streaming.FuzzyIngest.survivors(s, s"${DagRun(s, d)}/curation/fuzzy")
        .orderBy(col("doc_id"), col("pos"))),

    "q124_dag_semdedup" -> ((s, d) =>
      graft.streaming.SemIngest.survivors(s, s"${DagRun(s, d)}/curation/sem")
        .orderBy(col("vec_id"))),

    // END-TO-END curation pipeline — the composition proof: paragraph
    // dedup (q101) feeds language-ID + token counting (q15/q16) feeds
    // hash-gated stratified sampling (q60), all over the DEDUPED text.
    // A reference user's whole curation run is one declarative plan —
    // Catalyst fuses the stages; nothing materializes between them.
    "q107_curation_pipeline" -> ((s, d) => {
      val deduped = Dedup.paragraphDedup(Tables.documents(s, d), 10)
        .where(col("n_kept") > 0)
        .select(col("doc_id"), col("kept_text").as("text"))
      val sampled = graft.operators.Corpus.stratifiedSample(deduped,
        col("doc_id"), TextFunctions.langId(col("text")),
        Map("en" -> 0.5, "cjk" -> 1.0, "unknown" -> 0.125))
      sampled.groupBy(TextFunctions.langId(col("text")).as("lang_pred"))
        .agg(count(lit(1)).as("n_docs"),
          sum(TextFunctions.tokenCount(col("text")).cast("long")).as("sum_tokens"),
          sum(col("doc_id")).as("sum_ids"))
        .orderBy(col("lang_pred"))
    }),

    // TTL-ACTIVE ingest dedup (the round-7 ask): retention-window dedup
    // with the reference's 1-day state TTL actually EXPIRING state —
    // StatefulOps.firstPerKeyRetention defines the window in EVENT time
    // (admit iff first sighting or gap from the previous sighting > 1 day;
    // every sighting refreshes), so the TTL path is decided by the data and
    // the DuckDB LAG oracle checks it row-for-row. The events feed replays
    // as three ts-range micro-batches; at sf0.01 the per-key gap median is
    // ~1.45 days, so both suppression (~40 % of sightings) and
    // TTL-expiry re-admission (~60 %) are exercised in bulk.
    "q125_stream_retention_dedup" -> ((s, d) => {
      import s.implicits._
      val tUs = unix_micros(col("ts"))
      val ev = Tables.events(s, d).select(
        concat_ws(":", col("user_id"), col("event_type")).as("key"),
        col("event_id").as("id"), col("ts"))
      val mm = ev.agg(min(tUs), max(tUs)).head()
      val (lo, hi) = (mm.getLong(0), mm.getLong(1))
      val (c1, c2) = (lo + (hi - lo) / 3, lo + 2 * (hi - lo) / 3)
      val batches = Seq(
        ev.where(tUs <= c1), ev.where(tUs > c1 && tUs <= c2), ev.where(tUs > c2))
        .map(_.as[(String, Long, java.sql.Timestamp)])
      StreamHarness.runFiles(s, batches)(ds =>
        StatefulOps.firstPerKeyRetention(ds, java.time.Duration.ofDays(1)).toDF())
        .select(col("_2").as("id"), col("_1").as("key"))
        .orderBy(col("id"))
    }),

    // Exact-substring duplication profile (Lee et al. 2022) — the
    // character-window dedup method next to the paragraph-grain ops:
    // 40-char windows at stride 10, cross-doc duplicated windows merged
    // into spans per doc (gaps-and-islands). Catches boilerplate that
    // straddles line boundaries, which q101/q104's paragraph hashing
    // can't see. The oracle replays the identical window/df/island logic.
    "q126_substring_dup" -> ((s, d) =>
      Dedup.substringDupProfile(Tables.documents(s, d), 40, 10)
        .orderBy(col("doc_id"))),

    // SemDeDup centroid RECENTERING under the oracle gate — q118's
    // maintenance op for true unbounded ingest, no longer spec-only. The
    // two halves stream DESCENDING, so the frozen batch-1 quantizer seeds
    // from the HIGH half's lowest ids (an unrepresentative geometry —
    // exactly the drift scenario); `recenter` then refits over the whole
    // store with corpus-lowest-id seeds (lloydRounds = 0 → the same
    // bit-replicable seed partitioning as q54/q102's oracles) and scores
    // every moved vector against its new cellmates. Groups only MERGE, so
    // the survivor set is the min-id members of the components of the
    // UNION of both geometries' within-cell pair sets — which is exactly
    // what the oracle replays (two assignment CTEs, one recursive reach).
    // At the testdata SFs the stale lopsided geometry happens to
    // OVER-discover (few hot cells → more within-cell pairs), so the
    // union degenerates to the frozen set — the gate therefore pins the
    // no-split direction (a full re-geometry must not lose one prior
    // suppression) and the exact union-components contract; the
    // merge-DISCOVERY direction is pinned by SemIngestSpec's planted
    // stale-split pair.
    "q127_semdedup_recenter" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
        .select(col("vec_id"), col("embedding"), col("label"))
      val nCells = semDedupCells(emb.count())
      val mid = midOf(emb.agg(min(col("vec_id")), max(col("vec_id"))).head(),
        "embeddings (q127)")
      val root = java.nio.file.Files.createTempDirectory("graft_sem_rec_").toString
      implicit val enc: org.apache.spark.sql.Encoder[(Long, Array[Float], Int)] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
      import s.implicits._
      StreamHarness.runFilesSink(s,
          Seq(emb.where(col("vec_id") > mid).as[(Long, Array[Float], Int)],
            emb.where(col("vec_id") <= mid).as[(Long, Array[Float], Int)])) {
        (ds, ckpt) =>
          ds.toDF().toDF("vec_id", "embedding", "label").writeStream
            .option("checkpointLocation", ckpt)
            .foreachBatch { (b: DataFrame, epochId: Long) =>
              graft.streaming.SemIngest.processBatch(
                b.toDF("vec_id", "embedding", "label"), root, epochId, nCells, 0.35)
            }.start()
      }
      graft.streaming.SemIngest.recenter(s, root, nCells, epochId = 2L,
        threshold = 0.35, lloydRounds = 0)
      val out = graft.streaming.SemIngest.survivors(s, root)
        .orderBy(col("vec_id"))
        .localCheckpoint(true) // materialize before the store dir vanishes
      org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(root))
      out
    }),

    // Unigram-LM surprisal — the perplexity-proxy quality filter
    // (CCNet/Gopher-style, self-trained): per doc, the mean −ln p(token)
    // under corpus unigram frequencies; production drops both tails.
    // Per-token surprisals round to 6 dp before an exact DECIMAL
    // summation, so the oracle compares bit-for-bit.
    "q128_unigram_surprisal" -> ((s, d) =>
      graft.operators.TextProfile.unigramSurprisal(Tables.documents(s, d))
        .orderBy(col("doc_id"))),

    // Cross-source duplication matrix — the mixture-weights diagnostic
    // next to q98's per-source profile: distinct shared fingerprints and
    // set-Jaccard per source pair. Pair space is fp-equi-join bounded
    // (≤ sources² rows per fingerprint), never doc×doc. The synthetic
    // corpus's exact dups are within-source only, so the gate pins the
    // diagonal + correct ABSENCE of cross rows; CorpusSpec plants the
    // cross-source case.
    "q129_cross_source_overlap" -> ((s, d) =>
      graft.operators.Corpus.crossSourceOverlap(Tables.documents(s, d))
        .orderBy(col("src_a"), col("src_b"))),

    // Temperature-flattened mixture sampling (T=2, α=½): the
    // multilingual rebalance next to q60's FIXED-weight sample — per-lang
    // keep fraction √(n_min/n_lang) derived from the observed counts, so
    // the dominant language thins toward the flattened share while the
    // smallest is kept whole. Gate pins the kept set per stratum (count +
    // id checksum).
    "q130_temperature_sample" -> ((s, d) =>
      graft.operators.Corpus.temperatureSample(
          Tables.documents(s, d), col("lang"), col("doc_id"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("doc_id")).as("sum_ids"))
        .orderBy(col("lang"))),

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

    // Two-stage PQ retrieval: q90's ADC codes shortlist 50 candidates per
    // query, exact cosine re-ranks to top-10 — the IVFADC refine step.
    "q133_ann_pq_rerank" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.pqRerankTopK(emb, emb.where(col("vec_id") % 50 === 0),
          10, 64, shortlist = 50)
        .withColumn("rank", col("rank").cast("long"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // IVF index ON INGEST (AnnIngest): two ascending micro-batches
    // accrete the cell-partitioned store (centroids frozen from batch 1's
    // lowest-id seeds ≡ the corpus seeds under this feed; epoch-dir
    // overwrites make replays idempotent), then the store-backed
    // ivfSearch must equal the batch ivfTopK plan — shares q54's oracle
    // verbatim.
    "q134_stream_ann_ingest" -> ((s, d) => {
      val emb = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
      val mid = midOf(emb.agg(min(col("vec_id")), max(col("vec_id"))).head(),
        "embeddings (q134)")
      val root = java.nio.file.Files.createTempDirectory("graft_ann_ingest_").toString
      implicit val enc: org.apache.spark.sql.Encoder[(Long, Array[Float])] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
      import s.implicits._
      StreamHarness.runFilesSink(s,
          Seq(emb.where(col("vec_id") <= mid).as[(Long, Array[Float])],
            emb.where(col("vec_id") > mid).as[(Long, Array[Float])])) {
        (ds, ckpt) =>
          ds.toDF("vec_id", "embedding").writeStream
            .option("checkpointLocation", ckpt)
            .foreachBatch { (b: DataFrame, epochId: Long) =>
              graft.streaming.AnnIngest.processBatch(
                b.toDF("vec_id", "embedding"), root, epochId, nCells = 16)
            }.start()
      }
      val out = graft.streaming.AnnIngest.searchStore(s, root,
          Tables.embeddings(s, d).where(col("vec_id") % 50 === 0), 10, nProbe = 4)
        .withColumn("rank", col("rank").cast("long"))
        .orderBy(col("query_id"), col("rank"))
        .localCheckpoint(true) // materialize before the store dir vanishes
      org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(root))
      out
    }),

    // Token-budget selection: q132's importance scores ranked into a
    // half-the-corpus token budget via the distributed prefix scan — the
    // DSIR selection step end-to-end.
    "q135_budget_select" -> ((s, d) => {
      val iw = TextProfile.importanceWeight(
        Tables.documents(s, d), col("lang") === "en")
      val budget = iw.agg(sum(col("n_toks"))).head().getLong(0) / 2
      graft.operators.Corpus.selectByTokenBudget(
          iw, "doc_id", "importance", "n_toks", budget)
        .orderBy(col("doc_id"))
    }),

    // Per-group cap: ≤10 docs per source by smallest md5(id) — the
    // deterministic "max docs per domain" rule, bounded-heap aggregated
    // (≤n rows per (partition, group) shuffle, no per-group sort window).
    "q136_cap_per_group" -> ((s, d) =>
      graft.operators.Corpus.capPerGroup(
          Tables.documents(s, d), "source", "doc_id", 10)
        .select(col("doc_id"), col("source"))
        .orderBy(col("doc_id"))),

    // Per-group cap ON INGEST (CapIngest): two DESCENDING micro-batches —
    // min-n-by-hash is associative, so unlike the geometry-frozen ingest
    // ops this twin is feed-order independent by construction; a batch-2
    // smaller-hash arrival must EVICT a batch-1 keeper from the store.
    // Shares q136's oracle verbatim.
    // ANN index-quality monitor: recall@10 of the IVF path (q54's exact
    // params) against the brute-force ranking (q24's), per sampled query —
    // the continuous eval a production vector store runs on its index.
    "q138_ann_recall" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val qs = emb.where(col("vec_id") % 50 === 0)
      Similarity.recallAtK(
          Similarity.ivfTopK(emb, qs, 10, nCells = 16, nProbe = 4),
          Similarity.bruteForceTopK(emb, qs, 10))
        .orderBy(col("query_id"))
    }),

    "q137_stream_cap_per_group" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("source"))
      val mid = midOf(docs.agg(min(col("doc_id")), max(col("doc_id"))).head(),
        "documents (q137)")
      val root = java.nio.file.Files.createTempDirectory("graft_cap_ingest_").toString
      import s.implicits._
      StreamHarness.runFilesSink(s,
          Seq(docs.where(col("doc_id") > mid).as[(Long, String)],
            docs.where(col("doc_id") <= mid).as[(Long, String)])) {
        (ds, ckpt) =>
          ds.toDF("doc_id", "source").writeStream
            .option("checkpointLocation", ckpt)
            .foreachBatch { (b: DataFrame, epochId: Long) =>
              graft.streaming.CapIngest.processBatch(
                b.toDF("doc_id", "source"), root, epochId, 10, "source", "doc_id")
            }.start()
      }
      val out = graft.streaming.CapIngest.survivors(s, root, "source", "doc_id")
        .orderBy(col("doc_id"))
        .localCheckpoint(true) // materialize before the store dir vanishes
      org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(root))
      out
    }),

    // Token-window chunking: 32-token windows, stride 24, clamped tail —
    // the sequence-prep step between curation and tokenization. Doc-local
    // explode, zero shuffle; chunks pinned by md5 fingerprint.
    "q139_token_chunk" -> ((s, d) =>
      graft.operators.Corpus.chunkByTokens(Tables.documents(s, d))
        .orderBy(col("doc_id"), col("chunk_id"))),

    // Leakage-free holdout split: split is a pure function of the CONTENT
    // fingerprint, so exact dups can never straddle train/heldout. 10%
    // heldout via the md5-ppm gate.
    "q140_holdout_split" -> ((s, d) =>
      graft.operators.Corpus.holdoutSplit(Tables.documents(s, d))
        .orderBy(col("doc_id"))),

    // Cross-split 8-gram contamination audit over q140's split: per
    // heldout doc, distinct grams / grams also in train / flag. All joins
    // at gram grain, never doc×doc.
    "q141_split_contamination" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      graft.operators.Corpus.splitContamination(
          docs, graft.operators.Corpus.holdoutSplit(docs))
        .orderBy(col("doc_id"))
    }),

    // NEAR-dup-aware holdout split: q140's rule keyed by q84/q97's
    // simhash component representative, so paraphrase variants can't
    // straddle train/heldout either. Shares q97's component chain.
    "q142_neardup_split" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      graft.operators.Corpus.holdoutSplitByClusters(docs,
          Dedup.connectedComponentsStar(
            Dedup.simhashNearDups(Dedup.simhash(docs))))
        .orderBy(col("doc_id"))
    }),

    // CCNet perplexity banding: q128's surprisal ranked by the
    // range-partitioned exact global rank (no single-task window), cut
    // into equal-population head/middle/tail bands.
    "q143_perplexity_bands" -> ((s, d) =>
      TextProfile.perplexityBands(Tables.documents(s, d))
        .orderBy(col("doc_id"))),

    // Quality-aware dedup apply: q97's components, but the keeper is the
    // LOWEST-surprisal member (best copy survives, not first copy) —
    // keeper election via one bounded min_by aggregate.
    "q144_dedup_best_keeper" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Dedup.applyDedupBestKeeper(docs,
          Dedup.connectedComponentsStar(
            Dedup.simhashNearDups(Dedup.simhash(docs))),
          TextProfile.unigramSurprisal(docs))
        .select(col("doc_id"), col("lang"))
        .orderBy(col("doc_id"))
    }),

    // Count-min sketch heavy hitters: 4×256 counter table over the token
    // stream, point estimates vs exact counts — est ≥ exact pinned in the
    // output (overcount column), sketch size O(d·w) at any corpus.
    "q145_cms_heavyhitters" -> ((s, d) => {
      val toks = Tables.documents(s, d)
        .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("tok"))
      val exact = toks.groupBy(col("tok")).agg(count(lit(1)).as("exact"))
      graft.operators.Sketches.cmsEstimate(
          graft.operators.Sketches.cmsTable(toks, col("tok")),
          exact.select(col("tok")), col("tok"))
        .join(exact.select(col("tok").as("key"), col("exact")), Seq("key"))
        .select(col("key"), col("est"), col("exact"),
          (col("est") - col("exact")).as("overcount"))
        .orderBy(col("key"))
    }),

    // q145's CMS built ON INGEST: counter cells are additive, so the
    // per-key histogram state processor (q91's HistSketchProcessor, keyed
    // by hash row) IS a streaming count-min — no new operator, pure
    // composition. Three doc-hash micro-batches accrete the cells; the
    // latest snapshot per row must estimate exactly like the one-pass
    // batch table. Shares q145's oracle verbatim.
    "q146_cms_stream" -> ((s, d) => {
      import s.implicits._
      val toks = Tables.documents(s, d).select(col("doc_id"),
        explode(graft.functions.TextFunctions.tokens(col("text"))).as("tok"))
      // all 4 row-hashes in one pass over the cached tokens (posexplode,
      // not a 4-way union) — mirrors the cmsTable one-pass shape
      val obs = toks.select(
          posexplode(array((0 until 4).map(j =>
            pmod(Dedup.md5Long(concat_ws(":", lit(j.toString), col("tok"))),
              lit(256L)).cast("int")): _*)).as(Seq("j", "bin")),
          pmod(col("doc_id"), lit(3)).as("slice"))
        .select(concat(lit("cms"), col("j")).as("g"), col("bin"), col("slice"))
      val batches = (0 to 2).map(i => obs.where(col("slice") === i)
        .select(col("g"), col("bin")).as[SketchStream.BinRow])
      s.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      try {
        val snaps = StreamHarness.runFiles(s, batches)(ds =>
          SketchStream.histSketchStream(ds, 256).toDF())
        val sketch = snaps.groupBy(col("_1").as("g"))
          .agg(max_by(col("_3"), col("_2")).as("cells"))
          .select(substring(col("g"), 4, 10).cast("int").as("j"),
            posexplode(col("cells")).as(Seq("b", "c")))
          .where(col("c") > 0)
          .select(col("j"), col("b").cast("long").as("b"), col("c"))
        val exact = toks.groupBy(col("tok")).agg(count(lit(1)).as("exact"))
        graft.operators.Sketches.cmsEstimate(sketch, exact.select(col("tok")), col("tok"))
          .join(exact.select(col("tok").as("key"), col("exact")), Seq("key"))
          .select(col("key"), col("est"), col("exact"),
            (col("est") - col("exact")).as("overcount"))
          .orderBy(col("key"))
      } finally s.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }),

    // Substring dedup APPLY: q126's merged spans spliced OUT of the text
    // (the Lee et al. cleaning step q126 only measures) — one codegen'd
    // aggregate fold over each doc's sorted span array; no-span docs pass
    // through. Audit rows: cleaned fingerprint + before/after chars.
    "q147_substring_dedup_apply" -> ((s, d) =>
      Dedup.substringDedupApply(Tables.documents(s, d))
        .orderBy(col("doc_id"))),

    // Distribution-drift monitor: PSI of the value distribution per
    // event_type between the first and second half of the time range —
    // 32 global bins, add-1 smoothing over the full grid, DECIMAL-exact
    // term summation. One scan of the corpus; O(groups·bins) beyond it.
    "q148_drift_psi" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val mm = ev.agg(min(unix_micros(col("ts"))), max(unix_micros(col("ts")))).head()
      val mid = (mm.getLong(0) + mm.getLong(1)) / 2
      Sketches.driftPsi(ev, col("event_type"), "event_type", col("value"),
          unix_micros(col("ts")) <= mid)
        .orderBy(col("event_type"))
    }),

    // Blob-store dedup accounting per mime: payload counts, distinct
    // payloads by content md5, and the CAS byte savings — content bytes
    // hashed at the scan, never shuffled.
    "q149_media_dedup_accounting" -> ((s, d) =>
      Multimodal.dedupAccounting(
          Multimodal.ingestDocsAsMedia(Tables.documents(s, d)))
        .orderBy(col("mime"))),

    // DeltaStore TIME TRAVEL: epochs 0-2 upsert the events changelog
    // (sliced by event_id % 3), epoch 3 is a tombstone-only batch
    // retiring user_id % 7 == 0, epoch 4 re-upserts those keys. Then
    // readAsOf(3) must show the retired keys HIDDEN (their newest ≤3 row
    // is the tombstone) and the epoch-4 resurrection INVISIBLE (epoch
    // cap) — both travel behaviors in one view.
    "q151_delta_time_travel" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("value"), unix_micros(col("ts")).as("ts_us"),
          pmod(col("event_id"), lit(3)).as("_ep"))
      val root = java.nio.file.Files.createTempDirectory("graft_tt_").toString
      (0L to 2L).foreach { e =>
        graft.streaming.DeltaStore.append(
          ev.where(col("_ep") === e).drop("_ep"), Seq("user_id"), "ts_us", root, e)
      }
      val sevens = ev.where(col("user_id") % 7 === 0)
      graft.streaming.DeltaStore.append(
        ev.where(lit(false)).drop("_ep"), Seq("user_id"), "ts_us", root, 3L,
        deleteKeys = Some(sevens.select(col("user_id")).distinct()))
      graft.streaming.DeltaStore.append(
        sevens.where(col("_ep") === 0).drop("_ep"), Seq("user_id"), "ts_us", root, 4L)
      val out = graft.streaming.DeltaStore
        .readAsOf(s, root, Seq("user_id"), "ts_us", epoch = 3L)
        .orderBy(col("user_id"))
        .localCheckpoint(true) // materialize before the store dir vanishes
      org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(root))
      out
    }),

    // DeltaStore CHANGE DATA FEED over the same changelog: the net
    // effect of epochs (1, 3] — every key's newest epoch-2 upsert,
    // except the %7 keys whose epoch-3 tombstone wins and surfaces as an
    // op='d' row (nulled data) for downstream incremental consumers.
    "q152_delta_cdf" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("value"), unix_micros(col("ts")).as("ts_us"),
          pmod(col("event_id"), lit(3)).as("_ep"))
      val root = java.nio.file.Files.createTempDirectory("graft_cdf_").toString
      (0L to 2L).foreach { e =>
        graft.streaming.DeltaStore.append(
          ev.where(col("_ep") === e).drop("_ep"), Seq("user_id"), "ts_us", root, e)
      }
      graft.streaming.DeltaStore.append(
        ev.where(lit(false)).drop("_ep"), Seq("user_id"), "ts_us", root, 3L,
        deleteKeys = Some(ev.where(col("user_id") % 7 === 0)
          .select(col("user_id")).distinct()))
      val out = graft.streaming.DeltaStore
        .readChanges(s, root, Seq("user_id"), "ts_us", fromEpoch = 1L, toEpoch = 3L)
        .withColumnRenamed("_op", "op")
        .orderBy(col("user_id"))
        .localCheckpoint(true) // materialize before the store dir vanishes
      org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(root))
      out
    }),

    // Curation FUNNEL: the per-stage drop accounting of the full build —
    // simhash NEAR-dup dedup (q97's components) → Gopher quality →
    // per-source cap → decontamination (benchmark docs retire with their
    // overlaps). Every stage is the real operator; the gate pins all
    // four in/out counts at once.
    "q153_curation_funnel" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      graft.operators.Corpus.curationFunnel(docs,
          components = Some(Dedup.connectedComponentsStar(
            Dedup.simhashNearDups(Dedup.simhash(docs)))))
        .orderBy(col("stage"))
    }),

    // Declared data-quality EXPECTATIONS over lineitem: not-null / unique
    // key / ranges / enums / FK-to-orders, exact violation counts — two
    // of them (price range, single-status enum) intentionally FAIL so
    // the counting path is pinned, not just the all-green one. All
    // scalar checks fold into ONE aggregate pass.
    "q154_expectations" -> ((s, d) => {
      import graft.operators.Expectations._
      check(Tables.lineitem(s, d), Seq(
          NotNull("l_orderkey"),
          UniqueKey(Seq("l_orderkey", "l_linenumber")),
          InRange("l_quantity", 1, 50),
          InRange("l_extendedprice", 0, 1000),
          InSet("l_returnflag", Seq("A", "N", "R")),
          InSet("l_linestatus", Seq("O")),
          RefIntegrity("l_orderkey", Tables.orders(s, d), "o_orderkey")))
        .orderBy(col("expectation"))
    }),

    // Deterministic weighted sampling without replacement (A-ES): docs
    // weighted by n_chars, top-100 of the md5-derived ln(u)/w keys —
    // reproducible across engines, weight-faithful, no single-task sort.
    "q156_weighted_sample" -> ((s, d) =>
      graft.operators.Corpus.weightedSample(
          Tables.documents(s, d), "doc_id", col("n_chars"), 100)
        .orderBy(col("rank"))),

    // ONLINE drift monitor: the events stream in three time-tercile
    // micro-batches; epoch 0 freezes the reference distribution, every
    // later epoch computes its per-event-type PSI against it under
    // FIXED global bin bounds (data-derived bounds would move the grid
    // under the comparison) — the production data-drift alarm, one audit
    // row per (epoch, group).
    "q157_stream_drift" -> ((s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d).select(col("event_type"), col("value"),
        unix_micros(col("ts")).as("ts_us"))
      val mm = ev.agg(min(col("ts_us")), max(col("ts_us")),
        min(col("value")).cast("double"), max(col("value")).cast("double")).head()
      val (tlo, thi) = (mm.getLong(0), mm.getLong(1))
      val (vlo, vhi) = (mm.getDouble(2), mm.getDouble(3))
      // integer `div`, not `/`: Column `/` is DOUBLE division and a
      // boundary row could floor differently from the oracle's exact `//`
      val terc = expr(s"((ts_us - ${tlo}L) * 3L) div ${thi - tlo + 1}L")
      val root = java.nio.file.Files.createTempDirectory("graft_drift_").toString
      StreamHarness.runFilesSink(s, (0 to 2).map(e =>
          ev.where(terc === e.toLong)
            .select(col("event_type"), col("value"))
            .as[(String, Double)])) {
        (ds, ckpt) =>
          ds.toDF("event_type", "value").writeStream
            .option("checkpointLocation", ckpt)
            .foreachBatch { (b: DataFrame, epochId: Long) =>
              if (epochId == 0L)
                b.write.mode("overwrite").parquet(s"$root/ref")
              else {
                val ref = b.sparkSession.read.parquet(s"$root/ref")
                graft.operators.Sketches.driftPsiBounded(
                    ref.withColumn("_ra", lit(true))
                      .unionByName(b.withColumn("_ra", lit(false))),
                    col("event_type"), "event_type", col("value"), col("_ra"),
                    vlo, vhi, 32)
                  .withColumn("epoch", lit(epochId))
                  .write.mode("overwrite").parquet(s"$root/audit/epoch_id=$epochId")
              }
              ()
            }.start()
      }
      val out = s.read.parquet(s"$root/audit")
        .select(col("epoch"), col("event_type"), col("n_a"), col("n_b"), col("psi"))
        .orderBy(col("epoch"), col("event_type"))
        .localCheckpoint(true) // materialize before the audit dir vanishes
      org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(root))
      out
    }),

    // Expectations ON INGEST: the same contract checks run per
    // micro-batch inside foreachBatch, audit rows landing per epoch —
    // the fail-fast data-quality monitor a streaming pipeline runs on
    // every drop. Three event slices; per-epoch counts must equal the
    // batch operator on each slice.
    "q155_stream_expectations" -> ((s, d) => {
      import s.implicits._
      import graft.operators.Expectations._
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      val root = java.nio.file.Files.createTempDirectory("graft_exp_").toString
      StreamHarness.runFilesSink(s, (0 to 2).map(i =>
          ev.where(pmod(col("event_id"), lit(3)) === i)
            .as[(Long, Long, String, Double)])) {
        (ds, ckpt) =>
          ds.toDF("event_id", "user_id", "event_type", "value").writeStream
            .option("checkpointLocation", ckpt)
            .foreachBatch { (b: DataFrame, epochId: Long) =>
              check(b, Seq(
                  NotNull("user_id"),
                  InRange("value", 0, 100),
                  InSet("event_type", Seq("view", "click", "purchase"))))
                .withColumn("epoch", lit(epochId))
                .write.mode("overwrite").parquet(s"$root/audit/epoch_id=$epochId")
              ()
            }.start()
      }
      val out = s.read.parquet(s"$root/audit")
        .select(col("epoch"), col("expectation"), col("n_checked"),
          col("n_violations"), col("pass"))
        .orderBy(col("epoch"), col("expectation"))
        .localCheckpoint(true) // materialize before the audit dir vanishes
      org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(root))
      out
    }),

    // The GlobalWindowTopK optimizer rule under the oracle: the naive
    // global row_number()-top-k SQL (the single-task-sort antipattern)
    // runs through graft's injected rewrite — planned as distributed
    // partial-heap TakeOrderedAndProject — and must still produce the
    // exact ranking ((value DESC, event_id) totally orders, so ties
    // can't hide in the rewrite's tie license).
    "q150_topk_sql" -> ((s, d) => {
      graft.GraftExtensions.registerAll(s)
      Tables.events(s, d).createOrReplaceTempView("events_q150")
      val out = s.sql(
        """SELECT event_id, value, rn FROM (
          |  SELECT event_id, value,
          |    row_number() OVER (ORDER BY value DESC, event_id) AS rn
          |  FROM events_q150) WHERE rn <= 100""".stripMargin)
      val phys = out.queryExecution.executedPlan.toString
      require(phys.contains("TakeOrderedAndProject"),
        "GlobalWindowTopK must have rewritten the single-task window:\n" + phys)
      out.withColumn("rn", col("rn").cast("long")).orderBy(col("rn"))
    }),
  )

  // ------------------------------------------------------------- oracle SQL

  /** The HLL estimator numerator as a DuckDB double literal —
    * Scala Double.toString round-trips exactly through DuckDB's parser
    * (E-notation literals are DOUBLE), same trick as the LSH plane
    * matrices. */
  private object SketchesOracle {
    val numLit: String = graft.operators.Sketches.HllEstNumerator.toString
  }

  /** DuckDB fragments shared by the text oracles — MUST mirror
    * graft.functions.TextFunctions expression-for-expression. */
  private val toksSql =
    "list_filter(string_split_regex(trim(text), '\\s+'), x -> len(x) > 0)"
  private val stopListSql =
    TextFunctions.stopwords.map(w => s"'$w'").mkString("(", ", ", ")")
  private val punctRawSql =
    "CASE WHEN len(text) = 0 THEN 0.0 ELSE CAST(len(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS DOUBLE) / len(text) END"
  private val stopRawSql =
    s"CASE WHEN len(toks) = 0 THEN 0.0 ELSE CAST(len(list_filter(toks, x -> lower(x) IN $stopListSql)) AS DOUBLE) / len(toks) END"
  private val meanRawSql =
    "CASE WHEN len(toks) = 0 THEN 0.0 ELSE CAST(list_aggregate(list_transform(toks, x -> len(x)), 'sum') AS DOUBLE) / len(toks) END"
  private val asciiRawSql =
    "CASE WHEN len(text) = 0 THEN 1.0 ELSE CAST(len(regexp_replace(text, '[^\\x00-\\x7F]', '', 'g')) AS DOUBLE) / len(text) END"
  private val langSql =
    "CASE WHEN ascii_raw < 0.5 THEN 'cjk' WHEN stop_raw >= 0.05 THEN 'en' ELSE 'unknown' END"
  private val normalizedSql =
    "lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))"

  /** The merged duplicated-span table (40-char windows, stride 10,
    * cross-doc df ≥ 2, touching windows merged) — ONE text shared by
    * q126 (profile) and q147 (apply); mirrors Dedup.dupSpans. Final
    * table: `sp(doc_id, span_id, s, e)`, s inclusive / e exclusive. */
  private lazy val substringSpanCtes: String =
    """d AS (SELECT doc_id, text FROM documents WHERE length(text) >= 40),
      |o0 AS (SELECT doc_id, text,
      |    unnest(generate_series(0, (length(text) - 40) // 10)) * 10 AS off
      |  FROM d),
      |offs AS (SELECT doc_id, off, substring(text, off + 1, 40) AS win FROM o0),
      |dup AS (SELECT win FROM offs GROUP BY win HAVING count(DISTINCT doc_id) >= 2),
      |m AS (SELECT o.doc_id, o.off FROM offs o JOIN dup USING (win)),
      |x AS (SELECT doc_id, off,
      |    max(off + 40) OVER (PARTITION BY doc_id ORDER BY off
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
      |  FROM m),
      |y AS (SELECT doc_id, off,
      |    CASE WHEN prev_end IS NULL OR off > prev_end THEN 1 ELSE 0 END AS ni
      |  FROM x),
      |z AS (SELECT doc_id, off,
      |    sum(ni) OVER (PARTITION BY doc_id ORDER BY off) AS span_id FROM y),
      |sp AS (SELECT doc_id, span_id, min(off) AS s, max(off) + 40 AS e
      |  FROM z GROUP BY 1, 2)""".stripMargin

  /** The Gopher-rule signal + per-rule flag chain over `documents` — ONE
    * text shared by q131 (details + reasons) and q153 (the funnel's
    * quality stage); mirrors TextProfile.gopherFilter (6-dp-ROUNDED
    * signals compared to the thresholds). Final table: `r(doc_id,
    * n_words, mean_word_len, n_stop_distinct, dup_3gram_frac,
    * top_2gram_frac, ok_words, ok_word_len, ok_stopwords, ok_dup,
    * ok_top)`. Per-doc-local signals ⇒ subset-independent flags. */
  private lazy val gopherCtes: String =
    s"""t AS (SELECT doc_id, text, $toksSql AS toks FROM documents),
       |sig AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_words,
       |  round($meanRawSql, 6) AS mean_word_len,
       |  CAST(len(list_distinct(list_filter(toks, x -> lower(x) IN $stopListSql))) AS BIGINT) AS n_stop_distinct
       | FROM t),
       |toks2 AS (SELECT doc_id, toks AS w FROM t),
       |g3 AS (SELECT doc_id, unnest($sh3Sql) AS sh FROM toks2),
       |d3 AS (SELECT doc_id,
       |  round(1.0 - CAST(count(DISTINCT sh) AS DOUBLE) / count(*), 6) AS dup_3gram_frac
       | FROM g3 GROUP BY 1),
       |g2 AS (SELECT doc_id, unnest($sh2Sql) AS sh FROM toks2),
       |c2 AS (SELECT doc_id, sh, count(*) AS c FROM g2 GROUP BY 1, 2),
       |t2 AS (SELECT doc_id,
       |  round(CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE), 6) AS top_2gram_frac
       | FROM c2 GROUP BY 1),
       |j AS (SELECT sig.*, dup_3gram_frac, top_2gram_frac
       | FROM sig JOIN d3 USING (doc_id) JOIN t2 USING (doc_id)),
       |r AS (SELECT *,
       |  (n_words >= 30 AND n_words <= 100000) AS ok_words,
       |  (mean_word_len >= 3.0 AND mean_word_len <= 5.0) AS ok_word_len,
       |  (n_stop_distinct >= 2) AS ok_stopwords,
       |  (dup_3gram_frac <= 0.05) AS ok_dup,
       |  (top_2gram_frac <= 0.10) AS ok_top
       | FROM j)""".stripMargin

  /** Count-min table + estimates vs exact counts — ONE text shared by
    * q145 (batch one-pass table) and q146 (ingest-accreted cells), both
    * of which must produce identical estimates; mirrors
    * Sketches.cmsTable/cmsEstimate (d=4, w=256, salted md5-long rows). */
  private lazy val cmsOracle: String =
    s"""WITH ti AS (SELECT unnest($toksSql) AS tok FROM documents),
       |cells AS (SELECT j,
       |    ${hexLongSql("CAST(j AS VARCHAR) || ':' || tok")} % 256 AS b,
       |    count(*) AS c
       |  FROM ti CROSS JOIN range(4) t(j) GROUP BY 1, 2),
       |exact AS (SELECT tok, count(*) AS exact FROM ti GROUP BY 1),
       |probes AS (SELECT tok, j,
       |    ${hexLongSql("CAST(j AS VARCHAR) || ':' || tok")} % 256 AS b
       |  FROM (SELECT DISTINCT tok FROM ti) CROSS JOIN range(4) t(j)),
       |est AS (SELECT p.tok, min(c.c) AS est
       |  FROM probes p JOIN cells c ON p.j = c.j AND p.b = c.b GROUP BY 1)
       |SELECT e.tok AS key, est, exact, est - exact AS overcount
       |FROM est e JOIN exact USING (tok) ORDER BY key""".stripMargin

  /** Corpus-unigram surprisal per doc — ONE text shared by q128 and the
    * q143 banding oracle; mirrors TextProfile.unigramSurprisal (per-token
    * 6 dp rounding before exact DECIMAL summation). Final table:
    * `srp(doc_id, n_toks, surprisal)`. */
  private lazy val surprisalCtes: String =
    s"""t AS (SELECT doc_id, unnest($toksSql) AS tok FROM documents),
       |v AS (SELECT tok, count(*) AS cnt FROM t GROUP BY tok),
       |n AS (SELECT count(*) AS n_total FROM t),
       |s AS (SELECT doc_id,
       |    CAST(round(-ln(CAST(cnt AS DOUBLE) / n_total), 6) AS DECIMAL(28,6)) AS s
       |  FROM t JOIN v USING (tok) CROSS JOIN n),
       |srp AS (SELECT doc_id, count(*) AS n_toks,
       |  round(CAST(sum(s) AS DOUBLE) / count(*), 6) AS surprisal
       |FROM s GROUP BY doc_id)""".stripMargin

  /** 10-word paragraph windows — ONE text shared by the four paragraph
    * oracles (q101/q104/q107/q108) so the twins can never silently
    * diverge; mirrors Dedup.explodeParagraphs. */
  private val paraCtes =
    """w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |p0 AS (SELECT doc_id, ws,
      |   unnest(generate_series(1, CAST(ceil(len(ws)/10.0) AS BIGINT))) AS j FROM w),
      |p AS (SELECT doc_id, j - 1 AS pos,
      |   array_to_string(ws[(CAST(j-1 AS INT)*10+1):(CAST(j-1 AS INT)*10+10)], ' ') AS para
      |  FROM p0)""".stripMargin

  /** [[paraCtes]] + the corpus-wide first-occurrence keeper selection
    * (min encoded (doc, pos) per distinct paragraph — mirrors
    * Dedup.paragraphDedup / the q108 ingest twin). */
  private val paraKeeperCtes =
    s"""$paraCtes,
       |k AS (SELECT para, min(doc_id*100000+pos) AS keep FROM p GROUP BY para),
       |kept AS (SELECT p.doc_id, p.pos, p.para FROM p JOIN k ON p.para = k.para
       |  AND p.doc_id*100000+p.pos = k.keep)""".stripMargin

  /** [[paraCtes]] + the FUZZY keeper selection — mirrors
    * Dedup.paragraphDedupFuzzy stage for stage: distinct texts keyed by
    * their min encoded instance (pid), MinHash over the distinct texts
    * (same 32 perms/8 bands as [[sigCte]], coefficients shared via
    * [[minhashCoeffSql]]), exact-Jaccard verification at ≥ 0.4, components
    * via the recursive reach CTE (q76/q84's shape), keeper = group min
    * pid, survivors in `fkept`. Embedding oracle must open WITH RECURSIVE. */
  private lazy val paraFuzzyKeeperCtes: String =
    s"""$paraCtes,
       |pf AS (SELECT para, min(doc_id*100000+pos) AS pid FROM p GROUP BY para),
       |ptk AS (SELECT pid, para,
       |  list_filter(string_split_regex(trim(para), '\\s+'), x -> len(x) > 0) AS w
       |  FROM pf),
       |psh AS (SELECT pid, unnest(list_distinct($sh3Sql)) AS sh FROM ptk),
       |ph AS (SELECT pid, ${hexLongSql("sh")} AS h FROM psh),
       |coeff AS (SELECT * FROM (VALUES $minhashCoeffSql) t(i, ca, cb)),
       |ppm AS (SELECT pid, i,
       |  min(CAST((CAST(h AS HUGEINT) * ca + cb) % 2305843009213693951 AS BIGINT)) AS m
       |  FROM ph CROSS JOIN coeff GROUP BY pid, i),
       |psig AS (SELECT pid, list(m ORDER BY i) AS sig FROM ppm GROUP BY pid),
       |pbd AS (SELECT pid, bd,
       |  array_to_string(array_slice(sig, bd*4+1, bd*4+4), ',') AS bandkey
       |  FROM psig CROSS JOIN range(8) t(bd)),
       |pcand AS (SELECT DISTINCT l.pid AS a, r.pid AS b FROM pbd l
       |  JOIN pbd r ON l.bd = r.bd AND l.bandkey = r.bandkey AND l.pid < r.pid),
       |psz AS (SELECT pid, count(*) AS sz FROM psh GROUP BY pid),
       |ppr AS (SELECT pcand.a, pcand.b, count(*) AS common
       |  FROM pcand JOIN psh x ON x.pid = pcand.a
       |  JOIN psh y ON y.pid = pcand.b AND x.sh = y.sh GROUP BY 1, 2),
       |pe AS (SELECT a, b FROM (
       |  SELECT ppr.a, ppr.b,
       |   round(CAST(common AS DOUBLE) / CAST(sa.sz + sb.sz - common AS DOUBLE), 6) AS j
       |  FROM ppr JOIN psz sa ON ppr.a = sa.pid JOIN psz sb ON ppr.b = sb.pid)
       |  WHERE j >= 0.4),
       |pee AS (SELECT a, b FROM pe UNION SELECT b, a FROM pe),
       |preach(a, b) AS (
       |  SELECT a, a FROM (SELECT DISTINCT a FROM pee)
       |  UNION
       |  SELECT r.a, e2.b FROM preach r JOIN pee e2 ON r.b = e2.a),
       |pcomp AS (SELECT a AS pid, min(b) AS comp FROM preach GROUP BY a),
       |plabel AS (SELECT pf.para, COALESCE(pcomp.comp, pf.pid) AS keep
       |  FROM pf LEFT JOIN pcomp ON pf.pid = pcomp.pid),
       |fkept AS (SELECT p.doc_id, p.pos, p.para FROM p JOIN plabel
       |  ON p.para = plabel.para AND p.doc_id*100000+p.pos = plabel.keep)""".stripMargin

  /** Hex chars [from, from+14] of md5(e) as a non-negative 60-bit long —
    * MUST mirror graft.operators.Dedup.md5Long / Multimodal.hexSeg. */
  private def hexLongSql(e: String, from: Int = 1): String =
    s"list_reduce(list_transform(string_split(substr(md5($e), $from, 15), ''), " +
      "c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)), (a, b) -> a * 16 + b)"

  /** Word n-gram shingles over token list `w` — mirrors
    * TextFunctions.shingles (short docs collapse to one whole-text
    * shingle). */
  private def shNSql(n: Int): String = {
    val parts = (1 to n).map(j => s"w[i+$j]").mkString(", ")
    s"CASE WHEN len(w) < $n THEN [array_to_string(w, ' ')] " +
      s"ELSE list_transform(range(0, len(w) - ${n - 1}), i -> concat_ws(' ', $parts)) END"
  }
  private val sh3Sql = shNSql(3)

  /** Shared by q41 (batch) and q119 (the DAG's streamed pay_success). */
  private lazy val paySuccessOracle: String =
    s"""WITH $preCte
       |SELECT CASE WHEN o.o_orderkey%2=0 THEN 'alipay' ELSE 'wechat' END AS payment_type_name,
       | d.stn AS source_type_name, count(*) AS n_rows,
       | CAST(sum(d.amt) AS DOUBLE) AS sum_amount,
       | count(a.k) AS n_act, count(c.k) AS n_cpn
       |FROM det d JOIN orders o ON d.k=o.o_orderkey AND o.o_orderkey%3=0 AND o.o_orderkey%5<>0
       |LEFT JOIN act a ON d.k=a.k AND d.n=a.n
       |LEFT JOIN cpn c ON d.k=c.k AND d.n=c.n
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Shared by q42 (batch) and q120 (the DAG's streamed cancel). */
  private lazy val cancelOracle: String =
    s"""WITH $preCte
       |SELECT d.stn AS source_type_name, count(*) AS n_rows,
       | CAST(sum(d.amt) AS DOUBLE) AS sum_amount,
       | count(a.k) AS n_act, count(c.k) AS n_cpn
       |FROM det d JOIN orders o ON d.k=o.o_orderkey AND o.o_orderstatus<>'O' AND o.o_orderkey%5=1
       |LEFT JOIN act a ON d.k=a.k AND d.n=a.n
       |LEFT JOIN cpn c ON d.k=c.k AND d.n=c.n
       |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Shared by q44 (batch) and q122 (the DAG's streamed refund_pay_suc). */
  private lazy val refundPayOracle: String =
    """WITH rp AS (SELECT l_orderkey AS k, l_partkey AS p,
      |  CAST(l_extendedprice AS DECIMAL(18,2)) AS amt
      | FROM lineitem
      | WHERE l_returnflag='R' AND l_linenumber%2=0 AND l_partkey%3<>0 AND l_partkey%5<>4),
      |ri AS (SELECT l_orderkey AS k, l_partkey AS p, CAST(l_quantity AS INT) AS rn
      | FROM lineitem WHERE l_returnflag='R')
      |SELECT CASE WHEN rp.p%2=0 THEN 'alipay' ELSE 'wechat' END AS payment_type_name,
      | count(*) AS n_rows, CAST(sum(rp.amt) AS DOUBLE) AS sum_amount,
      | CAST(sum(ri.rn) AS BIGINT) AS sum_num
      |FROM rp JOIN orders o ON rp.k=o.o_orderkey AND o.o_orderstatus<>'O' AND o.o_orderkey%5=3
      |JOIN ri ON rp.k=ri.k AND rp.p=ri.p
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Shared by q102 (batch SemDeDup) and q118 (the ingest twin) — ONE
    * oracle: √N seed-centroid cells (ivfAssignCteN — scaled exactly like
    * the Spark side's [[semDedupCells]]), within-cell cosine pairs,
    * recursive-reach components, min-id survivors. */
  private lazy val semDedupOracle: String =
    s"""WITH RECURSIVE ${ivfAssignCteN(semDedupSeedLimitSql)},
       |v AS (SELECT m.vec_id, m.embedding AS e, $nrmSql AS nrm, a.cell
       |  FROM embeddings m JOIN assign a ON m.vec_id = a.vec_id),
       |e AS (SELECT va.vec_id AS a, vb.vec_id AS b
       |  FROM v va JOIN v vb ON va.cell = vb.cell AND va.vec_id < vb.vec_id
       |  WHERE $dotSql / (va.nrm * vb.nrm) >= 0.35),
       |ee AS (SELECT a, b FROM e UNION SELECT b, a FROM e),
       |reach(a, b) AS (
       |  SELECT a, a FROM (SELECT DISTINCT a FROM ee)
       |  UNION
       |  SELECT r.a, e2.b FROM reach r JOIN ee e2 ON r.b = e2.a),
       |comp AS (SELECT a AS id, min(b) AS comp FROM reach GROUP BY a)
       |SELECT m.vec_id, m.label FROM embeddings m
       |LEFT JOIN comp ON m.vec_id = comp.id
       |WHERE comp.comp IS NULL OR comp.comp = m.vec_id
       |ORDER BY m.vec_id""".stripMargin

  /** Shared by q37 (harness-fed) and q117 (the warehouse DAG's own
    * dws/keyword parquet) — ONE oracle over the shared log synthesis. */
  private lazy val keywordWindowOracle: String =
    s"""WITH toks AS (SELECT doc_id, $toksSql AS w FROM documents),
       |words AS (SELECT doc_id, unnest(w[1:3]) AS word FROM toks),
       |win AS (SELECT word, (doc_id * 3) // 10 * 10 AS w0 FROM words)
       |SELECT strftime(make_timestamp(w0 * 1000000), '%Y-%m-%d %H:%M:%S') AS stt,
       | strftime(make_timestamp((w0 + 10) * 1000000), '%Y-%m-%d %H:%M:%S') AS edt,
       | word, count(*) AS keyword_count
       |FROM win GROUP BY 1, 2, 3 ORDER BY 1, 3""".stripMargin

  /** Shared by q39 (batch wide table) and q115 (the warehouse DAG's
    * streamed order_pre epoch dirs) — ONE oracle: the cross-batch
    * interval-join content must equal the batch joins exactly. */
  private lazy val orderPreOracle: String =
    """WITH det AS (SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
      |  CAST(l_extendedprice AS DECIMAL(18,2)) AS amt,
      |  concat('240', l_linenumber % 2 + 1) AS source_type FROM lineitem),
      |act AS (SELECT l_orderkey, l_linenumber FROM lineitem WHERE l_linenumber % 3 = 0),
      |cpn AS (SELECT l_orderkey, l_linenumber FROM lineitem WHERE l_partkey % 4 = 0)
      |SELECT CASE WHEN o.o_orderstatus = 'O' THEN 'insert' ELSE 'update' END AS op_type,
      | CASE WHEN d.source_type = '2401' THEN 'promo' ELSE 'search' END AS source_type_name,
      | count(*) AS n_rows,
      | CAST(sum(d.amt) AS DOUBLE) AS sum_amount,
      | CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_oi_amount,
      | count(a.l_orderkey) AS n_act,
      | count(c.l_orderkey) AS n_cpn
      |FROM det d JOIN orders o ON d.l_orderkey = o.o_orderkey
      |LEFT JOIN act a ON d.l_orderkey = a.l_orderkey AND d.l_linenumber = a.l_linenumber
      |LEFT JOIN cpn c ON d.l_orderkey = c.l_orderkey AND d.l_linenumber = c.l_linenumber
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Shared by q36 (batch pipeline) and q113 (the warehouse DAG's
    * streamed dwd/cart_add dirs) — ONE oracle, since the stateless cart
    * pipeline's epoch-dir union must equal the batch form row for row. */
  private lazy val cartAddOracle: String =
    """SELECT CASE WHEN l_linenumber % 2 = 0 THEN 'promo' ELSE 'search' END AS source_type_name,
      | count(*) AS n_rows,
      | CAST(sum(CASE WHEN l_returnflag = 'N' THEN CAST(l_quantity AS INT)
      |          ELSE (l_linenumber % 4) - 1 END) AS BIGINT) AS sum_num,
      | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
      | CAST(sum(l_partkey % 2) AS BIGINT) AS sum_checked,
      | CAST(sum(l_orderkey % 2) AS BIGINT) AS sum_ordered,
      | count(CASE WHEN l_orderkey % 2 = 1 THEN 1 END) AS n_order_time,
      | max(strftime(l_shipdate, '%Y-%m-%d') || ' 09:00:00') AS max_operate_time,
      | count(DISTINCT l_suppkey) AS n_sources
      |FROM lineitem
      |WHERE l_returnflag = 'N' OR (l_returnflag = 'A' AND (l_linenumber % 4) IN (2, 3))
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Shared by q40 (harness-fed) and q114 (the warehouse DAG's own
    * dws/traffic parquet) — ONE oracle over the shared log synthesis. */
  private lazy val trafficWindowOracle: String =
    """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS stt,
      | strftime(date_trunc('hour', ts) + INTERVAL 1 HOUR, '%Y-%m-%d %H:%M:%S') AS edt,
      | 'v' || CAST(user_id % 3 AS VARCHAR) AS vc,
      | event_type AS ch,
      | CAST(user_id % 5 AS VARCHAR) AS ar,
      | CAST(event_id % 2 AS VARCHAR) AS is_new,
      | count(*) AS pv_ct,
      | CAST(sum(CASE WHEN event_id % 3 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS sv_ct,
      | CAST(sum(CAST(round(value) AS BIGINT)) AS BIGINT) AS dur_sum
      |FROM events
      |GROUP BY 1, 2, 3, 4, 5, 6 ORDER BY 1, 3, 4, 5, 6""".stripMargin

  /** Shared by q81 (batch) and q83 (streaming twin) — ONE oracle, since
    * register point-max is order/batch independent: same 60-bit md5 hash,
    * same bucket/rank split, same exact integer harmonic sum, same single
    * division (numerator literal injected from Scala). */
  private lazy val hllDistinctOracle: String =
    s"""WITH h AS (SELECT l_returnflag AS g,
       |  ${hexLongSql("CAST(l_orderkey AS VARCHAR)")} AS h FROM lineitem),
       |b AS (SELECT g, h >> 54 AS bucket, h & ${(1L << 54) - 1} AS low FROM h),
       |r AS (SELECT g, bucket,
       |  CASE WHEN low = 0 THEN 55 ELSE 55 - length(bin(low)) END AS rho FROM b),
       |regs AS (SELECT g, bucket, max(rho) AS mx FROM r GROUP BY 1, 2),
       |allb AS (SELECT d.g, gs.range AS bucket
       |  FROM (SELECT DISTINCT g FROM regs) d CROSS JOIN range(0, 64) gs),
       |filled AS (SELECT allb.g, coalesce(regs.mx, 0) AS mx
       |  FROM allb LEFT JOIN regs ON allb.g = regs.g AND allb.bucket = regs.bucket),
       |agg AS (SELECT g, sum(CAST(1 AS BIGINT) << (55 - mx)) AS s,
       |    CAST(sum(CAST(mx AS BIGINT)) AS BIGINT) AS reg_sum,
       |    count(*) FILTER (WHERE mx > 0) AS hit
       |  FROM filled GROUP BY g),
       |est AS (SELECT g, hit, reg_sum,
       |    ${SketchesOracle.numLit} / CAST(s AS DOUBLE) AS raw FROM agg)
       |SELECT g AS l_returnflag, hit AS n_buckets_hit, reg_sum,
       |  round(CASE WHEN raw <= 160.0e0 AND (64 - hit) > 0
       |    THEN 64.0e0 * ln(64.0e0 / CAST(64 - hit AS DOUBLE)) ELSE raw END, 6)
       |    AS est_distinct
       |FROM est ORDER BY l_returnflag""".stripMargin

  /** Shared by q76 (min-label propagation) and q84 (large-star/small-star)
    * — ONE oracle, since both converge to comp = min reachable id over the
    * same simhash near-dup pair graph. */
  private lazy val dedupGroupsOracle: String =
    s"""WITH RECURSIVE $shCte,
       |$simhashCte,
       |bkt AS (SELECT doc_id, simhash, simhash >> 44 AS bucket FROM ssig),
       |e AS (SELECT l.doc_id AS a, r.doc_id AS b
       | FROM bkt l JOIN bkt r ON l.bucket = r.bucket AND l.doc_id < r.doc_id
       | WHERE bit_count(xor(l.simhash, r.simhash)) <= 8),
       |ee AS (SELECT a, b FROM e UNION SELECT b, a FROM e),
       |reach(a, b) AS (
       |  SELECT a, a FROM (SELECT DISTINCT a FROM ee)
       |  UNION
       |  SELECT r.a, e2.b FROM reach r JOIN ee e2 ON r.b = e2.a)
       |SELECT a AS id, min(b) AS comp FROM reach GROUP BY a ORDER BY a""".stripMargin

  /** Shared by q80 (batch) and q87 (streaming window counts → same
    * bounded-heap ranking) — ONE oracle, identical output contract. */
  private lazy val topNOracle: String =
    """WITH c AS (SELECT date_trunc('hour', ts) AS w, user_id AS item, count(*) AS ct
      |  FROM events WHERE event_type = 'view' GROUP BY 1, 2),
      |r AS (SELECT w, item, ct,
      |  row_number() OVER (PARTITION BY w ORDER BY ct DESC, item) AS rnk FROM c)
      |SELECT strftime(w, '%Y-%m-%d %H:%M:%S') AS stt, item, ct, rnk
      |FROM r WHERE rnk <= 3 ORDER BY stt, rnk""".stripMargin

  /** Shared by q70 (batch) and q71 (streaming twin) — ONE oracle so the
    * two gates can never silently diverge: a session breaks only when the
    * µs gap STRICTLY exceeds the 4 h gap (Spark merges touching windows). */
  private val sessionOracleSql =
    """WITH g AS (SELECT user_id, ts,
        |  event_id,
        |  CASE WHEN lag(ts) OVER w IS NULL
        |    OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 14400000000 THEN 1 ELSE 0 END AS brk
        | FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (SELECT user_id, ts, sum(brk) OVER
        |  (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid FROM g)
        |SELECT user_id, strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS stt,
        | strftime(max(ts) + INTERVAL 4 HOUR, '%Y-%m-%d %H:%M:%S') AS edt,
        | count(*) AS n_events
        |FROM s GROUP BY user_id, sid ORDER BY user_id, stt""".stripMargin

  /** Word 2-gram shingles over token list `w` — mirrors TextFunctions.shingles(n=2). */
  private val sh2Sql =
    "CASE WHEN len(w) < 2 THEN [array_to_string(w, ' ')] " +
      "ELSE list_transform(range(0, len(w) - 1), i -> concat_ws(' ', w[i+1], w[i+2])) END"

  /** Distinct (doc_id, shingle) rows. */
  private val shCte =
    s"""toks AS (SELECT doc_id, $toksSql AS w FROM documents),
       |sh AS (SELECT doc_id, unnest(list_distinct($sh3Sql)) AS sh FROM toks)""".stripMargin

  /** MinHash signatures + LSH band candidates — mirrors Dedup.minhashSignatures
    * (32 perms) + Dedup.lshCandidates (8 bands of 4) with the identical affine
    * coefficients. */
  /** The 32 (i, a, b) MinHash perm coefficients as DuckDB VALUES rows —
    * shared by [[sigCte]] (doc grain) and the q109 paragraph-grain twin. */
  private lazy val minhashCoeffSql: String = (0 until 32).map { i =>
    val (a, b) = Dedup.permCoeff(i); s"($i, $a, $b)"
  }.mkString(", ")

  private val sigCte: String = {
    s"""h AS (SELECT doc_id, ${hexLongSql("sh")} AS h FROM sh),
       |coeff AS (SELECT * FROM (VALUES $minhashCoeffSql) t(i, ca, cb)),
       |pm AS (SELECT doc_id, i, min(CAST((CAST(h AS HUGEINT) * ca + cb) % 2305843009213693951 AS BIGINT)) AS m
       |  FROM h CROSS JOIN coeff GROUP BY doc_id, i),
       |sig AS (SELECT doc_id, list(m ORDER BY i) AS sig FROM pm GROUP BY doc_id),
       |banded AS (SELECT doc_id, bd, array_to_string(array_slice(sig, bd*4+1, bd*4+4), ',') AS bandkey
       |  FROM sig CROSS JOIN range(8) t(bd)),
       |cand AS (SELECT DISTINCT l.doc_id AS a, r.doc_id AS b FROM banded l
       |  JOIN banded r ON l.bd = r.bd AND l.bandkey = r.bandkey AND l.doc_id < r.doc_id)""".stripMargin
  }

  /** 60-bit SimHash per doc — mirrors Dedup.simhash. */
  private val simhashCte =
    s"""tok AS (SELECT doc_id, unnest(list_distinct(w)) AS tk FROM toks),
       |th AS (SELECT doc_id, ${hexLongSql("tk")} AS h FROM tok),
       |votes AS (SELECT doc_id, bb, sum(CASE WHEN (h >> bb) & 1 = 1 THEN 1 ELSE -1 END) AS v
       |  FROM th CROSS JOIN range(60) t(bb) GROUP BY doc_id, bb),
       |ssig AS (SELECT doc_id, CAST(sum(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << bb) ELSE 0 END) AS BIGINT) AS simhash
       |  FROM votes GROUP BY doc_id)""".stripMargin

  /** ‖e‖₂ with the same fold order as VectorFunctions.norm. */
  private val nrmSql =
    "sqrt(list_reduce(list_transform(e, u -> CAST(u AS DOUBLE) * CAST(u AS DOUBLE)), (p, q) -> p + q))"

  /** Σ va.e[i]·vb.e[i] with the same fold order as VectorFunctions.dot. */
  private val dotSql =
    "list_reduce(list_transform(range(64), i -> CAST(va.e[i+1] AS DOUBLE) * CAST(vb.e[i+1] AS DOUBLE)), (p, q) -> p + q)"

  /** q90's PQ-ADC chain (codebook → codes → LUT → summed-term ranking),
    * up to the `ranked` CTE — shared by q90 (plain ADC top-k) and q133
    * (ADC shortlist → exact re-rank) so the twins can never silently
    * diverge on the shortlist. */
  private lazy val pqRankedCtes: String =
    s"""WITH seeds AS (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 16),
       |cb AS (SELECT s.range AS sub, seeds.vec_id AS code,
       |    array_slice(embedding, s.range*8+1, s.range*8+8) AS ce
       |  FROM seeds CROSS JOIN range(8) s),
       |cbn AS (SELECT sub, code, ce,
       |    list_reduce(list_transform(range(8), i -> CAST(ce[i+1] AS DOUBLE)*CAST(ce[i+1] AS DOUBLE)), (p,q) -> p+q) AS cn2
       |  FROM cb),
       |ev AS (SELECT vec_id, s.range AS sub,
       |    array_slice(embedding, s.range*8+1, s.range*8+8) AS xs
       |  FROM embeddings CROSS JOIN range(8) s),
       |dd AS (SELECT ev.vec_id, ev.sub, cbn.code,
       |    cbn.cn2 - 2 * list_reduce(list_transform(range(8), i -> CAST(ev.xs[i+1] AS DOUBLE)*CAST(cbn.ce[i+1] AS DOUBLE)), (p,q) -> p+q) AS dist
       |  FROM ev JOIN cbn ON ev.sub = cbn.sub),
       |codes AS (SELECT vec_id, sub, code FROM (
       |  SELECT vec_id, sub, code, row_number() OVER (PARTITION BY vec_id, sub ORDER BY dist, code) AS rn FROM dd) WHERE rn = 1),
       |lut AS (SELECT q.vec_id AS query_id, q.sub, cbn.code,
       |    list_reduce(list_transform(range(8), i -> CAST(q.xs[i+1] AS DOUBLE)*CAST(cbn.ce[i+1] AS DOUBLE)), (p,q) -> p+q) AS tdot
       |  FROM (SELECT * FROM ev WHERE vec_id % 50 = 0) q JOIN cbn ON q.sub = cbn.sub),
       |pairs AS (SELECT l.query_id, c.vec_id AS neighbor_id,
       |    ${(0 until 8).map(s => s"max(CASE WHEN c.sub = $s THEN l.tdot END) AS t$s").mkString(", ")}
       |  FROM codes c JOIN lut l ON c.sub = l.sub AND c.code = l.code
       |  WHERE l.query_id <> c.vec_id GROUP BY 1, 2),
       |ranked AS (SELECT query_id, neighbor_id,
       |    ${(0 until 8).map(s => s"t$s").reduceLeft((a, b) => s"($a + $b)")} AS score,
       |    row_number() OVER (PARTITION BY query_id ORDER BY
       |      ${(0 until 8).map(s => s"t$s").reduceLeft((a, b) => s"($a + $b)")} DESC, neighbor_id) AS "rank"
       |  FROM pairs)""".stripMargin

  /** [[dotSql]] parameterized over the two list expressions (same fold). */
  private def dotOf(a: String, b: String, dim: Int = 64): String =
    s"list_reduce(list_transform(range($dim), i -> CAST($a[i+1] AS DOUBLE) * CAST($b[i+1] AS DOUBLE)), (p, q) -> p + q)"

  /** Hyperplane matrix + per-vector LSH bucket for q53 — mirrors
    * VectorExpressions.HyperplaneBucketF (4 planes × 64 dims): the plane
    * components are the exact same planeComp doubles inlined as literals
    * (Double.toString round-trips), the dot product folds left from 0.0 in
    * index order, and bit p is set iff the dot is ≥ 0. */
  private def lshBucketCte(nPlanes: Int, dim: Int): String = {
    val rows = (0 until nPlanes).map { p =>
      val w = (0 until dim)
        .map(dd => graft.functions.VectorFunctions.planeComp(p, dd).toString)
        .mkString("[", ", ", "]")
      s"($p, $w::DOUBLE[])"
    }.mkString(", ")
    s"""planes AS (SELECT * FROM (VALUES $rows) t(p, w)),
       |bkt AS (SELECT vec_id,
       |  CAST(sum(CASE WHEN dp >= 0 THEN (CAST(1 AS BIGINT) << p) ELSE 0 END) AS BIGINT) AS bucket
       | FROM (SELECT v.vec_id, pl.p,
       |   list_reduce(list_transform(range($dim),
       |     i -> CAST(v.embedding[i+1] AS DOUBLE) * pl.w[i+1]), (a, b) -> a + b) AS dp
       |  FROM embeddings v CROSS JOIN planes pl)
       | GROUP BY vec_id)""".stripMargin
  }

  /** Seed-centroid IVF assignment CTEs — mirrors
    * Similarity.kmeansCentroids(iterations = 0) + assignCells: lowest-id
    * seeds, dist = ‖c‖² − 2·x·c, argmin ties by cell id. `seedLimitSql`
    * injects the seed count: the literal "16" for q54/q59, the √N scalar
    * subquery for the SemDeDup pair (whose cell count must scale with the
    * corpus — see [[semDedupCells]]). */
  private def ivfAssignCteN(seedLimitSql: String): String =
    s"""seeds AS (SELECT vec_id AS cell, embedding AS ce,
      |  list_reduce(list_transform(range(64), i -> CAST(embedding[i+1] AS DOUBLE) * CAST(embedding[i+1] AS DOUBLE)), (a, b) -> a + b) AS cn2
      | FROM embeddings WHERE vec_id IN (SELECT vec_id FROM (
      |   SELECT vec_id, row_number() OVER (ORDER BY vec_id) AS rn FROM embeddings)
      |  WHERE rn <= $seedLimitSql)),
      |dd AS (SELECT v.vec_id, s.cell,
      |  s.cn2 - 2 * list_reduce(list_transform(range(64), i -> CAST(v.embedding[i+1] AS DOUBLE) * CAST(s.ce[i+1] AS DOUBLE)), (a, b) -> a + b) AS dist
      | FROM embeddings v CROSS JOIN seeds s),
      |assign AS (SELECT vec_id, cell FROM (
      |  SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cell) AS rn FROM dd) WHERE rn = 1)""".stripMargin

  /** Shared by q54/q59: the ANN/clustering gates keep a fixed 16-cell
    * quantizer (nProbe/recall semantics are per-cell-count contracts). */
  private val ivfAssignCte = ivfAssignCteN("16")

  /** [[ivfAssignCteN]] with TAGGED cte names and a seed-candidate filter —
    * the q127 oracle needs TWO geometries side by side: the frozen
    * ingest quantizer (seeds = √N lowest ids of the HIGH half) and the
    * recenter refit (corpus-lowest seeds). Same dist/tie arithmetic. */
  private def ivfAssignCteTagged(tag: String, seedWhere: String): String =
    s"""seeds$tag AS (SELECT vec_id AS cell, embedding AS ce,
      |  list_reduce(list_transform(range(64), i -> CAST(embedding[i+1] AS DOUBLE) * CAST(embedding[i+1] AS DOUBLE)), (a, b) -> a + b) AS cn2
      | FROM embeddings WHERE vec_id IN (SELECT vec_id FROM (
      |   SELECT vec_id, row_number() OVER (ORDER BY vec_id) AS rn FROM embeddings $seedWhere)
      |  WHERE rn <= $semDedupSeedLimitSql)),
      |dd$tag AS (SELECT v.vec_id, s.cell,
      |  s.cn2 - 2 * list_reduce(list_transform(range(64), i -> CAST(v.embedding[i+1] AS DOUBLE) * CAST(s.ce[i+1] AS DOUBLE)), (a, b) -> a + b) AS dist
      | FROM embeddings v CROSS JOIN seeds$tag s),
      |assign$tag AS (SELECT vec_id, cell FROM (
      |  SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cell) AS rn FROM dd$tag) WHERE rn = 1)""".stripMargin

  /** The SemDeDup oracle's seed count — the SQL twin of [[semDedupCells]]. */
  private val semDedupSeedLimitSql =
    "(SELECT GREATEST(4, CAST(ceil(sqrt(count(*))) AS BIGINT)) FROM embeddings)"

  /** Order wide-table CTEs mirroring TopicDb's order_detail / activity /
    * coupon derivations ⋈'d by q41/q42: source_type '240'||(n%2+1) → dic
    * name promo/search. */
  private val preCte =
    """det AS (SELECT l_orderkey AS k, l_linenumber AS n,
      |  CAST(l_extendedprice AS DECIMAL(18,2)) AS amt,
      |  CASE WHEN l_linenumber%2=0 THEN 'promo' ELSE 'search' END AS stn FROM lineitem),
      |act AS (SELECT l_orderkey AS k, l_linenumber AS n FROM lineitem WHERE l_linenumber%3=0),
      |cpn AS (SELECT l_orderkey AS k, l_linenumber AS n FROM lineitem WHERE l_partkey%4=0)""".stripMargin

  /** Fake media ingest+decode — mirrors Multimodal.ingestDocsAsMedia/decodeMeta. */
  private val mediaCte =
    s"""m AS (SELECT doc_id AS media_id,
       |  (['image/png', 'audio/wav', 'video/mp4'])[CAST(doc_id % 3 + 1 AS INT)] AS mime,
       |  text, octet_length(encode(text)) AS n_bytes,
       |  64 + ${hexLongSql("text", 1)} % 1857 AS width,
       |  64 + ${hexLongSql("text", 17)} % 1857 AS height
       | FROM documents)""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | sum(l_quantity) AS sum_qty,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        | CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax), 6) AS DECIMAL(28,6))) AS DOUBLE) AS sum_charge,
        | round(sum(l_quantity) / count(*), 6) AS avg_qty,
        | round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_price,
        | round(CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_disc,
        | count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q02_region_rollup" ->
      """SELECT r_name AS region_name, n_name AS nation_name, count(*) AS n_customers,
        | CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q03_order_revenue" ->
      """SELECT o_orderpriority, count(DISTINCT o_orderkey) AS n_orders,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE o_orderstatus <> 'F'
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q04_order_left_join" ->
      """SELECT o_orderstatus, count(*) AS n_rows, count(l_orderkey) AS n_matched
        |FROM orders LEFT JOIN (SELECT * FROM lineitem WHERE l_quantity > 45) l
        |  ON o_orderkey = l_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q05_anti_join" ->
      """SELECT c_mktsegment, count(*) AS n_customers
        |FROM customer WHERE NOT EXISTS (
        |  SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q06_cond_project" ->
      """SELECT event_id, user_id, event_type,
        | CASE WHEN event_type = 'view' THEN value ELSE value * 2 END AS adj_value
        |FROM events WHERE event_type IN ('view', 'click', 'purchase')
        |ORDER BY event_id""".stripMargin,

    "q07_union_counters" ->
      """SELECT user_id, CAST(sum(pv) AS BIGINT) AS pv_ct, CAST(sum(clk) AS BIGINT) AS clk_ct,
        | CAST(sum(buy) AS BIGINT) AS buy_ct FROM (
        | SELECT user_id, 1 AS pv, 0 AS clk, 0 AS buy FROM events WHERE event_type = 'view'
        | UNION ALL SELECT user_id, 0, 1, 0 FROM events WHERE event_type = 'click'
        | UNION ALL SELECT user_id, 0, 0, 1 FROM events WHERE event_type = 'purchase')
        |GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q08_json_props" ->
      """SELECT event_type, count(*) AS n_events, CAST(sum(k) AS BIGINT) AS sum_k FROM (
        | SELECT event_type, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k FROM events)
        |WHERE k IS NOT NULL AND k >= 50
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q09_hourly_window" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS stt,
        | strftime(date_trunc('hour', ts) + INTERVAL 1 HOUR, '%Y-%m-%d %H:%M:%S') AS edt,
        | event_type, count(*) AS n_events,
        | CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2, 3 ORDER BY 1, 3""".stripMargin,

    "q10_dedup_daily" ->
      """SELECT user_id, CAST(CAST(ts AS DATE) AS VARCHAR) AS visit_date,
        | strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS first_ts
        |FROM events GROUP BY user_id, CAST(ts AS DATE)
        |ORDER BY user_id, visit_date""".stripMargin,

    "q11_dual_flag_uv" ->
      """SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS visit_date,
        | count(DISTINCT CASE WHEN event_type = 'view' THEN user_id END) AS a_uv_ct,
        | count(DISTINCT CASE WHEN event_type = 'purchase' THEN user_id END) AS b_uv_ct
        |FROM events WHERE event_type IN ('view', 'purchase')
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q12_visitor_repair" ->
      """SELECT event_id, user_id, CAST(CAST(ts AS DATE) AS VARCHAR) AS visit_date,
        | CASE WHEN CAST(ts AS DATE) = min(CAST(ts AS DATE)) OVER (PARTITION BY user_id)
        |   THEN 1 ELSE 0 END AS is_new
        |FROM events ORDER BY event_id""".stripMargin,

    "q13_jump_detect" ->
      """WITH e AS (
        | SELECT event_id, user_id, ts, (event_type = 'view') AS is_entry,
        |  lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_ts,
        |  lead(event_type = 'view') OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_entry
        | FROM events)
        |SELECT event_id, user_id, strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_str
        |FROM e WHERE is_entry AND (next_ts IS NULL
        |  OR epoch_us(next_ts) - epoch_us(ts) > 30000000 OR next_entry)
        |ORDER BY event_id""".stripMargin,

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

    "q17_dedup_exact" ->
      s"""SELECT md5($normalizedSql) AS fp, min(doc_id) AS keeper_id,
         | count(*) AS n_copies
         |FROM documents GROUP BY 1 ORDER BY fp""".stripMargin,

    "q18_minhash_lsh" ->
      s"""WITH $shCte,
         |$sigCte
         |SELECT a, b FROM cand ORDER BY a, b""".stripMargin,

    // q18's banding with the (bd, bandkey) df cap mirrored — buckets over
    // LshBucketCap docs leave the index before pair generation, exactly
    // like Dedup.lshCandidatesCapped's broadcast anti-join.
    "q112_lsh_capped" ->
      s"""WITH $shCte,
         |$sigCte,
         |hotb AS (SELECT bd, bandkey FROM banded
         |  GROUP BY bd, bandkey HAVING count(*) > $LshBucketCap),
         |cappedb AS (SELECT b.doc_id, b.bd, b.bandkey FROM banded b
         |  LEFT JOIN hotb h ON b.bd = h.bd AND b.bandkey = h.bandkey
         |  WHERE h.bd IS NULL),
         |ccand AS (SELECT DISTINCT l.doc_id AS a, r.doc_id AS b FROM cappedb l
         |  JOIN cappedb r ON l.bd = r.bd AND l.bandkey = r.bandkey
         |    AND l.doc_id < r.doc_id)
         |SELECT a, b FROM ccand ORDER BY a, b""".stripMargin,

    "q19_simhash_sig" ->
      s"""WITH $shCte,
         |$simhashCte
         |SELECT doc_id, simhash FROM ssig ORDER BY doc_id""".stripMargin,

    "q20_simhash_neardup" ->
      s"""WITH $shCte,
         |$simhashCte,
         |bkt AS (SELECT doc_id, simhash, simhash >> 44 AS bucket FROM ssig)
         |SELECT l.doc_id AS a, r.doc_id AS b,
         | CAST(bit_count(xor(l.simhash, r.simhash)) AS BIGINT) AS hamming
         |FROM bkt l JOIN bkt r ON l.bucket = r.bucket AND l.doc_id < r.doc_id
         |WHERE bit_count(xor(l.simhash, r.simhash)) <= 8
         |ORDER BY a, b""".stripMargin,

    "q21_jaccard_pairs" ->
      s"""WITH $shCte,
         |sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
         |pr AS (SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS common
         |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY 1, 2)
         |SELECT a, b, jaccard FROM (
         | SELECT pr.a, pr.b,
         |  round(CAST(common AS DOUBLE) / CAST(sa.sz + sb.sz - common AS DOUBLE), 6) AS jaccard
         | FROM pr JOIN sz sa ON pr.a = sa.doc_id JOIN sz sb ON pr.b = sb.doc_id)
         |WHERE jaccard >= 0.5 ORDER BY a, b""".stripMargin,

    "q55_simhash_multi" ->
      s"""WITH $shCte,
         |$simhashCte,
         |rot AS (SELECT doc_id, simhash, t.t AS tbl,
         |  CASE WHEN t.t = 0 THEN simhash
         |  ELSE (simhash >> (60 - t.t * 15)) | ((simhash & ((CAST(1 AS BIGINT) << (60 - t.t * 15)) - 1)) << (t.t * 15))
         |  END AS r
         | FROM ssig CROSS JOIN (VALUES (0), (1), (2), (3)) t(t)),
         |bkt AS (SELECT doc_id, simhash, tbl, r >> 44 AS bucket FROM rot),
         |cand AS (SELECT DISTINCT l.doc_id AS a, r2.doc_id AS b, l.simhash AS sa, r2.simhash AS sb
         | FROM bkt l JOIN bkt r2 ON l.tbl = r2.tbl AND l.bucket = r2.bucket AND l.doc_id < r2.doc_id)
         |SELECT a, b, CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming
         |FROM cand WHERE bit_count(xor(sa, sb)) <= 8
         |ORDER BY a, b""".stripMargin,

    "q56_jaccard_capped" ->
      s"""WITH $shCte,
         |dfreq AS (SELECT sh AS hsh FROM sh GROUP BY sh HAVING count(*) > 100),
         |idx AS (SELECT doc_id, sh FROM sh WHERE sh NOT IN (SELECT hsh FROM dfreq)),
         |cand AS (SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
         |  FROM idx a JOIN idx b ON a.sh = b.sh AND a.doc_id < b.doc_id),
         |sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
         |pr AS (SELECT cand.a, cand.b, count(*) AS common
         |  FROM cand JOIN sh x ON x.doc_id = cand.a
         |  JOIN sh y ON y.doc_id = cand.b AND x.sh = y.sh
         |  GROUP BY 1, 2)
         |SELECT a, b, jaccard FROM (
         | SELECT pr.a, pr.b,
         |  round(CAST(common AS DOUBLE) / CAST(sa.sz + sb.sz - common AS DOUBLE), 6) AS jaccard
         | FROM pr JOIN sz sa ON pr.a = sa.doc_id JOIN sz sb ON pr.b = sb.doc_id)
         |WHERE jaccard >= 0.5 ORDER BY a, b""".stripMargin,

    "q22_jaccard_verify" ->
      s"""WITH $shCte,
         |$sigCte,
         |sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
         |pr AS (SELECT cand.a, cand.b, count(*) AS common
         |  FROM cand JOIN sh x ON x.doc_id = cand.a
         |  JOIN sh y ON y.doc_id = cand.b AND x.sh = y.sh
         |  GROUP BY 1, 2)
         |SELECT a, b, jaccard FROM (
         | SELECT pr.a, pr.b,
         |  round(CAST(common AS DOUBLE) / CAST(sa.sz + sb.sz - common AS DOUBLE), 6) AS jaccard
         | FROM pr JOIN sz sa ON pr.a = sa.doc_id JOIN sz sb ON pr.b = sb.doc_id)
         |WHERE jaccard >= 0.5 ORDER BY a, b""".stripMargin,

    "q23_embed_neardup" ->
      s"""WITH v AS (SELECT vec_id, embedding AS e, $nrmSql AS nrm FROM embeddings)
         |SELECT a, b, round(score, 6) AS score FROM (
         | SELECT va.vec_id AS a, vb.vec_id AS b, $dotSql / (va.nrm * vb.nrm) AS score
         | FROM v va JOIN v vb ON va.vec_id < vb.vec_id)
         |WHERE score >= 0.35 ORDER BY a, b""".stripMargin,

    "q24_ann_topk" ->
      s"""WITH v AS (SELECT vec_id, embedding AS e, $nrmSql AS nrm FROM embeddings),
         |scored AS (SELECT va.vec_id AS query_id, vb.vec_id AS neighbor_id,
         |  $dotSql / (va.nrm * vb.nrm) AS score
         | FROM (SELECT * FROM v WHERE vec_id % 50 = 0) va
         | JOIN v vb ON va.vec_id <> vb.vec_id),
         |ranked AS (SELECT query_id, neighbor_id, score,
         |  row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS "rank"
         | FROM scored)
         |SELECT query_id, neighbor_id, round(score, 6) AS score, "rank" FROM ranked
         |WHERE "rank" <= 10 ORDER BY query_id, "rank"""".stripMargin,

    // q24's exact scoring/ranking + label joins; purity = integer-count
    // ratio rounded to 6
    "q99_knn_label_purity" ->
      s"""WITH v AS (SELECT vec_id, label, embedding AS e, $nrmSql AS nrm FROM embeddings),
         |scored AS (SELECT va.vec_id AS query_id, va.label AS q_lbl,
         |  vb.vec_id AS neighbor_id, vb.label AS n_lbl,
         |  $dotSql / (va.nrm * vb.nrm) AS score
         | FROM (SELECT * FROM v WHERE vec_id % 50 = 0) va
         | JOIN v vb ON va.vec_id <> vb.vec_id),
         |ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY score DESC, neighbor_id) AS rnk FROM scored)
         |SELECT q_lbl AS label, count(DISTINCT query_id) AS n_queries,
         |  CAST(sum(CASE WHEN n_lbl = q_lbl THEN 1 ELSE 0 END) AS BIGINT) AS n_match,
         |  count(*) AS n_pairs,
         |  round(CAST(sum(CASE WHEN n_lbl = q_lbl THEN 1 ELSE 0 END) AS DOUBLE)
         |    / count(*), 6) AS purity
         |FROM ranked WHERE rnk <= 10 GROUP BY 1 ORDER BY 1""".stripMargin,

    // Relational replay of the q100 changelog: every customer inserted
    // (ts = k), k%3=0 updated to name_v2 (ts = k+maxK), k%5=0 deleted
    // (ts = k+2·maxK, the newest op) — survivors are the non-deleted keys
    // at their newest version.
    "q100_cdc_dim_maintain" ->
      """WITH mk AS (SELECT max(c_custkey) AS m FROM customer)
        |SELECT CAST(c_custkey AS VARCHAR) AS id,
        | CASE WHEN c_custkey % 3 = 0 THEN c_name || '_v2' ELSE c_name END AS uname,
        | c_mktsegment AS city,
        | CAST(CASE WHEN c_custkey % 3 = 0 THEN c_custkey + (SELECT m FROM mk)
        |      ELSE c_custkey END AS BIGINT) AS ts
        |FROM customer WHERE c_custkey % 5 <> 0
        |ORDER BY c_custkey""".stripMargin,

    // Paragraph replay: same 10-word windows, corpus-wide first occurrence
    // by the encoded min (doc_id·1e5 + pos), reassembly in pos order.
    "q101_paragraph_dedup" ->
      s"""WITH $paraKeeperCtes,
         |agg AS (SELECT doc_id, count(*) AS n_kept,
         |   string_agg(para, ' ' ORDER BY pos) AS kept_text FROM kept GROUP BY doc_id),
         |np AS (SELECT doc_id, CAST(ceil(len(ws)/10.0) AS BIGINT) AS n_paras FROM w)
         |SELECT np.doc_id, np.n_paras,
         |  COALESCE(agg.n_kept, 0) AS n_kept, COALESCE(agg.kept_text, '') AS kept_text
         |FROM np LEFT JOIN agg ON np.doc_id = agg.doc_id
         |ORDER BY np.doc_id""".stripMargin,

    // q101's keeper set verbatim — the streaming twin reads it directly.
    "q108_stream_paragraph_dedup" ->
      s"""WITH $paraKeeperCtes
         |SELECT doc_id, pos FROM kept ORDER BY doc_id, pos""".stripMargin,

    // DAG DIM stores: user_info inserts derive from customer (ts = key),
    // payment_info from orders (the TopicDb synthesis) — the upserted
    // store must equal the source projection, dynamic route included.
    "q110_dag_dim_store" ->
      """SELECT 'dim_user_info' AS store, CAST(c_custkey AS VARCHAR) AS id,
        | c_name AS v, CAST(c_custkey AS BIGINT) AS ts
        |FROM customer
        |UNION ALL
        |SELECT 'dim_payment_info', CAST(o_orderkey AS VARCHAR),
        | '110' || CAST(o_orderkey % 2 + 1 AS VARCHAR), CAST(o_orderkey AS BIGINT)
        |FROM orders WHERE o_orderkey % 3 = 0
        |ORDER BY store, ts, id""".stripMargin,

    "q113_dag_dwd_cart" -> cartAddOracle,

    "q114_dag_dws_traffic" -> trafficWindowOracle,

    // The fuzzy keeper KEYS verbatim — the ingest twin reads them
    // directly (fkept's rows are exactly the distinct group keepers).
    "q116_stream_paragraph_fuzzy" ->
      s"""WITH RECURSIVE $paraFuzzyKeeperCtes
         |SELECT doc_id, pos FROM fkept ORDER BY doc_id, pos""".stripMargin,

    // the DAG curation twins replay the IDENTICAL oracles: the streamed
    // store contents must equal the harness-fed and batch forms exactly
    "q123_dag_paragraph_fuzzy" ->
      s"""WITH RECURSIVE $paraFuzzyKeeperCtes
         |SELECT doc_id, pos FROM fkept ORDER BY doc_id, pos""".stripMargin,

    "q124_dag_semdedup" -> semDedupOracle,

    // Fuzzy paragraph replay: the full MinHash→LSH→Jaccard→components
    // chain over distinct paragraph texts (paraFuzzyKeeperCtes), then
    // q101's reassembly over the fuzzy survivor set.
    "q109_paragraph_dedup_fuzzy" ->
      s"""WITH RECURSIVE $paraFuzzyKeeperCtes,
         |agg AS (SELECT doc_id, count(*) AS n_kept,
         |   string_agg(para, ' ' ORDER BY pos) AS kept_text FROM fkept GROUP BY doc_id),
         |np AS (SELECT doc_id, CAST(ceil(len(ws)/10.0) AS BIGINT) AS n_paras FROM w)
         |SELECT np.doc_id, np.n_paras,
         |  COALESCE(agg.n_kept, 0) AS n_kept, COALESCE(agg.kept_text, '') AS kept_text
         |FROM np LEFT JOIN agg ON np.doc_id = agg.doc_id
         |ORDER BY np.doc_id""".stripMargin,

    // SemDeDup replay: seed-centroid assignment (shared ivfAssignCte),
    // within-cell cosine ≥ 0.35 pairs, components via the same recursive
    // reach CTE as q76/q84/q97, min-id survivors.
    "q102_semdedup" -> semDedupOracle,

    "q118_stream_semdedup" -> semDedupOracle,

    // First doc per fingerprint over the whole corpus — state suppression
    // across batches reduces to a global min per fp.
    "q103_stream_ingest_dedup" ->
      s"""WITH f AS (SELECT doc_id, md5($normalizedSql) AS fp FROM documents)
         |SELECT min(doc_id) AS doc_id, fp FROM f GROUP BY fp
         |ORDER BY doc_id""".stripMargin,

    // Same 10-word windows as q101; df counts DISTINCT docs per paragraph.
    "q104_boilerplate_profile" ->
      s"""WITH $paraCtes,
         |pd AS (SELECT DISTINCT doc_id, para FROM p),
         |df AS (SELECT para, count(*) AS n_docs FROM pd GROUP BY para)
         |SELECT pd.doc_id, count(*) AS n_distinct_paras,
         |  CAST(sum(CASE WHEN df.n_docs >= 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler,
         |  round(CAST(sum(CASE WHEN df.n_docs >= 3 THEN 1 ELSE 0 END) AS DOUBLE)
         |    / count(*), 6) AS boiler_frac
         |FROM pd JOIN df ON pd.para = df.para
         |GROUP BY pd.doc_id ORDER BY pd.doc_id""".stripMargin,

    // The bucketed layout must not change a single row vs the plain join.
    "q105_bucketed_join" ->
      """SELECT o_orderstatus, count(*) AS n_rows,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // Nor must the date-partitioned layout: one day's slice, plain filter.
    "q106_partition_pruned" ->
      """WITH md AS (SELECT min(CAST(ts AS DATE)) AS d FROM events)
        |SELECT event_type, count(*) AS n_rows,
        | count(DISTINCT user_id) AS n_users
        |FROM events WHERE CAST(ts AS DATE) = (SELECT d FROM md)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // q101's reassembly CTEs feeding q60's lang-ID + hash gate, token
    // accounting on the DEDUPED text.
    "q107_curation_pipeline" ->
      s"""WITH $paraKeeperCtes,
         |dd AS (SELECT doc_id, string_agg(para, ' ' ORDER BY pos) AS text
         |  FROM kept GROUP BY doc_id),
         |t AS (SELECT doc_id, text, $toksSql AS toks FROM dd),
         |sr AS (SELECT doc_id, $stopRawSql AS stop_raw, $asciiRawSql AS ascii_raw FROM t),
         |l AS (SELECT doc_id, $langSql AS lang_pred FROM sr),
         |f AS (SELECT t.doc_id, l.lang_pred, len(t.toks) AS ntok,
         |  CASE l.lang_pred WHEN 'en' THEN 500000 WHEN 'cjk' THEN 1000000 ELSE 125000 END AS ppm
         | FROM t JOIN l ON t.doc_id = l.doc_id)
         |SELECT lang_pred, count(*) AS n_docs,
         |  CAST(sum(ntok) AS BIGINT) AS sum_tokens,
         |  CAST(sum(doc_id) AS BIGINT) AS sum_ids
         |FROM f WHERE ${hexLongSql("CAST(doc_id AS VARCHAR)")} % 1000000 < ppm
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    // PQ-ADC replication: lowest-16-id seed codebooks per 8-dim subspace,
    // argmin assignment (ties by code), per-query LUT dots, and the ADC
    // score as the same explicit left-to-right 8-term addition.
    "q90_ann_pq" ->
      s"""$pqRankedCtes
         |SELECT query_id, neighbor_id, round(score, 6) AS score, "rank" FROM ranked
         |WHERE "rank" <= 10 ORDER BY query_id, "rank"""".stripMargin,

    // q90's ADC chain as the SHORTLIST (rank <= 50), then the exact
    // cosine re-rank over only those pairs — mirrors
    // Similarity.pqRerankTopK stage for stage.
    "q133_ann_pq_rerank" ->
      s"""$pqRankedCtes,
         |short AS (SELECT query_id, neighbor_id FROM ranked WHERE "rank" <= 50),
         |v AS (SELECT vec_id, embedding AS e, $nrmSql AS nrm FROM embeddings),
         |ex AS (SELECT s.query_id, s.neighbor_id, $dotSql / (va.nrm * vb.nrm) AS score
         |  FROM short s JOIN v va ON va.vec_id = s.query_id
         |  JOIN v vb ON vb.vec_id = s.neighbor_id),
         |rr AS (SELECT query_id, neighbor_id, score,
         |    row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS "rank"
         |  FROM ex)
         |SELECT query_id, neighbor_id, round(score, 6) AS score, "rank" FROM rr
         |WHERE "rank" <= 10 ORDER BY query_id, "rank"""".stripMargin,

    // q24 on the int8-quantized-then-dequantized store: max-abs scale
    // (nonneg max ≡ Spark's 0.0-seeded fold), half-away-from-zero round,
    // double→float4 reconstruction — then the identical exact top-k.
    "q89_ann_quantized" ->
      s"""WITH qs AS (SELECT vec_id, embedding,
         |  list_reduce(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))),
         |    (p, q) -> greatest(p, q)) AS scale FROM embeddings),
         |dq AS (SELECT vec_id,
         |  CASE WHEN scale = 0 THEN list_transform(embedding, x -> CAST(0 AS REAL))
         |  ELSE list_transform(embedding, x -> CAST(
         |    CAST(CAST(round(CAST(x AS DOUBLE) / scale * 127.0e0) AS INTEGER) AS DOUBLE)
         |      * scale / 127.0e0 AS REAL)) END AS e
         |  FROM qs),
         |v AS (SELECT vec_id, e, $nrmSql AS nrm FROM dq),
         |scored AS (SELECT va.vec_id AS query_id, vb.vec_id AS neighbor_id,
         |  $dotSql / (va.nrm * vb.nrm) AS score
         | FROM (SELECT * FROM v WHERE vec_id % 50 = 0) va
         | JOIN v vb ON va.vec_id <> vb.vec_id),
         |ranked AS (SELECT query_id, neighbor_id, score,
         |  row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS "rank"
         | FROM scored)
         |SELECT query_id, neighbor_id, round(score, 6) AS score, "rank" FROM ranked
         |WHERE "rank" <= 10 ORDER BY query_id, "rank"""".stripMargin,

    // Replicates graft.core.TopicDb's per-table derivations (see its
    // Scaladoc): one UNION branch per (table, type); deletes (cart R rows)
    // are dropped by the Spark-side cdcUpserts filter, so no branch here.
    "q26_cdc_route" ->
      """WITH li AS (SELECT *,
        |  CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR) AS lnid
        | FROM lineitem)
        |SELECT * FROM (
        | SELECT 'order_info' AS "table",
        |  CASE WHEN o_orderstatus='O' THEN 'insert' ELSE 'update' END AS type,
        |  count(*) AS n_rows, max(CAST(o_orderkey AS VARCHAR)) AS max_id,
        |  CAST(sum(o_orderkey) AS BIGINT) AS sum_ts
        | FROM orders GROUP BY 2
        | UNION ALL SELECT 'payment_info', 'update', count(*),
        |  max(CAST(o_orderkey AS VARCHAR)), CAST(sum(o_orderkey) AS BIGINT)
        | FROM orders WHERE o_orderkey%3=0 HAVING count(*) > 0
        | UNION ALL SELECT 'coupon_use', 'insert', count(*),
        |  max('cu' || CAST(o_orderkey AS VARCHAR)), CAST(sum(o_orderkey) AS BIGINT)
        | FROM orders WHERE o_orderkey%4=0 HAVING count(*) > 0
        | UNION ALL SELECT 'coupon_use', 'update', count(*),
        |  max('cu' || CAST(o_orderkey AS VARCHAR)), CAST(sum(o_orderkey) AS BIGINT)
        | FROM orders WHERE o_orderkey%4 IN (1,2) HAVING count(*) > 0
        | UNION ALL SELECT 'user_info', 'insert', count(*),
        |  max(CAST(c_custkey AS VARCHAR)), CAST(sum(c_custkey) AS BIGINT)
        | FROM customer HAVING count(*) > 0
        | UNION ALL SELECT 'order_detail', 'insert', count(*), max(lnid),
        |  CAST(sum(l_orderkey) AS BIGINT) FROM li HAVING count(*) > 0
        | UNION ALL SELECT 'order_detail_activity', 'insert', count(*),
        |  '-', CAST(sum(l_orderkey) AS BIGINT)
        | FROM li WHERE l_linenumber%3=0 HAVING count(*) > 0
        | UNION ALL SELECT 'order_detail_coupon', 'insert', count(*),
        |  '-', CAST(sum(l_orderkey) AS BIGINT)
        | FROM li WHERE l_partkey%4=0 HAVING count(*) > 0
        | UNION ALL SELECT 'cart_info', 'insert', count(*), max(lnid),
        |  CAST(sum(l_orderkey) AS BIGINT) FROM li WHERE l_returnflag='N' HAVING count(*) > 0
        | UNION ALL SELECT 'cart_info', 'update', count(*), max(lnid),
        |  CAST(sum(l_orderkey) AS BIGINT) FROM li WHERE l_returnflag='A' HAVING count(*) > 0
        | UNION ALL SELECT 'order_refund_info', 'insert', count(*), max(lnid || 'r'),
        |  CAST(sum(l_orderkey) AS BIGINT) FROM li WHERE l_returnflag='R' HAVING count(*) > 0
        | UNION ALL SELECT 'refund_payment', 'update', count(*), max(lnid || 'rp'),
        |  CAST(sum(l_orderkey) AS BIGINT)
        | FROM li WHERE l_returnflag='R' AND l_linenumber%2=0 HAVING count(*) > 0
        | UNION ALL SELECT 'favor_info', 'insert', count(*), max('f' || lnid),
        |  CAST(sum(l_orderkey) AS BIGINT)
        | FROM li WHERE l_partkey%5=0 AND l_orderkey%2=0 HAVING count(*) > 0
        | UNION ALL SELECT 'favor_info', 'update', count(*), max('f' || lnid),
        |  CAST(sum(l_orderkey) AS BIGINT)
        | FROM li WHERE l_partkey%5=0 AND l_orderkey%2=1 HAVING count(*) > 0
        | UNION ALL SELECT 'comment_info', 'insert', count(*),
        |  max('cm' || CAST(l_orderkey AS VARCHAR)), CAST(sum(l_orderkey) AS BIGINT)
        | FROM li WHERE l_linenumber=1 AND l_partkey%2=0 HAVING count(*) > 0
        |) ORDER BY 1, 2""".stripMargin,

    "q27_log_split" ->
      """SELECT 'display' AS branch, 2 * count(*) AS n_rows FROM events
        | WHERE event_id % 7 <> 0 AND event_id % 2 = 0
        |UNION ALL SELECT 'err', count(*) FROM events WHERE event_id % 11 = 0
        |UNION ALL SELECT 'page', count(*) FROM events WHERE event_id % 7 <> 0
        |UNION ALL SELECT 'start', count(*) FROM events WHERE event_id % 7 = 0
        |ORDER BY 1""".stripMargin,

    "q28_stream_dedup" ->
      """SELECT user_id, CAST(CAST(ts AS DATE) AS VARCHAR) AS visit_date,
        | strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS first_ts
        |FROM events GROUP BY user_id, CAST(ts AS DATE)
        |ORDER BY user_id, visit_date""".stripMargin,

    "q38_stream_dedup_tws" ->
      """SELECT user_id, CAST(CAST(ts AS DATE) AS VARCHAR) AS visit_date,
        | strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS first_ts
        |FROM events GROUP BY user_id, CAST(ts AS DATE)
        |ORDER BY user_id, visit_date""".stripMargin,

    "q29_stream_jump" ->
      """WITH e AS (
        | SELECT event_id, user_id, ts, (event_type = 'view') AS is_entry,
        |  lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_ts,
        |  lead(event_type = 'view') OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_entry
        | FROM events)
        |SELECT event_id, user_id, strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_str
        |FROM e WHERE is_entry AND (next_ts IS NULL
        |  OR epoch_us(next_ts) - epoch_us(ts) > 30000000 OR next_entry)
        |ORDER BY event_id""".stripMargin,

    "q37_dws_keyword" -> keywordWindowOracle,

    "q117_dag_dws_keyword" -> keywordWindowOracle,

    "q40_dws_traffic" -> trafficWindowOracle,

    "q35_salted_agg" ->
      """SELECT user_id, CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
        | count(*) AS cnt
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "q36_dwd_cart" -> cartAddOracle,

    "q39_dwd_order_pre" -> orderPreOracle,

    "q115_dag_dwd_order_pre" -> orderPreOracle,

    // q39's insert branch only (o_orderstatus = 'O'), grouped by source
    "q92_dwd_order_detail" ->
      """WITH det AS (SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
        |  CAST(l_extendedprice AS DECIMAL(18,2)) AS amt,
        |  concat('240', l_linenumber % 2 + 1) AS source_type FROM lineitem),
        |act AS (SELECT l_orderkey, l_linenumber FROM lineitem WHERE l_linenumber % 3 = 0),
        |cpn AS (SELECT l_orderkey, l_linenumber FROM lineitem WHERE l_partkey % 4 = 0)
        |SELECT CASE WHEN d.source_type = '2401' THEN 'promo' ELSE 'search' END AS source_type_name,
        | count(*) AS n_rows,
        | CAST(sum(d.amt) AS DOUBLE) AS sum_amount,
        | count(a.l_orderkey) AS n_act,
        | count(c.l_orderkey) AS n_cpn
        |FROM det d JOIN orders o ON d.l_orderkey = o.o_orderkey AND o.o_orderstatus = 'O'
        |LEFT JOIN act a ON d.l_orderkey = a.l_orderkey AND d.l_linenumber = a.l_linenumber
        |LEFT JOIN cpn c ON d.l_orderkey = c.l_orderkey AND d.l_linenumber = c.l_linenumber
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q33_stream_join" ->
      """SELECT a.event_id AS view_id, b.event_id AS buy_id
        |FROM events a JOIN events b
        | ON a.user_id = b.user_id AND a.event_type = 'view'
        | AND b.event_type = 'purchase'
        | AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 24 HOUR
        |ORDER BY 1, 2""".stripMargin,

    "q34_stream_window" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS stt,
        | strftime(date_trunc('hour', ts) + INTERVAL 1 HOUR, '%Y-%m-%d %H:%M:%S') AS edt,
        | event_type, count(*) AS n_events,
        | CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2, 3 ORDER BY 1, 3""".stripMargin,

    "q30_media_meta" ->
      s"""WITH $mediaCte,
         |r AS (SELECT *, 224.0 / CAST(greatest(width, height) AS DOUBLE) AS scale FROM m)
         |SELECT media_id, mime, n_bytes, width, height,
         | greatest(1, CAST(floor(CAST(width AS DOUBLE) * scale) AS BIGINT)) AS out_w,
         | greatest(1, CAST(floor(CAST(height AS DOUBLE) * scale) AS BIGINT)) AS out_h,
         | CASE WHEN mime <> 'image/png' THEN n_bytes * 10 END AS duration_ms
         |FROM r ORDER BY media_id""".stripMargin,

    "q32_media_features" ->
      """WITH b AS (
        | SELECT doc_id AS media_id,
        |  (['image/png', 'audio/wav', 'video/mp4'])[CAST(doc_id % 3 + 1 AS INT)] AS mime,
        |  hex(encode(text)) AS hx, octet_length(encode(text)) AS n
        | FROM documents),
        |bl AS (
        | SELECT media_id, mime, n,
        |  list_transform(range(n), i ->
        |   (strpos('0123456789ABCDEF', substr(hx, CAST(2*i+1 AS BIGINT), 1)) - 1) * 16
        |   + (strpos('0123456789ABCDEF', substr(hx, CAST(2*i+2 AS BIGINT), 1)) - 1)) AS bs
        | FROM b),
        |st AS (SELECT *, CAST(list_reduce(bs, (a, x) -> a + x) AS DOUBLE) / n AS mean FROM bl),
        |v AS (SELECT *,
        |  list_reduce(list_transform(bs, x -> (x - mean) * (x - mean)), (a, x) -> a + x) / n AS varr
        | FROM st)
        |SELECT media_id, mime,
        | round(CAST(CAST(n AS FLOAT) AS DOUBLE), 6) AS f0,
        | round(CAST(CAST(mean AS FLOAT) AS DOUBLE), 6) AS f1,
        | round(CAST(CAST(sqrt(varr) AS FLOAT) AS DOUBLE), 6) AS f2,
        | round(CAST(CAST(bs[1] AS FLOAT) AS DOUBLE), 6) AS f3,
        | round(CAST(CAST(bs[n] AS FLOAT) AS DOUBLE), 6) AS f4,
        | round(CAST(CAST(list_aggregate(bs, 'min') AS FLOAT) AS DOUBLE), 6) AS f5,
        | round(CAST(CAST(list_aggregate(bs, 'max') AS FLOAT) AS DOUBLE), 6) AS f6,
        | round(CAST(CAST(len(mime) AS FLOAT) AS DOUBLE), 6) AS f7
        |FROM v ORDER BY media_id""".stripMargin,

    "q31_media_frames" ->
      s"""WITH $mediaCte,
         |vid AS (SELECT media_id, text, n_bytes, 1 + n_bytes % 7 AS n_frames
         |  FROM m WHERE mime = 'video/mp4')
         |SELECT media_id, frame_no,
         | md5(substr(text, CAST(frame_no * (n_bytes // n_frames) + 1 AS BIGINT), 32)) AS frame_fp
         |FROM (SELECT media_id, text, n_bytes, n_frames,
         |  unnest(range(n_frames)) AS frame_no FROM vid)
         |ORDER BY media_id, frame_no""".stripMargin,

    // ---- q41+ replicate graft.core.TopicDb's derivations (see its
    // ---- Scaladoc) composed with the reference pipelines' filters/joins.

    "q41_dwd_pay_success" -> paySuccessOracle,

    "q42_dwd_cancel" -> cancelOracle,

    "q43_dwd_order_refund" -> orderRefundOracle,

    // the shuffle lookup-join twin computes the identical relation — one
    // shared oracle so the two J4 strategies can never silently diverge
    "q94_lookup_join_shuffle" -> orderRefundOracle,

    "q44_dwd_refund_pay_suc" -> refundPayOracle,

    // the warehouse DAG's streamed trade outputs — each shares its batch
    // gate's oracle verbatim
    "q119_dag_dwd_pay_success" -> paySuccessOracle,
    "q120_dag_dwd_cancel" -> cancelOracle,
    "q121_dag_dwd_order_refund" -> orderRefundOracle,
    "q122_dag_dwd_refund_pay_suc" -> refundPayOracle,

    "q45_dwd_coupon_get" ->
      """SELECT 'cpn_' || CAST(o_orderkey%7 AS VARCHAR) AS coupon_id,
        | count(*) AS n_rows, count(DISTINCT o_custkey) AS n_users,
        | max(strftime(o_orderdate, '%Y-%m-%d')) AS max_date
        |FROM orders WHERE o_orderkey%4=0 GROUP BY 1 ORDER BY 1""".stripMargin,

    "q46_dwd_coupon_order" ->
      """SELECT 'cpn_' || CAST(o_orderkey%7 AS VARCHAR) AS coupon_id,
        | count(*) AS n_rows, CAST(sum(o_orderkey) AS BIGINT) AS sum_ts
        |FROM orders WHERE o_orderkey%8=1 GROUP BY 1 ORDER BY 1""".stripMargin,

    "q47_dwd_coupon_pay" ->
      """SELECT 'cpn_' || CAST(o_orderkey%7 AS VARCHAR) AS coupon_id,
        | count(*) AS n_rows, CAST(sum(o_orderkey) AS BIGINT) AS sum_ts
        |FROM orders WHERE o_orderkey%8=2 GROUP BY 1 ORDER BY 1""".stripMargin,

    "q48_dwd_favor_add" ->
      """SELECT strftime(l_shipdate, '%Y-%m-%d') AS create_time,
        | count(*) AS n_rows, count(DISTINCT l_suppkey) AS n_users
        |FROM lineitem WHERE l_partkey%5=0 AND (l_orderkey%2=0 OR l_linenumber%2=0)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q49_dwd_comment" ->
      """SELECT CASE l_partkey%3 WHEN 0 THEN 'good' WHEN 1 THEN 'mid' ELSE 'bad' END AS appraise_name,
        | count(*) AS n_rows, count(DISTINCT l_suppkey) AS n_users,
        | count(DISTINCT l_orderkey) AS n_orders,
        | max(strftime(l_shipdate, '%Y-%m-%d')) AS max_date
        |FROM lineitem WHERE l_linenumber=1 AND l_partkey%2=0
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q50_dwd_user_register" ->
      """SELECT '2023-04-' || lpad(CAST(c_custkey%28+1 AS VARCHAR), 2, '0') AS date_id,
        | count(*) AS n_rows
        |FROM customer GROUP BY 1 ORDER BY 1""".stripMargin,

    // Multi-probe LSH ANN, exact-checked: buckets from the same inlined
    // plane matrix (12 planes), probe set = bucket XOR {0, 1<<b}; a
    // (query, candidate) pair matches via exactly one probe, so DISTINCT
    // collapses what Spark's groupBy-max dedup does.
    "q25_ann_lsh" ->
      s"""WITH ${lshBucketCte(12, 64)},
         |v AS (SELECT vec_id, embedding AS e, $nrmSql AS nrm FROM embeddings),
         |qp AS (SELECT b.vec_id AS query_id, xor(b.bucket, CAST(m.m AS BIGINT)) AS bucket
         | FROM bkt b CROSS JOIN (VALUES ${(Seq(0L) ++ (0 until 12).map(1L << _)).map(m => s"($m)").mkString(", ")}) m(m)
         | WHERE b.vec_id % 50 = 0),
         |cand AS (SELECT DISTINCT qp.query_id, cb.vec_id AS neighbor_id
         | FROM qp JOIN bkt cb ON cb.bucket = qp.bucket AND cb.vec_id <> qp.query_id),
         |scored AS (SELECT c.query_id, c.neighbor_id, $dotSql / (va.nrm * vb.nrm) AS score
         | FROM cand c JOIN v va ON va.vec_id = c.query_id JOIN v vb ON vb.vec_id = c.neighbor_id),
         |ranked AS (SELECT query_id, neighbor_id, score,
         |  row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS "rank" FROM scored)
         |SELECT query_id, neighbor_id, round(score, 6) AS score, "rank" FROM ranked
         |WHERE "rank" <= 10 ORDER BY query_id, "rank"""".stripMargin,

    // IVF with seed centroids: cell ranking uses dist = ‖c‖² − 2·x·c with
    // the identical left-fold dots; ties break by cell id in both engines.
    "q54_ann_ivf" -> ivfTopKOracle,

    "q53_embed_neardup_lsh" ->
      s"""WITH ${lshBucketCte(4, 64)},
         |v AS (SELECT m.vec_id, m.embedding AS e, $nrmSql AS nrm, b.bucket
         |  FROM embeddings m JOIN bkt b ON m.vec_id = b.vec_id)
         |SELECT a, b, round(score, 6) AS score FROM (
         | SELECT va.vec_id AS a, vb.vec_id AS b, $dotSql / (va.nrm * vb.nrm) AS score
         | FROM v va JOIN v vb ON va.bucket = vb.bucket AND va.vec_id < vb.vec_id)
         |WHERE score >= 0.35 ORDER BY a, b""".stripMargin,

    "q59_kmeans_cells" ->
      s"""WITH $ivfAssignCte
         |SELECT cell, count(*) AS n_vecs, CAST(sum(vec_id) AS BIGINT) AS sum_ids
         |FROM assign GROUP BY 1 ORDER BY 1""".stripMargin,

    // One Lloyd round replayed exactly: integer-quantized inputs (exact
    // sums in any order), 16 lowest-id seeds, argmin assignment (ties by
    // cell), per-(cell,dim) mean cast to REAL, re-assignment against the
    // trained centroids. Mirrors Similarity.kmeansCentroids(16, 1) +
    // assignCells over the same quantized frame.
    "q111_kmeans_lloyd" ->
      s"""WITH q AS (SELECT vec_id,
         |  list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 8) AS REAL)) AS e
         | FROM embeddings),
         |seeds AS (SELECT vec_id AS cell, e AS ce, ${dotOf("e", "e")} AS cn2
         | FROM q WHERE vec_id IN (SELECT vec_id FROM q ORDER BY vec_id LIMIT 16)),
         |d1 AS (SELECT v.vec_id, s.cell, s.cn2 - 2 * ${dotOf("v.e", "s.ce")} AS dist
         | FROM q v CROSS JOIN seeds s),
         |a1 AS (SELECT vec_id, cell FROM (
         |  SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cell) AS rn
         |  FROM d1) WHERE rn = 1),
         |mem AS (SELECT a1.cell, q.e FROM a1 JOIN q USING (vec_id)),
         |upd AS (SELECT cell, i, avg(CAST(e[i+1] AS DOUBLE)) AS m
         | FROM mem CROSS JOIN range(64) t(i) GROUP BY 1, 2),
         |cents AS (SELECT cell, list(CAST(m AS REAL) ORDER BY i) AS ce FROM upd GROUP BY cell),
         |cents2 AS (SELECT cell, ce, ${dotOf("ce", "ce")} AS cn2 FROM cents),
         |d2 AS (SELECT v.vec_id, c.cell, c.cn2 - 2 * ${dotOf("v.e", "c.ce")} AS dist
         | FROM q v CROSS JOIN cents2 c),
         |a2 AS (SELECT vec_id, cell FROM (
         |  SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cell) AS rn
         |  FROM d2) WHERE rn = 1)
         |SELECT cell, count(*) AS n_vecs, CAST(sum(vec_id) AS BIGINT) AS sum_ids
         |FROM a2 GROUP BY 1 ORDER BY 1""".stripMargin,

    "q62_dws_register_window" ->
      """SELECT strftime(make_timestamp((c_custkey+1)//10*10*1000000), '%Y-%m-%d %H:%M:%S') AS stt,
        | strftime(make_timestamp(((c_custkey+1)//10*10+10)*1000000), '%Y-%m-%d %H:%M:%S') AS edt,
        | count(*) AS register_ct
        |FROM customer GROUP BY 1, 2 ORDER BY 1""".stripMargin,

    // TopicDb order_detail = one row per lineitem (ts=k, sku=partkey,
    // num=qty, amount=extendedprice 2-dec)
    "q66_dws_sku_order_window" ->
      """SELECT strftime(make_timestamp((l_orderkey+1)//10*10*1000000), '%Y-%m-%d %H:%M:%S') AS stt,
        | strftime(make_timestamp(((l_orderkey+1)//10*10+10)*1000000), '%Y-%m-%d %H:%M:%S') AS edt,
        | CAST(l_partkey AS VARCHAR) AS sku_id, count(*) AS order_ct,
        | CAST(sum(CAST(l_quantity AS INT)) AS BIGINT) AS sku_num_sum,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS amount_sum
        |FROM lineitem WHERE l_orderkey % 8 = 0
        |GROUP BY 1, 2, 3 ORDER BY 1, 3""".stripMargin,

    // hourly windows of each user's first purchase per day; new_ct counts
    // the users whose first-EVER purchase falls in the window
    "q65_dws_order_window" ->
      """WITH p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase'),
        |fd AS (SELECT user_id, CAST(ts AS DATE) AS d, min(ts) AS fts FROM p GROUP BY 1, 2),
        |fe AS (SELECT user_id, min(ts) AS ets FROM p GROUP BY 1)
        |SELECT strftime(date_trunc('hour', fts), '%Y-%m-%d %H:%M:%S') AS stt,
        | strftime(date_trunc('hour', fts) + INTERVAL 1 HOUR, '%Y-%m-%d %H:%M:%S') AS edt,
        | count(*) AS uu_ct,
        | CAST(sum(CASE WHEN fts = ets THEN 1 ELSE 0 END) AS BIGINT) AS new_ct
        |FROM fd JOIN fe USING (user_id)
        |GROUP BY 1, 2 ORDER BY 1""".stripMargin,

    // first successful payment per (user, DAY): TopicDb payment = orders
    // with k%3=0 ∧ k%5≠0 (see its Scaladoc); event time is (k+1) s, so the
    // day bucket is (k+1)//86400 — day-aware so the oracle stays exact at
    // any SF (keys span multiple 1970 days from sf0.1 up)
    "q64_dws_pay_suc_uu" ->
      """WITH pay AS (SELECT o_orderkey AS k, o_custkey AS u FROM orders
        | WHERE o_orderkey%3=0 AND o_orderkey%5<>0),
        |firsts AS (SELECT u, min(k) AS fk FROM pay GROUP BY u, (k+1)//86400)
        |SELECT strftime(make_timestamp((fk+1)//10*10*1000000), '%Y-%m-%d %H:%M:%S') AS stt,
        | strftime(make_timestamp(((fk+1)//10*10+10)*1000000), '%Y-%m-%d %H:%M:%S') AS edt,
        | count(*) AS uu_ct
        |FROM firsts GROUP BY 1, 2 ORDER BY 1""".stripMargin,

    // first cart-add per (user, DAY): event time is (k+1) s, id = k*8+n;
    // within a day min (ts, id) ordering collapses to min(k*8+n) since k
    // dominates (n ≤ 7); day bucket (k+1)//86400 keeps the oracle exact
    // when keys span multiple 1970 days (sf0.1+)
    "q63_dws_cart_uu" ->
      """WITH cart AS (SELECT l_orderkey AS k, l_linenumber AS n, l_suppkey AS u
        | FROM lineitem
        | WHERE l_returnflag='N' OR (l_returnflag='A' AND (l_linenumber%4) IN (2, 3))),
        |firsts AS (SELECT u, min(k*8+n) AS fid FROM cart GROUP BY u, (k+1)//86400)
        |SELECT strftime(make_timestamp(((fid//8)+1)//10*10*1000000), '%Y-%m-%d %H:%M:%S') AS stt,
        | strftime(make_timestamp((((fid//8)+1)//10*10+10)*1000000), '%Y-%m-%d %H:%M:%S') AS edt,
        | count(*) AS uu_ct
        |FROM firsts GROUP BY 1, 2 ORDER BY 1""".stripMargin,

    "q60_stratified_sample" ->
      s"""WITH t AS (SELECT doc_id, text, $toksSql AS toks FROM documents),
         |sr AS (SELECT doc_id, $stopRawSql AS stop_raw, $asciiRawSql AS ascii_raw FROM t),
         |l AS (SELECT doc_id, $langSql AS lang_pred FROM sr),
         |f AS (SELECT doc_id, lang_pred,
         |  CASE lang_pred WHEN 'en' THEN 500000 WHEN 'cjk' THEN 1000000 ELSE 125000 END AS ppm
         | FROM l)
         |SELECT lang_pred, count(*) AS n_docs, CAST(sum(doc_id) AS BIGINT) AS sum_ids
         |FROM f
         |WHERE ${hexLongSql("CAST(doc_id AS VARCHAR)")} % 1000000 < ppm
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q61_pack_sequences" ->
      s"""WITH t AS (SELECT doc_id, text, $toksSql AS toks FROM documents),
         |sr AS (SELECT doc_id, len(toks) AS ntok,
         |  $stopRawSql AS stop_raw, $asciiRawSql AS ascii_raw FROM t),
         |l AS (SELECT doc_id, ntok, $langSql AS lang_pred FROM sr),
         |w AS (SELECT doc_id, lang_pred, ntok,
         |  sum(ntok) OVER (PARTITION BY lang_pred ORDER BY doc_id) AS cum FROM l)
         |SELECT lang_pred, CAST(floor((cum - ntok) / 2048.0) AS BIGINT) AS bin,
         | count(*) AS n_docs, CAST(sum(ntok) AS BIGINT) AS sum_tokens,
         | max(doc_id) AS max_doc
         |FROM w GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q57_stream_visitor_repair" ->
      """SELECT event_id, user_id, CAST(CAST(ts AS DATE) AS VARCHAR) AS visit_date,
        | CASE WHEN CAST(ts AS DATE) = min(CAST(ts AS DATE)) OVER (PARTITION BY user_id)
        |   THEN 1 ELSE 0 END AS is_new
        |FROM events ORDER BY event_id""".stripMargin,

    "q58_salted_join" ->
      """SELECT e.event_type, d.type_code, count(*) AS n_rows,
        | CAST(sum(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events e
        |JOIN (VALUES ('view', 'V'), ('click', 'C'), ('purchase', 'P')) d(event_type, type_code)
        | ON e.event_type = d.event_type
        |GROUP BY 1, 2 ORDER BY 1""".stripMargin,

    "q52_stream_dual_flag" ->
      """SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS visit_date,
        | count(DISTINCT CASE WHEN event_type = 'view' THEN user_id END) AS a_uv_ct,
        | count(DISTINCT CASE WHEN event_type = 'purchase' THEN user_id END) AS b_uv_ct
        |FROM events WHERE event_type IN ('view', 'purchase')
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q51_dim_router" ->
      """SELECT * FROM (
        | SELECT 'dim_user_info' AS sink_table, 'insert' AS type, count(*) AS n_rows,
        |  CAST(count(*)*2 AS BIGINT) AS sum_cols, max(CAST(c_custkey AS VARCHAR)) AS max_id
        | FROM customer HAVING count(*) > 0
        | UNION ALL SELECT 'dim_order_info',
        |  CASE WHEN o_orderstatus='O' THEN 'insert' ELSE 'update' END,
        |  count(*), CAST(count(*)*4 AS BIGINT), max(CAST(o_orderkey AS VARCHAR))
        | FROM orders GROUP BY 2
        | UNION ALL SELECT 'dim_cart_info', 'insert', count(*), CAST(count(*)*3 AS BIGINT),
        |  max(CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR))
        | FROM lineitem WHERE l_returnflag='N' HAVING count(*) > 0
        | UNION ALL SELECT 'dim_cart_info', 'update', count(*), CAST(count(*)*3 AS BIGINT),
        |  max(CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR))
        | FROM lineitem WHERE l_returnflag='A' HAVING count(*) > 0
        | UNION ALL SELECT 'dim_comment_info', 'insert', count(*), CAST(count(*)*2 AS BIGINT),
        |  max('cm' || CAST(l_orderkey AS VARCHAR))
        | FROM lineitem WHERE l_linenumber=1 AND l_partkey%2=0 HAVING count(*) > 0
        |) ORDER BY 1, 2""".stripMargin,

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

    // gaps-and-islands twin of Spark's session_window: a session breaks
    // only when the µs gap STRICTLY exceeds the 4 h gap duration — Spark
    // merges touching windows (an event at exactly prev_ts + gap joins
    // the session; verified empirically in TextProfileSpec)
    "q70_session_window" -> sessionOracleSql,

    "q71_stream_session" -> sessionOracleSql,  // identical by design: the streaming twin must pin the SAME semantics

    // each event belongs to the two 1 h windows whose 30 min-aligned
    // starts are floor(ts/30min) and that minus one slide — Spark's
    // epoch-aligned hopping-window assignment
    "q72_sliding_window" ->
      """WITH g AS (SELECT event_type, user_id,
        |  (epoch_us(ts) // 1800000000 - i.i) * 1800000000 AS ws
        | FROM events CROSS JOIN (VALUES (0), (1)) i(i))
        |SELECT strftime(make_timestamp(ws), '%Y-%m-%d %H:%M:%S') AS stt,
        | strftime(make_timestamp(ws + 3600000000), '%Y-%m-%d %H:%M:%S') AS edt,
        | event_type, count(*) AS n_events, count(DISTINCT user_id) AS n_users
        |FROM g GROUP BY 1, 2, 3 ORDER BY 1, 3""".stripMargin,

    "q73_bloom_dedup" ->
      s"""WITH store AS (SELECT DISTINCT md5($normalizedSql) AS fp
         |  FROM documents WHERE doc_id < 250),
         |b AS (SELECT doc_id, md5($normalizedSql) AS fp
         |  FROM documents WHERE doc_id >= 250),
         |firsts AS (SELECT fp, min(doc_id) AS doc_id FROM b GROUP BY fp)
         |SELECT doc_id, fp FROM firsts
         |WHERE fp NOT IN (SELECT fp FROM store) ORDER BY doc_id""".stripMargin,

    "q74_percentile" ->
      """SELECT event_type,
        | round(quantile_cont(value, 0.5), 6) AS p50,
        | round(quantile_cont(value, 0.9), 6) AS p90,
        | round(quantile_cont(value, 0.99), 6) AS p99,
        | count(*) AS n
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "q75_rollup" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin,

    // transitive closure over the symmetrized q20 pair graph; min
    // reachable id per node = the component label BOTH Spark algorithms
    // (q76 min-label propagation, q84 large-star/small-star) converge to
    "q76_dedup_groups" -> dedupGroupsOracle,
    "q84_dedup_groups_star" -> dedupGroupsOracle,

    // per-source volumes + intra-source exact-dup volume, fingerprint =
    // md5(normalized text) mirrored expression-for-expression
    "q98_source_profile" ->
      s"""WITH t AS (SELECT source, lang, md5($normalizedSql) AS fp,
         |  len($toksSql) AS n_toks FROM documents),
         |g AS (SELECT source, fp, count(*) AS c FROM t GROUP BY 1, 2),
         |d AS (SELECT source,
         |  CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS n_exact_dup
         | FROM g GROUP BY 1),
         |a AS (SELECT source, count(*) AS n_docs,
         |  CAST(sum(n_toks) AS BIGINT) AS n_tokens,
         |  count(DISTINCT lang) AS n_langs FROM t GROUP BY 1)
         |SELECT a.source, n_docs, n_tokens, n_langs, n_exact_dup
         |FROM a JOIN d ON a.source = d.source ORDER BY a.source""".stripMargin,

    // the q76/q84 component labels applied to the corpus: keep the
    // canonical (min-id) doc per component + every untouched doc
    "q97_dedup_apply" ->
      s"""WITH RECURSIVE $shCte,
         |$simhashCte,
         |bkt AS (SELECT doc_id, simhash, simhash >> 44 AS bucket FROM ssig),
         |e AS (SELECT l.doc_id AS a, r.doc_id AS b
         | FROM bkt l JOIN bkt r ON l.bucket = r.bucket AND l.doc_id < r.doc_id
         | WHERE bit_count(xor(l.simhash, r.simhash)) <= 8),
         |ee AS (SELECT a, b FROM e UNION SELECT b, a FROM e),
         |reach(a, b) AS (
         |  SELECT a, a FROM (SELECT DISTINCT a FROM ee)
         |  UNION
         |  SELECT r.a, e2.b FROM reach r JOIN ee e2 ON r.b = e2.a),
         |comp AS (SELECT a AS id, min(b) AS comp FROM reach GROUP BY a)
         |SELECT d.doc_id, d.lang FROM documents d
         |LEFT JOIN comp ON d.doc_id = comp.id
         |WHERE comp.comp IS NULL OR comp.comp = d.doc_id
         |ORDER BY d.doc_id""".stripMargin,

    "q77_contamination" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS w FROM documents),
         |s1 AS (SELECT doc_id, unnest(list_distinct($sh3Sql)) AS sh FROM t WHERE doc_id >= 50),
         |bs AS (SELECT DISTINCT sh FROM
         |  (SELECT unnest(list_distinct($sh3Sql)) AS sh FROM t WHERE doc_id < 50)),
         |j AS (SELECT s1.doc_id, count(*) AS n_shingles,
         |  sum(CASE WHEN bs.sh IS NOT NULL THEN 1 ELSE 0 END) AS n_contaminated
         | FROM s1 LEFT JOIN bs ON s1.sh = bs.sh GROUP BY 1)
         |SELECT doc_id, n_shingles, CAST(n_contaminated AS BIGINT) AS n_contaminated,
         | round(CAST(n_contaminated AS DOUBLE) / n_shingles, 6) AS contam_frac
         |FROM j ORDER BY doc_id""".stripMargin,

    "q93_funnel" -> funnelOracle,

    // the streaming funnel twin converges to the identical per-step
    // counts — one shared oracle, like the other batch/stream pairs
    "q95_funnel_stream" -> funnelOracle,

    "q88_mixture_interleave" ->
      """WITH r AS (SELECT doc_id, lang,
        |  row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rnk
        |  FROM documents)
        |SELECT doc_id, lang,
        |  round(CAST(rnk AS DOUBLE) / CASE lang WHEN 'en' THEN 3.0e0
        |    WHEN 'zh' THEN 2.0e0 ELSE 1.0e0 END, 6) AS mix_pos
        |FROM r ORDER BY mix_pos, lang, doc_id""".stripMargin,

    // q77 at shingleN=5 — identical shape, longer n-gram
    "q86_contamination_n5" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS w FROM documents),
         |s1 AS (SELECT doc_id, unnest(list_distinct(${shNSql(5)})) AS sh FROM t WHERE doc_id >= 50),
         |bs AS (SELECT DISTINCT sh FROM
         |  (SELECT unnest(list_distinct(${shNSql(5)})) AS sh FROM t WHERE doc_id < 50)),
         |j AS (SELECT s1.doc_id, count(*) AS n_shingles,
         |  sum(CASE WHEN bs.sh IS NOT NULL THEN 1 ELSE 0 END) AS n_contaminated
         | FROM s1 LEFT JOIN bs ON s1.sh = bs.sh GROUP BY 1)
         |SELECT doc_id, n_shingles, CAST(n_contaminated AS BIGINT) AS n_contaminated,
         | round(CAST(n_contaminated AS DOUBLE) / n_shingles, 6) AS contam_frac
         |FROM j ORDER BY doc_id""".stripMargin,

    // q81's register replication per (hourly window, event_type) over
    // events — the windowed streaming HLL UU gate
    "q85_dws_uu_hll_window" ->
      s"""WITH h AS (SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS stt,
         |  event_type,
         |  ${hexLongSql("CAST(user_id AS VARCHAR)")} AS h FROM events),
         |b AS (SELECT stt, event_type, h >> 54 AS bucket,
         |  h & ${(1L << 54) - 1} AS low FROM h),
         |r AS (SELECT stt, event_type, bucket,
         |  CASE WHEN low = 0 THEN 55 ELSE 55 - length(bin(low)) END AS rho FROM b),
         |regs AS (SELECT stt, event_type, bucket, max(rho) AS mx FROM r GROUP BY 1, 2, 3),
         |allb AS (SELECT d.stt, d.event_type, gs.range AS bucket
         |  FROM (SELECT DISTINCT stt, event_type FROM regs) d CROSS JOIN range(0, 64) gs),
         |filled AS (SELECT allb.stt, allb.event_type, coalesce(regs.mx, 0) AS mx
         |  FROM allb LEFT JOIN regs ON allb.stt = regs.stt
         |    AND allb.event_type = regs.event_type AND allb.bucket = regs.bucket),
         |agg AS (SELECT stt, event_type, sum(CAST(1 AS BIGINT) << (55 - mx)) AS s,
         |    CAST(sum(CAST(mx AS BIGINT)) AS BIGINT) AS reg_sum,
         |    count(*) FILTER (WHERE mx > 0) AS hit
         |  FROM filled GROUP BY stt, event_type),
         |est AS (SELECT stt, event_type, hit, reg_sum,
         |    ${SketchesOracle.numLit} / CAST(s AS DOUBLE) AS raw FROM agg)
         |SELECT stt, event_type, hit AS n_buckets_hit, reg_sum,
         |  round(CASE WHEN raw <= 160.0e0 AND (64 - hit) > 0
         |    THEN 64.0e0 * ln(64.0e0 / CAST(64 - hit AS DOUBLE)) ELSE raw END, 6)
         |    AS est_distinct
         |FROM est ORDER BY stt, event_type""".stripMargin,

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

    "q78_asof_join" ->
      """WITH l AS (SELECT o_orderkey AS k, o_custkey AS cust, o_orderkey AS ts FROM orders),
        |r AS (SELECT o_custkey AS cust, o_orderkey AS ts, o_orderkey AS ref_k,
        |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS ref_price
        | FROM orders WHERE o_orderkey % 3 = 0)
        |SELECT l.k, l.cust, r.ref_k, r.ref_price
        |FROM l ASOF LEFT JOIN r ON l.cust = r.cust AND l.ts >= r.ts
        |ORDER BY l.k""".stripMargin,

    "q79_range_join" ->
      """WITH p AS (SELECT l_orderkey AS p FROM lineitem WHERE l_linenumber = 1),
        |iv AS (SELECT o_orderkey AS ik, o_orderkey - 8 AS lo, o_orderkey + 8 AS hi
        | FROM orders WHERE o_orderkey % 10 = 0)
        |SELECT p, ik FROM p JOIN iv ON p >= lo AND p <= hi
        |ORDER BY p, ik""".stripMargin,

    "q80_topn_window" -> topNOracle,
    "q87_topn_window_stream" -> topNOracle,

    // Replicates Sketches.hllDistinct register by register: same 60-bit
    // md5 hash, same bucket/rank split, same exact integer harmonic sum,
    // same single division (numerator literal injected from Scala).
    "q81_hll_distinct" -> hllDistinctOracle,

    // The streaming twin produces the SAME registers (point max is
    // order/batch independent), so the oracle is shared verbatim.
    "q83_hll_distinct_stream" -> hllDistinctOracle,

    // Replicates Sketches.histogramQuantiles float-for-float: global
    // [min,max] edges, identical bin index, rank position p·n, and
    // in-bin linear interpolation. Shared by the streaming register twin
    // (counts add across micro-batches → identical bin counts).
    "q82_hist_quantile" -> histQuantileOracle,
    "q91_hist_quantile_stream" -> histQuantileOracle,

    // TTL-active retention dedup: the event-time window is exactly a LAG —
    // admit iff first sighting per key or the gap from the PREVIOUS
    // sighting (admitted or suppressed — the window refreshes on every
    // one) exceeds 1 day (86 400 000 000 µs). Ties break by id, matching
    // the operator's (ts, id) sort.
    "q125_stream_retention_dedup" ->
      """WITH f AS (SELECT concat(user_id, ':', event_type) AS key,
        |  event_id AS id, epoch_us(ts) AS ts_us FROM events),
        |g AS (SELECT key, id, ts_us,
        |  LAG(ts_us) OVER (PARTITION BY key ORDER BY ts_us, id) AS prev FROM f)
        |SELECT id, key FROM g WHERE prev IS NULL OR ts_us - prev > 86400000000
        |ORDER BY id""".stripMargin,

    // Two geometries, one component graph: assignA replays the frozen
    // ingest quantizer (√N lowest ids of the HIGH half — the descending
    // feed's first batch; mid uses the overflow-safe min/2 + max/2 the
    // Spark side computes), assignB the recenter refit (corpus-lowest
    // seeds); survivors = min-id members of the components of the UNION
    // of both geometries' within-cell cosine pairs.
    "q127_semdedup_recenter" -> {
      val midSql = "(SELECT min(vec_id) // 2 + max(vec_id) // 2 FROM embeddings)"
      s"""WITH RECURSIVE ${ivfAssignCteTagged("A", s"WHERE vec_id > $midSql")},
         |${ivfAssignCteTagged("B", "")},
         |vA AS (SELECT m.vec_id, m.embedding AS e, $nrmSql AS nrm, a.cell
         |  FROM embeddings m JOIN assignA a ON m.vec_id = a.vec_id),
         |vB AS (SELECT m.vec_id, m.embedding AS e, $nrmSql AS nrm, a.cell
         |  FROM embeddings m JOIN assignB a ON m.vec_id = a.vec_id),
         |eA AS (SELECT va.vec_id AS a, vb.vec_id AS b
         |  FROM vA va JOIN vA vb ON va.cell = vb.cell AND va.vec_id < vb.vec_id
         |  WHERE $dotSql / (va.nrm * vb.nrm) >= 0.35),
         |eB AS (SELECT va.vec_id AS a, vb.vec_id AS b
         |  FROM vB va JOIN vB vb ON va.cell = vb.cell AND va.vec_id < vb.vec_id
         |  WHERE $dotSql / (va.nrm * vb.nrm) >= 0.35),
         |ee AS (SELECT a, b FROM eA UNION SELECT b, a FROM eA
         |  UNION SELECT a, b FROM eB UNION SELECT b, a FROM eB),
         |reach(a, b) AS (
         |  SELECT a, a FROM (SELECT DISTINCT a FROM ee)
         |  UNION
         |  SELECT r.a, e2.b FROM reach r JOIN ee e2 ON r.b = e2.a),
         |comp AS (SELECT a AS id, min(b) AS comp FROM reach GROUP BY a)
         |SELECT m.vec_id, m.label FROM embeddings m
         |LEFT JOIN comp ON m.vec_id = comp.id
         |WHERE comp.comp IS NULL OR comp.comp = m.vec_id
         |ORDER BY m.vec_id""".stripMargin
    },

    // Same md5(normalized text) fingerprints as every exact-dedup oracle;
    // distinct (source, fp) grain, fp equi-join, a <= b pairs incl. the
    // diagonal, Jaccard over the set sizes.
    "q129_cross_source_overlap" ->
      s"""WITH f AS (SELECT DISTINCT source AS src, md5($normalizedSql) AS fp
         |  FROM documents),
         |sz AS (SELECT src, count(*) AS n FROM f GROUP BY src),
         |sh AS (SELECT a.src AS src_a, b.src AS src_b, count(*) AS n_shared
         |  FROM f a JOIN f b ON a.fp = b.fp AND a.src <= b.src
         |  GROUP BY 1, 2)
         |SELECT src_a, src_b, n_shared,
         |  round(CAST(n_shared AS DOUBLE) / (sa.n + sb.n - n_shared), 6) AS jaccard
         |FROM sh JOIN sz sa ON sh.src_a = sa.src JOIN sz sb ON sh.src_b = sb.src
         |ORDER BY src_a, src_b""".stripMargin,

    // Same whitespace tokens, same corpus unigram p, same per-token
    // 6 dp rounding before exact DECIMAL summation as
    // TextProfile.unigramSurprisal.
    "q128_unigram_surprisal" ->
      s"""WITH $surprisalCtes
         |SELECT doc_id, n_toks, surprisal FROM srp ORDER BY doc_id""".stripMargin,

    // q128's surprisal ranked by (surprisal, doc_id) — a total order, so
    // row_number is deterministic — then equal-population integer banding
    "q143_perplexity_bands" ->
      s"""WITH $surprisalCtes,
         |r AS (SELECT doc_id, surprisal,
         |    row_number() OVER (ORDER BY surprisal, doc_id) AS rank,
         |    count(*) OVER () AS n FROM srp)
         |SELECT doc_id, surprisal, rank, 1 + ((rank - 1) * 3) // n AS band
         |FROM r ORDER BY doc_id""".stripMargin,

    // q97's component chain + q128's surprisal: keeper = the member with
    // the lowest (surprisal, id) tuple per component
    "q144_dedup_best_keeper" ->
      s"""WITH RECURSIVE $shCte,
         |$simhashCte,
         |bkt AS (SELECT doc_id, simhash, simhash >> 44 AS bucket FROM ssig),
         |e AS (SELECT l.doc_id AS a, r.doc_id AS b
         | FROM bkt l JOIN bkt r ON l.bucket = r.bucket AND l.doc_id < r.doc_id
         | WHERE bit_count(xor(l.simhash, r.simhash)) <= 8),
         |ee AS (SELECT a, b FROM e UNION SELECT b, a FROM e),
         |reach(a, b) AS (
         |  SELECT a, a FROM (SELECT DISTINCT a FROM ee)
         |  UNION
         |  SELECT r.a, e2.b FROM reach r JOIN ee e2 ON r.b = e2.a),
         |comp AS (SELECT a AS id, min(b) AS comp FROM reach GROUP BY a),
         |$surprisalCtes,
         |kq AS (SELECT comp.comp AS cmp, comp.id AS id,
         |    coalesce(srp.surprisal, CAST('infinity' AS DOUBLE)) AS s2
         |  FROM comp LEFT JOIN srp ON comp.id = srp.doc_id),
         |keep AS (SELECT cmp, id FROM (
         |  SELECT cmp, id, row_number() OVER (PARTITION BY cmp ORDER BY s2, id) AS rn
         |  FROM kq) WHERE rn = 1)
         |SELECT d.doc_id, d.lang FROM documents d
         |LEFT JOIN comp ON d.doc_id = comp.id
         |LEFT JOIN keep ON comp.comp = keep.cmp AND d.doc_id = keep.id
         |WHERE comp.comp IS NULL OR keep.id IS NOT NULL
         |ORDER BY d.doc_id""".stripMargin,

    // the 4×256 counter table + min-over-rows point estimates, salted
    // row hashes replayed via the shared hexLong form
    "q145_cms_heavyhitters" -> cmsOracle,

    // the ingest-accreted CMS cells must estimate exactly like the
    // one-pass batch table — counters are additive, so feed slicing is
    // invisible; one shared oracle with q145
    "q146_cms_stream" -> cmsOracle,

    // Same 40-char/stride-10 windows, same cross-doc df >= 2 screen, same
    // merge-touching island rule (new span iff off STRICTLY past the
    // running max end) as Dedup.substringDupProfile.
    "q126_substring_dup" ->
      s"""WITH $substringSpanCtes
         |SELECT doc_id, count(*) AS n_spans, CAST(sum(e - s) AS BIGINT) AS dup_chars
         |FROM sp GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // same global [min,max] 32-bin grid, slice at the integer-µs time
    // midpoint, add-1 smoothing over the FULL grid (empty bins count),
    // per-term 6 dp round into DECIMAL before the sum
    "q148_drift_psi" ->
      """WITH mm AS (SELECT (epoch_us(min(ts)) + epoch_us(max(ts))) // 2 AS mid,
        |    CAST(min(value) AS DOUBLE) AS lo, CAST(max(value) AS DOUBLE) AS hi
        |  FROM events),
        |bb AS (SELECT event_type AS g, epoch_us(ts) <= mid AS sl,
        |    least(CAST(floor((CAST(value AS DOUBLE) - lo) / (hi - lo) * 32.0e0)
        |      AS BIGINT), 31) AS bin
        |  FROM events, mm),
        |cnt AS (SELECT g, sl, bin, count(*) AS c FROM bb GROUP BY 1, 2, 3),
        |tot AS (SELECT g, sl, sum(c) AS n FROM cnt GROUP BY 1, 2),
        |grid AS (SELECT g, t.bin FROM (SELECT DISTINCT g FROM bb) CROSS JOIN range(32) t(bin)),
        |j AS (SELECT grid.g, grid.bin,
        |    COALESCE(ca.c, 0) AS ca, COALESCE(cb.c, 0) AS cb,
        |    COALESCE(na.n, 0) AS na, COALESCE(nb.n, 0) AS nb
        |  FROM grid
        |  LEFT JOIN (SELECT g, bin, c FROM cnt WHERE sl) ca
        |    ON grid.g = ca.g AND grid.bin = ca.bin
        |  LEFT JOIN (SELECT g, bin, c FROM cnt WHERE NOT sl) cb
        |    ON grid.g = cb.g AND grid.bin = cb.bin
        |  LEFT JOIN (SELECT g, n FROM tot WHERE sl) na ON grid.g = na.g
        |  LEFT JOIN (SELECT g, n FROM tot WHERE NOT sl) nb ON grid.g = nb.g),
        |t2 AS (SELECT g, na, nb,
        |    CAST(round(
        |      (CAST(ca + 1 AS DOUBLE) / CAST(na + 32 AS DOUBLE)
        |        - CAST(cb + 1 AS DOUBLE) / CAST(nb + 32 AS DOUBLE))
        |      * ln((CAST(ca + 1 AS DOUBLE) / CAST(na + 32 AS DOUBLE))
        |        / (CAST(cb + 1 AS DOUBLE) / CAST(nb + 32 AS DOUBLE))), 6)
        |      AS DECIMAL(28,6)) AS term
        |  FROM j)
        |SELECT g AS event_type,
        |  CAST(max(na) AS BIGINT) AS n_a, CAST(max(nb) AS BIGINT) AS n_b,
        |  round(CAST(sum(term) AS DOUBLE), 6) AS psi
        |FROM t2 GROUP BY g ORDER BY event_type""".stripMargin,

    // q148's smoothed-grid PSI parameterized over the (ref=tercile-0,
    // epoch) pairs; global value bounds + exact integer terciling
    "q157_stream_drift" ->
      """WITH mm AS (SELECT epoch_us(min(ts)) AS tlo, epoch_us(max(ts)) AS thi,
        |    CAST(min(value) AS DOUBLE) AS lo, CAST(max(value) AS DOUBLE) AS hi
        |  FROM events),
        |base AS (SELECT event_type AS g, value,
        |    ((epoch_us(ts) - tlo) * 3) // (thi - tlo + 1) AS terc FROM events, mm),
        |eps AS (SELECT 1 AS ep UNION ALL SELECT 2),
        |bb AS (SELECT e.ep, b.g, (b.terc = 0) AS sl,
        |    least(CAST(floor((CAST(value AS DOUBLE) - lo) / (hi - lo) * 32.0e0)
        |      AS BIGINT), 31) AS bin
        |  FROM base b CROSS JOIN mm JOIN eps e ON b.terc = 0 OR b.terc = e.ep),
        |cnt AS (SELECT ep, g, sl, bin, count(*) AS c FROM bb GROUP BY 1, 2, 3, 4),
        |tot AS (SELECT ep, g, sl, sum(c) AS n FROM cnt GROUP BY 1, 2, 3),
        |grid AS (SELECT gg.ep, gg.g, t.bin FROM
        |  (SELECT DISTINCT ep, g FROM bb) gg CROSS JOIN range(32) t(bin)),
        |j AS (SELECT grid.ep, grid.g, grid.bin,
        |    COALESCE(ca.c, 0) AS ca, COALESCE(cb.c, 0) AS cb,
        |    COALESCE(na.n, 0) AS na, COALESCE(nb.n, 0) AS nb
        |  FROM grid
        |  LEFT JOIN (SELECT ep, g, bin, c FROM cnt WHERE sl) ca
        |    ON grid.ep = ca.ep AND grid.g = ca.g AND grid.bin = ca.bin
        |  LEFT JOIN (SELECT ep, g, bin, c FROM cnt WHERE NOT sl) cb
        |    ON grid.ep = cb.ep AND grid.g = cb.g AND grid.bin = cb.bin
        |  LEFT JOIN (SELECT ep, g, n FROM tot WHERE sl) na
        |    ON grid.ep = na.ep AND grid.g = na.g
        |  LEFT JOIN (SELECT ep, g, n FROM tot WHERE NOT sl) nb
        |    ON grid.ep = nb.ep AND grid.g = nb.g),
        |t2 AS (SELECT ep, g, na, nb,
        |    CAST(round(
        |      (CAST(ca + 1 AS DOUBLE) / CAST(na + 32 AS DOUBLE)
        |        - CAST(cb + 1 AS DOUBLE) / CAST(nb + 32 AS DOUBLE))
        |      * ln((CAST(ca + 1 AS DOUBLE) / CAST(na + 32 AS DOUBLE))
        |        / (CAST(cb + 1 AS DOUBLE) / CAST(nb + 32 AS DOUBLE))), 6)
        |      AS DECIMAL(28,6)) AS term
        |  FROM j)
        |SELECT CAST(ep AS BIGINT) AS epoch, g AS event_type,
        |  CAST(max(na) AS BIGINT) AS n_a, CAST(max(nb) AS BIGINT) AS n_b,
        |  round(CAST(sum(term) AS DOUBLE), 6) AS psi
        |FROM t2 GROUP BY ep, g ORDER BY epoch, event_type""".stripMargin,

    // same dyadic u from the md5 hash, same ln(u)/w key rounded to 6 dp,
    // same (key DESC, id) cut — the A-ES ordering replayed
    "q156_weighted_sample" ->
      s"""WITH h AS (SELECT doc_id, CAST(n_chars AS DOUBLE) AS weight,
         |    (CAST(${hexLongSql("CAST(doc_id AS VARCHAR)")} % 9007199254740992 AS DOUBLE) + 1)
         |      / 9007199254740992.0 AS u
         |  FROM documents),
         |kk AS (SELECT doc_id, weight, round(ln(u) / weight, 6) AS key FROM h),
         |rr AS (SELECT doc_id, weight, key,
         |    row_number() OVER (ORDER BY key DESC, doc_id) AS rank FROM kk)
         |SELECT doc_id, weight, key, rank FROM rr WHERE rank <= 100
         |ORDER BY rank""".stripMargin,

    // per-epoch slices recomputed with the same CASE predicates — the
    // ingest audit must equal the batch operator on every slice
    "q155_stream_expectations" ->
      """WITH b AS (SELECT event_id % 3 AS ep, user_id, event_type, value FROM events)
        |SELECT ep AS epoch, expectation, n_checked, n_violations,
        |  n_violations = 0 AS pass FROM (
        | SELECT ep, 'not_null_user_id' AS expectation, count(*) AS n_checked,
        |   CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
        | FROM b GROUP BY ep
        | UNION ALL SELECT ep, 'range_value', count(*),
        |   CAST(sum(CASE WHEN value IS NULL OR value < 0 OR value > 100
        |     THEN 1 ELSE 0 END) AS BIGINT)
        | FROM b GROUP BY ep
        | UNION ALL SELECT ep, 'in_set_event_type', count(*),
        |   CAST(sum(CASE WHEN event_type IS NULL
        |     OR event_type NOT IN ('view', 'click', 'purchase')
        |     THEN 1 ELSE 0 END) AS BIGINT)
        | FROM b GROUP BY ep
        |) ORDER BY epoch, expectation""".stripMargin,

    // each audit row recomputed as written; violation semantics (NULL
    // violates range/enum/FK) mirrored in the CASE predicates
    "q154_expectations" ->
      """SELECT expectation, n_checked, n_violations, n_violations = 0 AS pass
        |FROM (
        | SELECT 'not_null_l_orderkey' AS expectation, count(*) AS n_checked,
        |   CAST(sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
        | FROM lineitem
        | UNION ALL SELECT 'unique_l_orderkey_l_linenumber', count(*),
        |   count(*) - (SELECT count(*) FROM (SELECT DISTINCT l_orderkey, l_linenumber
        |     FROM lineitem WHERE l_orderkey IS NOT NULL AND l_linenumber IS NOT NULL))
        | FROM lineitem
        | UNION ALL SELECT 'range_l_quantity', count(*),
        |   CAST(sum(CASE WHEN l_quantity IS NULL OR l_quantity < 1 OR l_quantity > 50
        |     THEN 1 ELSE 0 END) AS BIGINT)
        | FROM lineitem
        | UNION ALL SELECT 'range_l_extendedprice', count(*),
        |   CAST(sum(CASE WHEN l_extendedprice IS NULL OR l_extendedprice < 0
        |     OR l_extendedprice > 1000 THEN 1 ELSE 0 END) AS BIGINT)
        | FROM lineitem
        | UNION ALL SELECT 'in_set_l_returnflag', count(*),
        |   CAST(sum(CASE WHEN l_returnflag IS NULL
        |     OR l_returnflag NOT IN ('A', 'N', 'R') THEN 1 ELSE 0 END) AS BIGINT)
        | FROM lineitem
        | UNION ALL SELECT 'in_set_l_linestatus', count(*),
        |   CAST(sum(CASE WHEN l_linestatus IS NULL
        |     OR l_linestatus NOT IN ('O') THEN 1 ELSE 0 END) AS BIGINT)
        | FROM lineitem
        | UNION ALL SELECT 'ref_l_orderkey', count(*),
        |   CAST(sum(CASE WHEN o._k IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        | FROM lineitem l LEFT JOIN
        |   (SELECT DISTINCT o_orderkey AS _k FROM orders) o ON l.l_orderkey = o._k
        |) ORDER BY expectation""".stripMargin,

    // the four stages replayed sequentially: q97's simhash component
    // min-id keepers, the shared gopher flags (per-doc-local ⇒
    // subset-independent), the cap's (md5-hash, id) ranking over the
    // gopher survivors, and the distinct-8-gram screen vs the id<50
    // benchmark (bench docs retire)
    "q153_curation_funnel" ->
      s"""WITH RECURSIVE $shCte,
         |$simhashCte,
         |bkt AS (SELECT doc_id, simhash, simhash >> 44 AS bucket FROM ssig),
         |e AS (SELECT l.doc_id AS a, rt.doc_id AS b
         | FROM bkt l JOIN bkt rt ON l.bucket = rt.bucket AND l.doc_id < rt.doc_id
         | WHERE bit_count(xor(l.simhash, rt.simhash)) <= 8),
         |ee AS (SELECT a, b FROM e UNION SELECT b, a FROM e),
         |reach(a, b) AS (
         |  SELECT a, a FROM (SELECT DISTINCT a FROM ee)
         |  UNION
         |  SELECT rr.a, e2.b FROM reach rr JOIN ee e2 ON rr.b = e2.a),
         |comp AS (SELECT a AS id, min(b) AS comp FROM reach GROUP BY a),
         |$gopherCtes,
         |keep1 AS (SELECT d.doc_id AS id FROM documents d
         |  LEFT JOIN comp ON d.doc_id = comp.id
         |  WHERE comp.comp IS NULL OR comp.comp = d.doc_id),
         |k2 AS (SELECT id FROM keep1 JOIN r ON id = r.doc_id
         |  WHERE ok_words AND ok_word_len AND ok_stopwords AND ok_dup AND ok_top),
         |ch AS (SELECT d.doc_id, d.source,
         |    ${hexLongSql("CAST(d.doc_id AS VARCHAR)")} AS hh
         |  FROM documents d JOIN k2 ON d.doc_id = k2.id),
         |k3 AS (SELECT doc_id FROM (SELECT doc_id,
         |    row_number() OVER (PARTITION BY source ORDER BY hh, doc_id) AS rn
         |  FROM ch) WHERE rn <= 10),
         |tw AS (SELECT doc_id, $toksSql AS w FROM documents),
         |bg AS (SELECT DISTINCT gram FROM
         |  (SELECT unnest(list_distinct(${shNSql(8)})) AS gram FROM tw WHERE doc_id < 50)),
         |cand AS (SELECT doc_id FROM k3 WHERE doc_id >= 50),
         |cg AS (SELECT tw.doc_id, unnest(list_distinct(${shNSql(8)})) AS gram
         |  FROM tw JOIN cand ON tw.doc_id = cand.doc_id),
         |contam AS (SELECT DISTINCT cg.doc_id FROM cg JOIN bg USING (gram)),
         |k4 AS (SELECT doc_id FROM cand
         |  WHERE doc_id NOT IN (SELECT doc_id FROM contam)),
         |c0 AS (SELECT count(*) AS n FROM documents),
         |c1 AS (SELECT count(*) AS n FROM keep1),
         |cq AS (SELECT count(*) AS n FROM k2),
         |c3 AS (SELECT count(*) AS n FROM k3),
         |c4 AS (SELECT count(*) AS n FROM k4)
         |SELECT * FROM (
         | SELECT 'a_neardup_dedup' AS stage, c0.n AS n_in, c1.n AS n_out,
         |   c0.n - c1.n AS n_dropped FROM c0, c1
         | UNION ALL SELECT 'b_gopher_quality', c1.n, cq.n, c1.n - cq.n FROM c1, cq
         | UNION ALL SELECT 'c_cap_per_source', cq.n, c3.n, cq.n - c3.n FROM cq, c3
         | UNION ALL SELECT 'd_decontamination', c3.n, c4.n, c3.n - c4.n FROM c3, c4
         |) ORDER BY stage""".stripMargin,

    // the epochs ≤ 3 changelog replayed in one window: (ep DESC, op DESC,
    // ord DESC NULLS LAST) — the store's cross-epoch merge; the
    // tombstone-only epoch 3 tops every %7 key (hidden), epoch 4 is
    // beyond the cap and never enters
    "q151_delta_time_travel" ->
      """WITH ch AS (SELECT event_id % 3 AS ep, user_id, value,
        |    epoch_us(ts) AS ts_us, 'u' AS op FROM events),
        |tmb AS (SELECT DISTINCT 3 AS ep, user_id, CAST(NULL AS DOUBLE) AS value,
        |    CAST(NULL AS BIGINT) AS ts_us, 'd' AS op FROM events WHERE user_id % 7 = 0),
        |al AS (SELECT * FROM ch UNION ALL SELECT * FROM tmb),
        |r AS (SELECT *, row_number() OVER (PARTITION BY user_id
        |    ORDER BY ep DESC, op DESC, ts_us DESC NULLS LAST) AS rn FROM al)
        |SELECT user_id, value, ts_us FROM r WHERE rn = 1 AND op <> 'd'
        |ORDER BY user_id""".stripMargin,

    // the net-change window over epochs (1, 3]: epoch-2 upserts for every
    // touched key, the %7 keys' epoch-3 tombstones on top as 'd' rows
    "q152_delta_cdf" ->
      """WITH ch AS (SELECT event_id % 3 AS ep, user_id, value,
        |    epoch_us(ts) AS ts_us, 'u' AS op FROM events),
        |tmb AS (SELECT DISTINCT 3 AS ep, user_id, CAST(NULL AS DOUBLE) AS value,
        |    CAST(NULL AS BIGINT) AS ts_us, 'd' AS op FROM events WHERE user_id % 7 = 0),
        |al AS (SELECT * FROM ch WHERE ep = 2 UNION ALL SELECT * FROM tmb),
        |r AS (SELECT *, row_number() OVER (PARTITION BY user_id
        |    ORDER BY ep DESC, op DESC, ts_us DESC NULLS LAST) AS rn FROM al)
        |SELECT user_id, value, ts_us, op FROM r WHERE rn = 1
        |ORDER BY user_id""".stripMargin,

    // the same naive ranking SQL the rewrite accelerates — DuckDB runs it
    // as written; (value DESC, event_id) is a total order
    "q150_topk_sql" ->
      """SELECT event_id, value, rn FROM (
        |  SELECT event_id, value,
        |    row_number() OVER (ORDER BY value DESC, event_id) AS rn
        |  FROM events) WHERE rn <= 100 ORDER BY rn""".stripMargin,

    // same mime cycle, same md5-of-bytes fingerprint, same two-level
    // (mime, fp) → mime aggregation as Multimodal.dedupAccounting
    "q149_media_dedup_accounting" ->
      """WITH b AS (SELECT doc_id AS media_id,
        |   (['image/png', 'audio/wav', 'video/mp4'])[CAST(doc_id % 3 + 1 AS INT)] AS mime,
        |   md5(text) AS fp, octet_length(encode(text)) AS len FROM documents),
        |g AS (SELECT mime, fp, count(*) AS c, max(len) AS blen FROM b GROUP BY 1, 2)
        |SELECT mime, CAST(sum(c) AS BIGINT) AS n_blobs, count(*) AS n_distinct,
        |  CAST(sum(c * blen) AS BIGINT) AS bytes_total,
        |  CAST(sum(blen) AS BIGINT) AS bytes_distinct,
        |  round(1.0 - CAST(sum(blen) AS DOUBLE) / CAST(sum(c * blen) AS DOUBLE), 6)
        |    AS savings_frac
        |FROM g GROUP BY mime ORDER BY mime""".stripMargin,

    // the same span table SPLICED OUT of the text: per doc, string_agg of
    // the inter-span gaps in order + the tail; no-span docs pass through
    "q147_substring_dedup_apply" ->
      s"""WITH $substringSpanCtes,
         |wsp AS (SELECT dd.doc_id, dd.text, sp.s, sp.e
         |  FROM documents dd JOIN sp ON dd.doc_id = sp.doc_id),
         |gaps AS (SELECT doc_id, text, s, e,
         |    COALESCE(lag(e) OVER (PARTITION BY doc_id ORDER BY s), 0) AS ps FROM wsp),
         |mid AS (SELECT doc_id,
         |    string_agg(substring(text, ps + 1, s - ps), '' ORDER BY s) AS midtxt,
         |    max(e) AS maxe, any_value(text) AS text FROM gaps GROUP BY doc_id),
         |cln AS (SELECT doc_id,
         |    midtxt || substring(text, maxe + 1, length(text) - maxe) AS clean FROM mid)
         |SELECT d2.doc_id, md5(COALESCE(cln.clean, d2.text)) AS clean_fp,
         |  CAST(length(d2.text) AS BIGINT) AS orig_chars,
         |  CAST(length(COALESCE(cln.clean, d2.text)) AS BIGINT) AS clean_chars
         |FROM documents d2 LEFT JOIN cln USING (doc_id) ORDER BY doc_id""".stripMargin,

    // per-lang ppm threshold = round(1e6·√(n_min/n)) — sqrt is IEEE-exact
    // in both engines, so the sampled set is bit-identical
    "q130_temperature_sample" ->
      s"""WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY 1),
         |m AS (SELECT min(n) AS n_min FROM c),
         |f AS (SELECT lang, CAST(round(1000000.0 * sqrt(CAST(n_min AS DOUBLE) / CAST(n AS DOUBLE))) AS BIGINT) AS ppm
         |  FROM c CROSS JOIN m)
         |SELECT d.lang, count(*) AS n_docs, CAST(sum(doc_id) AS BIGINT) AS sum_ids
         |FROM documents d JOIN f USING (lang)
         |WHERE ${hexLongSql("CAST(doc_id AS VARCHAR)")} % 1000000 < ppm
         |GROUP BY 1 ORDER BY 1""".stripMargin,

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
    // rounded to 6 dp then DECIMAL-summed — q128's exactness trick
    "q132_importance_weight" ->
      s"""$importanceCtes
         |SELECT doc_id, n_toks, importance FROM iw ORDER BY doc_id""".stripMargin,

    // the ingest-maintained IVF store must answer exactly like the batch
    // plan — one shared oracle with q54
    "q134_stream_ann_ingest" -> ivfTopKOracle,

    // q132's scores ranked into a half-the-corpus token budget: global
    // (importance desc, doc_id) prefix-sum, keep while cum ≤ budget
    "q135_budget_select" ->
      s"""$importanceCtes,
         |bud AS (SELECT CAST(sum(n_toks) // 2 AS BIGINT) AS b FROM iw),
         |w AS (SELECT doc_id, n_toks, importance,
         |    sum(n_toks) OVER (ORDER BY importance DESC, doc_id) AS cum FROM iw)
         |SELECT doc_id, n_toks, importance FROM w CROSS JOIN bud
         |WHERE cum <= b ORDER BY doc_id""".stripMargin,

    // smallest-10 md5(doc_id) per source, hash order with id tie-break —
    // the exact integer sort the LONG-space heap mirrors
    "q136_cap_per_group" -> capPerGroupOracle,

    // the ingest-maintained cap store must equal the batch rule over the
    // full corpus under ANY feed order — one shared oracle with q136
    "q137_stream_cap_per_group" -> capPerGroupOracle,

    // per-query IVF recall vs the exact ranking, both chains recomputed
    "q138_ann_recall" -> annRecallOracle,

    // same 32/24 clamped-tail windows as Corpus.chunkByTokens; max(0,·)
    // BEFORE the floor-division so engine division semantics never differ
    "q139_token_chunk" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS w FROM documents),
         |n AS (SELECT doc_id, w, CAST(len(w) AS BIGINT) AS n FROM t),
         |k AS (SELECT doc_id, w, n, greatest(0, n - 32 + 23) // 24 AS k FROM n),
         |c AS (SELECT doc_id, w, n,
         |   unnest(generate_series(0, k)) AS chunk_id FROM k),
         |s AS (SELECT doc_id, w, n, chunk_id,
         |   least(chunk_id * 24, greatest(0, n - 32)) AS start_tok FROM c)
         |SELECT doc_id, chunk_id, start_tok,
         |  least(32, n - start_tok) AS n_tok_chunk,
         |  md5(array_to_string(w[CAST(start_tok + 1 AS INT):CAST(start_tok + 32 AS INT)], ' ')) AS chunk_fp
         |FROM s ORDER BY doc_id, chunk_id""".stripMargin,

    // split = pure function of md5(normalized text): exact dups land on
    // one side by construction; 10% heldout via the md5-ppm gate
    "q140_holdout_split" ->
      s"""SELECT doc_id, md5($normalizedSql) AS cluster_fp,
         |  CASE WHEN ${hexLongSql(s"md5($normalizedSql)")} % 1000000 < 100000
         |    THEN 'heldout' ELSE 'train' END AS split
         |FROM documents ORDER BY doc_id""".stripMargin,

    // q140's split recomputed, then distinct word-8-grams per heldout doc
    // semi-joined against the train-side gram set — all at gram grain
    "q141_split_contamination" ->
      s"""WITH sp AS (SELECT doc_id, text,
         |    CASE WHEN ${hexLongSql(s"md5($normalizedSql)")} % 1000000 < 100000
         |      THEN 'heldout' ELSE 'train' END AS split FROM documents),
         |t AS (SELECT doc_id, split, $toksSql AS w FROM sp),
         |g AS (SELECT doc_id, split, unnest(list_distinct(${shNSql(8)})) AS gram FROM t),
         |tr AS (SELECT DISTINCT gram FROM g WHERE split = 'train'),
         |he AS (SELECT doc_id, gram FROM g WHERE split = 'heldout'),
         |hit AS (SELECT doc_id, count(*) AS n_hit FROM he JOIN tr USING (gram) GROUP BY 1),
         |ng AS (SELECT doc_id, count(*) AS n_grams FROM he GROUP BY 1)
         |SELECT ng.doc_id, n_grams, COALESCE(n_hit, 0) AS n_hit,
         |  COALESCE(n_hit, 0) > 0 AS contaminated
         |FROM ng LEFT JOIN hit USING (doc_id) ORDER BY doc_id""".stripMargin,

    // q97's simhash component chain verbatim, then the md5-ppm gate on
    // the component representative (own id when unclustered)
    "q142_neardup_split" ->
      s"""WITH RECURSIVE $shCte,
         |$simhashCte,
         |bkt AS (SELECT doc_id, simhash, simhash >> 44 AS bucket FROM ssig),
         |e AS (SELECT l.doc_id AS a, r.doc_id AS b
         | FROM bkt l JOIN bkt r ON l.bucket = r.bucket AND l.doc_id < r.doc_id
         | WHERE bit_count(xor(l.simhash, r.simhash)) <= 8),
         |ee AS (SELECT a, b FROM e UNION SELECT b, a FROM e),
         |reach(a, b) AS (
         |  SELECT a, a FROM (SELECT DISTINCT a FROM ee)
         |  UNION
         |  SELECT r.a, e2.b FROM reach r JOIN ee e2 ON r.b = e2.a),
         |comp AS (SELECT a AS id, min(b) AS comp FROM reach GROUP BY a),
         |ck AS (SELECT d.doc_id,
         |   CAST(COALESCE(comp.comp, d.doc_id) AS BIGINT) AS cluster_key
         |  FROM documents d LEFT JOIN comp ON d.doc_id = comp.id)
         |SELECT doc_id, cluster_key,
         |  CASE WHEN ${hexLongSql("CAST(cluster_key AS VARCHAR)")} % 1000000 < 100000
         |    THEN 'heldout' ELSE 'train' END AS split
         |FROM ck ORDER BY doc_id""".stripMargin,
  )

  /** q138: the IVF path (q54's chain) joined against the brute-force
    * ranking (q24's chain) at k = 10 — per-query hit counts + recall. */
  private lazy val annRecallOracle: String =
    s"""WITH $ivfAssignCte,
       |probes AS (SELECT vec_id AS query_id, cell FROM (
       |  SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cell) AS rn FROM dd WHERE vec_id % 50 = 0) WHERE rn <= 4),
       |v AS (SELECT vec_id, embedding AS e, $nrmSql AS nrm FROM embeddings),
       |iscored AS (SELECT p.query_id, a.vec_id AS neighbor_id, $dotSql / (va.nrm * vb.nrm) AS score
       | FROM probes p JOIN assign a ON p.cell = a.cell AND p.query_id <> a.vec_id
       | JOIN v va ON va.vec_id = p.query_id JOIN v vb ON vb.vec_id = a.vec_id),
       |approx AS (SELECT query_id, neighbor_id FROM (
       |  SELECT query_id, neighbor_id, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rn FROM iscored) WHERE rn <= 10),
       |escored AS (SELECT va.vec_id AS query_id, vb.vec_id AS neighbor_id, $dotSql / (va.nrm * vb.nrm) AS score
       | FROM (SELECT * FROM v WHERE vec_id % 50 = 0) va JOIN v vb ON va.vec_id <> vb.vec_id),
       |eranked AS (SELECT query_id, neighbor_id, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rn FROM escored),
       |j AS (SELECT e.query_id, a.neighbor_id AS hitn
       |  FROM (SELECT query_id, neighbor_id FROM eranked WHERE rn <= 10) e
       |  LEFT JOIN approx a ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id)
       |SELECT query_id, count(*) AS n_exact, count(hitn) AS n_hit,
       | round(CAST(count(hitn) AS DOUBLE) / count(*), 6) AS recall
       |FROM j GROUP BY 1 ORDER BY 1""".stripMargin

  /** q136/q137's shared cap rule: smallest-10 md5(doc_id) per source. */
  private lazy val capPerGroupOracle: String =
    s"""WITH h AS (SELECT doc_id, source,
       |    ${hexLongSql("CAST(doc_id AS VARCHAR)")} AS hh FROM documents),
       |r AS (SELECT doc_id, source,
       |    row_number() OVER (PARTITION BY source ORDER BY hh, doc_id) AS rn FROM h)
       |SELECT doc_id, source FROM r WHERE rn <= 10 ORDER BY doc_id""".stripMargin

  /** Seed-centroid IVF probe + exact in-cell scoring — shared by q54
    * (batch ivfTopK) and q134 (the AnnIngest store-backed search, which
    * must answer identically under the id-ascending feed). */
  private lazy val ivfTopKOracle: String =
    s"""WITH $ivfAssignCte,
       |probes AS (SELECT vec_id AS query_id, cell FROM (
       |  SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cell) AS rn FROM dd WHERE vec_id % 50 = 0) WHERE rn <= 4),
       |v AS (SELECT vec_id, embedding AS e, $nrmSql AS nrm FROM embeddings),
       |scored AS (SELECT p.query_id, a.vec_id AS neighbor_id, $dotSql / (va.nrm * vb.nrm) AS score
       | FROM probes p JOIN assign a ON p.cell = a.cell AND p.query_id <> a.vec_id
       | JOIN v va ON va.vec_id = p.query_id JOIN v vb ON vb.vec_id = a.vec_id),
       |ranked AS (SELECT query_id, neighbor_id, score,
       |  row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS "rank" FROM scored)
       |SELECT query_id, neighbor_id, round(score, 6) AS score, "rank" FROM ranked
       |WHERE "rank" <= 10 ORDER BY query_id, "rank"""".stripMargin

  /** q132's DSIR importance chain up to the per-doc `iw` CTE — shared
    * with q135 so the selection step can never diverge from the scores. */
  private lazy val importanceCtes: String =
    s"""WITH t AS (SELECT doc_id, (lang = 'en') AS it, unnest($toksSql) AS tok FROM documents),
       |v AS (SELECT tok, count(*) AS cb,
       |    sum(CASE WHEN it THEN 1 ELSE 0 END) AS ct FROM t GROUP BY tok),
       |tot AS (SELECT sum(cb) AS nb, sum(ct) AS nt, count(*) AS vv FROM v),
       |s AS (SELECT doc_id,
       |    CAST(round(ln((CAST(ct + 1 AS DOUBLE) / CAST(nt + vv AS DOUBLE))
       |      / (CAST(cb + 1 AS DOUBLE) / CAST(nb + vv AS DOUBLE))), 6) AS DECIMAL(28,6)) AS s
       |  FROM t JOIN v USING (tok) CROSS JOIN tot),
       |iw AS (SELECT doc_id, count(*) AS n_toks,
       |    round(CAST(sum(s) AS DOUBLE) / count(*), 6) AS importance
       |  FROM s GROUP BY doc_id)""".stripMargin

  // step-by-step min-time chaining: strictly-after µs compare + 7-day
  // horizon, counts per step — shared by q93 (batch) and q95 (streaming)
  private lazy val funnelOracle: String =
    """WITH s1 AS (SELECT user_id, min(ts) AS t FROM events
      |  WHERE event_type = 'view' GROUP BY 1),
      |s2 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
      |  JOIN s1 ON e.user_id = s1.user_id
      |  WHERE e.event_type = 'click' AND epoch_us(e.ts) > epoch_us(s1.t)
      |    AND epoch_us(e.ts) - epoch_us(s1.t) <= 604800000000 GROUP BY 1),
      |s3 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
      |  JOIN s2 ON e.user_id = s2.user_id
      |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > epoch_us(s2.t)
      |    AND epoch_us(e.ts) - epoch_us(s2.t) <= 604800000000 GROUP BY 1)
      |SELECT CAST(1 AS BIGINT) AS step_idx, 'view' AS step,
      |  (SELECT count(*) FROM s1) AS n_users
      |UNION ALL SELECT CAST(2 AS BIGINT), 'click', (SELECT count(*) FROM s2)
      |UNION ALL SELECT CAST(3 AS BIGINT), 'purchase', (SELECT count(*) FROM s3)
      |ORDER BY step_idx""".stripMargin

  // refund pipeline relation shared by q43 (broadcast J4) and q94
  // (shuffle lookup-join J4)
  private lazy val orderRefundOracle: String =
    """SELECT CASE WHEN l_linenumber%2=0 THEN 'refund_full' ELSE 'refund_part' END AS refund_type_name,
      | CASE WHEN l_partkey%2=0 THEN 'reason_quality' ELSE 'reason_other' END AS refund_reason_type_name,
      | count(*) AS n_rows,
      | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_amount,
      | CAST(sum(CAST(l_quantity AS INT)) AS BIGINT) AS sum_num
      |FROM lineitem JOIN orders ON l_orderkey=o_orderkey
      | AND o_orderstatus<>'O' AND o_orderkey%5=2
      |WHERE l_returnflag='R'
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  private lazy val histQuantileOracle: String =
    """WITH lohi AS (SELECT CAST(min(value) AS DOUBLE) AS lo,
      |    CAST(max(value) AS DOUBLE) AS hi FROM events),
      |b AS (SELECT event_type AS g,
      |    least(CAST(floor((CAST(value AS DOUBLE) - lo) / (hi - lo) * 128.0e0)
      |      AS BIGINT), 127) AS bin
      |  FROM events, lohi),
      |c AS (SELECT g, bin, count(*) AS c FROM b GROUP BY 1, 2),
      |w AS (SELECT g, bin, c,
      |    sum(c) OVER (PARTITION BY g ORDER BY bin) AS cum,
      |    sum(c) OVER (PARTITION BY g) AS n FROM c),
      |sel AS (SELECT g, p.p,
      |    lo + (hi - lo) / 128.0e0 * (CAST(bin AS DOUBLE)
      |      + (p.p * CAST(n AS DOUBLE) - CAST(cum - c AS DOUBLE))
      |        / CAST(c AS DOUBLE)) AS est
      |  FROM w CROSS JOIN (VALUES (0.5e0), (0.9e0), (0.99e0)) p(p)
      |  CROSS JOIN lohi
      |  WHERE CAST(cum AS DOUBLE) >= p.p * CAST(n AS DOUBLE)
      |    AND CAST(cum - c AS DOUBLE) < p.p * CAST(n AS DOUBLE))
      |SELECT g AS event_type,
      |  round(max(CASE WHEN p = 0.5e0 THEN est END), 6) AS p50,
      |  round(max(CASE WHEN p = 0.9e0 THEN est END), 6) AS p90,
      |  round(max(CASE WHEN p = 0.99e0 THEN est END), 6) AS p99
      |FROM sel GROUP BY g ORDER BY event_type""".stripMargin
}
