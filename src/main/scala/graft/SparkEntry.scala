package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.{Dedup, EventOps, Relational, Similarity}
import graft.functions.TextFunctions

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
  )

  // ------------------------------------------------------------- oracle SQL

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
  )
}
