package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Envelope schemas + parsers for the three ODS input families of the
  * reference warehouse (SURVEY.md §1.1, FIXTURES.md):
  *
  *  - Maxwell CDC (`topic_db`): reference DDL utils/MyKafkaUtil.java:79-89,
  *    sample app/func/TableProcessFunction.java:276-277.
  *  - Behavior log (`topic_log`): field accesses app/dwd/BaseLogApp.java:
  *    56,72-73,105-147.
  *  - Debezium config stream: app/func/TableProcessFunction.java:187-193.
  *
  * Parsing is `from_json` in PERMISSIVE mode with a corrupt-record column —
  * the declarative replacement for the reference's try/catch dirty side
  * output (app/dwd/BaseLogApp.java:36-52). Bad input NEVER fails the job
  * (X11); it routes to the dirty stream.
  *
  * Scale: `from_json` is a codegen'd Catalyst expression evaluated at the
  * scan — no shuffle, no UDF, schema pruning applies when downstream
  * selects a subset of envelope fields.
  */
object Envelopes {

  val Corrupt = "_corrupt"

  // ------------------------------------------------------------- schemas --

  /** Maxwell envelope: data/old as string→string maps exactly like the
    * reference DDL (`data MAP<STRING,STRING>`, utils/MyKafkaUtil.java:85). */
  val maxwellSchema: StructType = StructType(Seq(
    StructField("database", StringType),
    StructField("table", StringType),
    StructField("type", StringType),
    StructField("ts", LongType),
    StructField("xid", LongType),
    StructField("commit", BooleanType),
    StructField("data", MapType(StringType, StringType)),
    StructField("old", MapType(StringType, StringType)),
    StructField(Corrupt, StringType)))

  /** Behavior-log envelope (FIXTURES.md §1). `displays`/`actions` are
    * arrays of structs; `start` presence ⇒ launch log. */
  val logSchema: StructType = {
    val common = StructType(Seq(
      StructField("mid", StringType), StructField("vc", StringType),
      StructField("ch", StringType), StructField("ar", StringType),
      StructField("is_new", StringType), StructField("uid", StringType),
      StructField("os", StringType), StructField("md", StringType),
      StructField("ba", StringType)))
    val page = StructType(Seq(
      StructField("page_id", StringType),
      StructField("last_page_id", StringType),
      StructField("item", StringType),
      StructField("item_type", StringType),
      StructField("during_time", LongType)))
    val display = StructType(Seq(
      StructField("display_type", StringType), StructField("item", StringType),
      StructField("item_type", StringType), StructField("pos_id", LongType),
      StructField("order", LongType)))
    val action = StructType(Seq(
      StructField("action_id", StringType), StructField("item", StringType),
      StructField("item_type", StringType), StructField("ts", LongType)))
    val start = StructType(Seq(
      StructField("entry", StringType), StructField("open_ad_id", LongType),
      StructField("loading_time", LongType), StructField("open_ad_ms", LongType),
      StructField("open_ad_skip_ms", LongType)))
    val err = StructType(Seq(
      StructField("error_code", LongType), StructField("msg", StringType)))
    StructType(Seq(
      StructField("common", common), StructField("page", page),
      StructField("displays", ArrayType(display)),
      StructField("actions", ArrayType(action)),
      StructField("start", start), StructField("err", err),
      StructField("ts", LongType),
      StructField(Corrupt, StringType)))
  }

  /** Debezium envelope for the config stream (only the fields the
    * reference reads: `after` + `op`, TableProcessFunction.java:192-193). */
  val debeziumConfigSchema: StructType = {
    val tp = StructType(Seq(
      StructField("source_table", StringType),
      StructField("sink_table", StringType),
      StructField("sink_columns", StringType),
      StructField("sink_pk", StringType),
      StructField("sink_extend", StringType)))
    StructType(Seq(
      StructField("before", tp), StructField("after", tp),
      StructField("op", StringType), StructField("ts_ms", LongType),
      StructField(Corrupt, StringType)))
  }

  /** Debezium envelope for a DATA-PLANE table stream (per-record dim
    * maintenance, SURVEY §2.1 S4's data leg): `before`/`after` as
    * string→string maps — the schema-agnostic dynamic-table shape (the
    * Maxwell `data` map's counterpart), since the table_process config
    * decides per table which columns survive, and `source.table` routes
    * the record exactly like the reference keys its broadcast config by
    * source table (app/func/TableProcessFunction.java:287-298; the CDC
    * source itself is app/dim/DimApp.java:163-175). */
  val debeziumRowSchema: StructType = StructType(Seq(
    StructField("before", MapType(StringType, StringType)),
    StructField("after", MapType(StringType, StringType)),
    StructField("source", StructType(Seq(StructField("table", StringType)))),
    StructField("op", StringType),
    StructField("ts_ms", LongType),
    StructField(Corrupt, StringType)))

  // ------------------------------------------------------------- parsing --

  private def parse(raw: DataFrame, jsonCol: String, schema: StructType,
      keep: Seq[String] = Nil): DataFrame =
    raw.withColumn("_env", from_json(col(jsonCol), schema,
        Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> Corrupt)))
      .select(keep.map(col) ++ Seq(col(jsonCol).as("_raw"), col("_env.*")): _*)

  /** Parse a Maxwell JSON column; corrupt input keeps `_raw` and gets a
    * non-null [[Corrupt]] column.
    *
    * `keep` passes input columns through UNPARSED alongside the envelope
    * fields. The point is predicate pushdown past the parse: a filter on
    * a kept column (e.g. a producer-staged `table` tag) references a
    * passthrough attribute, so Catalyst moves it BELOW this projection
    * and `from_json` — by far the most expensive expression in any CDC
    * plan — evaluates only for surviving rows. A filter on a from_json
    * OUTPUT field (like the parsed `table`) can never push below the
    * parse that computes it. */
  def parseMaxwell(raw: DataFrame, jsonCol: String = "value",
      keep: Seq[String] = Nil): DataFrame =
    parse(raw, jsonCol, maxwellSchema, keep)

  /** Parse a behavior-log JSON column. */
  def parseLog(raw: DataFrame, jsonCol: String = "value"): DataFrame =
    parse(raw, jsonCol, logSchema)

  /** Parse the Debezium config stream. */
  def parseDebeziumConfig(raw: DataFrame, jsonCol: String = "value"): DataFrame =
    parse(raw, jsonCol, debeziumConfigSchema)

  /** Parse a Debezium data-plane row stream ([[debeziumRowSchema]]). */
  def parseDebeziumRows(raw: DataFrame, jsonCol: String = "value"): DataFrame =
    parse(raw, jsonCol, debeziumRowSchema)

  /** A record is dirty iff the corrupt column captured anything — exactly
    * the reference's rule (dirty = JSON parse failure and nothing else,
    * BaseLogApp.java:42-47). A parseable log record lacking both `page` and
    * `start` is NOT dirty; the reference routes it to the page stream
    * (BaseLogApp.java:115-118, where it would NPE on page access), while
    * [[graft.apps.GmallPipelines.baseLogSplit]] additionally requires a
    * `page` section, so such records match no branch — the one deliberate
    * divergence, chosen over crashing. */
  def isDirty: Column = col(Corrupt).isNotNull

  /** Split one parsed stream into (clean, dirty) without recomputing the
    * parse: both branches are filters over the same plan. */
  def cleanDirty(parsed: DataFrame): (DataFrame, DataFrame) =
    (parsed.where(!isDirty).drop(Corrupt), parsed.where(isDirty))

  /** The Maxwell CDC type filter (P2): keep row-changing types, drop
    * `delete`/noise exactly like app/dim/DimApp.java:142-160. */
  def cdcUpserts(parsed: DataFrame): DataFrame =
    parsed.where(col("type").isin("insert", "update", "bootstrap-insert"))

  /** P3 — project Maxwell `data['k']` map entries to named string columns:
    * `dataCols("id", "sku_id")` ⇒ element_at per key, mirroring the
    * reference's `data['id'] id` select lists
    * (app/dwd/DwdTradeOrderPreProcess.java:25-43). */
  def dataCols(parsed: DataFrame, keys: String*): DataFrame =
    parsed.select(
      (Seq(col("database"), col("table"), col("type"), col("ts"), col("old"))
        ++ keys.map(k => element_at(col("data"), k).as(k))): _*)
}
