package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Relational query shapes from SURVEY.md §2 re-expressed over the
  * TPC-H-ish test tables — each models one operator family of the
  * reference (filter/projection P2-P5, equi-joins J1-J4, grouped
  * aggregation A1-A3, unions SO1/SO2) as a declarative Spark plan so
  * Catalyst gets full pushdown/pruning freedom.
  *
  * Scale notes (100 TB / 1000-executor):
  *  - Dimension tables (region/nation) are always on the build side of a
  *    broadcast join — the fact side never shuffles for enrichment,
  *    mirroring the reference's lookup-join design (SURVEY.md §2.4 J4).
  *  - Fact-fact joins (orders ⋈ lineitem) shuffle on the join key only
  *    after filters/projections are pushed to the parquet scan.
  *  - Aggregations rely on partial aggregation (map-side combine); keys
  *    are natural attributes with bounded cardinality per group.
  *
  * Determinism note (oracle hash-matching): money doubles in the test
  * data are exact 2-decimal values, so `cast(x as decimal(18,2))` is
  * LOSSLESS and decimal sums are bit-identical between Spark and the
  * DuckDB oracle — no float summation-order nondeterminism. Derived
  * per-row products are computed in double (IEEE-identical per row in
  * both engines), rounded to 6 decimals (still identical), then summed
  * exactly as decimals.
  */
object Relational {

  /** Lossless 2-decimal money cast (see determinism note above). */
  def money(c: Column): Column = c.cast("decimal(18,2)")

  /** Exact sum of a per-row double expression: round to 6 decimals
    * (deterministic given identical per-row doubles), sum as decimal
    * (exact, order-independent), emit double. */
  def exactSum6(c: Column): Column =
    sum(round(c, 6).cast("decimal(28,6)")).cast("double")

  /** A1/A2-style grouped aggregation: pricing summary per flag/status
    * (the classic TPC-H q1 shape — one shuffle on two low-cardinality
    * keys, map-side partial agg does nearly all the work). */
  def pricingSummary(li: DataFrame): DataFrame =
    li.where(col("l_shipdate") <= lit("1998-09-02"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        sum(money(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        sum(money(col("l_extendedprice")) * (lit(1) - money(col("l_discount"))))
          .cast("double").as("sum_disc_price"),
        exactSum6(col("l_extendedprice") * (lit(1) - col("l_discount"))
          * (lit(1) + col("l_tax"))).as("sum_charge"),
        round(sum(col("l_quantity")) / count(lit(1)), 6).as("avg_qty"),
        round(sum(money(col("l_extendedprice"))).cast("double") / count(lit(1)), 6)
          .as("avg_price"),
        round(sum(money(col("l_discount"))).cast("double") / count(lit(1)), 6)
          .as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** J4-style dimension-enrichment join chain: customer → nation →
    * region, dims broadcast (at 100 TB the customer side is the fact
    * and never shuffles for this join). */
  def customerByRegion(customer: DataFrame, nation: DataFrame, region: DataFrame): DataFrame =
    customer
      .join(broadcast(nation), customer("c_nationkey") === nation("n_nationkey"))
      .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
      .groupBy(col("r_name").as("region_name"), col("n_name").as("nation_name"))
      .agg(
        count(lit(1)).as("n_customers"),
        sum(money(col("c_acctbal"))).cast("double").as("total_acctbal"))
      .orderBy(col("region_name"), col("nation_name"))

  /** J1-style fact-fact inner equi-join (orders ⋈ lineitem on orderkey)
    * + aggregation — the batch analogue of the reference's
    * order_detail ⋈ order_info stream join
    * (app/dwd/DwdTradeOrderPreProcess.java:165-167). Shuffles both
    * sides on the key; AQE may convert to broadcast at small SF. */
  def orderRevenue(orders: DataFrame, li: DataFrame): DataFrame =
    orders
      .where(col("o_orderstatus") =!= "F")
      .join(li, orders("o_orderkey") === li("l_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(
        countDistinct(col("o_orderkey")).as("n_orders"),
        sum(money(col("l_extendedprice")) * (lit(1) - money(col("l_discount"))))
          .cast("double").as("revenue"))
      .orderBy(col("o_orderpriority"))

  /** J2-style left outer join: every order, with high-quantity lineitem
    * matches where present (batch analogue of od LEFT JOIN
    * order_detail_activity, app/dwd/DwdTradeOrderPreProcess.java:168-171). */
  def orderWithOptionalLines(orders: DataFrame, li: DataFrame): DataFrame =
    orders
      .join(li.where(col("l_quantity") > 45),
        orders("o_orderkey") === li("l_orderkey"), "left")
      .groupBy(col("o_orderstatus"))
      .agg(
        count(lit(1)).as("n_rows"),
        count(col("l_orderkey")).as("n_matched"))
      .orderBy(col("o_orderstatus"))

  /** Anti join — customers without open orders. left_anti never
    * materializes right columns → the shuffle carries keys only. */
  def customersWithoutOrders(customer: DataFrame, orders: DataFrame): DataFrame =
    customer
      .join(orders.where(col("o_orderstatus") === "O"),
        customer("c_custkey") === orders("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(col("c_mktsegment"))

  /** P4/P5-style conditional projection + predicate filter — the
    * when/otherwise mirrors `if(type='insert', sku_num, ...)`
    * (app/dwd/DwdTradeCartAdd.java:31); the isin filter mirrors the CDC
    * type filter (app/dim/DimApp.java:142-160). */
  def conditionalProjection(events: DataFrame): DataFrame =
    events
      .where(col("event_type").isin("view", "click", "purchase"))
      .select(
        col("event_id"),
        col("user_id"),
        col("event_type"),
        when(col("event_type") === "view", col("value"))
          .otherwise(col("value") * 2).as("adj_value"))
      .orderBy(col("event_id"))

  /** SO1/SO2-style union of N filtered branches then aggregate — the
    * DWS pattern of unioning counter streams, with events pre-encoded
    * as 0/1 counters before the sum (X7 pre-aggregation;
    * DwsTrafficVcChArIsNewPageViewWindow.java:43-86). Spark unions are
    * plan-level concatenation: no shuffle until the group-by. */
  def unionCounters(events: DataFrame): DataFrame = {
    val a = events.where(col("event_type") === "view")
      .select(col("user_id"), lit(1L).as("pv"), lit(0L).as("clk"), lit(0L).as("buy"))
    val b = events.where(col("event_type") === "click")
      .select(col("user_id"), lit(0L).as("pv"), lit(1L).as("clk"), lit(0L).as("buy"))
    val c = events.where(col("event_type") === "purchase")
      .select(col("user_id"), lit(0L).as("pv"), lit(0L).as("clk"), lit(1L).as("buy"))
    a.union(b).union(c)
      .groupBy(col("user_id"))
      .agg(sum(col("pv")).as("pv_ct"), sum(col("clk")).as("clk_ct"),
        sum(col("buy")).as("buy_ct"))
      .orderBy(col("user_id"))
  }

  /** P1-style schemaless JSON field extraction (the Maxwell/log envelope
    * parse, utils/MyKafkaUtil.java:79-89): pull `k` out of the props
    * JSON string, filter, aggregate. */
  def jsonPropsAgg(events: DataFrame): DataFrame =
    events
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
      .where(col("k").isNotNull && col("k") >= 50)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("k")).as("sum_k"))
      .orderBy(col("event_type"))

  /** AS-OF (point-in-time) join — an operator Spark has no primitive for,
    * built by COMPOSITION (the brief's preference order (a)): each left
    * row picks the latest right row of its key with `right.ts <= left.ts`
    * (inclusive). The distributed form is the piecewise merge: tag both
    * sides, union, and carry the last right payload forward inside one
    * (key, ts, tag)-sorted window — right rows sort BEFORE left rows at
    * equal ts, making the bound inclusive.
    *
    * The right payload rides in ONE struct column, so a null field inside
    * a right row is carried faithfully (ignoreNulls skips only rows from
    * the left side, never a right row's null attribute). Left rows with
    * no prior right row get a null struct → null payload columns (left
    * semantics).
    *
    * Scale: ONE shuffle of each side on the key, in-partition sort —
    * never a per-key range probe or an O(L×R) product; skew bounded by
    * the hottest key's row count, same as any keyed window.
    */
  def asOfJoin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      payloadCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val payloadSchema = org.apache.spark.sql.types.StructType(
      right.select(payloadCols.map(col): _*).schema.fields.map(_.copy(nullable = true)))
    val l = left.withColumn("_tag", lit(1))
      .withColumn("_r", lit(null).cast(payloadSchema))
    val r = right.select(
      col(keyCol), col(tsCol), lit(0).as("_tag"),
      struct(payloadCols.map(col): _*).as("_r"))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    // _r as the final sort key makes duplicate right (key, ts) rows
    // deterministic: the greatest payload struct wins the carry-forward
    // (struct ordering is field-by-field; left rows sort among themselves
    // only by ts,_tag — their _r is null). Without it, `last` would pick
    // whichever tied right row the shuffle happened to order last.
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col("_tag"), col("_r"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned.withColumn("_asof", last(col("_r"), ignoreNulls = true).over(w))
    payloadCols.foldLeft(
        carried.where(col("_tag") === 1).drop("_tag", "_r"))(
        (df, c) => df.withColumn(c, col("_asof").getField(c)))
      .drop("_asof")
  }

  /** J4 lookup join for a dimension PAST the broadcast threshold — the
    * shuffle-based strategy SURVEY §4.3 flags as the open stretch item:
    * the reference's JDBC lookup cache holds the whole dim per task
    * (utils/MysqlUtil.java:4-29 — fine for base_dic's handful of rows,
    * impossible for a 10^9-row dim), so past the broadcast threshold the
    * only scale-correct plan is to hash-partition BOTH sides on the key
    * and hash-join per partition.
    *
    * The SHUFFLE_HASH hint pins that strategy at planning time: join
    * strategy hints take precedence over the size-based broadcast pick
    * in Catalyst's JoinSelection, and survive AQE replanning, so the
    * plan is broadcast-free regardless of `autoBroadcastJoinThreshold`
    * (PlanSpec tripwires this).
    *
    * Scale: one exchange of each side on the join key; the dim builds
    * its hash map per PARTITION (ShuffledHashJoin, build = dim side), so
    * task memory is dim_rows/shuffle_partitions, not dim_rows. Repeated
    * lookups against an identical dim projection reuse the dim exchange
    * (ReuseExchange). For streaming, call inside `foreachBatch` with a
    * [[graft.streaming.DimCache]]-refreshed dim: each micro-batch
    * shuffles only its own rows against the cached dim snapshot.
    */
  def lookupJoin(
      fact: DataFrame,
      dim: DataFrame,
      cond: Column,
      joinType: String = "inner"): DataFrame =
    fact.join(dim.hint("shuffle_hash"), cond, joinType)

  /** RANGE (interval-containment) join, binned — the second operator the
    * brief names that Spark lacks natively: pair each point with every
    * interval containing it. A naive inequality join plans as a nested
    * loop; the scale form EQUI-joins on a bin key: intervals explode to
    * the bins they cover (⌈len/binWidth⌉+1 rows each), points hash to
    * exactly one bin, and the residual range predicate filters exact
    * containment. Each (point, interval) pair meets in exactly one bin —
    * no dedup needed.
    *
    * Scale: shuffle volume = points + Σ interval-bin spans; pick binWidth
    * near the typical interval length so the explosion factor stays ~2.
    */
  def rangeJoinBinned(
      points: DataFrame,
      intervals: DataFrame,
      pCol: String,
      loCol: String,
      hiCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val pts = points.withColumn("_bin",
      floor(col(pCol) / lit(binWidth)).cast("long"))
    val iv = intervals.withColumn("_bin",
      explode(sequence(floor(col(loCol) / lit(binWidth)).cast("long"),
        floor(col(hiCol) / lit(binWidth)).cast("long"))))
    pts.join(iv, Seq("_bin"))
      .where(col(pCol) >= col(loCol) && col(pCol) <= col(hiCol))
      .drop("_bin")
  }

  /** Bucketed co-location — the STORAGE-layout half of shuffle
    * minimization: materialize a table hash-bucketed AND sorted by its
    * join key, so every later equi-join between two tables bucketed on
    * their join keys (same bucket count) plans with NO Exchange and no
    * per-task Sort — Spark's bucketed-scan join. The one shuffle happens
    * once, at write time; at 100 TB this is how a fact table joined every
    * day on the same key amortizes that shuffle across all downstream
    * runs (the `repartition()/bucketing for co-located joins` line of the
    * design brief). `path` keeps the data external to the session
    * catalog's warehouse.
    *
    * `table` is a BASE name: the registered catalog name gets a per-run
    * nonce suffix (returned in [[Bucketed.table]]) because `saveAsTable`
    * writes the SHARED session catalog — two concurrent runs using the
    * same fixed name would race each other's DROP/create. A failed write
    * drops the half-registered table and deletes `path` before
    * rethrowing, so error paths leak neither catalog entries nor files.
    *
    * PlanSpec pins the no-Exchange property with broadcasting disabled. */
  def bucketize(
      df: DataFrame,
      table: String,
      key: String,
      nBuckets: Int,
      path: String): Bucketed = {
    require(nBuckets > 0, "nBuckets must be positive")
    val spark = df.sparkSession
    val name = s"${table}_n${bucketNonce.incrementAndGet()}"
    try {
      df.write.format("parquet").option("path", path)
        .bucketBy(nBuckets, key).sortBy(key)
        .saveAsTable(name)
      Bucketed(spark.table(name), name)
    } catch {
      case e: Throwable =>
        try spark.sql(s"DROP TABLE IF EXISTS `$name`")
        finally org.apache.hadoop.fs.FileUtil.fullyDelete(new java.io.File(path))
        throw e
    }
  }

  /** [[bucketize]]'s handle: the re-read bucketed frame plus the resolved
    * (nonce-suffixed) catalog name — callers drop by `table` when done. */
  final case class Bucketed(df: DataFrame, table: String)

  private val bucketNonce = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Partition-pruned layout — [[bucketize]]'s sibling for
    * LOW-cardinality keys (date, source, language): write hive-style
    * `key=value` directories, and any filter on the key prunes whole
    * directories at planning time (`PartitionFilters` on the scan — the
    * scan never opens a non-matching file). At 100 TB this is the
    * date-partitioned fact-table layout every daily pipeline reads one
    * slice of. Returns the re-read frame. */
  def partitionByKey(df: DataFrame, keys: Seq[String], path: String): DataFrame = {
    require(keys.nonEmpty, "need at least one partition key")
    df.write.mode("overwrite").partitionBy(keys: _*).parquet(path)
    df.sparkSession.read.parquet(path)
  }
}
