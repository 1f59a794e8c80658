package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.apps.{GmallApp, GmallPipelines}
import graft.core.{Envelopes, TopicDb}

/** Executes the PRODUCTION DAG (GmallApp.wire — the exact graph `start`
  * deploys against Kafka) end-to-end through MemoryStream: DIM routing
  * with dynamic table creation, the 12-branch DWD fan-out, the log
  * 5-way split, and both DWS windows, all as real streaming queries
  * writing a real warehouse directory. */
class GmallAppSpec extends SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("GmallApp.wire runs the full warehouse DAG over MemoryStream feeds") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val wh = Files.createTempDirectory("graft_app_").toString
    val dbIn = MemoryStream[String]
    val logIn = MemoryStream[String]
    val db = Envelopes.cleanDirty(Envelopes.parseMaxwell(dbIn.toDS().toDF()))._1
    val log = Envelopes.cleanDirty(Envelopes.parseLog(logIn.toDS().toDF()))._1

    val queries = GmallApp.wire(spark, db, log, wh)
    try {
      // ---- feed: the synthesized topic_db firehose + a few log events --
      val envelopes = TopicDb.raw(spark, sf).as[String].collect().toSeq
      def pageRow(ts: Long, mid: String, item: String) =
        s"""{"common":{"mid":"$mid","vc":"v1","ch":"app","ar":"1","is_new":"0"},""" +
          s""""page":{"page_id":"good_list","last_page_id":"search","item":"$item","item_type":"keyword","during_time":1000},"ts":$ts}"""
      val logs = Seq(
        pageRow(1000L, "m1", "hello world"),
        pageRow(2000L, "m2", "hello spark"),
        """{"common":{"mid":"m3","vc":"v1","ch":"app","ar":"1","is_new":"1"},"start":{"entry":"icon"},"ts":3000}""",
        """{"common":{"mid":"m1","vc":"v1","ch":"app","ar":"1","is_new":"0"},"err":{"error_code":1,"msg":"boom"},"page":{"page_id":"home","during_time":5},"ts":4000}""")
      dbIn.addData(envelopes)
      logIn.addData(logs)
      queries.foreach(_.processAllAvailable())
      // watermark-flush the DWS windows with a far-future sentinel
      logIn.addData(Seq(pageRow(4102444800000L, "zz", "zzflush")))
      queries.foreach(_.processAllAvailable())

      // ---- DIM: routed, pruned, dynamically-created keyed store --------
      val dimUsers = spark.read.parquet(s"$wh/dim/dim_user_info")
      assert(dimUsers.schema.fieldNames.toSeq === Seq("id", "name", "ts"))
      assert(dimUsers.count() === Tables.customer(spark, sf).count())

      // ---- DWD db family: matches the batch pipeline bit-for-bit ------
      val cartStreamed = spark.read.parquet(s"$wh/dwd/cart_add")
      val cartBatch = GmallPipelines.tradeCartAdd(TopicDb(spark, sf))
      assert(cartStreamed.count() === cartBatch.count())
      assert(spark.read.parquet(s"$wh/dwd/user_register").count() ===
        Tables.customer(spark, sf).count())
      assert(spark.read.parquet(s"$wh/dwd/order_pre").count() ===
        GmallPipelines.tradeOrderPreProcess(
          TopicDb(spark, sf), TopicDb.baseDic(spark)).count())
      assert(spark.read.parquet(s"$wh/dwd/pay_success").count() > 0)
      assert(spark.read.parquet(s"$wh/dwd/comment").count() > 0)

      // ---- DWD log family: 5-way split branches ------------------------
      assert(spark.read.parquet(s"$wh/dwd/traffic_page").count() === 4L) // 3 pages + sentinel
      assert(spark.read.parquet(s"$wh/dwd/traffic_start").count() === 1L)
      assert(spark.read.parquet(s"$wh/dwd/traffic_err").count() === 1L)

      // ---- DWS: windows flushed by the sentinel's watermark ------------
      val kw = spark.read.parquet(s"$wh/dws/keyword")
      assert(kw.where($"word" === "hello").count() === 1L) // one 10s window, ct 2
      assert(spark.read.parquet(s"$wh/dws/traffic").count() > 0)
    } finally queries.foreach(_.stop())
  }

  private def Tables = graft.core.Tables
}
