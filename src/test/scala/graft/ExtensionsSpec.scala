package graft

import org.apache.spark.sql.SparkSessionExtensions

/** SQL registration of the native expressions (SparkSessionExtensions
  * entry point + live-session registration). */
class ExtensionsSpec extends SparkTestBase {
  import spark.implicits._

  test("GraftExtensions injects without error and registerAll exposes SQL functions") {
    // injection path (what spark.sql.extensions invokes at session build)
    new GraftExtensions().apply(new SparkSessionExtensions)

    GraftExtensions.registerAll(spark)
    Seq((1L, Array(3.0f, 4.0f), Array(1.0f, 0.0f)))
      .toDF("id", "a", "b").createOrReplaceTempView("vecs")

    val row = spark.sql(
      "SELECT graft_dot(a, b) AS d, graft_l2norm(a) AS n FROM vecs")
      .as[(Double, Double)].head()
    assert(row === ((3.0, 5.0)))

    val bkt = spark.sql("SELECT graft_bucket64(a, 4) AS bkt FROM vecs")
      .as[Long].head()
    assert(bkt >= 0L && bkt < 16L)

    Seq((1L, "hello spark 引擎测试 world"))
      .toDF("doc_id", "text").createOrReplaceTempView("docs")
    val words = spark.sql(
      "SELECT word FROM docs LATERAL VIEW graft_tokenize(text) t AS word")
      .as[String].collect().toSeq
    // CJK run of length 4 → 3 bigrams; ASCII tokens pass through
    assert(words === Seq("hello", "spark", "引擎", "擎测", "测试", "world"))

    // hash signatures from SQL match the Column-API expressions
    val (mh, sh) = spark.sql(
      "SELECT graft_minhash(array('a', 'b'), 4) AS mh, graft_simhash(array('a', 'b'), 60) AS sh")
      .as[(Array[Long], Long)].head()
    val viaApi = Seq("x").toDF("t").select(
      org.apache.spark.sql.graftshim.ColumnBridge.column(
        graft.functions.HashExpressions.MinHashSig(
          org.apache.spark.sql.graftshim.ColumnBridge.expression(
            org.apache.spark.sql.functions.array(
              org.apache.spark.sql.functions.lit("a"),
              org.apache.spark.sql.functions.lit("b"))), 4)).as("mh"))
      .as[Array[Long]].head()
    assert(mh.toSeq === viaApi.toSeq)
    assert(mh.length === 4 && sh >= 0L)

    val red = spark.sql(
      "SELECT graft_redact_pii('mail a@b.co ip 10.0.0.1 end') AS r")
      .as[String].head()
    assert(red === "mail <EMAIL> ip <IP> end")
  }

  test("tokenizeGen generator matches the UDF tokenizer on the documents table") {
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
    import org.apache.spark.sql.functions._
    val viaGen = docs.select(col("doc_id"),
        graft.functions.Tokenizer.tokenizeGen(col("text")).as("word"))
      .as[(Long, String)].collect().toSeq.sorted
    val viaUdf = docs.select(col("doc_id"),
        explode(graft.functions.Tokenizer.tokenizeUdf(col("text"))).as("word"))
      .as[(Long, String)].collect().toSeq.sorted
    assert(viaGen === viaUdf)
    assert(viaGen.nonEmpty)
  }
}
