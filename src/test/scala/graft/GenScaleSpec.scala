package graft

import org.apache.spark.sql.functions._

/** Up-scale corpus generator invariants (`tools/GenScale`). The scale
  * legs' growth exponents are only meaningful if the synthetic corpus
  * really scales the way the design note claims — in particular that
  * replica transforms are pairwise DISTINCT, so dup-pair spaces grow
  * linearly by construction. Regression anchor: `generateDocs` originally
  * branched forward/reversed rotations on `(_r / dim) % 2 === 0`, which
  * is FLOAT division in Spark — every replica 1..dim-1 silently took the
  * reversed branch, making replicas r and r+dim element-wise identical
  * (caught as 65/66 distinct transforms at factor 66). */
class GenScaleSpec extends SparkTestBase {

  private val src = "/root/testdata/sf0.001"

  test("generateDocs: counts scale, ids stay distinct, text replicas are token-disjoint") {
    val out = graft.core.TempDirs.create("graft_genscale_spec_")
    graft.tools.GenScale.generateDocs(spark, src, out, 4)
    val docs = spark.read.parquet(s"$out/documents.parquet")
    val emb = spark.read.parquet(s"$out/embeddings.parquet")
    val srcDocs = spark.read.parquet(s"$src/documents.parquet")
    val nSrc = srcDocs.count()
    assert(docs.count() == 4 * nSrc)
    assert(docs.select("doc_id").distinct().count() == 4 * nSrc)
    assert(emb.count() == 4 * spark.read.parquet(s"$src/embeddings.parquet").count())
    // n_chars matches the SUFFIXED text, not the source text
    assert(docs.where(col("n_chars") =!= length(col("text"))).count() == 0)
    // replica 0 is verbatim; replica r>0 suffixes EVERY token → shingle
    // spaces are replica-disjoint (no token of replica 1 appears in 0)
    val toks0 = docs.where(col("doc_id") < nSrc)
      .select(explode(split(col("text"), "\\s+")).as("t"))
    val toks1 = docs.where(col("doc_id") >= nSrc && col("doc_id") < 2 * nSrc)
      .select(explode(split(col("text"), "\\s+")).as("t"))
    assert(toks1.join(toks0, "t").isEmpty)
    graft.core.TempDirs.deleteNow(out)
  }

  test("generateDocs: embedding transforms are pairwise distinct past the rotation group") {
    // factor 66 > dim (64) exercises the reversed-rotation branch; the
    // float-division bug collapsed it to 65 distinct transforms
    val out = graft.core.TempDirs.create("graft_genscale_spec_")
    graft.tools.GenScale.generateDocs(spark, src, out, 66)
    val stride = spark.read.parquet(s"$src/embeddings.parquet")
      .agg(max(col("vec_id"))).head().getLong(0) + 1
    val distinct = spark.read.parquet(s"$out/embeddings.parquet")
      .where(pmod(col("vec_id"), lit(stride)) === 0)
      .select(col("embedding").cast("string")).distinct().count()
    assert(distinct == 66, s"expected 66 pairwise-distinct replica transforms, got $distinct")
    graft.core.TempDirs.deleteNow(out)
  }
}
