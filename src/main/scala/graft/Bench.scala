package graft
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and emits ONE raw JSON line on stdout (plus the full
  * per-query map at bench_result.json) for the driver. A query failure
  * aborts the run with a non-zero exit — a broken query must never bench
  * as a fast success.
  *
  * Accounting: the shared topic_db parse and the materialized
  * dwd_trade_order_pre_process wide table (the reference's two
  * Kafka-topic-equivalent hand-offs feeding ~15 pipeline gates) build in
  * a disclosed warmup phase, and `value` INCLUDES that warmup — the gated
  * total is all work done, with `warmup_sec` broken out purely for
  * round-over-round attribution.
  *
  * The stdout line carries total+warmup+slowest-10 only: the driver's
  * bounded stdout-tail parser front-clipped the ~2 KB full-map line three
  * rounds running (BENCH_r0{1,2,3}.json `parsed: null`). The full map
  * lives in bench_result.json, and the line prints LAST so only sbt's
  * ~60-byte success trailer follows it in the tail buffer.
  *
  * The three warehouse-DAG gates (q110/q113/q114) share ONE cached
  * `startFromFiles` run: whichever of them the Map iterates first pays
  * the whole ~10-query streaming DAG (~100 s at sf0.1) and the other two
  * read cached warehouse dirs in <1 s — the retry pass self-discloses
  * this (the payer re-measures at ~0.1 s).
  */
object Bench {
  private def r2(v: Double): Double = math.rint(v * 100) / 100

  /** Host load (1/5/15-min averages) — recorded into bench_result.json so
    * a reviewer can tell host-load variance from a code regression without
    * re-running (rounds 3 and 4 both produced ~1.8× phantom deltas on a
    * loaded host). Absent (empty) on non-Linux. */
  private def loadavg(): String =
    try new String(Files.readAllBytes(Paths.get("/proc/loadavg")))
      .split("\\s+").take(3).mkString(" ")
    catch { case _: Throwable => "" }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val loadStart = loadavg()
    // FAIR scheduling with a FAIR default pool: the warehouse-DAG gate
    // runs ~17 streaming queries concurrently, and under FIFO a tiny
    // broadcast-exchange job can queue behind several million-row stages
    // until it blows spark.sql.broadcastTimeout — observed at the ×10
    // up-scale leg. FAIR round-robins task slots across runnable jobs, so
    // small jobs finish promptly regardless of queue depth; serial batch
    // gates run one job at a time and are unaffected. (A pool entry is
    // required: FAIR mode alone still schedules FIFO *within* the default
    // pool.) The raised broadcast timeout is belt-and-braces for the same
    // shape — local[32] contends the driver in ways a real cluster's
    // dedicated driver does not.
    val fairPools = Files.createTempFile("graft_fair_", ".xml")
    Files.writeString(fairPools,
      """<?xml version="1.0"?>
        |<allocations>
        |  <pool name="default">
        |    <schedulingMode>FAIR</schedulingMode>
        |    <weight>1</weight>
        |    <minShare>0</minShare>
        |  </pool>
        |</allocations>
        |""".stripMargin)
    fairPools.toFile.deleteOnExit() // Spark reads the file at scheduler
    // init; exit-time deletion is safe and stops one-file-per-run temp leaks
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.scheduler.allocation.file", fairPools.toString)
      .config("spark.sql.broadcastTimeout", "3600")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    /** The shared-table warmup for one sf dir (the two Kafka-topic-
      * equivalent hand-offs + the two session-cached wide tables). */
    def warmShared(d: String): Double = {
      val w0 = System.nanoTime()
      graft.core.TopicDb(spark, d).count()
      graft.apps.GmallPipelines.tradeOrderPreProcessCached(spark, d).count()
      // documents + events feed ~40 gates each; their session-cached
      // persist (Tables.scala) materializes here so per-query times stop
      // carrying the first-touch scan of whichever gate runs first
      graft.core.Tables.documents(spark, d).count()
      graft.core.Tables.events(spark, d).count()
      (System.nanoTime() - w0) / 1e9
    }
    val warmup =
      try warmShared(sfDir)
      catch { case e: Throwable =>
        System.err.println(s"[bench] FATAL: shared-table warmup failed: $e")
        spark.stop()
        sys.exit(1)
      }
    System.err.println(f"[bench] warmup(shared tables) $warmup%8.2f s")
    def count(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Long = {
      val rows =
        try fn(spark, sfDir).count()
        catch { case e: Throwable =>
          System.err.println(s"[bench] FATAL: $name failed: $e")
          spark.stop()
          sys.exit(1)
        }
      // every gate produces rows at every SF — an empty result is a broken
      // query that must not bench as a fast success
      if (rows == 0L) {
        System.err.println(s"[bench] FATAL: $name returned 0 rows")
        spark.stop()
        sys.exit(1)
      }
      rows
    }
    val qs = SparkEntry.queries // one Map build; `queries` is a def
    val counts = scala.collection.mutable.Map[String, Long]()
    val results = qs.map { case (name, fn) =>
      val t0 = System.nanoTime()
      counts(name) = count(name, fn)
      val sec = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[bench] $name%-22s $sec%8.2f s")
      name -> sec
    }
    // variance probe: anything slow on the first pass runs once more — a
    // query that re-measures fast was host noise, not a regression; both
    // samples land in bench_result.json for the reviewer, and the retry
    // pass's own wall-clock is disclosed as retry_total_sec (it is NOT in
    // `value`, which gates first-pass work only)
    val r0 = System.nanoTime()
    val retries = results.filter(_._2 > 5.0).map { case (name, first) =>
      val t0 = System.nanoTime()
      count(name, qs(name))
      val second = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[bench] $name%-22s $second%8.2f s (retry; first $first%.2f)")
      name -> second
    }
    val retryTotal = (System.nanoTime() - r0) / 1e9
    // scale-sensitivity cross-check at the BENCH SF (correctness runs at
    // sf0.01 only): each streaming twin shares its batch form's oracle, so
    // their row counts — already computed by the timing pass — must agree
    // here too. A pair diverging only at sf0.1 is a real bug the sf0.01
    // gate can't see; fail the whole bench rather than report a time.
    val twins = Seq(
      "q09_hourly_window" -> "q34_stream_window",
      "q10_dedup_daily" -> "q28_stream_dedup",
      "q10_dedup_daily" -> "q38_stream_dedup_tws",
      "q11_dual_flag_uv" -> "q52_stream_dual_flag",
      "q12_visitor_repair" -> "q57_stream_visitor_repair",
      "q13_jump_detect" -> "q29_stream_jump",
      "q43_dwd_order_refund" -> "q94_lookup_join_shuffle",
      "q70_session_window" -> "q71_stream_session",
      "q76_dedup_groups" -> "q84_dedup_groups_star",
      "q80_topn_window" -> "q87_topn_window_stream",
      "q81_hll_distinct" -> "q83_hll_distinct_stream",
      "q82_hist_quantile" -> "q91_hist_quantile_stream",
      "q93_funnel" -> "q95_funnel_stream",
      // the contamination screens' bloom forms must be filter-invisible
      "q77_contamination" -> "q158_contamination_bloom",
      "q141_split_contamination" -> "q159_split_contamination_bloom",
      // the warehouse DAG's streamed outputs vs their batch/harness forms
      "q102_semdedup" -> "q118_stream_semdedup",
      "q102_semdedup" -> "q124_dag_semdedup",
      "q102_semdedup" -> "q160_semdedup_cadence",
      "q116_stream_paragraph_fuzzy" -> "q123_dag_paragraph_fuzzy",
      "q36_dwd_cart" -> "q113_dag_dwd_cart",
      "q37_dws_keyword" -> "q117_dag_dws_keyword",
      "q39_dwd_order_pre" -> "q115_dag_dwd_order_pre",
      "q40_dws_traffic" -> "q114_dag_dws_traffic",
      "q41_dwd_pay_success" -> "q119_dag_dwd_pay_success",
      "q42_dwd_cancel" -> "q120_dag_dwd_cancel",
      "q43_dwd_order_refund" -> "q121_dag_dwd_order_refund",
      "q44_dwd_refund_pay_suc" -> "q122_dag_dwd_refund_pay_suc")
    twins.foreach { case (a, b) =>
      if (counts(a) != counts(b)) {
        System.err.println(
          s"[bench] FATAL: twin row-count mismatch at $sfDir: $a=${counts(a)} vs $b=${counts(b)}")
        spark.stop()
        sys.exit(1)
      }
    }
    val rowcheck = s"pass(${twins.size} twin pairs)"
    System.err.println(s"[bench] sf rowcheck: $rowcheck")
    val dagGates = Set("q110_dag_dim_store", "q113_dag_dwd_cart",
      "q114_dag_dws_traffic", "q115_dag_dwd_order_pre", "q117_dag_dws_keyword",
      "q119_dag_dwd_pay_success", "q120_dag_dwd_cancel",
      "q121_dag_dwd_order_refund", "q122_dag_dwd_refund_pay_suc",
      "q123_dag_paragraph_fuzzy", "q124_dag_semdedup")
    /** A gate's host-noise-adjudicated main-leg time: DAG gates keep the
      * first pass (their retry is a cache hit, not a re-measure). */
    def mainT(name: String): Double =
      if (dagGates(name)) results(name)
      else math.min(results(name), retries.getOrElse(name, results(name)))
    // ---- scale legs (round-7 ask #3 + round-9 ask #1): growth exponents
    // MEASURED, not argued — in BOTH directions. The scale-sensitive
    // families (ingest-store twins, the DAG charge gate + its twins, every
    // dedup/ANN path, a scan-agg and a windowed-state control) re-run
    // against (a) the next SMALLER sf dir sibling (fixed per-gate overhead
    // makes sub-linear exponents normal there — the tripwire is exponents
    // ≫ 1 beyond a gate's documented complexity) and (b) a GENERATED
    // ×10 UP-scale corpus (tools/GenScale key-offset replicas; textually/
    // geometrically disjoint so dup-pair spaces scale linearly by
    // construction), where fixed overhead DEFLATES instead of flattering —
    // the direction that actually extrapolates toward 100 TB.
    // Disable with SPARK_GRAFT_SF2=off / SPARK_GRAFT_UP=off; override the
    // dirs with SPARK_GRAFT_SF2_DIR / SPARK_GRAFT_UP_DIR.
    val sf2Subset = Seq(
      "q01_pricing_summary", "q17_dedup_exact", "q18_minhash_lsh",
      "q19_simhash_sig", "q21_jaccard_pairs", "q23_embed_neardup",
      "q24_ann_topk", "q44_dwd_refund_pay_suc", "q63_dws_cart_uu",
      "q80_topn_window", "q101_paragraph_dedup", "q102_semdedup",
      "q116_stream_paragraph_fuzzy", "q118_stream_semdedup",
      "q122_dag_dwd_refund_pay_suc", "q123_dag_paragraph_fuzzy",
      "q124_dag_semdedup", "q125_stream_retention_dedup",
      // newer gates with scale-sensitive shapes: gram-grain contamination
      // join, CC-chain funnel, one-pass CMS, token chunking
      "q141_split_contamination", "q139_token_chunk",
      "q145_cms_heavyhitters", "q153_curation_funnel",
      // round-10 additions: the bloom-screened contamination and the
      // recenter-cadence ingest (2 refits O(store) — amortized-O(1) claim)
      "q159_split_contamination_bloom", "q160_semdedup_cadence",
      // round-11 ask #3: the PRODUCTION capped-Jaccard path measured on
      // the same legs as the uncapped q21 it stop-lists
      "q56_jaccard_capped")
    val sf2Twins = Seq(
      "q102_semdedup" -> "q118_stream_semdedup",
      "q102_semdedup" -> "q124_dag_semdedup",
      "q102_semdedup" -> "q160_semdedup_cadence",
      "q116_stream_paragraph_fuzzy" -> "q123_dag_paragraph_fuzzy",
      "q141_split_contamination" -> "q159_split_contamination_bloom",
      "q44_dwd_refund_pay_suc" -> "q122_dag_dwd_refund_pay_suc")
    /** One scale leg: warm the shared tables at `d`, run `subset`, check
      * the twin pairs present in the subset. Returns (times, warmup,
      * errors). Scale-leg failures are RECORDED, not fatal: the main-leg
      * emission (the driver's headline) must survive a scale-leg query
      * blowing up at an SF no correctness gate covers — the error list
      * rides the result JSON so a skipped leg query is loudly disclosed,
      * never silently absent. (Main-leg failures stay fatal above.) */
    // per-leg loadavg bracketing (round-11 verdict #1: the bench
    // regression adjudication needs to know WHICH leg ran on a loaded
    // host, not just the run's endpoints)
    val legLoads = scala.collection.mutable.ArrayBuffer[(String, String)]()
    def runLeg(d: String, subset: Seq[String], tag: String,
        warmLeg: String => Double = warmShared)
        : (Map[String, Double], Double, Seq[String]) = {
      legLoads += (s"${tag}_start" -> loadavg())
      // drop the previous leg's persisted tables before warming this one:
      // legs never revisit an earlier dir, and keeping three dirs' caches
      // resident starved the heap at the ×10 leg (see SessionCache)
      graft.core.SessionCache.evictOwned(spark)
      val errs = scala.collection.mutable.ArrayBuffer[String]()
      val warm = try { warmLeg(d) }
        catch { case e: Throwable =>
          System.err.println(s"[bench] LEG ERROR: warmup failed at $d: $e")
          errs += s"warmup: ${e.getClass.getSimpleName}"
          return (Map.empty, 0.0, errs.toSeq)
        }
      System.err.println(f"[bench] warmup($tag shared)  $warm%8.2f s")
      val cs = scala.collection.mutable.Map[String, Long]()
      val res = subset.flatMap { name =>
        val t0 = System.nanoTime()
        try {
          val rows = qs(name)(spark, d).count()
          if (rows == 0L) {
            System.err.println(s"[bench] LEG ERROR: $name returned 0 rows at $d")
            errs += s"$name: 0 rows"
            None
          } else {
            cs(name) = rows
            val sec = (System.nanoTime() - t0) / 1e9
            System.err.println(f"[bench] $name%-22s $sec%8.2f s ($tag)")
            Some(name -> sec)
          }
        } catch { case e: Throwable =>
          System.err.println(s"[bench] LEG ERROR: $name failed at $d: $e")
          errs += s"$name: ${e.getClass.getSimpleName}"
          None
        }
      }.toMap
      val pairs = sf2Twins.filter { case (a, b) => cs.contains(a) && cs.contains(b) }
      val bad = pairs.filter { case (a, b) => cs(a) != cs(b) }
      bad.foreach { case (a, b) =>
        System.err.println(
          s"[bench] LEG ERROR: twin row-count mismatch at $d: $a=${cs(a)} vs $b=${cs(b)}")
        errs += s"twin $a/$b: ${cs(a)}!=${cs(b)}"
      }
      System.err.println(
        s"[bench] $tag rowcheck: ${if (bad.isEmpty) "pass" else "FAIL"}(${pairs.size} twin pairs)")
      legLoads += (s"${tag}_end" -> loadavg())
      (res, warm, errs.toSeq)
    }
    def sibling(dir: String): Option[String] = {
      val p = Paths.get(dir).toAbsolutePath
      val name = p.getFileName.toString
      val sf = if (name.startsWith("sf")) name.drop(2).toDoubleOption else None
      sf.flatMap { primary =>
        val parent = p.getParent.toFile
        Option(parent.listFiles()).getOrElse(Array.empty)
          .filter(_.isDirectory).map(_.getName)
          .flatMap(n => if (n.startsWith("sf")) n.drop(2).toDoubleOption.map(n -> _) else None)
          .filter(_._2 < primary)
          .sortBy(-_._2).headOption
          .map { case (n, _) => s"${parent.getAbsolutePath}/$n" }
      }
    }
    // ---- DOWN leg (next smaller sibling; exponent = log(t1/t2)/log(r))
    val sf2Dir = sys.env.get("SPARK_GRAFT_SF2_DIR")
      .orElse(if (sys.env.get("SPARK_GRAFT_SF2").contains("off")) None
              else sibling(sfDir))
      .filter(d => Files.isDirectory(Paths.get(d)))
    val (sf2Results, sf2Warmup, sf2Growth, sf2Errors) = sf2Dir match {
      case None => (Map.empty[String, Double], 0.0, Map.empty[String, Double], Seq.empty[String])
      case Some(d2) =>
        val (res2, warm2, errs2) = runLeg(d2, sf2Subset, "sf2")
        val ratio = {
          val sfOf = (p: String) =>
            Paths.get(p).getFileName.toString.drop(2).toDoubleOption
          (sfOf(sfDir), sfOf(d2)) match {
            case (Some(a), Some(b)) if b > 0 => a / b
            case _ => 10.0
          }
        }
        val growth = res2.collect { case (name, t2) if t2 > 0 =>
          name -> r2(math.log(mainT(name) / t2) / math.log(ratio))
        }
        (res2, warm2, growth, errs2)
    }
    // ---- UP leg (round-9 ask #1): a ×10 corpus GENERATED from the bench
    // sf dir (manifest-guarded — regenerated only when absent or built
    // from a different source), exponent = log(tUp/t1)/log(factor). The
    // two quadratic exact BASELINES are excluded by design (documented
    // all-pairs controls whose exponent 2 is known and whose up-scale
    // cost is ~100× for that known answer); their scale-path variants
    // (q102 cells, q18 bands, q19/q21 buckets, q159 bloom) stay in.
    val upFactor = 10
    val upExcluded = Seq("q23_embed_neardup", "q24_ann_topk")
    val upSubset = sf2Subset.filterNot(upExcluded.contains)
    val upRequested = sys.env.get("SPARK_GRAFT_UP_DIR")
      .orElse(if (sys.env.get("SPARK_GRAFT_UP").contains("off")) None
              else Some(new java.io.File("updata/sf1").getAbsolutePath))
    // Shared freshness-check + generate-on-miss for the scale-leg corpora.
    // Path spellings are normalized (relative vs absolute vs trailing
    // slash) so a re-spelled dir never triggers a full regeneration; a
    // generation failure skips the leg loudly rather than failing the run.
    def ensureCorpus(dir: String, factor: Int, label: String,
        gen: => Unit): (Option[String], Double) = {
      def norm(p: String) =
        java.nio.file.Paths.get(p).toAbsolutePath.normalize.toString
      val fresh = graft.tools.GenScale.manifestInfo(spark, dir)
        .exists { case (src, f) => norm(src) == norm(sfDir) && f == factor }
      if (fresh) (Some(dir), 0.0)
      else {
        System.err.println(s"[bench] generating ×$factor $label corpus at $dir")
        val t0 = System.nanoTime()
        try { gen; (Some(dir), (System.nanoTime() - t0) / 1e9) }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $label generation failed ($e) — skipping leg")
          (None, (System.nanoTime() - t0) / 1e9)
        }
      }
    }
    val (upDir, upGenSec) = upRequested match {
      case None => (None, 0.0)
      case Some(d) => ensureCorpus(d, upFactor, "up-scale",
        graft.tools.GenScale.generate(spark, sfDir, d, upFactor))
    }
    val (upResults, upWarmup, upGrowth, upErrors) = upDir match {
      case None => (Map.empty[String, Double], 0.0, Map.empty[String, Double], Seq.empty[String])
      case Some(d) =>
        val (resU, warmU, errsU) = runLeg(d, upSubset, "up")
        val growth = resU.collect { case (name, tU) if mainT(name) > 0 =>
          name -> r2(math.log(tU / mainT(name)) / math.log(upFactor.toDouble))
        }
        (resU, warmU, growth, errsU)
    }
    // ---- ×100 DOCUMENT-FAMILY leg (round-10 ask #6): the 100× claim for
    // the dedup/ANN/contamination family measured, not extrapolated — a
    // documents+embeddings-only corpus at 100× the bench SF (GenScale
    // .generateDocs; ~10× the ×10 leg's DOC bytes, none of its warehouse
    // bytes), running just the gates that read those two tables. Exponent
    // base is 100 vs the MAIN leg. SPARK_GRAFT_UP100=off skips;
    // SPARK_GRAFT_UP100_DIR overrides the corpus dir.
    val up100Factor = 100
    val up100Subset = Seq("q17_dedup_exact", "q18_minhash_lsh",
      "q21_jaccard_pairs", "q101_paragraph_dedup", "q102_semdedup",
      "q158_contamination_bloom",
      // round-11 asks #3/#4: the capped-Jaccard production path, and the
      // ANN family (the ×100 corpus carries embeddings — offset-rotated
      // replicas keep the cell geometry linear)
      "q56_jaccard_capped", "q53_embed_neardup_lsh", "q54_ann_ivf",
      "q134_stream_ann_ingest")
    val up100Requested = sys.env.get("SPARK_GRAFT_UP100_DIR")
      .orElse(if (sys.env.get("SPARK_GRAFT_UP100").contains("off")) None
              else Some(new java.io.File("updata/sf10docs").getAbsolutePath))
    val (up100Dir, up100GenSec) = up100Requested match {
      case None => (None, 0.0)
      case Some(d) => ensureCorpus(d, up100Factor, "doc-family",
        graft.tools.GenScale.generateDocs(spark, sfDir, d, up100Factor))
    }
    val (up100Results, up100Warmup, up100Growth, up100Errors) = up100Dir match {
      case None => (Map.empty[String, Double], 0.0, Map.empty[String, Double], Seq.empty[String])
      case Some(d) =>
        // doc-family warmup only: the corpus has no warehouse tables
        val warmDocs = (dd: String) => {
          val w0 = System.nanoTime()
          graft.core.Tables.documents(spark, dd).count()
          graft.core.Tables.embeddings(spark, dd).count()
          (System.nanoTime() - w0) / 1e9
        }
        val (resC, warmC, errsC) = runLeg(d, up100Subset, "up100", warmDocs)
        val growth = resC.collect { case (name, tC) if mainT(name) > 0 =>
          name -> r2(math.log(tC / mainT(name)) / math.log(up100Factor.toDouble))
        }
        (resC, warmC, growth, errsC)
    }
    val loadEnd = loadavg()
    // `value` includes warmup (all gated work, the round-3 accounting);
    // queries_only_sec = first-pass query time alone, so round-over-round
    // consumers can separate the two without reading doc comments
    val queriesOnly = results.values.sum
    val total = queriesOnly + warmup
    // best_of_2_sec: warmup + Σ min(first pass, retry) — the host-noise-
    // adjudicated comparison as a first-class number, so round-over-round
    // review stops doing manual retry arithmetic over retry_sec.
    // EXCEPT the warehouse-DAG gates: they share ONE cached startFromFiles
    // run, so the paying gate's retry reads cached dirs in ~0.2 s — a
    // cache hit, not a re-measure — and min() would erase the ~90 s of
    // real streaming work from the headline. DAG gates keep their
    // first-pass time so best_of_2_sec still covers all work performed.
    val bestOf2 = warmup + results.keys.map(mainT).sum
    def qJson(qs: Iterable[(String, Double)]): String =
      qs.map { case (k, v) => "\"" + k + "\":" + r2(v) }.mkString("{", ",", "}")
    def common =
      s""""metric":"total","value":${r2(total)},"unit":"sec","warmup_sec":${r2(warmup)},""" +
        s""""queries_only_sec":${r2(queriesOnly)},"best_of_2_sec":${r2(bestOf2)},""" +
        s""""n_queries":${results.size},""" +
        s""""sf_twin_rowcheck":"$rowcheck""""
    def sJson(ss: Seq[String]): String =
      ss.map(s => "\"" + s.replace("\"", "'") + "\"").mkString("[", ",", "]")
    val sf2Json = sf2Dir.map { d2 =>
      s""","sf2":"$d2","sf2_warmup_sec":${r2(sf2Warmup)},""" +
        s""""queries_sf2":${qJson(sf2Results)},"growth_exponents":${qJson(sf2Growth)},""" +
        s""""sf2_errors":${sJson(sf2Errors)}"""
    }.getOrElse("")
    val upJson = upDir.map { d =>
      s""","up":"$d","up_factor":$upFactor,"up_gen_sec":${r2(upGenSec)},""" +
        s""""up_warmup_sec":${r2(upWarmup)},"queries_up":${qJson(upResults)},""" +
        s""""up_growth_exponents":${qJson(upGrowth)},""" +
        s""""up_errors":${sJson(upErrors)},""" +
        s""""up_excluded":${upExcluded.map("\"" + _ + "\"").mkString("[", ",", "]")}"""
    }.getOrElse("")
    val up100Json = up100Dir.map { d =>
      s""","up100":"$d","up100_factor":$up100Factor,"up100_gen_sec":${r2(up100GenSec)},""" +
        s""""up100_warmup_sec":${r2(up100Warmup)},"queries_up100":${qJson(up100Results)},""" +
        s""""up100_growth_exponents":${qJson(up100Growth)},""" +
        s""""up100_errors":${sJson(up100Errors)}"""
    }.getOrElse("")
    // q21 candidate-pair counts per leg (round-11 verdict #3: separate
    // PLAN growth from memory pressure — if these are linear in the
    // factor, a superlinear wall-clock exponent is shuffle/host, not the
    // pair space). One cheap aggregate per leg over the exploded
    // shingles; replica token-suffixing makes these exactly linear by
    // construction, so this line is the standing proof.
    def candPairs(d: String): Long = {
      import org.apache.spark.sql.functions.{array_distinct, col, explode, expr, lit, sum}
      graft.core.Tables.documents(spark, d)
        .select(explode(array_distinct(
          graft.functions.TextFunctions.shingles(col("text"), 3))).as("sh"))
        .groupBy(col("sh")).agg(org.apache.spark.sql.functions.count(lit(1)).as("c"))
        .agg(sum(expr("c*(c-1) div 2"))).head().getLong(0)
    }
    val diagJson = {
      val legs = Seq("main" -> Some(sfDir), "up" -> upDir, "up100" -> up100Dir)
        .collect { case (tag, Some(d)) => tag -> candPairs(d) }
      s""","diag_q21_cand_pairs":${legs.map { case (t, n) => "\"" + t + "\":" + n }
        .mkString("{", ",", "}")}"""
    }
    val legLoadJson =
      s""","leg_loadavg":${legLoads.map { case (t, l) => "\"" + t + "\":\"" + l + "\"" }
        .mkString("{", ",", "}")}"""
    val full =
      s"""{$common,"loadavg_start":"$loadStart","loadavg_end":"$loadEnd",""" +
        s""""retry_total_sec":${r2(retryTotal)},"retry_sec":${qJson(retries)},""" +
        s""""queries":${qJson(results)}$sf2Json$upJson$up100Json$diagJson$legLoadJson,"sf":"$sfDir"}"""
    Files.writeString(Paths.get("bench_result.json"), full + "\n")
    val slowest = results.toSeq.sortBy(-_._2).take(10)
    // the stdout line stays tail-parser-small: growth exponents ride it
    // (the judged number — now in BOTH directions), the full per-query
    // scale-leg maps live in bench_result.json
    val growthLine = sf2Dir.map { d2 =>
      s""","sf2":"$d2","growth_exponents":${qJson(sf2Growth)}"""
    }.getOrElse("") + upDir.map { d =>
      s""","up_factor":$upFactor,"up_growth_exponents":${qJson(upGrowth)}"""
    }.getOrElse("") + up100Dir.map { d =>
      s""","up100_growth_exponents":${qJson(up100Growth)}"""
    }.getOrElse("") + {
      val n = sf2Errors.size + upErrors.size + up100Errors.size
      if (n > 0) s""","leg_errors":${sJson(sf2Errors ++ upErrors ++ up100Errors)}""" else ""
    }
    val line = s"""{$common,"queries":${qJson(slowest)}$growthLine,"sf":"$sfDir"}"""
    // stop BEFORE printing so nothing follows the JSON line in the tail
    // buffer — but a stop-time failure must never swallow the line
    try spark.stop()
    catch { case e: Throwable => System.err.println(s"[bench] spark.stop failed: $e") }
    println(line)
  }
}
