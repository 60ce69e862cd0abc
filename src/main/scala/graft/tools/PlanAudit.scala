package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Plan hygiene audit: materializes every SparkEntry query's physical plan
  * at a small scale factor and flags the smells that stop mattering only
  * when the data is small — cartesian products, BNLJ outside the declared
  * ss_ brute-force family, and SILENT whole-stage-codegen fallbacks (the
  * r10 ss_pq_topk Janino 64 KB overflow ran interpreted for a round
  * before this audit caught it). Run per-round after correctness goes
  * green — it is a REQUIRED gate step (tools/gate.sh):
  *   runMain graft.tools.PlanAudit [sfDir]
  * EXIT CODE is non-zero when any query carries a flag, so the gate
  * script can refuse to ship the round on a plan regression.
  */
object PlanAudit {

  /** Collects codegen-fallback warnings (Janino "grows beyond 64 KB",
    * compile failures) that Spark logs and then silently works around by
    * interpreting the stage — invisible in the plan string, caught only
    * at the log layer. Attached to the two emitting loggers at WARN
    * while the session log level is ERROR. */
  private final class CodegenWarnCatcher
      extends org.apache.logging.log4j.core.appender.AbstractAppender(
        "graft-codegen-catcher", null,
        org.apache.logging.log4j.core.layout.PatternLayout.createDefaultLayout(),
        false, org.apache.logging.log4j.core.config.Property.EMPTY_ARRAY) {
    val hits = new java.util.concurrent.atomic.AtomicInteger(0)
    override def append(e: org.apache.logging.log4j.core.LogEvent): Unit = {
      val m = e.getMessage.getFormattedMessage
      if (m.contains("grows beyond 64 KB") || m.contains("Failed to compile") ||
        m.contains("codegen disabled")) hits.incrementAndGet()
    }
    def drain(): Int = hits.getAndSet(0)
  }

  /** Queries whose BroadcastNestedLoopJoin is a DECLARED scalar cross —
    * a 1-row aggregate side (corpus doc count, HLL/KMV estimate, MP
    * group stats, skyline bound, HITS norm, butterfly total, vocab
    * size) broadcast against the main stream. Bounded by construction;
    * a BNLJ on any query NOT in this set fails the audit. */
  private val DeclaredScalarCross: Set[String] = Set(
    "g_butterflies", "g_hits", "g_negative_samples", "q_dq_report",
    "q_hll_compacted", "q_hll_distinct", "q_kmv_setops", "q_mp_quantiles",
    "q_skyline_orders", "q_skyline_parts",
    "tx_bigram_logprob", "tx_bm25", "tx_chunk_bm25",
    "tx_dsir", "tx_tfidf", "tx_unigram_logprob")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val catcher = new CodegenWarnCatcher
    catcher.start()
    val ctx = org.apache.logging.log4j.LogManager.getContext(false)
      .asInstanceOf[org.apache.logging.log4j.core.LoggerContext]
    val cfg = ctx.getConfiguration
    Seq("org.apache.spark.sql.execution.WholeStageCodegenExec",
      "org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator").foreach { ln =>
      val lc = new org.apache.logging.log4j.core.config.LoggerConfig(
        ln, org.apache.logging.log4j.Level.WARN, false)
      lc.addAppender(catcher, org.apache.logging.log4j.Level.WARN, null)
      cfg.addLogger(ln, lc)
    }
    ctx.updateLoggers()

    // --selftest: prove the catcher wiring actually receives codegen
    // warnings (a silently-detached appender would make INTERPRETED a
    // no-op detector — the exact failure class this audit exists for)
    if (args.contains("--selftest")) {
      org.apache.logging.log4j.LogManager
        .getLogger("org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator")
        .warn("synthetic: generated method grows beyond 64 KB")
      val ok = catcher.drain() == 1
      println(s"[audit] selftest catcher=${if (ok) "OK" else "FAILED"}")
      spark.stop()
      sys.exit(if (ok) 0 else 1)
    }

    var failed = 0
    val rows = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        // execute THIS queryExecution so its AdaptiveSparkPlan finalizes in
        // place (a separate write/count action builds its own plan copy and
        // leaves df's plan showing pre-AQE state)
        catcher.drain()
        df.queryExecution.executedPlan.execute().count()
        val plan = df.queryExecution.executedPlan.toString
        val interpreted = catcher.drain()
        val failFlags = Seq(
          if (plan.contains("CartesianProduct")) Some("CARTESIAN") else None,
          if (plan.contains("BroadcastNestedLoopJoin") && !name.startsWith("ss_")
            && !DeclaredScalarCross(name)) Some("BNLJ") else None,
          if (interpreted > 0) Some(s"INTERPRETED($interpreted)") else None
        ).flatten
        val flags = failFlags ++
          (if (plan.contains("BroadcastNestedLoopJoin") && DeclaredScalarCross(name))
            Seq("bnlj-scalar-ok") else Nil)
        if (failFlags.nonEmpty) failed += 1
        val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
        // executedPlan.toString marks codegen'd operators with a "*(n)" prefix
        val codegen = raw"\*\(\d+\)".r.findAllIn(plan).toSeq
          .map(_.drop(2).dropRight(1).toInt).distinct.size
        f"$name%-28s exchanges=$exchanges%-3d codegenSpans=$codegen%-3d ${flags.mkString(",")}"
      } catch {
        case e: Throwable =>
          failed += 1
          f"$name%-28s PLAN-ERROR: ${e.getMessage.take(80)}"
      }
    }
    println("[audit] physical-plan hygiene @ " + sfDir)
    rows.foreach(r => println("[audit] " + r))
    println(s"[audit] flagged queries: $failed")
    spark.stop()
    if (failed > 0) sys.exit(1)
  }
}
