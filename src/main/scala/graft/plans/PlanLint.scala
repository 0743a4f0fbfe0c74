package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.Cross
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan, Window}
import org.apache.spark.sql.catalyst.rules.Rule

/** The 100 TB plan linter: mechanical detection of the two plan shapes
  * that quietly work at test scale and collapse on a cluster —
  *
  *  - a join with NO condition (cross/cartesian): |L|·|R| work;
  *  - a window with an EMPTY partition spec: Spark executes the whole
  *    input through ONE task (the global-window trap SCALE.md documents —
  *    the reason the prefix sums and top-k lowerings in this library avoid
  *    the window formulation).
  *
  * Two consumption paths:
  *  - [[PlanLint.check]] / [[PlanLint.assertScalable]] — CI-style: inspect
  *    a DataFrame's optimized plan before shipping the pipeline. Sketch-
  *    sized inputs (a ≤k-row sketch through a whole-partition window, a
  *    broadcast scalar via crossJoin) are legitimate uses of both shapes —
  *    the caller decides; this library's own catalog uses them ONLY on
  *    report-sized frames.
  *  - an optimizer rule injected by [[GraftExtensions]] — set
  *    `spark.graft.lint=warn` to log findings on every query a session
  *    plans, or `fail` to reject them (default `off`).
  */
object PlanLint {

  final case class Finding(kind: String, detail: String)

  /** Findings over a logical plan (and its subqueries' children). */
  def findings(plan: LogicalPlan): Seq[Finding] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Finding]
    // foreach walks plan CHILDREN only; subquery plans live inside
    // expressions (ScalarSubquery/Exists) and would otherwise be a blind
    // spot — a global window hidden in a scalar subquery passes the gate
    (plan +: plan.subqueriesAll).foreach(_.foreach {
      case j: Join if j.condition.isEmpty || j.joinType == Cross =>
        out += Finding("cartesian",
          s"join without condition (${j.joinType}): |L|*|R| work at scale")
      case w: Window if w.partitionSpec.isEmpty =>
        out += Finding("global-window",
          "window with empty PARTITION BY: whole input through one task")
      case _ => ()
    })
    out.toSeq
  }

  /** Lint a DataFrame's optimized plan. */
  def check(df: DataFrame): Seq[Finding] =
    findings(df.queryExecution.optimizedPlan)

  /** Throw (naming every finding) if the plan carries a scale trap —
    * the pre-ship CI gate for user pipelines. */
  def assertScalable(df: DataFrame): Unit = {
    val fs = check(df)
    if (fs.nonEmpty)
      throw new IllegalStateException("plan fails the scale lint: " +
        fs.map(f => s"[${f.kind}] ${f.detail}").mkString("; "))
  }

  /** The injectable rule: observe-only (never rewrites), gated by
    * `spark.graft.lint` = off (default) | warn | fail. The optimizer
    * applies injected rules once per fixed-point iteration in EACH
    * operator batch, so identical findings would log several times per
    * query — consecutive duplicates are suppressed per planning thread
    * (mid-optimization plans can also differ from [[check]]'s final
    * optimizedPlan; the session lint is a tripwire, check() is the
    * authoritative CI gate). */
  final case class LintRule(session: SparkSession) extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan = {
      val mode = session.conf.get("spark.graft.lint", "off")
      if (mode != "off") {
        val fs = findings(plan)
        if (fs.nonEmpty) {
          val msg = fs.map(f => s"[${f.kind}] ${f.detail}").mkString("; ")
          if (mode == "fail")
            throw new IllegalStateException(s"plan fails the scale lint: $msg")
          if (LintRule.lastLogged.get() != msg) {
            LintRule.lastLogged.set(msg)
            logWarning(s"graft plan lint: $msg")
          }
        }
      }
      plan
    }
  }

  object LintRule {
    private val lastLogged = new ThreadLocal[String] {
      override def initialValue(): String = ""
    }
  }
}
