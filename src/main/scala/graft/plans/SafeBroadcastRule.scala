package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.{BROADCAST, HintInfo, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer guardrail against the classic scale failure: a BROADCAST
  * hint on a relation that only LOOKS small at dev scale. A hinted
  * broadcast bypasses AQE's size check entirely — at 100× the data the
  * "small" side is tens of GB and the job dies collecting it to the
  * driver (the round-1 `broadcast(orders)` bug, automated away).
  *
  * The rule runs after the main optimizer batches (hints are already
  * folded into `Join.hint`) and STRIPS the broadcast strategy from any
  * side whose optimizer-estimated size exceeds
  * `spark.graft.broadcast.maxBytes` (default 512 MB) — planning then
  * falls through to AQE/statistics-based selection, which picks a
  * shuffle join for a genuinely large side. Hints on sides within the
  * cap pass through untouched.
  *
  * Installed with the rest of the graft extensions
  * ([[graft.functions.GraftExtensions]]): via
  * `spark.sql.extensions` config or `GraftExtensions.install(spark)`.
  */
case class SafeBroadcastRule() extends Rule[LogicalPlan] {

  private val confKey = "spark.graft.broadcast.maxBytes"
  private val defaultMax = 512L * 1024 * 1024

  /** Accepts plain bytes or Spark-style size strings ("512m", "1g");
    * a malformed value degrades to the default with a warning — a
    * misconfigured guardrail must never fail working queries. */
  private def maxBytes: BigInt = {
    val raw = conf.getConfString(confKey, defaultMax.toString)
    try BigInt(org.apache.spark.network.util.JavaUtils.byteStringAsBytes(raw))
    catch {
      case _: NumberFormatException =>
        logWarning(s"$confKey='$raw' is not a size; using $defaultMax")
        BigInt(defaultMax)
    }
  }

  private def isBroadcast(h: Option[HintInfo]): Boolean =
    h.exists(_.strategy.contains(BROADCAST))

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j: Join if isBroadcast(j.hint.leftHint) || isBroadcast(j.hint.rightHint) =>
      val cap = maxBytes
      // stat-less sources (JDBC, streaming) report the unknown-stats
      // default (spark.sql.defaultSizeInBytes ≈ Long.MaxValue): there a
      // user hint is the ONLY size information available — trust it.
      // The rule only overrides hints contradicted by REAL estimates.
      val unknown = BigInt(conf.defaultSizeInBytes)
      def vet(side: Option[HintInfo], child: LogicalPlan,
          name: String): Option[HintInfo] = {
        val size = child.stats.sizeInBytes
        if (isBroadcast(side) && size > cap && size < unknown) {
          logWarning(s"stripping BROADCAST hint from $name join side: " +
            s"estimated $size bytes > $confKey=$cap")
          None
        } else side
      }
      j.copy(hint = j.hint.copy(
        leftHint = vet(j.hint.leftHint, j.left, "left"),
        rightHint = vet(j.hint.rightHint, j.right, "right")))
  }
}
