package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rewrite: the declarative top-k-per-key idiom
  *
  * {{{ df.withColumn("rn", row_number().over(partitionBy(k).orderBy(o)))
  *      .filter($"rn" <= k) }}}
  *
  * plans as Exchange → full per-partition Sort → WindowExec that
  * materializes EVERY row before the filter discards all but k. This
  * rule recognizes the pattern after analysis and replaces it with
  * [[TopKPerKeyNode]] — the bounded-heap operator (one pass, O(n log k),
  * no sort) — so users writing the standard window spelling get the
  * heap plan automatically.
  *
  * Deliberately narrow match (anything else is left untouched):
  *  - the Window computes exactly ONE expression, a `row_number()`;
  *  - non-empty partition AND order specs (a global top-k has no key to
  *    cluster on — that is a plain sort+limit, Spark's TakeOrdered);
  *  - the filter's rank predicate is `rn <= lit` / `rn < lit` /
  *    `rn = 1` / `lit >= rn` / `lit > rn`, with `k ≤ maxK` bounding
  *    heap memory (O(keys · k) per task);
  *  - other conjuncts survive in a Filter ABOVE the rewritten node.
  *
  * Ties: `row_number` under a non-total order is already
  * non-deterministic; the heap keeps an equally-valid set, so the
  * rewrite preserves semantics exactly when the order is total and up
  * to the same tie arbitrariness otherwise. The minted rank attribute
  * reuses the original alias' exprId, so downstream references (and the
  * rank values 1..k) resolve unchanged.
  *
  * Interplay with Spark's own `InferWindowGroupLimit`: its PARTIAL
  * phase caps each map partition at k rows per key BEFORE the
  * exchange — a shuffle-volume win this rewrite keeps. Whether that
  * rule has fired depends on the installation path (`install()` runs
  * after Spark's "Infer window group limit" batch; the
  * `spark.sql.extensions` hook runs BEFORE it), so this rule inserts
  * the WindowGroupLimit itself when the child doesn't already carry
  * one — both paths plan identically. What the rewrite removes is the
  * final WindowExec, which would re-buffer every surviving group to
  * attach row numbers; the heap ranks the (already small, ≤ k × mappers
  * per key) post-shuffle stream in one pass instead.
  */
case class TopKRewriteRule(maxK: Int = 10000) extends Rule[LogicalPlan]
    with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case f @ Filter(cond,
        Window(Seq(alias @ Alias(WindowExpression(RowNumber(), _), _)),
          partSpec, orderSpec, child, _))
        if partSpec.nonEmpty && orderSpec.nonEmpty =>
      val rnId = alias.exprId
      val conjuncts = splitConjunctivePredicates(cond)
      val (rnConds, others) = conjuncts.partition(c =>
        c.references.size == 1 && c.references.head.exprId == rnId)
      val bound: Option[Int] = rnConds match {
        case Seq(one) => one match {
          case LessThanOrEqual(a: AttributeReference, Literal(k: Int, IntegerType))
            if a.exprId == rnId => Some(k)
          case LessThan(a: AttributeReference, Literal(k: Int, IntegerType))
            if a.exprId == rnId => Some(k - 1)
          case EqualTo(a: AttributeReference, Literal(1, IntegerType))
            if a.exprId == rnId => Some(1)
          case GreaterThanOrEqual(Literal(k: Int, IntegerType), a: AttributeReference)
            if a.exprId == rnId => Some(k)
          case GreaterThan(Literal(k: Int, IntegerType), a: AttributeReference)
            if a.exprId == rnId => Some(k - 1)
          case _ => None
        }
        case _ => None
      }
      bound match {
        case Some(k) if k >= 1 && k <= maxK =>
          val rankAttr = AttributeReference(alias.name, IntegerType,
            nullable = false)(exprId = rnId)
          // map-side pre-filter: reuse the child's WindowGroupLimit only
          // if it is THIS window's (same specs, row_number, limit ≥ k —
          // i.e. Spark's InferWindowGroupLimit ran before us); a WGL
          // present for any other reason must not stand in for the
          // pre-filter, so a fresh one wraps it instead
          val limited = child match {
            case wgl @ WindowGroupLimit(p, o, _: RowNumber, limit, _)
                if limit >= k && p.length == partSpec.length &&
                  p.zip(partSpec).forall { case (a, b) => a.semanticEquals(b) } &&
                  o.length == orderSpec.length &&
                  o.zip(orderSpec).forall { case (a, b) => a.semanticEquals(b) } =>
              wgl
            case other =>
              WindowGroupLimit(partSpec, orderSpec, RowNumber(), k, other)
          }
          val topk = TopKPerKeyNode(partSpec, orderSpec, k, rankAttr, limited)
          others.reduceOption(And).map(Filter(_, topk)).getOrElse(topk)
        case _ => f
      }
  }
}
