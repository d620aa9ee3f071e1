package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/**
 * Catalyst optimizer rule: rewrite the low-cardinality top-k-per-group
 * trap automatically.
 *
 *   Filter(rn <= k, Window(row_number() OVER (PARTITION BY P ORDER BY O)))
 *
 * caps parallelism at |distinct P| — with 5 groups a 1000-core cluster runs
 * 5 tasks and funnels every row of a group through one of them. The rewrite
 * inserts a salted pre-stage (the plan [[graft.ops.TopK.topKPerGroup]]
 * builds by hand):
 *
 *   stage 1: row_number() OVER (PARTITION BY P, pmod(hash(O), S) ORDER BY O)
 *            kept to k per (group, slice) — slices the heavy lifting S-ways
 *            (correct: the global top-k of a union is inside the union of
 *            per-slice top-ks);
 *   stage 2: the ORIGINAL window + filter over the ≤ |P|·S·k survivors.
 *
 * Results are row-identical when O is a total order within groups; among
 * exact (P, O)-ties the choice is arbitrary in BOTH plans (same class of
 * nondeterminism the naive window already has).
 *
 * Gated OFF by default (`spark.graft.topkRewrite.enabled`): whether the
 * extra window pays depends on group cardinality, which is a runtime
 * property the optimizer can't see — the flag is the user's cardinality
 * hint. Register per session via [[GraftExtensions]]
 * (`spark.sql.extensions=graft.plans.GraftExtensions`) or
 * `spark.experimental.extraOptimizations`.
 *
 * SALT-TIE LIMITATION: the slice key is `hash(O) % S` — the only
 * deterministic expression the rewrite can derive without knowing a unique
 * column (the hand-built [[graft.ops.TopK.topKPerGroup]] takes an explicit
 * `saltExpr` for exactly this reason). If a group's ORDER BY values are
 * heavily tied (e.g. constant), all its rows hash to ONE slice and the
 * plan DEGRADES to the naive single-window shape — still row-correct
 * (pinned by TopKRewriteSpec's all-ties test), just not faster. Callers
 * with tied orderings should add a high-cardinality tiebreaker to the
 * ORDER BY (good practice anyway for deterministic results) or use
 * TopK.topKPerGroup directly.
 */
object TopKPerGroupRewrite extends Rule[LogicalPlan] {

  private val Stage1Name = "__graft_rn1"

  private def enabled: Boolean =
    conf.getConfString("spark.graft.topkRewrite.enabled", "false") == "true"
  private def saltN: Int =
    conf.getConfString("spark.graft.topkRewrite.salt", "16").toInt

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan.transformUp {
      case f @ Filter(_, w: Window) =>
        rewrite(f, Nil, w).getOrElse(f)
      case f @ Filter(_, p @ Project(_, w: Window)) =>
        rewrite(f, Seq(p), w).getOrElse(f)
    }

  private def alreadyRewritten(w: Window): Boolean =
    w.child.exists {
      case inner: Window => inner.windowExpressions.exists(_.name == Stage1Name)
      case _ => false
    }

  private def rewrite(f: Filter, mid: Seq[Project], w: Window): Option[LogicalPlan] =
    w.windowExpressions match {
      case Seq(a @ Alias(WindowExpression(RowNumber(),
          spec @ WindowSpecDefinition(parts, order, _)), _))
          if parts.nonEmpty && order.nonEmpty &&
            a.name != Stage1Name && // never rewrite our own stage 1
            !alreadyRewritten(w) =>
        val k = f.condition match {
          case LessThanOrEqual(attr: AttributeReference, Literal(v: Int, IntegerType))
              if attr.exprId == a.exprId => Some(v)
          case LessThan(attr: AttributeReference, Literal(v: Int, IntegerType))
              if attr.exprId == a.exprId => Some(v - 1)
          case _ => None
        }
        k.filter(_ > 0).map { kk =>
          // deterministic slice key from the ORDER BY expressions: rows of a
          // group spread across S slices, identical rows land together
          val salt = Pmod(new Murmur3Hash(order.map(_.child)), Literal(saltN))
          val spec1 = spec.copy(partitionSpec = parts :+ salt)
          val rn1 = Alias(WindowExpression(RowNumber(), spec1), Stage1Name)()
          val stage1 = Window(Seq(rn1), parts :+ salt, order, w.child)
          val pruned = Project(w.child.output,
            Filter(LessThanOrEqual(rn1.toAttribute, Literal(kk)), stage1))
          val finalWindow = w.copy(child = pruned)
          val rebuilt = mid.headOption match {
            case Some(p) => p.copy(child = finalWindow)
            case None => finalWindow
          }
          f.copy(child = rebuilt)
        }
      case _ => None
    }
}

/** `spark.sql.extensions`-style injection point for the engine's Catalyst
  * rules. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectOptimizerRule(_ => TopKPerGroupRewrite)
}
