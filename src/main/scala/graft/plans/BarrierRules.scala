package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

import graft.functions.PushdownBarrier

/** Narrows [[PushdownBarrier]]'s fence from project-wide to
  * alias-level.
  *
  * The barrier works by reporting `deterministic = false`, and
  * Catalyst's `PushDownPredicates` refuses to push ANY predicate
  * through a projection containing any non-deterministic field — so a
  * filter on a pass-through source column (say an id) sitting above
  * `qualityGate`'s metric projection lost parquet scan pruning, the
  * measured project-wide cost the round-12 barrier shipped with. At
  * 100 TB that silently turns a pruned scan into a full one.
  *
  * This rule re-opens exactly the safe half: conjuncts that — after
  * substituting non-barrier, deterministic aliases — reference only the
  * projection's CHILD output and contain no barrier are pushed below
  * the projection (where the stock rules keep pushing them toward the
  * scan); conjuncts touching a barrier-fenced alias stay above,
  * fenced. Pushing below a barrier alias is semantics-preserving
  * because the barrier's child is required to be deterministic — the
  * non-determinism flag is a planning fence, not real randomness
  * (projections with GENUINELY non-deterministic fields are left
  * alone).
  *
  * Injected via [[graft.GraftExtensions]] into the operator
  * optimization fixpoint, so a pushed conjunct participates in all
  * further stock pushdown (through joins, into the scan's
  * `PushedFilters`).
  */
object PushThroughBarrierProjects extends Rule[LogicalPlan] with PredicateHelper {

  private def hasBarrier(e: Expression): Boolean =
    e.exists(_.isInstanceOf[PushdownBarrier])

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, Project(fields, child))
        if fields.exists(hasBarrier) &&
          fields.forall(fld => fld.deterministic || hasBarrier(fld)) =>
      val substitutions = AttributeMap(fields.collect {
        case a: Alias if !hasBarrier(a) && a.child.deterministic =>
          a.toAttribute -> a.child
      })
      def substituted(c: Expression): Expression = c.transform {
        case attr: Attribute => substitutions.getOrElse(attr, attr)
      }
      val (push, stay) = splitConjunctivePredicates(cond).partition { c =>
        val s = substituted(c)
        s.deterministic && s.references.subsetOf(child.outputSet) && !hasBarrier(s)
      }
      // Only split when every STAY conjunct is non-deterministic purely
      // because of the barrier fence (deterministic once barriers are
      // stripped). A genuinely non-deterministic conjunct — e.g. a
      // seeded rand() sampling predicate, whose state advances per
      // evaluated row — must see the SAME row stream as before: pushing
      // a sibling conjunct below the projection would reorder/reduce the
      // rows reaching it and silently change a fixed-seed sample.
      def fencedDeterministic(c: Expression): Boolean =
        c.transformUp { case b: PushdownBarrier => b.child }.deterministic
      if (push.isEmpty || !stay.forall(c => fencedDeterministic(substituted(c)))) f
      else {
        val projected =
          Project(fields, Filter(push.map(substituted).reduce(And), child))
        stay.reduceOption(And).map(Filter(_, projected)).getOrElse(projected)
      }
  }
}
