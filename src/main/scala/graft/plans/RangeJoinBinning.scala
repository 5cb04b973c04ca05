package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Optimizer rule: rewrite interval-overlap joins into binned equi-joins.
  *
  * An inner join whose condition is only range predicates
  * (`a.start <= b.end AND b.start <= a.end`, the F6 temporal-overlap
  * pattern; reference: src/analysis/temporal.rs window intersection) has no
  * equi-join key, so Spark plans BroadcastNestedLoopJoin / CartesianProduct
  * — O(|A|x|B|) predicate evaluations and a single-node bottleneck once
  * neither side fits in a broadcast. At 100 TB that plan never finishes.
  *
  * With a user-declared bin width K (`spark.graft.rangeJoin.binSize`, in the
  * unit of the join columns; 0 = rule off), each row explodes into the bins
  * its interval touches and the join becomes a shuffled equi-join on the bin
  * id — the standard binning/bucketing technique behind range-join
  * optimizations in Flink and Databricks' range-join hint, here as a plain
  * `Rule[LogicalPlan]` injected through SparkSessionExtensions so an
  * unmodified overlap join written against the DataFrame API picks it up.
  *
  * Correctness (any opposite pair of long `<=` conjuncts, intervals in any
  * order, including degenerate end < start):
  *   - A explodes bins `[aS/K, max(aS,aE)/K]`, B explodes `[bS/K,
  *     max(bS,bE)/K]` (integer division; monotonic for negatives too).
  *   - A matching pair is emitted exactly once, anchored at the bin
  *     `b* = max(aS,bS)/K`: `aS <= b*K` trivially, `b* <= max(aS,aE)/K`
  *     because `bS <= aE`, and symmetrically for B — so both sides
  *     explode `b*`, and the `bin = max(aS,bS)/K` anchor predicate keeps
  *     exactly that one copy.
  *   - The original conjuncts are all retained, so false bin collisions
  *     are filtered; NULL bounds yield a NULL sequence which Generate
  *     (outer=false) drops, matching the naive join's NULL semantics.
  *
  * The rule fires only when the join has NO equality conjunct across sides
  * (if it does, Spark already has a shuffle key and the range predicates
  * are cheap post-filters) — which also makes it a no-op on its own output
  * inside the fixed-point optimizer batch. Efficiency, not correctness,
  * depends on K: intervals much longer than K explode into many bins
  * (Sequence aborts past its array cap rather than exploding silently).
  */
object RangeJoinBinning extends Rule[LogicalPlan] with PredicateHelper {

  val BinSizeKey = "spark.graft.rangeJoin.binSize"

  private def binSize: Long =
    try conf.getConfString(BinSizeKey, "0").toLong
    catch { case _: NumberFormatException => 0L }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val k = binSize
    if (k <= 0) plan
    else plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), _) =>
        rewrite(j, left, right, splitConjunctivePredicates(cond), k).getOrElse(j)
    }
  }

  /** conjuncts normalized to (lo, hi) meaning lo <= hi, long-typed and
    * deterministic; `>=` flips. Strict `<` stays a plain post-filter —
    * overlap predicates are closed-interval in every caller we mirror. */
  private def normalizedLe(conjuncts: Seq[Expression]): Seq[(Expression, Expression)] =
    conjuncts.collect {
      case LessThanOrEqual(a, b) => (a, b)
      case GreaterThanOrEqual(a, b) => (b, a)
    }.filter { case (a, b) =>
      a.dataType == LongType && b.dataType == LongType &&
        a.deterministic && b.deterministic
    }

  private def sideOf(e: Expression, left: LogicalPlan, right: LogicalPlan): Option[Boolean] = {
    val refs = e.references
    if (refs.isEmpty) None
    else if (refs.subsetOf(left.outputSet)) Some(true)
    else if (refs.subsetOf(right.outputSet)) Some(false)
    else None
  }

  private def rewrite(j: Join, left: LogicalPlan, right: LogicalPlan,
                      conjuncts: Seq[Expression], k: Long): Option[LogicalPlan] = {
    // an existing cross-side equality means Spark already has a shuffle
    // key; it is also the re-entry guard for the fixed-point batch
    val hasEquiKey = conjuncts.exists {
      case EqualTo(a, b) =>
        sideOf(a, left, right).isDefined && sideOf(b, left, right).isDefined &&
          sideOf(a, left, right) != sideOf(b, left, right)
      case EqualNullSafe(a, b) =>
        sideOf(a, left, right).isDefined && sideOf(b, left, right).isDefined &&
          sideOf(a, left, right) != sideOf(b, left, right)
      case _ => false
    }
    if (hasEquiKey) return None

    val les = normalizedLe(conjuncts)
    // (aS <= bE): left-only <= right-only; (bS <= aE): right-only <= left-only
    val lr = les.find { case (a, b) =>
      sideOf(a, left, right).contains(true) && sideOf(b, left, right).contains(false)
    }
    val rl = les.find { case (a, b) =>
      sideOf(a, left, right).contains(false) && sideOf(b, left, right).contains(true)
    }
    (lr, rl) match {
      case (Some((aS, bE)), Some((bS, aE))) =>
        val kLit = Literal(k)
        def div(e: Expression) = IntegralDivide(e, kLit)
        // post-analysis construction: ResolveTimeZone has already run, so a
        // TimeZoneAwareExpression like Sequence must be born with its zone
        def bins(s: Expression, e: Expression) =
          Sequence(div(s), div(Greatest(Seq(s, e))), Some(Literal(1L)),
            Some(conf.sessionLocalTimeZone))
        val binL = AttributeReference("__graft_bin_l", LongType, nullable = false)()
        val binR = AttributeReference("__graft_bin_r", LongType, nullable = false)()
        val genL = Generate(Explode(bins(aS, aE)), unrequiredChildIndex = Nil,
          outer = false, qualifier = None, generatorOutput = Seq(binL), child = left)
        val genR = Generate(Explode(bins(bS, bE)), unrequiredChildIndex = Nil,
          outer = false, qualifier = None, generatorOutput = Seq(binR), child = right)
        val anchor = EqualTo(binL, div(Greatest(Seq(aS, bS))))
        val newCond = (Seq(EqualTo(binL, binR), anchor) ++ conjuncts).reduce(And)
        val binned = Join(genL, genR, Inner, Some(newCond), j.hint)
        Some(Project(j.output, binned))
      case _ => None
    }
  }
}

/** `spark.sql.extensions=graft.plans.GraftExtensions` (spark-submit) or
  * `SparkSession.builder.withExtensions` (see graft.Sessions). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectOptimizerRule(_ => RangeJoinBinning)
}
