package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Optimizer rule (SURVEY §2.12 — second `Rule[LogicalPlan]` surface):
  * rewrite a thresholded edit-distance predicate
  * `levenshtein(a, b) <= k` into `levenshtein(a, b, k) >= 0`.
  *
  * Why it matters at 100 TB: the 2-arg levenshtein fills the full O(|a|·|b|)
  * DP matrix per pair; the 3-arg form runs the banded DP — O(min(|a|,|b|)·k)
  * work and early exit, returning -1 above the bound — so the predicate is
  * equivalent (`lev ≤ k ⇔ lev3(k) ≥ 0`, NULL-for-NULL identical) at ~|a|/k×
  * less work per candidate pair. A fuzzy-join stage evaluates this predicate
  * millions of times per task; the rewrite buys the banding for every query
  * written the natural way, not just ones hand-tuned like q_dedup_edit.
  *
  * Scope: strict/non-strict less-than against a non-negative integer
  * literal, either operand order. The rewritten form carries a `Some`
  * threshold and cannot match again → idempotent under fixed-point. */
object LevenshteinBanding extends Rule[LogicalPlan] {

  /** Integral threshold literal. Values past Int.MaxValue can't bound any
    * real string length — no rewrite. */
  private object IntK {
    def unapply(e: Expression): Option[Int] = e match {
      case Literal(null, _)              => None
      case Literal(v: Int, IntegerType)  => Some(v)
      case Literal(v: Long, LongType) if v.isValidInt => Some(v.toInt)
      case Literal(v: Short, ShortType)  => Some(v.toInt)
      case Literal(v: Byte, ByteType)    => Some(v.toInt)
      case _                             => None
    }
  }

  /** Unbanded levenshtein, possibly under the integral up-cast the analyzer
    * inserts when the predicate compares against a BIGINT column/literal
    * (e.g. `.cast("long")` projections — the natural DataFrame spelling). */
  private object Lev2 {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case Levenshtein(a, b, None) => Some((a, b))
      case c: Cast if c.dataType == LongType || c.dataType == IntegerType =>
        c.child match {
          case Levenshtein(a, b, None) => Some((a, b))
          case _                       => None
        }
      case _ => None
    }
  }

  private def banded(a: Expression, b: Expression, k: Int): Expression =
    GreaterThanOrEqual(Levenshtein(a, b, Some(Literal(k, IntegerType))),
      Literal(0, IntegerType))

  override def apply(plan: LogicalPlan): LogicalPlan = plan transformAllExpressions {
    case LessThanOrEqual(Lev2(a, b), IntK(k)) if k >= 0    => banded(a, b, k)
    case GreaterThanOrEqual(IntK(k), Lev2(a, b)) if k >= 0 => banded(a, b, k)
    case LessThan(Lev2(a, b), IntK(k)) if k >= 1           => banded(a, b, k - 1)
    case GreaterThan(IntK(k), Lev2(a, b)) if k >= 1        => banded(a, b, k - 1)
  }

  /** Idempotent per-session installation. */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(LevenshteinBanding))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ LevenshteinBanding
}
