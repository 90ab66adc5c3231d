package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Unwraps the ns→µs truncation in timestamp comparisons so time
  * predicates on the nanos-backed events table reach the parquet scan.
  *
  * The events source stores TIMESTAMP(NANOS), read as a raw long and
  * converted with `timestamp_micros(ts div 1000)` (Tables.events). A
  * filter on the converted column — `timestamp_micros(t div 1000) >= L`
  * — is opaque to data-source pushdown: the scan reads EVERY row and
  * the predicate runs post-scan. On a 100 TB events table the time
  * window is the dominant pruner (row-group stats + partition pruning),
  * so this rule rewrites such comparisons into equivalent predicates on
  * the raw nanos column, where they push into the scan:
  *
  *   trunc(t/1000) >= L  ⇔  t >= 1000L          (L > 0)
  *   trunc(t/1000) >  L  ⇔  t >  1000L + 999
  *   trunc(t/1000) <  L  ⇔  t <  1000L
  *   trunc(t/1000) <= L  ⇔  t <  1000(L+1)
  *   trunc(t/1000) =  L  ⇔  1000L <= t < 1000(L+1)
  *
  * Same unwrap discipline as Spark's own UnwrapCastInBinaryComparison
  * (which cannot know this conversion is monotone). Only positive-epoch
  * literals are rewritten: `div` truncates toward zero, which equals
  * floor only on non-negative operands, and the boundary values above
  * assume that; the guard also keeps 1000·(L+1) far from Long overflow.
  * Null semantics are preserved — the conversion is null-intolerant, so
  * the rewritten comparison nulls out for exactly the same rows.
  */
object MicrosTruncationPushdown extends Rule[LogicalPlan] {

  /** timestamp_micros(a div 1000) where a is a raw long. */
  private object TruncMicros {
    def unapply(e: Expression): Option[Expression] = e match {
      case m: MicrosToTimestamp => m.child match {
        case d: IntegralDivide if d.left.dataType == LongType &&
            d.right.foldable && {
              val v = d.right.eval()
              v == 1000L || v == 1000
            } => Some(d.left)
        case _ => None
      }
      case _ => None
    }
  }

  /** Microsecond epoch literal with room for ×1000 and +1000. */
  private object MicrosLit {
    private val MaxSafe = Long.MaxValue / 1000 - 1
    def unapply(e: Expression): Option[Long] = e match {
      case Literal(us: Long, TimestampType) if us > 0 && us < MaxSafe => Some(us)
      case _ => None
    }
  }

  private def ns(v: Long): Expression = Literal(v, LongType)

  private val rewrite: PartialFunction[Expression, Expression] = {
    case GreaterThanOrEqual(TruncMicros(a), MicrosLit(l)) => GreaterThanOrEqual(a, ns(l * 1000))
    case GreaterThan(TruncMicros(a), MicrosLit(l))        => GreaterThan(a, ns(l * 1000 + 999))
    case LessThan(TruncMicros(a), MicrosLit(l))           => LessThan(a, ns(l * 1000))
    case LessThanOrEqual(TruncMicros(a), MicrosLit(l))    => LessThan(a, ns((l + 1) * 1000))
    case EqualTo(TruncMicros(a), MicrosLit(l)) =>
      And(GreaterThanOrEqual(a, ns(l * 1000)), LessThan(a, ns((l + 1) * 1000)))
    // literal-first forms
    case GreaterThanOrEqual(MicrosLit(l), TruncMicros(a)) => LessThan(a, ns((l + 1) * 1000))
    case GreaterThan(MicrosLit(l), TruncMicros(a))        => LessThan(a, ns(l * 1000))
    case LessThan(MicrosLit(l), TruncMicros(a))           => GreaterThan(a, ns(l * 1000 + 999))
    case LessThanOrEqual(MicrosLit(l), TruncMicros(a))    => GreaterThanOrEqual(a, ns(l * 1000))
    case EqualTo(MicrosLit(l), TruncMicros(a)) =>
      And(GreaterThanOrEqual(a, ns(l * 1000)), LessThan(a, ns((l + 1) * 1000)))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case f: Filter =>
      val rewritten = f.condition.transform(rewrite)
      if (rewritten fastEquals f.condition) f else f.copy(condition = rewritten)
  }
}
