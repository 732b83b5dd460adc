package graft.core

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Restores parquet predicate pushdown for time filters over the
  * nanos-backed `ts` column.
  *
  * `events.ts` is parquet TIMESTAMP(NANOS), read as raw long
  * (`nanosAsLong`) and converted by [[Tables.load]] through
  * `timestamp_micros(ts div 1000)`. After Catalyst pushes a filter
  * through that projection, the condition compares a *computed*
  * expression with a literal — un-pushable, so every time-windowed scan
  * of `events` read all row groups (the reference's own benchmark
  * shapes, `internal/metrics/benchmark.go:350-372`, are exactly such
  * scans). This rule rewrites those comparisons onto the raw long
  * column, where the parquet reader prunes row groups from footer
  * stats.
  *
  * Soundness (`div` = truncating integer division; `t` = trunc(raw/1000),
  * literal micros `L >= 1`, so `t >= L` implies `raw > 0` where trunc =
  * floor):
  *  - `t >= L  ⟺ raw >= 1000L`
  *  - `t >  L  ⟺ t >= L+1 ⟺ raw >= 1000(L+1)`
  *  - `t <  U  ⟺ raw < 1000U`   (raw < 0 satisfies both sides)
  *  - `t <= U  ⟺ t < U+1 ⟺ raw < 1000(U+1)`
  *  - `t == E  ⟺ 1000E <= raw < 1000(E+1)`
  * NULL propagates identically on both forms. Pre-epoch literals
  * (micros < 1, where trunc ≠ floor) and literals near Long.MaxValue/1000
  * (overflow) are left untouched — correct, just un-pushed.
  */
object NanosTimePushdown extends Rule[LogicalPlan] {

  private val MaxSafeMicros = Long.MaxValue / 1000 - 2

  /** `timestamp_micros(raw div 1000)` over a long column → `raw`. */
  private object NanosToTs {
    def unapply(e: Expression): Option[Expression] = e match {
      case MicrosToTimestamp(IntegralDivide(raw, Literal(1000L, LongType), _))
          if raw.dataType == LongType => Some(raw)
      case _ => None
    }
  }

  /** Timestamp literal in the provably-rewritable micros range. */
  private object TsMicros {
    def unapply(e: Expression): Option[Long] = e match {
      case Literal(v: Long, TimestampType) if v >= 1L && v <= MaxSafeMicros => Some(v)
      case _ => None
    }
  }

  private def ns(micros: Long): Literal = Literal(micros * 1000L, LongType)

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case GreaterThanOrEqual(NanosToTs(raw), TsMicros(l)) => GreaterThanOrEqual(raw, ns(l))
    case GreaterThan(NanosToTs(raw), TsMicros(l))        => GreaterThanOrEqual(raw, ns(l + 1))
    case LessThan(NanosToTs(raw), TsMicros(u))           => LessThan(raw, ns(u))
    case LessThanOrEqual(NanosToTs(raw), TsMicros(u))    => LessThan(raw, ns(u + 1))
    case EqualTo(NanosToTs(raw), TsMicros(e)) =>
      And(GreaterThanOrEqual(raw, ns(e)), LessThan(raw, ns(e + 1)))
    // literal-on-left mirrors
    case GreaterThanOrEqual(TsMicros(u), NanosToTs(raw)) => LessThan(raw, ns(u + 1))
    case GreaterThan(TsMicros(u), NanosToTs(raw))        => LessThan(raw, ns(u))
    case LessThan(TsMicros(l), NanosToTs(raw))           => GreaterThanOrEqual(raw, ns(l + 1))
    case LessThanOrEqual(TsMicros(l), NanosToTs(raw))    => GreaterThanOrEqual(raw, ns(l))
    case EqualTo(TsMicros(e), NanosToTs(raw)) =>
      And(GreaterThanOrEqual(raw, ns(e)), LessThan(raw, ns(e + 1)))
  }
}
