package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator[IN, BUF, OUT]` surface (SURVEY.md §7.4 ladder — the
  * user-facing typed-aggregate API, complementing the Catalyst-level
  * `TypedImperativeAggregate` in graft.plans.MinHashUnion).
  *
  * Welford/Chan parallel mean+variance: numerically stable, and the merge
  * is exact for any partition split, so results are identical under any
  * parallelism — the property every distributed aggregate here must hold.
  */
object TypedAggs {

  final case class MomentsBuf(n: Long, mean: Double, m2: Double)
  final case class Moments(n: Long, mean: Double, variance: Double)

  /** Population mean/variance of a Double-typed column. */
  val moments: Aggregator[Double, MomentsBuf, Moments] =
    new Aggregator[Double, MomentsBuf, Moments] {
      override def zero: MomentsBuf = MomentsBuf(0L, 0.0, 0.0)

      override def reduce(b: MomentsBuf, x: Double): MomentsBuf = {
        val n = b.n + 1
        val d = x - b.mean
        val mean = b.mean + d / n
        MomentsBuf(n, mean, b.m2 + d * (x - mean))
      }

      override def merge(a: MomentsBuf, b: MomentsBuf): MomentsBuf = {
        if (a.n == 0) b
        else if (b.n == 0) a
        else {
          val n = a.n + b.n
          val d = b.mean - a.mean
          MomentsBuf(
            n,
            a.mean + d * b.n / n,
            a.m2 + b.m2 + d * d * a.n * b.n / n)
        }
      }

      override def finish(r: MomentsBuf): Moments =
        Moments(r.n, r.mean, if (r.n == 0) 0.0 else r.m2 / r.n)

      override def bufferEncoder: Encoder[MomentsBuf] = Encoders.product
      override def outputEncoder: Encoder[Moments] = Encoders.product
    }
}
