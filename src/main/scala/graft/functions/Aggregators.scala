package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed Aggregator surface (SURVEY.md §2.6 UDAF row): numerically-stable
  * streaming statistics as a user-defined aggregate. Welford/Chan
  * merge-form — associative and commutative, so map-side partial
  * aggregation applies exactly as with built-ins.
  */
object Aggregators {

  case class MomentState(n: Long, mean: Double, m2: Double)

  /** Single-pass mean/variance (sample) with the parallel-merge form. */
  object WelfordStats extends Aggregator[Double, MomentState, (Double, Double)] {
    override def zero: MomentState = MomentState(0L, 0.0, 0.0)

    override def reduce(s: MomentState, x: Double): MomentState = {
      val n = s.n + 1
      val d = x - s.mean
      val mean = s.mean + d / n
      MomentState(n, mean, s.m2 + d * (x - mean))
    }

    override def merge(a: MomentState, b: MomentState): MomentState = {
      if (a.n == 0) b
      else if (b.n == 0) a
      else {
        val n = a.n + b.n
        val d = b.mean - a.mean
        MomentState(n,
          a.mean + d * b.n / n,
          a.m2 + b.m2 + d * d * a.n * b.n / n)
      }
    }

    /** (mean, sample variance); variance NaN below 2 observations. */
    override def finish(s: MomentState): (Double, Double) =
      (if (s.n == 0) Double.NaN else s.mean,
       if (s.n < 2) Double.NaN else s.m2 / (s.n - 1))

    override def bufferEncoder: Encoder[MomentState] = Encoders.product[MomentState]
    override def outputEncoder: Encoder[(Double, Double)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
  }
}
