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

  /** Misra-Gries heavy hitters: a k-counter frequency summary with the
    * standard guarantee — every item with true count > n/(k+1) survives,
    * and each reported count undercounts by at most n/(k+1). State is a
    * bounded map (k entries), merge is the summary-merge from
    * Agarwal et al. ("Mergeable Summaries"): add counts, then subtract
    * the (k+1)-th largest and drop non-positives. Associative +
    * commutative, so Spark applies it map-side like any built-in — the
    * vocabulary/top-terms sketch for a 100 TB corpus where exact counts
    * would shuffle every distinct token.
    */
  class MisraGries(k: Int) extends Aggregator[String, Map[String, Long], Map[String, Long]] {
    require(k >= 1)
    override def zero: Map[String, Long] = Map.empty

    override def reduce(s: Map[String, Long], x: String): Map[String, Long] = {
      if (s.contains(x)) s.updated(x, s(x) + 1)
      else if (s.size < k) s.updated(x, 1L)
      else {
        // decrement all; drop zeros (the classic MG step, batched)
        s.flatMap { case (kk, v) => if (v > 1) Some(kk -> (v - 1)) else None }
      }
    }

    override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
      val combined = (a.keySet ++ b.keySet).iterator
        .map(kk => kk -> (a.getOrElse(kk, 0L) + b.getOrElse(kk, 0L))).toMap
      if (combined.size <= k) combined
      else {
        val cut = combined.values.toSeq.sorted(Ordering[Long].reverse)(k)
        combined.flatMap { case (kk, v) =>
          if (v - cut > 0) Some(kk -> (v - cut)) else None
        }
      }
    }

    override def finish(s: Map[String, Long]): Map[String, Long] = s

    override def bufferEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
    override def outputEncoder: Encoder[Map[String, Long]] = bufferEncoder
  }
}
