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

  /** HyperLogLog distinct-count sketch over pre-hashed keys, built to be
    * CROSS-ENGINE EXACT rather than merely approximately right: the
    * input is a 60-bit hash both engines derive identically (15 hex
    * chars of md5, see `Queries.duckHex60`), the registers are integer
    * maxima, and the raw estimator is evaluated in integer-scaled
    * arithmetic (sum of 2^(wBits - Mj) as a BIGINT) followed by ONE
    * double multiply-divide — so a DuckDB GROUP BY over the same hashes
    * reproduces the estimate bit-for-bit and the sketch hash-matches in
    * the oracle gate, something approximate-distinct implementations
    * (Spark's HLL++, DuckDB's approx_count_distinct) can never do
    * against each other.
    *
    * Register-max merge is associative/commutative → map-side partials,
    * fixed 2^b bytes of state per group at ANY cardinality: the 100 TB
    * answer to per-group distinct counting without shuffling every
    * distinct key. Deliberately the RAW estimator (no linear-counting
    * small-range branch — that needs ln(), which diverges between libm
    * builds); accuracy is the standard ~1.04/sqrt(m) once n is a few
    * multiples of m, biased above that floor only below ~2.5m.
    */
  class HllDistinct(b: Int) extends Aggregator[Long, Array[Byte], Long] {
    require(b >= 4 && b <= 16)
    private val m = 1 << b
    private val wBits = 60 - b // hash payload bits below the register index
    private val alpha = 0.7213 / (1.0 + 1.079 / m)

    override def zero: Array[Byte] = new Array[Byte](m)

    override def reduce(regs: Array[Byte], h: Long): Array[Byte] = {
      val idx = (h >>> wBits).toInt & (m - 1)
      val w = h & ((1L << wBits) - 1)
      val rho =
        if (w == 0L) wBits + 1
        else java.lang.Long.numberOfLeadingZeros(w) - (64 - wBits) + 1
      if (rho > regs(idx)) regs(idx) = rho.toByte
      regs
    }

    override def merge(a: Array[Byte], bb: Array[Byte]): Array[Byte] = {
      var i = 0
      while (i < m) { if (bb(i) > a(i)) a(i) = bb(i); i += 1 }
      a
    }

    override def finish(regs: Array[Byte]): Long = {
      // integer-scaled denominator: sum of 2^(wBits - Mj), empty
      // registers contribute 2^wBits; Mj > wBits truncates to 0 — all
      // exactly reproducible in SQL integer arithmetic
      var intSum = 0L
      var i = 0
      while (i < m) {
        val mj = regs(i).toInt
        if (mj <= wBits) intSum += 1L << (wBits - mj)
        i += 1
      }
      val scale = (1L << wBits).toDouble
      math.floor(alpha * m * m * scale / intSum).toLong
    }

    override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** Count-Min frequency sketch, cross-engine exact like
    * [[HllDistinct]]: rows arrive with their d md5-derived bucket ids
    * already computed (codegen'd `md5`/`conv` in the plan — see
    * `Queries.sketch_cms_freq`), the buffer is the d×w counter matrix,
    * merge is elementwise sum, and the point estimates for the fixed
    * probe keys are min-over-rows — all integer arithmetic, so a DuckDB
    * GROUP BY over the same buckets reproduces every estimate exactly.
    * The standard guarantee: est >= true, est <= true + e*N with
    * probability 1-δ for w = ceil(e/ε), d = ceil(ln 1/δ).
    *
    * Probe buckets are driver-computed metadata (the probes are known
    * keys); the sketch itself never stores keys — fixed d*w longs per
    * group at any cardinality.
    */
  class CountMinFreq(d: Int, w: Int, probeBuckets: Array[Array[Int]])
      extends Aggregator[Seq[Int], Array[Long], Seq[Long]] {
    require(d >= 1 && w >= 1 && probeBuckets.forall(_.length == d))

    override def zero: Array[Long] = new Array[Long](d * w)

    override def reduce(buf: Array[Long], buckets: Seq[Int]): Array[Long] = {
      var j = 0
      while (j < d) { buf(j * w + buckets(j)) += 1; j += 1 }
      buf
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }

    override def finish(buf: Array[Long]): Seq[Long] =
      probeBuckets.toSeq.map { pb =>
        var est = Long.MaxValue
        var j = 0
        while (j < d) { est = math.min(est, buf(j * w + pb(j))); j += 1 }
        est
      }

    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** KMV (k-minimum-values / bottom-k theta) distinct sketch over
    * pre-hashed keys, cross-engine exact like [[HllDistinct]]: the
    * buffer is the k SMALLEST DISTINCT 60-bit hashes seen (a sorted
    * bounded array), merge is a sorted-merge-then-truncate, and the
    * estimator is pure integer arithmetic — below k distinct hashes the
    * count is EXACT (the sketch saw every one), at or above k it is
    * `(k-1) * (2^60 div h_k)` with h_k the k-th smallest hash (the
    * classic Bar-Yossef bottom-k estimator, with the division spelled
    * as a truncating integer op both engines reproduce verbatim).
    * Unlike [[HllDistinct]] the sketch also supports set operations
    * downstream (the kept hashes are a uniform sample of the key
    * space), which is why warehouse theta sketches use this shape.
    *
    * Associative + commutative → map-side partials; fixed k longs of
    * state per group at ANY cardinality — the same 100 TB contract as
    * the other sketches. Returns (n_kept, h_k-or-max, est).
    */
  class KmvDistinct(k: Int) extends Aggregator[Long, Array[Long], (Long, Long, Long)] {
    require(k >= 2, "k must be >= 2")
    private val full = 1L << 60

    override def zero: Array[Long] = Array.empty[Long]

    override def reduce(buf: Array[Long], h: Long): Array[Long] = {
      val pos = java.util.Arrays.binarySearch(buf, h)
      if (pos >= 0) buf // already kept
      else {
        val ins = -pos - 1
        if (buf.length < k) {
          val out = new Array[Long](buf.length + 1)
          System.arraycopy(buf, 0, out, 0, ins)
          out(ins) = h
          System.arraycopy(buf, ins, out, ins + 1, buf.length - ins)
          out
        } else if (ins < k) {
          // beats the current k-th minimum: shift the tail right, drop it
          val out = new Array[Long](k)
          System.arraycopy(buf, 0, out, 0, ins)
          out(ins) = h
          System.arraycopy(buf, ins, out, ins + 1, k - ins - 1)
          out
        } else buf
      }
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      if (a.isEmpty) b
      else if (b.isEmpty) a
      else {
        val out = new Array[Long](math.min(k, a.length + b.length))
        var i = 0; var j = 0; var n = 0
        while (n < out.length && (i < a.length || j < b.length)) {
          val next =
            if (j >= b.length || (i < a.length && a(i) <= b(j))) { val v = a(i); i += 1; v }
            else { val v = b(j); j += 1; v }
          if (n == 0 || out(n - 1) != next) { out(n) = next; n += 1 }
        }
        if (n == out.length) out else java.util.Arrays.copyOf(out, n)
      }
    }

    override def finish(buf: Array[Long]): (Long, Long, Long) = {
      val nKept = buf.length.toLong
      if (buf.isEmpty) (0L, 0L, 0L)
      else {
        val hk = buf.last
        val est = if (nKept < k) nKept else (k - 1).toLong * (full / hk)
        (nKept, hk, est)
      }
    }

    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    override def outputEncoder: Encoder[(Long, Long, Long)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong)
  }

  /** d×d Gram (uncentered second-moment) matrix of quantized embedding
    * vectors: buffer[i*d+j] accumulates Σ_rows xq_i·xq_j. Reduce adds
    * one outer product, merge is elementwise sum — associative,
    * commutative, FIXED d² longs of state, so Spark computes the whole
    * corpus Gram in ONE map-side-combinable pass (the 100 TB
    * alternative is exploding every row into d² pair terms and
    * shuffling 4096× the data). Pure integer arithmetic: the result is
    * order-independent and engine-exact; the caller owns the overflow
    * bound (|xq| ≤ 10⁶ micro-units keeps ~9·10⁶ rows per matrix cell
    * safe; at larger corpora pre-scale the quantization).
    */
  class GramMatrix(d: Int) extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {
    require(d >= 1 && d <= 512, "d must be in [1, 512]")

    override def zero: Array[Long] = new Array[Long](d * d)

    override def reduce(buf: Array[Long], x: Seq[Long]): Array[Long] = {
      require(x.length == d, s"expected $d components, got ${x.length}")
      val xa = x.toArray
      var i = 0
      while (i < d) {
        val xi = xa(i)
        var j = 0
        while (j < d) { buf(i * d + j) += xi * xa(j); j += 1 }
        i += 1
      }
      buf
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }

    override def finish(buf: Array[Long]): Seq[Long] =
      scala.collection.immutable.ArraySeq.unsafeWrapArray(buf)

    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** Sum of the k largest values per group, in O(k) state — the
    * neighborhood-mass aggregate for margin mining and any "top-k
    * similarity budget" statistic. State is an UNSORTED bounded buffer
    * holding the current k largest (plus its running minimum's position
    * found on demand); reduce replaces the minimum when beaten, merge
    * concatenates and re-prunes. Associative and commutative, so Spark
    * runs it map-side like any built-in — contrast a row_number window,
    * which must SORT every group's full candidate list on one partition.
    * Value ties at the k boundary are indistinguishable by construction
    * (equal values sum equally), so the result matches any
    * deterministic-tie window formulation.
    */
  class TopKSum(k: Int) extends Aggregator[Long, Array[Long], Long] {
    require(k >= 1)

    override def zero: Array[Long] = Array.empty[Long]

    override def reduce(buf: Array[Long], x: Long): Array[Long] =
      if (buf.length < k) buf :+ x
      else {
        var mi = 0
        var i = 1
        while (i < buf.length) { if (buf(i) < buf(mi)) mi = i; i += 1 }
        if (x > buf(mi)) buf(mi) = x
        buf
      }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
      if (a.isEmpty) b
      else if (b.isEmpty) a
      else {
        val all = a ++ b
        if (all.length <= k) all
        else { java.util.Arrays.sort(all); all.takeRight(k) }
      }

    override def finish(buf: Array[Long]): Long = buf.sum

    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** EXACT distinct count over a bounded non-negative id domain as a
    * dense bitmap — the ClickHouse `groupBitmap` / Druid bitmap-rollup
    * shape. State is `ceil((maxId+1)/64)` words per group regardless of
    * row count; reduce sets a bit, merge ORs words, so Spark combines
    * it map-side like any built-in and the exchange carries fixed-size
    * state, not ids. For unbounded or sparse domains use [[HllDistinct]]
    * (approximate) or a compressed bitmap — dense is the right call
    * when the id space is a dictionary-encoded surrogate range, the
    * standard warehouse layout. Out-of-range ids fail loudly: silently
    * dropping them would fake exactness.
    */
  class BitmapDistinct(maxId: Int) extends Aggregator[Long, Array[Long], Long] {
    require(maxId >= 0)
    private val nWords = (maxId >>> 6) + 1

    override def zero: Array[Long] = new Array[Long](nWords)

    override def reduce(bm: Array[Long], id: Long): Array[Long] = {
      require(id >= 0 && id <= maxId, s"id $id outside [0, $maxId]")
      bm((id >>> 6).toInt) |= 1L << (id & 63)
      bm
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < nWords) { a(i) |= b(i); i += 1 }
      a
    }

    override def finish(bm: Array[Long]): Long = {
      var n = 0L; var i = 0
      while (i < nWords) { n += java.lang.Long.bitCount(bm(i)); i += 1 }
      n
    }

    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** Audience overlap via TWO conditional bitmaps in one aggregate:
    * input rows carry an id plus membership flags for cohorts A and B;
    * the finish popcounts A, B, their intersection (word-wise AND) and
    * union (word-wise OR) — all EXACT. This is the set-algebra rollup
    * behind "users who did both / either" overlap matrices: one pass
    * over the log, fixed state per group, no self-join of the event
    * stream against itself.
    */
  class AudienceOverlap(maxId: Int)
      extends Aggregator[(Long, Boolean, Boolean), (Array[Long], Array[Long]),
                         (Long, Long, Long, Long)] {
    require(maxId >= 0)
    private val nWords = (maxId >>> 6) + 1

    override def zero: (Array[Long], Array[Long]) =
      (new Array[Long](nWords), new Array[Long](nWords))

    override def reduce(s: (Array[Long], Array[Long]),
                        x: (Long, Boolean, Boolean)): (Array[Long], Array[Long]) = {
      val (id, inA, inB) = x
      require(id >= 0 && id <= maxId, s"id $id outside [0, $maxId]")
      val w = (id >>> 6).toInt; val bit = 1L << (id & 63)
      if (inA) s._1(w) |= bit
      if (inB) s._2(w) |= bit
      s
    }

    override def merge(a: (Array[Long], Array[Long]),
                       b: (Array[Long], Array[Long])): (Array[Long], Array[Long]) = {
      var i = 0
      while (i < nWords) { a._1(i) |= b._1(i); a._2(i) |= b._2(i); i += 1 }
      a
    }

    override def finish(s: (Array[Long], Array[Long])): (Long, Long, Long, Long) = {
      var nA = 0L; var nB = 0L; var nBoth = 0L; var nEither = 0L
      var i = 0
      while (i < nWords) {
        nA += java.lang.Long.bitCount(s._1(i))
        nB += java.lang.Long.bitCount(s._2(i))
        nBoth += java.lang.Long.bitCount(s._1(i) & s._2(i))
        nEither += java.lang.Long.bitCount(s._1(i) | s._2(i))
        i += 1
      }
      (nA, nB, nBoth, nEither)
    }

    override def bufferEncoder: Encoder[(Array[Long], Array[Long])] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    override def outputEncoder: Encoder[(Long, Long, Long, Long)] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }
}
