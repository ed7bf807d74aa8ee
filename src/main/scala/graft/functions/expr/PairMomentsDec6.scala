package graft.functions.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Accumulator of [[PairMomentsDec6]]: one exact DECIMAL(·,6) sum per
  * moment, held as a primitive unscaled-Long fast path with a lazily
  * allocated BigDecimal spill for the (overflow-rare) remainder —
  * `total(t) = spill(t) + BigDecimal(acc(t), scale 6)`, exact at any
  * magnitude and any row count. `seen` preserves SQL `sum` null
  * semantics (a moment no finite in-precision term ever reached is
  * null, not 0). */
final class PairMomentsBuf(val m: Int) {
  var n: Long = 0L
  val acc: Array[Long] = new Array[Long](m)
  val seen: Array[Boolean] = new Array[Boolean](m)
  var spill: Array[java.math.BigDecimal] = _

  /** Exact-add into the spill slot, allocating the spill array on first
    * use. (The allocation must happen BEFORE the slot store — a naive
    * `spill(t) = spillAt(t).add(v)` evaluates the null array reference
    * first and NPEs.) */
  def addToSpill(t: Int, v: java.math.BigDecimal): Unit = {
    if (spill == null) spill = new Array[java.math.BigDecimal](m)
    val cur = spill(t)
    spill(t) = if (cur == null) v else cur.add(v)
  }

  /** Add one quantized term's unscaled-long value with overflow spill. */
  def addUnscaled(t: Int, u: Long): Unit = {
    seen(t) = true
    val a = acc(t)
    val r = a + u
    if (((a ^ r) & (u ^ r)) < 0L) { // two's-complement overflow
      addToSpill(t, java.math.BigDecimal.valueOf(a, 6))
      acc(t) = u
    } else acc(t) = r
  }

  def total(t: Int): java.math.BigDecimal = {
    val base = java.math.BigDecimal.valueOf(acc(t), 6)
    if (spill == null || spill(t) == null) base else spill(t).add(base)
  }
}

/** ALL first and second moments of a k-column row in ONE native
  * aggregate — the [[DotProductDec18]] technique applied to
  * [[graft.operators.Stats.correlationMatrix]]'s pairwise moment sums:
  * per input row (given as `array(col_0 … col_{k−1})` of doubles), the
  * k values, k squares, and k·(k−1)/2 cross products are each quantized
  * exactly the way Spark's `CAST(x AS DECIMAL(28,6))` does
  * (Double.toString-based BigDecimal, HALF_UP at scale 6; NaN/±Inf and
  * precision-28 overflow → term skipped, as the cast's null is skipped
  * by `sum`) and accumulated EXACTLY — so the result is bit-identical
  * to the SQL formulation `CAST(sum(CAST(a*b AS DECIMAL(28,6))) AS
  * DOUBLE)` per moment, for any aggregation order, whenever that SQL
  * sum itself stays inside DECIMAL(38,6) (beyond it the SQL sum
  * overflows to null while this stays exact — strictly wider).
  *
  * Why not the 2k + k(k−1)/2 separate `sum(CAST(...))` aggregate this
  * replaces: a DECIMAL(38,6) agg buffer is immutable in UnsafeRow, so
  * Spark plans those sums as interpreted, non-codegen aggregation —
  * every row pays |moments| interpreted expression walks plus wrapper
  * Decimal adds (x79's chronic 8× scaling row). Here the per-row work
  * is ONE virtual call into a primitive loop; the quantized unscaled
  * values accumulate in primitive longs (BigDecimal only on overflow
  * spill — never for in-range data). Partial aggregation still applies
  * (one buffer per partition, merged exactly), so the shuffle carries
  * one row per partition either way.
  *
  * Output: `array(n, s_0…s_{k−1}, q_0…q_{k−1}, p_{ij} row-major i<j)`
  * as doubles (each moment `BigDecimal.doubleValue` of the exact total,
  * = Spark's decimal→double cast; null where no term survived — SQL sum
  * semantics). Rows with a NULL element are skipped entirely
  * (complete-case — the caller already filters, this keeps the
  * aggregate honest standalone). */
case class PairMomentsDec6(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[PairMomentsBuf]
  with UnaryLike[Expression] {

  private val m = 2 * k + k * (k - 1) / 2

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) if k >= 2 => TypeCheckResult.TypeCheckSuccess
    case ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckFailure("pair_moments_dec6 needs k >= 2")
    case other => TypeCheckResult.TypeCheckFailure(
      s"pair_moments_dec6 requires array<double>, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def nullable: Boolean = false
  override def prettyName: String = "pair_moments_dec6"

  override def createAggregationBuffer(): PairMomentsBuf =
    new PairMomentsBuf(m)

  override def update(buf: PairMomentsBuf, input: InternalRow): PairMomentsBuf = {
    val arr = child.eval(input).asInstanceOf[ArrayData]
    if (arr == null || arr.numElements() < k) return buf
    var i = 0
    while (i < k) { // complete-case: any null element skips the row
      if (arr.isNullAt(i)) return buf
      i += 1
    }
    val x = new Array[Double](k)
    i = 0
    while (i < k) { x(i) = arr.getDouble(i); i += 1 }
    buf.n += 1L
    i = 0
    while (i < k) {
      PairMomentsDec6.addTerm(buf, i, x(i))
      PairMomentsDec6.addTerm(buf, k + i, x(i) * x(i))
      i += 1
    }
    var t = 2 * k
    i = 0
    while (i < k) {
      var j = i + 1
      while (j < k) {
        PairMomentsDec6.addTerm(buf, t, x(i) * x(j))
        t += 1
        j += 1
      }
      i += 1
    }
    buf
  }

  override def merge(b1: PairMomentsBuf, b2: PairMomentsBuf): PairMomentsBuf = {
    b1.n += b2.n
    var t = 0
    while (t < m) {
      if (b2.seen(t)) {
        b1.addUnscaled(t, b2.acc(t))
        if (b2.spill != null && b2.spill(t) != null)
          b1.addToSpill(t, b2.spill(t))
      }
      t += 1
    }
    b1
  }

  override def eval(buf: PairMomentsBuf): Any = {
    val out = new Array[Any](1 + m)
    out(0) = buf.n.toDouble
    var t = 0
    while (t < m) {
      out(1 + t) = if (buf.seen(t)) buf.total(t).doubleValue else null
      t += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: PairMomentsBuf): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.m)
    out.writeLong(buf.n)
    var t = 0
    while (t < buf.m) {
      out.writeBoolean(buf.seen(t))
      out.writeLong(buf.acc(t))
      val sp = if (buf.spill == null) null else buf.spill(t)
      if (sp == null) out.writeInt(-1)
      else {
        val bytes = sp.unscaledValue.toByteArray // scale is fixed at 6
        out.writeInt(bytes.length)
        out.write(bytes)
      }
      t += 1
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): PairMomentsBuf = {
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val buf = new PairMomentsBuf(in.readInt())
    buf.n = in.readLong()
    var t = 0
    while (t < buf.m) {
      buf.seen(t) = in.readBoolean()
      buf.acc(t) = in.readLong()
      val len = in.readInt()
      if (len >= 0) {
        val b = new Array[Byte](len)
        in.readFully(b)
        buf.addToSpill(t,
          new java.math.BigDecimal(new java.math.BigInteger(b), 6))
      }
      t += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): PairMomentsDec6 =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): PairMomentsDec6 =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): PairMomentsDec6 =
    copy(child = newChild)
}

object PairMomentsDec6 {
  /** Sentinel for "the fast path cannot decide — take the slow path".
    * Safe: a genuine fast-path result is bounded by ~4.5e15 in
    * magnitude, nowhere near Long.MinValue. */
  private final val Ambiguous = Long.MinValue

  /** The scale-6 HALF_UP unscaled value by pure double arithmetic, IFF
    * provably identical to the BigDecimal ground truth — else
    * [[Ambiguous]].
    *
    * Why this is exact when taken: the ground truth quantizes d, the
    * SHORTEST decimal representation of x (Double.toString), so the
    * true value being rounded is d·10⁶ with |d − x| ≤ ulp(x)/2. The
    * computed y = x·10⁶ adds ≤ ulp(y)/2 more, and 10⁶·ulp(x) ≤
    * 4·ulp(y) across power-of-two boundaries — so |y − d·10⁶| ≤
    * 3·ulp(y). HALF_UP changes value ONLY across .5 boundaries; if y's
    * fractional part sits > 8·ulp(y) from 0.5, no boundary lies between
    * y and d·10⁶ and both round identically. The magnitude guard keeps
    * `+0.5`/`floor` exact (|y| < 2^52) and the result in a long. Beyond
    * the guard or inside the margin, d's own digits decide — only
    * Double.toString knows them, so those terms pay the slow path. */
  private def fastUnscaled6(x: Double): Long = {
    val y = x * 1e6
    val ay = math.abs(y)
    if (!(ay < 4.5e15)) return Ambiguous // also rejects NaN
    val fl = math.floor(ay)
    val frac = ay - fl
    if (math.abs(frac - 0.5) <= 8.0 * Math.ulp(ay)) return Ambiguous
    val mag = if (frac > 0.5) fl + 1.0 else fl
    if (y < 0.0) -mag.toLong else mag.toLong
  }

  /** Quantize-and-accumulate one term, replicating the full Spark
    * double→DECIMAL(28,6) cast: NaN/±Inf and precision-28 overflow cast
    * to null and the SQL sum skips them — so do we. The fast double
    * path ([[fastUnscaled6]]) serves the overwhelming majority of
    * terms; ambiguous or large-magnitude terms replay the cast's exact
    * BigDecimal sequence (in-precision results ≤ 18 digits take the
    * primitive-long accumulator; the 18-to-28-digit band goes straight
    * to the exact spill). */
  private[expr] def addTerm(buf: PairMomentsBuf, t: Int, x: Double): Unit = {
    val fast = fastUnscaled6(x)
    if (fast != Ambiguous) { buf.addUnscaled(t, fast); return }
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) return
    val q = java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP)
    if (q.precision > 28) return
    val unscaled = q.unscaledValue
    if (unscaled.bitLength < 63) buf.addUnscaled(t, unscaled.longValue)
    else {
      buf.seen(t) = true
      buf.addToSpill(t, q)
    }
  }
}
