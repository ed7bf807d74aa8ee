package graft.functions.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, NullType}

/** Exact scale-18 decimal SCATTER-sum — the gradient twin of
  * [[GatherSumDec18]]: per input row, add `dec18(value)` into every
  * slot named by the `array<long>` index column, accumulating one exact
  * [[Dec18Sums]] slot per index in `[0, nSlots)`; the aggregate's value
  * is the `array<double>` of slot totals (null where no in-precision
  * term ever landed — SQL `sum` semantics per slot).
  *
  * This is the NATIVE one-pass replacement for the logistic family's
  * per-iteration gradient shape `explode(__bs) → groupBy(bucket) →
  * sum_dec18(resid)` (see [[graft.functions.Curation]] gradStep): the
  * explode materialized one row PER FEATURE per iteration — corpus ×
  * avg-features rows through row encoding, hash-aggregate probing and
  * per-row quantization, 16 times per training run — where this
  * aggregate walks each document's bucket array in place, quantizes the
  * document's residual ONCE (every feature of a doc carries the same
  * x = 1 term, so the parsed (hi, lo) split is reused across its
  * buckets), and keeps the whole (dim+1 ≤ 4097)-slot gradient in one
  * flat accumulator per task. Value-identical to the exploded
  * formulation for any row order: same [[VecMomentsDec18.quantize18]]
  * per term, same exact split-long accumulation, same final
  * `BigDecimal.doubleValue` conversion per slot (NativeExprSpec pins
  * the parity). Out-of-range or null indices contribute nothing.
  *
  * 100 TB shape: one map-only pass per GD step; the shuffled state is
  * the fixed (nSlots)-slot buffer per task — never a row per feature. */
case class ScatterSumDec18(left: Expression, right: Expression,
    nSlots: Int, mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Dec18Sums] with BinaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case _ if nSlots < 1 || nSlots > (1 << 22) =>
        TypeCheckResult.TypeCheckFailure(
          s"scatter_sum_dec18 nSlots=$nSlots out of [1, ${1 << 22}]")
      case (ArrayType(LongType, _) | NullType, DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"scatter_sum_dec18 requires (array<bigint>, double), got " +
          s"${l.sql}, ${r.sql}")
    }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def nullable: Boolean = false
  override def prettyName: String = "scatter_sum_dec18"

  override def createAggregationBuffer(): Dec18Sums = new Dec18Sums(nSlots)

  override def update(buf: Dec18Sums, input: InternalRow): Dec18Sums = {
    val bs = left.eval(input)
    val v = right.eval(input)
    if (bs != null && v != null) {
      if (buf.scratch == null) buf.scratch = new Array[Long](2)
      // quantize the row's value ONCE; every named slot gets the same
      // parsed (hi, lo) term — non-finite / precision-28 overflow rows
      // cast to null under the decimal cast and are skipped whole
      if (VecMomentsDec18.quantize18(v.asInstanceOf[Double], buf.scratch)) {
        val arr = bs.asInstanceOf[ArrayData]
        val n = arr.numElements()
        var i = 0
        while (i < n) {
          if (!arr.isNullAt(i)) {
            val b = arr.getLong(i)
            if (b >= 0L && b < nSlots)
              buf.addParsed(b.toInt, buf.scratch(0), buf.scratch(1))
          }
          i += 1
        }
      }
    }
    buf
  }

  override def merge(b1: Dec18Sums, b2: Dec18Sums): Dec18Sums = {
    b1.mergeFrom(b2)
    b1
  }

  override def eval(buf: Dec18Sums): Any = {
    val out = new Array[Any](nSlots)
    var t = 0
    while (t < nSlots) {
      if (buf.seen(t)) out(t) = buf.total(t).doubleValue
      t += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: Dec18Sums): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    buf.write(out)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Dec18Sums =
    Dec18Sums.read(new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes)))

  override def withNewMutableAggBufferOffset(newOffset: Int): ScatterSumDec18 =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ScatterSumDec18 =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): ScatterSumDec18 =
    copy(left = newLeft, right = newRight)
}

object ScatterSumDec18 {
  /** `scatter_sum_dec18(indices, value, nSlots)` as a Column: the
    * array<double> of exact per-slot dec18 sums. */
  def scatterSumDec18(indices: org.apache.spark.sql.Column,
      value: org.apache.spark.sql.Column, nSlots: Int)
      : org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(ScatterSumDec18(Bridge.expression(indices),
      Bridge.expression(value), nSlots).toAggregateExpression())
  }
}
