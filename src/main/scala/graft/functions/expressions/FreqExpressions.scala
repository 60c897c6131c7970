package graft.functions.expressions

import org.apache.datasketches.common.ArrayOfStringsSerDe
import org.apache.datasketches.frequencies.{ErrorType, ItemsSketch}
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Frequent-items (heavy hitters) sketches as native Catalyst
  * aggregates — the FREQUENCY member of the mergeable-sketch family
  * (distinct = HLL/x15, quantiles = KLL/x49). Sketch once per
  * partition/group, merge kilobyte images for any rollup, and read
  * guaranteed error BOUNDS per item: for every reported item,
  * lower_bound <= true count <= upper_bound, and NO item with true
  * count >= N/maxMapSize-ish error is missed (the no-false-negatives
  * guarantee of the Misra-Gries family this engine's EXACT x47 also
  * builds on — x54 is the mergeable, bounded-memory face of the same
  * idea for when a recount pass is too expensive).
  *
  * Estimates depend on merge order (purge timing), so x54 is rows-only
  * at the driver's gate; the bounds themselves are asserted against
  * exact truth in ScalaTest, as is mergeability and the serde
  * round-trip. */
object FreqOps {

  /** Default max counter-map size (power of 2). Error bound ~ 3.5/k of
    * the stream weight; 512 counters ≈ 0.7% of N. */
  val DefaultMapSize = 512

  private val serde = new ArrayOfStringsSerDe

  def deserialize(bytes: Array[Byte]): ItemsSketch[String] =
    ItemsSketch.getInstance(Memory.wrap(bytes), serde)

  def serialize(sk: ItemsSketch[String]): Array[Byte] =
    sk.toByteArray(serde)

  /** Rows of (item, estimate, lower_bound, upper_bound) for items whose
    * UPPER bound EXCEEDS `minCount` — the NO_FALSE_NEGATIVES view: a
    * superset of every item with true count > minCount (the sketch's
    * guarantee is strict). */
  def topRows(bytes: Array[Byte], minCount: Long): Array[InternalRow] = {
    val sk = deserialize(bytes)
    sk.getFrequentItems(minCount, ErrorType.NO_FALSE_NEGATIVES)
      .map(r => InternalRow(UTF8String.fromString(r.getItem),
        r.getEstimate, r.getLowerBound, r.getUpperBound))
  }

  def streamWeight(bytes: Array[Byte]): Long =
    deserialize(bytes).getStreamLength
}

/** Build a frequent-items sketch over a string column (binary image
  * out). */
case class FreqSketchAgg(
    child: Expression,
    maxMapSize: Int = FreqOps.DefaultMapSize,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ItemsSketch[String]] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"freq_sketch_agg needs string, got $t")
  }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "freq_sketch_agg"
  override def children: Seq[Expression] = Seq(child)

  override def createAggregationBuffer(): ItemsSketch[String] =
    new ItemsSketch[String](maxMapSize)

  override def update(buf: ItemsSketch[String], row: InternalRow): ItemsSketch[String] = {
    val v = child.eval(row)
    if (v != null) buf.update(v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(buf: ItemsSketch[String], other: ItemsSketch[String]): ItemsSketch[String] = {
    buf.merge(other); buf
  }

  override def eval(buf: ItemsSketch[String]): Any = FreqOps.serialize(buf)

  override def serialize(buf: ItemsSketch[String]): Array[Byte] = FreqOps.serialize(buf)
  override def deserialize(bytes: Array[Byte]): ItemsSketch[String] =
    FreqOps.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): FreqSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): FreqSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}

/** Union pre-built frequent-items sketch images (binary in/out) — the
  * rollup face over persisted sketch tables. */
case class FreqUnionAgg(
    child: Expression,
    maxMapSize: Int = FreqOps.DefaultMapSize,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ItemsSketch[String]] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"freq_union_agg needs binary, got $t")
  }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "freq_union_agg"
  override def children: Seq[Expression] = Seq(child)

  override def createAggregationBuffer(): ItemsSketch[String] =
    new ItemsSketch[String](maxMapSize)

  override def update(buf: ItemsSketch[String], row: InternalRow): ItemsSketch[String] = {
    val v = child.eval(row)
    if (v != null) buf.merge(FreqOps.deserialize(v.asInstanceOf[Array[Byte]]))
    buf
  }

  override def merge(buf: ItemsSketch[String], other: ItemsSketch[String]): ItemsSketch[String] = {
    buf.merge(other); buf
  }

  override def eval(buf: ItemsSketch[String]): Any = FreqOps.serialize(buf)

  override def serialize(buf: ItemsSketch[String]): Array[Byte] = FreqOps.serialize(buf)
  override def deserialize(bytes: Array[Byte]): ItemsSketch[String] =
    FreqOps.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): FreqUnionAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): FreqUnionAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}

/** Heavy items with error bounds out of a sketch image:
  * array<struct<item, estimate, lower_bound, upper_bound>> of every
  * item whose upper bound reaches `minCount` (NO_FALSE_NEGATIVES — a
  * guaranteed superset of the truly-heavy set). Post-aggregate rows
  * only, like KllQuantile. */
case class FreqTopItems(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (BinaryType, LongType) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"freq_top_items needs (binary, bigint), got $t")
  }
  override def dataType: DataType = ArrayType(FreqTopItems.rowType, containsNull = false)
  override def prettyName: String = "freq_top_items"

  override def nullSafeEval(sk: Any, min: Any): Any =
    new GenericArrayData(FreqOps.topRows(sk.asInstanceOf[Array[Byte]],
      min.asInstanceOf[Long]).asInstanceOf[Array[Any]])

  override protected def doGenCode(ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
                                   ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (sk, m) =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  (Object[]) graft.functions.expressions.FreqOps.topRows($sk, $m));""".stripMargin)

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object FreqTopItems {
  val rowType: StructType = StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("estimate", LongType, nullable = false),
    StructField("lower_bound", LongType, nullable = false),
    StructField("upper_bound", LongType, nullable = false)))
}

/** Exact total stream weight a sketch absorbed (deterministic). */
case class FreqStreamWeight(child: Expression)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"freq_stream_weight needs binary, got $t")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "freq_stream_weight"

  override def nullSafeEval(sk: Any): Any =
    FreqOps.streamWeight(sk.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
                                   ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, sk =>
      s"${ev.value} = graft.functions.expressions.FreqOps.streamWeight($sk);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Column faces (session-independent, same pattern as KllFunctions). */
object FreqFunctions {
  import org.apache.spark.sql.graft.bridge.{column, expression}

  def freqSketchAgg(items: Column, maxMapSize: Int = FreqOps.DefaultMapSize): Column =
    column(FreqSketchAgg(expression(items.cast("string")), maxMapSize)
      .toAggregateExpression())
  def freqUnionAgg(sketches: Column, maxMapSize: Int = FreqOps.DefaultMapSize): Column =
    column(FreqUnionAgg(expression(sketches), maxMapSize).toAggregateExpression())
  def freqTopItems(sketch: Column, minCount: Column): Column =
    column(FreqTopItems(expression(sketch), expression(minCount.cast("long"))))
  def freqStreamWeight(sketch: Column): Column =
    column(FreqStreamWeight(expression(sketch)))
}
