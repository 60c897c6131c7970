package graft.functions.expressions

import org.apache.datasketches.kll.{KllDoublesSketch, KllSketch}
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.types._

/** KLL quantile sketches as native Catalyst aggregates — the mergeable
  * QUANTILE counterpart of the x15 HLL distinct rollup. Sketch once per
  * partition/group (one scan of the raw data, ever), then answer any
  * percentile rollup by MERGING the ~KB-sized sketches instead of
  * re-scanning: the pattern that makes 100 TB latency dashboards cheap.
  *
  * Modeled on Spark's own Datasketches-backed HllSketchAgg (a
  * TypedImperativeAggregate whose buffer IS the library sketch object,
  * serialized through the sketch's portable byte image — zero per-row
  * serde; bytes only cross the wire at shuffle boundaries). The binary
  * column this emits is a stable storage artifact: any later job — or
  * any non-Spark Datasketches consumer — can heapify and merge it.
  *
  * Determinism note (why x49 is rows-only at the driver's gate): KLL
  * compaction flips a random coin, so ESTIMATES can vary run to run
  * within the sketch's published rank-error bound; counts (getN) are
  * exact. Accuracy, mergeability, and serde are asserted in ScalaTest
  * against that epsilon instead of cell-exact values.
  */
object KllOps {

  /** Default k: rank error ~1.65% at 99% confidence, ~3 KB sketches. */
  val DefaultK = 200

  /** Normalized rank-error bound of a k=200 sketch (~1.65%); spec
    * assertions use a multiple of this for slack. */
  def epsilon(k: Int): Double = KllSketch.getNormalizedRankError(k, false)

  def quantile(bytes: Array[Byte], rank: Double): java.lang.Double = {
    val sk = KllDoublesSketch.heapify(Memory.wrap(bytes))
    if (sk.isEmpty) null else java.lang.Double.valueOf(sk.getQuantile(rank))
  }

  def count(bytes: Array[Byte]): Long =
    KllDoublesSketch.heapify(Memory.wrap(bytes)).getN
}

/** Build a KLL doubles sketch over `child` (double); emits the sketch's
  * portable binary image. */
case class KllSketchAgg(
    child: Expression,
    k: Int = KllOps.DefaultK,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"kll_sketch_agg needs double, got $t")
  }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "kll_sketch_agg"
  override def children: Seq[Expression] = Seq(child)

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buf: KllDoublesSketch, row: InternalRow): KllDoublesSketch = {
    val v = child.eval(row)
    if (v != null) buf.update(v.asInstanceOf[Double])
    buf
  }

  override def merge(buf: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buf.merge(other); buf
  }

  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray

  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(o: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}

/** Union pre-built KLL sketch images (binary in, binary out) — the
  * rollup face: per-day/per-group sketch tables merge to any coarser
  * grain without touching raw data. */
case class KllUnionAgg(
    child: Expression,
    k: Int = KllOps.DefaultK,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"kll_union_agg needs binary, got $t")
  }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "kll_union_agg"
  override def children: Seq[Expression] = Seq(child)

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buf: KllDoublesSketch, row: InternalRow): KllDoublesSketch = {
    val v = child.eval(row)
    if (v != null)
      buf.merge(KllDoublesSketch.heapify(Memory.wrap(v.asInstanceOf[Array[Byte]])))
    buf
  }

  override def merge(buf: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buf.merge(other); buf
  }

  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray

  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(o: Int): KllUnionAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllUnionAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}

/** Read a quantile out of a sketch image. Scalar, codegen'd (one static
  * call per ROW — but it only ever runs on post-aggregate rows, one per
  * group, so the heapify cost is per-group, not per-datum). */
case class KllQuantile(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (BinaryType, DoubleType) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"kll_quantile needs (binary, double), got $t")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "kll_quantile"

  override def nullSafeEval(sk: Any, rank: Any): Any = {
    val q = KllOps.quantile(sk.asInstanceOf[Array[Byte]], rank.asInstanceOf[Double])
    if (q == null) null else q.doubleValue()
  }

  override protected def doGenCode(ctx: codegen.CodegenContext,
                                   ev: codegen.ExprCode): codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (sk, r) => {
      s"""java.lang.Double ${ev.value}_q =
         |  graft.functions.expressions.KllOps.quantile($sk, $r);
         |if (${ev.value}_q == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}_q.doubleValue(); }""".stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Exact item count a sketch has absorbed (getN — deterministic). */
case class KllCount(child: Expression)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"kll_count needs binary, got $t")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "kll_count"

  override def nullSafeEval(sk: Any): Any =
    KllOps.count(sk.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: codegen.CodegenContext,
                                   ev: codegen.ExprCode): codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, sk =>
      s"${ev.value} = graft.functions.expressions.KllOps.count($sk);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Column faces (session-independent, same pattern as NativeExpressions).
  * Numeric inputs are cast to double here — a double->double cast folds
  * away, and any numeric column (the DECIMAL prices the rollup itself
  * targets) just works. */
object KllFunctions {
  import org.apache.spark.sql.graft.bridge.{column, expression}

  def kllSketchAgg(values: Column, k: Int = KllOps.DefaultK): Column =
    column(KllSketchAgg(expression(values.cast("double")), k).toAggregateExpression())
  def kllUnionAgg(sketches: Column, k: Int = KllOps.DefaultK): Column =
    column(KllUnionAgg(expression(sketches), k).toAggregateExpression())
  def kllQuantile(sketch: Column, rank: Column): Column =
    column(KllQuantile(expression(sketch), expression(rank.cast("double"))))
  def kllCount(sketch: Column): Column =
    column(KllCount(expression(sketch)))
}
