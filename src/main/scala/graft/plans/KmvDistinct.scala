package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType, LongType}

/** Native KMV (bottom-k / k-minimum-values) distinct-count sketch as a
  * Catalyst `TypedImperativeAggregate` — the engine's fourth extension
  * kind alongside the codegen scalar expressions (DmsToDecimal,
  * CosineSim), the whole-operator plans (TopKPerGroup, AsOfJoin), and the
  * optimizer rule (TopKRewrite). (Beyer et al., "On Synopses for
  * Distinct-Value Estimation Under Multiset Operations", SIGMOD 2007.)
  *
  * The input column is a uniform in (0,1] — in this engine the
  * md5-derived `(first 52 md5 bits + 0.5) / 2^52` uniform the sampling
  * family already uses — and the state is the k SMALLEST DISTINCT values
  * seen. The estimator is exact while fewer than k distinct values have
  * been seen, and floor((k-1) / u_(k)) once the sketch saturates
  * (u_(k) = the k-th smallest). Because the hash is deterministic, so is
  * the estimate: unlike HLL (q62) or GK percentiles (q80), this sketch is
  * ORACLE-CHECKABLE — DuckDB recomputes the identical bottom-k and floor.
  *
  * Scale shape: the state is a bounded k-entry set with map-side partial
  * aggregation and associative/commutative MERGE through Spark's
  * ObjectHashAggregate path — each partition ships ≤ k doubles per group,
  * never the raw column. Relative std error ≈ 1/√(k−2) (~6% at k=256).
  */
case class KmvDistinct(
    child: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Double]] {

  /** Sketch size: a foldable literal (checked at analysis by the eval). */
  private lazy val k: Int = kExpr.eval() match {
    case n: Number if n.intValue >= 2 => n.intValue
    case other =>
      throw new IllegalArgumentException(
        s"kmv_distinct: k must be a foldable integer >= 2, got $other")
  }

  override def children: Seq[Expression] = Seq(child, kExpr)
  // ExpectsInputTypes is private[sql]; validate directly instead
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"kmv_distinct: input must be DOUBLE (a uniform in (0,1]), got ${child.dataType}")
    else if (kExpr.dataType != IntegerType || !kExpr.foldable)
      TypeCheckResult.TypeCheckFailure("kmv_distinct: k must be a foldable INT")
    else TypeCheckResult.TypeCheckSuccess
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_distinct"

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Double] =
    new java.util.TreeSet[java.lang.Double]()

  private def add(buf: java.util.TreeSet[java.lang.Double], u: Double): Unit = {
    if (buf.size < k) { buf.add(u); () }
    else if (u < buf.last() && buf.add(u)) { buf.pollLast(); () }
  }

  override def update(
      buf: java.util.TreeSet[java.lang.Double],
      input: InternalRow): java.util.TreeSet[java.lang.Double] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Double])
    buf
  }

  override def merge(
      a: java.util.TreeSet[java.lang.Double],
      b: java.util.TreeSet[java.lang.Double]): java.util.TreeSet[java.lang.Double] = {
    val it = b.iterator()
    while (it.hasNext) add(a, it.next().doubleValue())
    a
  }

  override def eval(buf: java.util.TreeSet[java.lang.Double]): Any = {
    val n = buf.size
    if (n < k) n.toLong
    else {
      val uk = buf.last().doubleValue()
      // uk > 0 by construction of the (+0.5)/2^52 uniform; guard anyway so a
      // zero input yields the exact-tier answer instead of dividing by zero
      if (uk <= 0.0) n.toLong else math.floor((k - 1).toDouble / uk).toLong
    }
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putDouble(it.next().doubleValue())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Double] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.TreeSet[java.lang.Double]()
    var i = 0
    while (i < n) { buf.add(bb.getDouble); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvDistinct =
    copy(child = newChildren(0), kExpr = newChildren(1))
}
