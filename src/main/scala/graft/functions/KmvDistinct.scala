package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** KMV (k-minimum-values) approximate distinct count as a native
  * TypedImperativeAggregate — the engine's custom-sketch slot (SURVEY
  * §2.8 "aggregates … reserved for extensions").
  *
  * The sketch keeps the k smallest distinct 48-bit hashes of the
  * values (first 12 hex chars of md5). With fewer than k distinct
  * hashes the count is exact; otherwise the estimator is
  * floor((k-1) · 2^48 / kthSmallest). Using md5 (not an
  * engine-internal hash) makes the whole sketch REPLAYABLE IN SQL, so
  * the DuckDB oracle checks the estimate bit-for-bit — unlike
  * approx_count_distinct, whose HLL internals are engine-specific.
  *
  * Buffer: a bounded TreeSet[Long]; partial aggregation (map-side
  * combine) and buffer serialization work like any built-in sketch, so
  * the shuffle carries at most k longs per group.
  */
case class KmvDistinct(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0,
) extends TypedImperativeAggregate[java.util.TreeSet[Long]] {

  // analysis-time contract: hash48 reads the child as UTF8String —
  // reject non-string arguments at analysis with a named error
  // instead of ClassCastException mid-task (AbstractDataType is
  // private[sql], so checkInputDataTypes is the public surface)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kmv_distinct requires a string argument, got ${child.dataType.sql}")
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType

  override def createAggregationBuffer(): java.util.TreeSet[Long] =
    new java.util.TreeSet[Long]()

  private def add(buffer: java.util.TreeSet[Long], h: Long): Unit = {
    buffer.add(h)
    if (buffer.size() > k) buffer.pollLast()
  }

  override def update(
      buffer: java.util.TreeSet[Long], input: InternalRow): java.util.TreeSet[Long] = {
    val v = child.eval(input)
    if (v != null) {
      add(buffer, KmvDistinct.hash48(v.asInstanceOf[UTF8String]))
    }
    buffer
  }

  override def merge(
      buffer: java.util.TreeSet[Long],
      other: java.util.TreeSet[Long]): java.util.TreeSet[Long] = {
    val it = other.iterator()
    while (it.hasNext) add(buffer, it.next())
    buffer
  }

  override def eval(buffer: java.util.TreeSet[Long]): Any =
    if (buffer.size() < k) buffer.size().toLong
    else math.floor((k - 1).toDouble * KmvDistinct.Space / buffer.last().toDouble).toLong

  override def serialize(buffer: java.util.TreeSet[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buffer.size() * 8)
    bb.putInt(buffer.size())
    val it = buffer.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val s = new java.util.TreeSet[Long]()
    (1 to n).foreach(_ => s.add(bb.getLong))
    s
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvDistinct =
    copy(child = newChildren.head)
}

object KmvDistinct {
  /** 2^48 — the hash space of the 12-hex-char prefix. */
  final val Space: Double = 281474976710656.0

  /** First 48 bits of md5(utf8 bytes), matching the SQL replay
    * `CAST('0x' || substr(md5(v), 1, 12) AS BIGINT)`.
    */
  def hash48(v: UTF8String): Long = {
    val md5 = java.security.MessageDigest.getInstance("MD5").digest(v.getBytes)
    ((md5(0) & 0xffL) << 40) | ((md5(1) & 0xffL) << 32) |
      ((md5(2) & 0xffL) << 24) | ((md5(3) & 0xffL) << 16) |
      ((md5(4) & 0xffL) << 8) | (md5(5) & 0xffL)
  }
}
