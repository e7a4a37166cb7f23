package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitters candidate sketch as a native
  * TypedImperativeAggregate — the bounded-memory first pass of exact
  * heavy-hitter detection (SURVEY §2.8 "aggregates … reserved for
  * extensions", same slot as [[KmvDistinct]]).
  *
  * The sketch keeps at most k (key, counter) entries. Update is the
  * classic decrement-all step; merge is the mergeable-summaries rule
  * (Agarwal et al., PODS'12): sum counters pairwise, then if more than
  * k entries survive, subtract the (k+1)-th largest counter from all
  * and drop the non-positive. Both preserve the guarantee that EVERY
  * item with true frequency > n/k is still present in the summary, so
  * a second exact-count pass restricted to the ≤ k surviving
  * candidates provably returns the exact heavy-hitter set — the
  * composition stays deterministic even though the intermediate
  * summary depends on partition/merge order (order only changes which
  * NON-heavy extras survive, and the refine pass filters those by
  * exact count).
  *
  * eval() returns the surviving candidate keys sorted (counts are
  * deliberately not exposed: MG counters are underestimates and any
  * consumer should refine — returning them would invite misuse).
  * The shuffle carries at most k entries per group.
  */
case class MisraGries(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0,
) extends TypedImperativeAggregate[java.util.HashMap[String, java.lang.Long]] {
  require(k > 0, "MisraGries requires k > 0")

  // analysis-time contract: the update path reads the child as
  // UTF8String, so a non-string argument must fail analysis with a
  // named error, not ClassCastException mid-task (AbstractDataType is
  // private[sql], so checkInputDataTypes is the public surface)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"misra_gries requires a string argument, got ${child.dataType.sql}")
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def createAggregationBuffer(): java.util.HashMap[String, java.lang.Long] =
    new java.util.HashMap[String, java.lang.Long]()

  private def addOne(buffer: java.util.HashMap[String, java.lang.Long], key: String): Unit = {
    val cur = buffer.get(key)
    if (cur != null) {
      buffer.put(key, cur + 1L)
    } else if (buffer.size() < k) {
      buffer.put(key, 1L)
    } else {
      // decrement-all: every stored counter loses one; zeros drop out.
      val it = buffer.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue <= 1L) it.remove() else e.setValue(e.getValue - 1L)
      }
    }
  }

  override def update(
      buffer: java.util.HashMap[String, java.lang.Long], input: InternalRow): java.util.HashMap[String, java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) addOne(buffer, v.asInstanceOf[UTF8String].toString)
    buffer
  }

  override def merge(
      buffer: java.util.HashMap[String, java.lang.Long],
      other: java.util.HashMap[String, java.lang.Long]): java.util.HashMap[String, java.lang.Long] = {
    val it = other.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = buffer.get(e.getKey)
      buffer.put(e.getKey, (if (cur == null) 0L else cur.longValue()) + e.getValue)
    }
    if (buffer.size() > k) {
      // subtract the (k+1)-th largest counter from all entries; at most
      // k stay positive. O(m log m) on a ≤ 2k-entry map — driver-safe.
      val counts = new java.util.ArrayList[java.lang.Long](buffer.values())
      java.util.Collections.sort(counts, java.util.Collections.reverseOrder[java.lang.Long]())
      val cut = counts.get(k).longValue()
      val jt = buffer.entrySet().iterator()
      while (jt.hasNext) {
        val e = jt.next()
        if (e.getValue <= cut) jt.remove() else e.setValue(e.getValue - cut)
      }
    }
    buffer
  }

  override def eval(buffer: java.util.HashMap[String, java.lang.Long]): Any = {
    val keys = new java.util.ArrayList[String](buffer.keySet())
    java.util.Collections.sort(keys)
    val out = new Array[Any](keys.size())
    var i = 0
    while (i < keys.size()) { out(i) = UTF8String.fromString(keys.get(i)); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buffer: java.util.HashMap[String, java.lang.Long]): Array[Byte] = {
    var bytes = 4
    val it0 = buffer.entrySet().iterator()
    while (it0.hasNext) {
      bytes += 4 + 8 + it0.next().getKey.getBytes(StandardCharsets.UTF_8).length
    }
    val bb = ByteBuffer.allocate(bytes)
    bb.putInt(buffer.size())
    val it = buffer.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val kb = e.getKey.getBytes(StandardCharsets.UTF_8)
      bb.putInt(kb.length); bb.put(kb); bb.putLong(e.getValue.longValue())
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[String, java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val m = new java.util.HashMap[String, java.lang.Long](math.max(4, n * 2))
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val kb = new Array[Byte](len)
      bb.get(kb)
      m.put(new String(kb, StandardCharsets.UTF_8), bb.getLong)
      i += 1
    }
    m
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGries =
    copy(child = newChildren.head)
}
