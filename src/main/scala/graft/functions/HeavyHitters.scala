package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitters sketch as a native Catalyst aggregate.
  *
  * The 100 TB problem this solves: finding the dominant keys of a column
  * without a full `groupBy(key).count()` — the exact form shuffles every
  * distinct key, which for high-cardinality columns (URLs, user ids,
  * document shingles) is the single biggest exchange in a profiling
  * pipeline. The sketch keeps at most `capacity` counters per partial
  * aggregate, merges associatively (map-side partial aggregation stays
  * enabled, the shuffle carries `capacity` rows per partition, not the
  * keyspace), and guarantees:
  *
  *  - every key with true frequency > n/capacity is present in the output;
  *  - each reported min_count undercounts the true frequency by at most
  *    n/capacity (n = rows aggregated).
  *
  * When `capacity` >= the number of distinct keys no counter is ever
  * evicted and the result is EXACT (counts equal groupBy-count) — which is
  * what makes the operator oracle-checkable against DuckDB at test scale
  * while remaining a bounded-memory sketch at cluster scale.
  *
  * Output: array<struct<item string, min_count long>> sorted by count
  * descending, then item ascending (deterministic given a deterministic
  * summary).
  */
case class HeavyHitters(
    child: Expression,
    capacityExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]]
  with ImplicitCastInputTypes {

  lazy val capacity: Int = {
    require(capacityExpr.foldable, "heavy_hitters capacity must be a literal")
    val c = capacityExpr.eval(InternalRow.empty).asInstanceOf[Int]
    require(c > 0, s"heavy_hitters capacity must be positive, got $c")
    c
  }

  override def inputTypes: Seq[DataType] = Seq(StringType, IntegerType)
  override def children: Seq[Expression] = Seq(child, capacityExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType), StructField("min_count", LongType))))
  override def prettyName: String = "heavy_hitters"

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[UTF8String, Long],
                      input: InternalRow): mutable.HashMap[UTF8String, Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val key = v.asInstanceOf[UTF8String]
    buf.get(key) match {
      case Some(c) => buf.update(key, c + 1)
      case None if buf.size < capacity =>
        // copy: unsafe-row UTF8Strings alias a reused backing buffer
        buf.update(key.clone(), 1L)
      case None =>
        // classic MG step: an unseen key past capacity decrements everyone
        val dead = mutable.ArrayBuffer.empty[UTF8String]
        buf.mapValuesInPlace { (k, c) => if (c == 1) dead += k; c - 1 }
        dead.foreach(buf.remove)
    }
    buf
  }

  override def merge(buf: mutable.HashMap[UTF8String, Long],
                     other: mutable.HashMap[UTF8String, Long]): mutable.HashMap[UTF8String, Long] = {
    other.foreach { case (k, c) => buf.update(k, buf.getOrElse(k, 0L) + c) }
    if (buf.size > capacity) {
      // subtract the (capacity+1)-th largest count from everyone; keeps the
      // summary within capacity and preserves the undercount bound
      val counts = buf.values.toArray
      java.util.Arrays.sort(counts)
      val threshold = counts(counts.length - capacity - 1)
      val dead = mutable.ArrayBuffer.empty[UTF8String]
      buf.mapValuesInPlace { (k, c) => if (c <= threshold) dead += k; c - threshold }
      dead.foreach(buf.remove)
    }
    buf
  }

  override def eval(buf: mutable.HashMap[UTF8String, Long]): Any = {
    val sorted = buf.toArray.sortWith { case ((k1, c1), (k2, c2)) =>
      if (c1 != c2) c1 > c2 else k1.compareTo(k2) < 0
    }
    new GenericArrayData(sorted.map { case (k, c) => InternalRow(k, c) })
  }

  override def serialize(buf: mutable.HashMap[UTF8String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (k, c) =>
      val b = k.getBytes
      out.writeInt(b.length)
      out.write(b)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[UTF8String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[UTF8String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.update(UTF8String.fromBytes(b), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HeavyHitters =
    copy(child = newChildren(0), capacityExpr = newChildren(1))
}
