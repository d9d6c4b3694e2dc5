package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded per-group top-k as a native Catalyst aggregate: keep the k
  * best (score, id) pairs of each group, best = highest score, ties to the
  * smaller id (deterministic across engines when the caller feeds tie-safe
  * rounded scores).
  *
  * The 100 TB problem this solves: "keep the k best documents per source"
  * (quality-ranked corpus curation, RefinedWeb-style per-domain caps) is
  * naturally a `row_number() OVER (PARTITION BY source ORDER BY score
  * DESC)` — but with a handful of sources that window SORTS EACH ENTIRE
  * SOURCE IN ONE TASK, the same single-reducer trap the sharded prefix sum
  * exists for (TextOps.shardedPrefixSum), except rank-by-score cannot be
  * sharded by a monotone id. A bounded aggregate dissolves it: partial
  * aggregation stays enabled, every map partition reduces to at most k
  * pairs per group BEFORE the shuffle, the merge is associative, and no
  * sort ever sees more than (partitions x k) rows per group. (Same family
  * as [[HeavyHitters]]; Spark's own TakeOrderedAndProject does this for
  * global top-k but has no per-group form.)
  *
  * Output: array<struct<id long, score double>>, best-first (score desc,
  * id asc). Rows with a null/NaN score or null id are ignored. Exact for
  * every k (it is a heap, not a sketch).
  */
case class TopKByScore(
    scoreExpr: Expression,
    idExpr: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]]
  with ImplicitCastInputTypes {

  lazy val k: Int = {
    require(kExpr.foldable, "top_k_by k must be a literal")
    val v = kExpr.eval(InternalRow.empty).asInstanceOf[Int]
    require(v > 0, s"top_k_by k must be positive, got $v")
    v
  }

  /** Dequeues the WORST kept pair first (lowest score; ties, largest id),
    * so a bounded insert only ever compares against / evicts the root. */
  private val worstFirst: Ordering[(Double, Long)] = new Ordering[(Double, Long)] {
    def compare(a: (Double, Long), b: (Double, Long)): Int = {
      val c = java.lang.Double.compare(b._1, a._1)
      if (c != 0) c else java.lang.Long.compare(a._2, b._2)
    }
  }

  override def inputTypes: Seq[DataType] = Seq(DoubleType, LongType, IntegerType)
  override def children: Seq[Expression] = Seq(scoreExpr, idExpr, kExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", LongType), StructField("score", DoubleType))))
  override def prettyName: String = "top_k_by"

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty(worstFirst)

  private def offer(buf: mutable.PriorityQueue[(Double, Long)],
                    pair: (Double, Long)): Unit = {
    if (buf.size < k) buf.enqueue(pair)
    else if (worstFirst.compare(pair, buf.head) < 0) { // better than the worst
      buf.dequeue(); buf.enqueue(pair)
    }
  }

  override def update(buf: mutable.PriorityQueue[(Double, Long)],
                      input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val s = scoreExpr.eval(input)
    val i = idExpr.eval(input)
    if (s == null || i == null) return buf
    val score = s.asInstanceOf[Double]
    if (score.isNaN) return buf
    offer(buf, (score, i.asInstanceOf[Long]))
    buf
  }

  override def merge(buf: mutable.PriorityQueue[(Double, Long)],
                     other: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    other.foreach(offer(buf, _))
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Long)]): Any = {
    // sorted() is ascending in "worse-ness" => best pair first
    val best = buf.toArray.sorted(worstFirst)
    new GenericArrayData(best.map { case (s, i) => InternalRow(i, s) })
  }

  override def serialize(buf: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (s, i) => out.writeDouble(s); out.writeLong(i) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      buf.enqueue((in.readDouble(), in.readLong()))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(scoreExpr = newChildren(0), idExpr = newChildren(1),
      kExpr = newChildren(2))
}
