package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** KMV (k-minimum-values) distinct-count sketch as a native Catalyst
  * aggregate: keep the k SMALLEST DISTINCT hash values of a group and
  * report (n_kept, kth) — from which the caller derives the classic
  * estimator `D-hat = (k-1) / U_(k)` with `U_(k) = kth / 2^32` when the
  * group saturates the sketch, and the EXACT distinct-hash count
  * (`n_kept`) when it does not (Bar-Yossef et al. 2002; Beyer et al.
  * SIGMOD 2007 give the unbiased (k-1) form).
  *
  * The 100 TB problem this solves: `COUNT(DISTINCT key)` over a
  * high-cardinality key shuffles EVERY distinct key (Spark plans an
  * Expand + two exchanges); at petabyte row counts that is often the
  * single most expensive aggregate in a report. The sketch is
  * constant-state (k longs), mergeable (set-union then re-truncate, fully
  * associative/commutative), and keeps partial aggregation enabled — each
  * map partition ships at most k longs per group, so the shuffle carries
  * sketches, not keys. Relative error ~ 1/sqrt(k-2) (~11% at k=64,
  * ~4.4% at k=512); the caller picks k per accuracy budget.
  *
  * Determinism contract (what makes this oracle-checkable, unlike
  * `approx_count_distinct`'s engine-private HLL): the result is a pure
  * function of the distinct input-hash SET — no RNG, no insertion-order
  * dependence, no merge-order dependence. Feed it the repo's canonical
  * md5-prefix hash (`conv(substr(md5(x),1,8),16,10)`, uniform on
  * [0, 2^32)) and any engine that sorts distinct hashes reproduces
  * (n_kept, kth) bit-for-bit — DuckDB does it with DISTINCT + ROW_NUMBER.
  *
  * Output: struct<n_kept int, kth bigint> — `kth` is the LARGEST kept
  * hash (= the k-th smallest overall when saturated); null when the group
  * is empty. Null hashes are ignored. Negative hashes are rejected at
  * update (the estimator's U_(k) mapping assumes [0, 2^32)).
  *
  * Reference provenance: the reference engine has no sketching surface —
  * its distinct counts (reference `etl/transform.py` nunique calls) are
  * exact pandas ops; this operator is the scale path the engine family
  * (a2 exact / a12 heavy-hitters) was missing for distinct cardinality.
  */
case class KmvSketch(
    hashExpr: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.TreeSet[Long]]
  with ImplicitCastInputTypes {

  lazy val k: Int = {
    require(kExpr.foldable, "kmv_sketch k must be a literal")
    val v = kExpr.eval(InternalRow.empty).asInstanceOf[Int]
    require(v > 1, s"kmv_sketch k must be > 1, got $v")
    v
  }

  override def inputTypes: Seq[DataType] = Seq(LongType, IntegerType)
  override def children: Seq[Expression] = Seq(hashExpr, kExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("n_kept", IntegerType),
    StructField("kth", LongType)))
  override def prettyName: String = "kmv_sketch"

  override def createAggregationBuffer(): mutable.TreeSet[Long] =
    mutable.TreeSet.empty[Long]

  /** Bounded distinct insert: TreeSet dedups; past k members only a hash
    * below the current max can enter (and evicts that max). */
  private def offer(buf: mutable.TreeSet[Long], h: Long): Unit = {
    if (buf.size < k) { buf.add(h); () }
    else if (h < buf.last && !buf.contains(h)) {
      buf.remove(buf.last); buf.add(h); ()
    }
  }

  override def update(buf: mutable.TreeSet[Long],
                      input: InternalRow): mutable.TreeSet[Long] = {
    val h = hashExpr.eval(input)
    if (h != null) {
      val v = h.asInstanceOf[Long]
      require(v >= 0, s"kmv_sketch hash must be non-negative, got $v")
      offer(buf, v)
    }
    buf
  }

  override def merge(buf: mutable.TreeSet[Long],
                     other: mutable.TreeSet[Long]): mutable.TreeSet[Long] = {
    other.foreach(offer(buf, _))
    buf
  }

  override def eval(buf: mutable.TreeSet[Long]): Any =
    if (buf.isEmpty) InternalRow(0, null)
    else InternalRow(buf.size, buf.last)

  override def serialize(buf: mutable.TreeSet[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach(out.writeLong)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.TreeSet[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.add(in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvSketch =
    copy(hashExpr = newChildren(0), kExpr = newChildren(1))
}
