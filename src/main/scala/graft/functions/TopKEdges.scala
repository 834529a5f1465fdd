package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k (score DESC, id ASC) neighbor selection as a native
  * mergeable aggregate — the MAP-SIDE-COMBINABLE alternative to the
  * `dense_rank() OVER (PARTITION BY a ORDER BY cos DESC, b ASC) ≤ k`
  * window the kNN builders rank with. The window form must SORT every
  * candidate row inside each shuffle partition (the sized-LSH edge build
  * at ×100 scale spilled 6.7 GB through that sort) and shuffles the FULL
  * candidate stream; this aggregate keeps O(k) state per vertex, collapses
  * each map partition's candidates to ≤ k entries per vertex BEFORE the
  * exchange (Spark plans partial + final HashAggregate automatically), and
  * never sorts more than k elements.
  *
  * Determinism: for a TOTAL order (score DESC, id ASC) over distinct ids,
  * the top-k SET is unique, and bounded insert-with-eviction retains
  * exactly the k best seen regardless of arrival order — so the result is
  * bit-identical to the window form under the same precondition
  * [[graft.ext.Relational.topKPerGroupDense]] documents. Duplicate
  * candidates (the multi-table LSH case) carry the same id with a
  * bit-identical score and are dropped on sight: present → skip; evicted →
  * they lose the same comparison that evicted them; not-yet-seen → first
  * insertion wins and later copies skip. NaN scores must be filtered
  * upstream (the builders do) — a NaN would corrupt the ordering, so
  * update() drops them defensively.
  *
  * Output: `array<struct<b: long, cos: double>>`, (cos DESC, b ASC).
  */
case class TopKEdges(
    idChild: Expression,
    scoreChild: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKEdges.State] {

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = idChild :: scoreChild :: Nil

  override def checkInputDataTypes(): TypeCheckResult =
    (idChild.dataType, scoreChild.dataType) match {
      case (LongType, DoubleType) => TypeCheckResult.TypeCheckSuccess
      case (i, s) =>
        TypeCheckResult.TypeCheckFailure(
          s"graft_topk_edges requires (bigint, double), got (${i.simpleString}, ${s.simpleString})")
    }

  override def nullable: Boolean = false

  override def dataType: DataType = TopKEdges.OutType

  override def prettyName: String = "graft_topk_edges"

  override def createAggregationBuffer(): TopKEdges.State = new TopKEdges.State(k)

  override def update(state: TopKEdges.State, input: InternalRow): TopKEdges.State = {
    val id = idChild.eval(input)
    val sc = scoreChild.eval(input)
    if (id != null && sc != null) {
      val c = sc.asInstanceOf[Double]
      if (!c.isNaN) state.add(id.asInstanceOf[Long], c)
    }
    state
  }

  override def merge(a: TopKEdges.State, b: TopKEdges.State): TopKEdges.State = {
    b.foreach((id, c) => a.add(id, c))
    a
  }

  override def eval(state: TopKEdges.State): Any = {
    val rows = new Array[Any](state.size)
    var i = 0
    state.foreach { (id, c) =>
      rows(i) = InternalRow(id, c)
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(state: TopKEdges.State): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(state.size)
    state.foreach { (id, c) =>
      out.writeLong(id)
      out.writeDouble(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKEdges.State = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val state = new TopKEdges.State(k)
    val n = in.readInt()
    var i = 0
    while (i < n) {
      state.add(in.readLong(), in.readDouble())
      i += 1
    }
    state
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKEdges =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): TopKEdges =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression])
      : TopKEdges = copy(idChild = newChildren.head, scoreChild = newChildren(1))
}

object TopKEdges {

  val OutType: DataType = ArrayType(
    StructType(Seq(
      StructField("b", LongType, nullable = false),
      StructField("cos", DoubleType, nullable = false))),
    containsNull = false)

  /** Bounded sorted buffer: parallel arrays in (cos DESC, b ASC) order,
    * size ≤ k. Insertion is an O(k) scan + shift — k is a neighborhood
    * size (≤ ~tens), so this beats any heap bookkeeping at real ks.
    */
  final class State(k: Int) {
    private val ids = new Array[Long](k)
    private val cs = new Array[Double](k)
    private var n = 0

    def size: Int = n

    /** true iff (c1, id1) ranks strictly before (c2, id2). */
    @inline private def before(c1: Double, id1: Long, c2: Double, id2: Long): Boolean =
      c1 > c2 || (c1 == c2 && id1 < id2)

    def add(id: Long, c: Double): Unit = {
      // duplicate id ⇒ bit-identical score by the caller's contract; skip
      var i = 0
      while (i < n) {
        if (ids(i) == id) return
        i += 1
      }
      if (n < k) {
        // find insertion point, shift the tail right
        var p = n
        while (p > 0 && before(c, id, cs(p - 1), ids(p - 1))) p -= 1
        var j = n
        while (j > p) { ids(j) = ids(j - 1); cs(j) = cs(j - 1); j -= 1 }
        ids(p) = id; cs(p) = c
        n += 1
      } else if (before(c, id, cs(n - 1), ids(n - 1))) {
        // beats the current worst: drop it, insert in place
        var p = n - 1
        while (p > 0 && before(c, id, cs(p - 1), ids(p - 1))) p -= 1
        var j = n - 1
        while (j > p) { ids(j) = ids(j - 1); cs(j) = cs(j - 1); j -= 1 }
        ids(p) = id; cs(p) = c
      }
    }

    def foreach(f: (Long, Double) => Unit): Unit = {
      var i = 0
      while (i < n) { f(ids(i), cs(i)); i += 1 }
    }
  }
}
