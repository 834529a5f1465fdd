package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SpaceSaving (Metwally et al., "Efficient computation of frequent and
  * top-k elements in data streams") heavy-hitter sketch as a native
  * mergeable aggregate — the ONE-PASS, bounded-memory alternative to
  * `explode → groupBy(token) → top-k`, whose shuffle carries the entire
  * vocabulary. Here each partition keeps at most `cap` counters
  * (`O(cap)` state regardless of input size), partial states merge
  * associatively, and only k rows leave the aggregation.
  *
  * Guarantees (per partial state, preserved through count-summing
  * merges): every estimate OVERcounts — `true ≤ est ≤ true + err` — and
  * any item with true count > N/cap is guaranteed present. The
  * cap-trim on merge drops the lightest counters, so merged `err`
  * bounds are per-stream, not global (the standard practical trade; at
  * cap ≫ k the head is unaffected).
  *
  * Output: `array<struct<item, est, err>>`, top `k` by (est desc, item
  * asc). The eviction scan is O(cap) per over-capacity update — fine
  * for the few-hundred-counter caps this is meant for (a production
  * tuning would keep the stream-summary linked structure).
  */
case class SpaceSavingTopK(
    child: Expression,
    k: Int,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SpaceSavingTopK.State] {

  require(k > 0, "k must be positive")
  require(cap >= k, "cap must be >= k")

  override def children: Seq[Expression] = child :: Nil

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"graft_topk requires string, got ${other.simpleString}")
  }

  override def nullable: Boolean = false

  override def dataType: DataType = SpaceSavingTopK.OutType

  override def prettyName: String = "graft_topk"

  override def createAggregationBuffer(): SpaceSavingTopK.State =
    new SpaceSavingTopK.State(cap)

  override def update(state: SpaceSavingTopK.State, input: InternalRow): SpaceSavingTopK.State = {
    val v = child.eval(input)
    if (v != null) state.add(v.asInstanceOf[UTF8String].toString, 1L, 0L)
    state
  }

  override def merge(a: SpaceSavingTopK.State, b: SpaceSavingTopK.State): SpaceSavingTopK.State = {
    b.foreach((item, est, err) => a.add(item, est, err))
    a
  }

  override def eval(state: SpaceSavingTopK.State): Any = {
    val top = state.top(k)
    new GenericArrayData(top.map { case (item, est, err) =>
      InternalRow(UTF8String.fromString(item), est, err)
    })
  }

  override def serialize(state: SpaceSavingTopK.State): Array[Byte] =
    SpaceSavingTopK.serializeState(state)

  override def deserialize(bytes: Array[Byte]): SpaceSavingTopK.State =
    SpaceSavingTopK.deserializeState(bytes, cap)

  override def withNewMutableAggBufferOffset(newOffset: Int): SpaceSavingTopK =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): SpaceSavingTopK =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression])
      : SpaceSavingTopK = copy(child = newChildren.head)
}

/** Weighted SpaceSaving: each row contributes `weight` observations of
  * `item` in ONE `add` — the replay form that rebuilds a heavy-hitter
  * summary from pre-aggregated `(token, count)` vocab rows (the
  * `cmsSketchFromCounts` precedent). Fed a deterministic stream (one
  * final partition, sorted `count desc, item asc`), the resulting
  * summary — and therefore the top-k — is a pure function of the vocab
  * counts, so a SQL oracle can gate it exactly; the eviction cascade
  * and the `true ≤ est ≤ true + err` invariant are the same machinery
  * as the raw one-pass [[SpaceSavingTopK]].
  */
case class SpaceSavingTopKWeighted(
    child: Expression,
    weight: Expression,
    k: Int,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SpaceSavingTopK.State] {

  require(k > 0, "k must be positive")
  require(cap >= k, "cap must be >= k")

  override def children: Seq[Expression] = child :: weight :: Nil

  override def checkInputDataTypes(): TypeCheckResult = (child.dataType, weight.dataType) match {
    case (StringType, LongType) => TypeCheckResult.TypeCheckSuccess
    case (c, w) => TypeCheckResult.TypeCheckFailure(
      s"graft_topk_w requires (string, bigint), got (${c.simpleString}, ${w.simpleString})")
  }

  override def nullable: Boolean = false
  override def dataType: DataType = SpaceSavingTopK.OutType
  override def prettyName: String = "graft_topk_w"

  override def createAggregationBuffer(): SpaceSavingTopK.State =
    new SpaceSavingTopK.State(cap)

  override def update(state: SpaceSavingTopK.State, input: InternalRow): SpaceSavingTopK.State = {
    val v = child.eval(input)
    val w = weight.eval(input)
    if (v != null && w != null) {
      val n = w.asInstanceOf[Long]
      if (n > 0L) state.add(v.asInstanceOf[UTF8String].toString, n, 0L)
    }
    state
  }

  override def merge(a: SpaceSavingTopK.State, b: SpaceSavingTopK.State): SpaceSavingTopK.State = {
    b.foreach((item, est, err) => a.add(item, est, err))
    a
  }

  override def eval(state: SpaceSavingTopK.State): Any = {
    val top = state.top(k)
    new GenericArrayData(top.map { case (item, est, err) =>
      InternalRow(UTF8String.fromString(item), est, err)
    })
  }

  override def serialize(state: SpaceSavingTopK.State): Array[Byte] =
    SpaceSavingTopK.serializeState(state)

  override def deserialize(bytes: Array[Byte]): SpaceSavingTopK.State =
    SpaceSavingTopK.deserializeState(bytes, cap)

  override def withNewMutableAggBufferOffset(newOffset: Int): SpaceSavingTopKWeighted =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): SpaceSavingTopKWeighted =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression])
      : SpaceSavingTopKWeighted = copy(child = newChildren.head, weight = newChildren(1))
}

object SpaceSavingTopK {

  private[functions] def serializeState(state: State): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(state.size)
    state.foreach { (item, est, err) =>
      val bytes = item.getBytes("UTF-8")
      out.writeInt(bytes.length)
      out.write(bytes)
      out.writeLong(est)
      out.writeLong(err)
    }
    out.flush()
    bos.toByteArray
  }

  private[functions] def deserializeState(bytes: Array[Byte], cap: Int): State = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val state = new State(cap)
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val buf = new Array[Byte](len)
      in.readFully(buf)
      state.add(new String(buf, "UTF-8"), in.readLong(), in.readLong())
      i += 1
    }
    state
  }


  val OutType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("est", LongType, nullable = false),
      StructField("err", LongType, nullable = false))),
    containsNull = false)

  /** Mutable counter set, at most `cap` entries of (est, err). */
  final class State(cap: Int) extends Serializable {
    private val counters = new java.util.HashMap[String, Array[Long]]()

    def size: Int = counters.size

    /** Add `est` observations of `item` (err carried from a merged
      * partial). Evicts the minimum-est counter when over capacity: the
      * newcomer inherits the evicted estimate as its error — the
      * SpaceSaving invariant keeping every estimate an overcount.
      */
    def add(item: String, est: Long, err: Long): Unit = {
      val cur = counters.get(item)
      if (cur != null) { cur(0) += est; cur(1) += err }
      else if (counters.size < cap) counters.put(item, Array(est, err))
      else {
        var minKey: String = null
        var minEst = Long.MaxValue
        val it = counters.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          // deterministic eviction: lowest est, ties by key order
          if (e.getValue()(0) < minEst ||
            (e.getValue()(0) == minEst && (minKey == null || e.getKey < minKey))) {
            minEst = e.getValue()(0)
            minKey = e.getKey
          }
        }
        counters.remove(minKey)
        counters.put(item, Array(minEst + est, minEst + err))
      }
    }

    def foreach(f: (String, Long, Long) => Unit): Unit = {
      val it = counters.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        f(e.getKey, e.getValue()(0), e.getValue()(1))
      }
    }

    /** Top `k` by (est desc, item asc) — deterministic given the state. */
    def top(k: Int): Array[(String, Long, Long)] = {
      val all = new scala.collection.mutable.ArrayBuffer[(String, Long, Long)](counters.size)
      foreach((i, e, r) => all += ((i, e, r)))
      all.sortBy { case (item, est, _) => (-est, item) }.take(k).toArray
    }
  }
}
