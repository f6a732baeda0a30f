package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SpaceSaving heavy-hitters sketch (Metwally, Agrawal & El Abbadi 2005,
  * "Efficient computation of frequent and top-k elements in data streams")
  * as a native Catalyst `TypedImperativeAggregate` — the mergeable-sketch
  * shape for frequent-item mining at 100 TB: each partition maintains a
  * bounded `capacity`-entry summary, partial buffers serialize into the
  * standard partial/final aggregation exchange (O(capacity) bytes per
  * partition, never O(vocabulary)), and merge folds one summary into the
  * other by weighted insert. Invariants maintained under insert AND merge:
  *   - est(i) ≥ true(i)                  (counts only ever overestimate)
  *   - est(i) − err(i) ≤ true(i)         (err bounds the overcount)
  *   - Σ est over the summary = n        (total stream weight is conserved)
  *   - any item with true(i) > n/capacity survives in a single-stream
  *     summary; the merged bound is ≤ 2n/capacity (Agarwal et al. 2012,
  *     "Mergeable summaries", for the combine-then-prune family)
  * When capacity ≥ |distinct items| no eviction ever fires and the sketch
  * is EXACT (est = true, err = 0) — q103 runs that regime under the hash
  * gate so the driver verifies this operator's full update/merge/
  * serialize/eval path; SketchSpec covers the approximate regime.
  *
  * This is ladder rung (b) (custom Catalyst expression) for AGGREGATES —
  * the imperative-buffer counterpart to the typed `TopKAggregator`
  * (Aggregator) surface, usable from raw Column expressions with no
  * Dataset encoder plumbing.
  */
case class SpaceSavingTopK(
    child: Expression,
    capacity: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SpaceSavingTopK.Buffer]
  with UnaryLike[Expression] {

  require(capacity > 0, "space_saving_topk capacity must be positive")

  // AbstractDataType (ExpectsInputTypes) is private[sql] in Spark 4 —
  // enforce the string-input contract directly instead
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"space_saving_topk requires a string column, got ${child.dataType}")
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("est", LongType, nullable = false),
    StructField("err", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): SpaceSavingTopK.Buffer =
    new SpaceSavingTopK.Buffer(capacity)

  override def update(b: SpaceSavingTopK.Buffer, input: InternalRow): SpaceSavingTopK.Buffer = {
    val v = child.eval(input)
    if (v != null) b.insert(v.asInstanceOf[UTF8String].toString, 1L, 0L)
    b
  }

  override def merge(b: SpaceSavingTopK.Buffer, other: SpaceSavingTopK.Buffer): SpaceSavingTopK.Buffer = {
    // weighted insert of the smaller summary into the larger conserves
    // Σest = n₁ + n₂ and both per-item invariants
    other.entriesSorted.foreach { case (item, c, e) => b.insert(item, c, e) }
    b
  }

  override def eval(b: SpaceSavingTopK.Buffer): Any =
    new GenericArrayData(b.entriesSorted.map { case (item, c, e) =>
      new GenericInternalRow(Array[Any](UTF8String.fromString(item), c, e))
    }.toArray[Any])

  override def serialize(b: SpaceSavingTopK.Buffer): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    val entries = b.entriesSorted
    out.writeInt(entries.length)
    entries.foreach { case (item, c, e) =>
      val bytes = item.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(bytes.length); out.write(bytes)
      out.writeLong(c); out.writeLong(e)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): SpaceSavingTopK.Buffer = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val b = new SpaceSavingTopK.Buffer(capacity)
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val arr = new Array[Byte](len); in.readFully(arr)
      b.insert(new String(arr, java.nio.charset.StandardCharsets.UTF_8),
        in.readLong(), in.readLong())
      i += 1
    }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SpaceSavingTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SpaceSavingTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): SpaceSavingTopK =
    copy(child = newChild)
  override def prettyName: String = "space_saving_topk"
}

object SpaceSavingTopK {

  /** Bounded stream summary: item → (count, err). Eviction picks the
    * minimum count (ties: lexicographically LARGEST item, so the choice is
    * deterministic given identical contents regardless of hash iteration
    * order). Capacity is small (10s–100s) so the O(capacity) eviction scan
    * is cheap relative to the per-row hash hit; the classic stream-summary
    * linked structure is an optimization, not a semantic change. */
  final class Buffer(val capacity: Int) {
    private val m = new java.util.HashMap[String, Array[Long]]()

    def insert(item: String, c: Long, e: Long): Unit = {
      val cur = m.get(item)
      if (cur != null) { cur(0) += c; cur(1) += e }
      else if (m.size < capacity) m.put(item, Array(c, e))
      else {
        var minK: String = null
        var minC = Long.MaxValue
        val it = m.entrySet().iterator()
        while (it.hasNext) {
          val en = it.next()
          val cc = en.getValue()(0)
          if (cc < minC || (cc == minC && (minK == null || en.getKey.compareTo(minK) > 0))) {
            minC = cc; minK = en.getKey
          }
        }
        m.remove(minK)
        m.put(item, Array(c + minC, e + minC))
      }
    }

    /** Entries ordered (est desc, item asc) — the output and serialization
      * order, so downstream ranks are deterministic given contents. */
    def entriesSorted: Seq[(String, Long, Long)] = {
      val buf = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long)]
      val it = m.entrySet().iterator()
      while (it.hasNext) {
        val en = it.next()
        buf += ((en.getKey, en.getValue()(0), en.getValue()(1)))
      }
      buf.sortBy { case (item, c, _) => (-c, item) }.toSeq
    }
  }
}
