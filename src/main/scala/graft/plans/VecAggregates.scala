package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Mutable Gramian accumulator: row-major `d×d` sums plus a presence
  * bit per cell (a cell is "present" once one non-null product has
  * been added — the composed explode form's `filter(_s.isNotNull)`
  * semantics). Ragged inputs grow the matrix; existing sums re-layout
  * to the wider row stride.
  */
final class GramianBuffer(var d: Int, var sums: Array[Double], var seen: Array[Long]) {
  def this() = this(0, Array.emptyDoubleArray, Array.emptyLongArray)

  @inline private def bit(idx: Int): Boolean = (seen(idx >> 6) & (1L << (idx & 63))) != 0
  @inline private def setBit(idx: Int): Unit = seen(idx >> 6) |= (1L << (idx & 63))

  def ensure(newD: Int): Unit = {
    if (newD <= d) return
    // d² doubles per task: past a few thousand dims the buffer is a
    // per-task OOM (and newD*newD overflows Int at 46341) — fail with
    // a diagnosable message instead of a NegativeArraySizeException
    require(newD <= GramianBuffer.MaxDim,
      s"graft_gramian: vector dimension $newD exceeds the supported " +
        s"maximum ${GramianBuffer.MaxDim} (the d×d accumulator would " +
        s"need ${newD.toLong * newD * 8 / (1 << 20)} MiB per task)")
    val ns = new Array[Double](newD * newD)
    val nb = new Array[Long]((newD * newD + 63) >> 6)
    var i = 0
    while (i < d) {
      System.arraycopy(sums, i * d, ns, i * newD, d)
      var j = 0
      while (j < d) {
        if (bit(i * d + j)) nb((i * newD + j) >> 6) |= (1L << ((i * newD + j) & 63))
        j += 1
      }
      i += 1
    }
    d = newD; sums = ns; seen = nb
  }

  /** Accumulate the outer product of one (possibly null-holed) vector. */
  def add(v: ArrayData): Unit = {
    val n = v.numElements()
    if (n == 0) return
    ensure(n)
    var i = 0
    while (i < n) {
      if (!v.isNullAt(i)) {
        val vi = v.getDouble(i)
        val base = i * d
        var j = 0
        while (j < n) {
          if (!v.isNullAt(j)) {
            sums(base + j) += vi * v.getDouble(j)
            setBit(base + j)
          }
          j += 1
        }
      }
      i += 1
    }
  }

  def mergeIn(o: GramianBuffer): Unit = {
    ensure(o.d)
    var i = 0
    while (i < o.d) {
      var j = 0
      while (j < o.d) {
        if ((o.seen((i * o.d + j) >> 6) & (1L << ((i * o.d + j) & 63))) != 0) {
          sums(i * d + j) += o.sums(i * o.d + j)
          setBit(i * d + j)
        }
        j += 1
      }
      i += 1
    }
  }

  /** (i, j, s) rows for every present cell, row-major order. */
  def result(): ArrayData = {
    val out = new java.util.ArrayList[InternalRow](d * d)
    var i = 0
    while (i < d) {
      var j = 0
      while (j < d) {
        if (bit(i * d + j))
          out.add(InternalRow(i, j, sums(i * d + j)))
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

object GramianBuffer {
  /** 8192² doubles = 512 MiB per task — already past any sane local
    * budget, but the point is a CLEAR failure for pathological widths
    * rather than Int overflow at 46341.
    */
  val MaxDim = 8192
}

/** Distributed Gramian (un-normalized covariance) of a vector column:
  * `GramianAgg(v)` sums the outer product `v vᵀ` across rows into one
  * `d²`-bounded accumulator per partition and returns
  * `array<struct<i:int, j:int, s:double>>` — one entry per (i, j)
  * pair that received at least one non-null product.
  *
  * Value-contract with the composed explode form it replaces
  * (`explode(flatten(transform(_c, (xi,i) => transform(_c, (xj,j) =>
  * struct(i, j, xi*xj))))) → groupBy(i,j).agg(sum(p)) →
  * filter(isNotNull)`): the same multiset of non-null products is
  * summed per (i, j) — only the ADDITION ORDER differs (partition
  * accumulation instead of hash-aggregate merge order), which the
  * callers' round-6 of `s / n` absorbs exactly as it already absorbs
  * the Spark-vs-DuckDB order difference. Null elements contribute
  * nothing and never mark presence (a null product vanishes from
  * `sum`); a (i, j) cell whose every product was null is ABSENT from
  * the output, replaying `filter(_s.isNotNull)`; ragged rows grow the
  * matrix exactly as the longer row's indices appear.
  *
  * Scale shape: the per-row cost is `d²` fused multiply-adds into a
  * flat primitive array — no per-pair struct allocation, no `rows×d²`
  * explode through Generate, and the shuffle carries one `d²` partial
  * per map task instead of the hash-aggregate's per-key traffic.
  */
case class GramianAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[GramianBuffer] with UnaryLike[Expression] {

  // no ImplicitCastInputTypes (AbstractDataType is private[sql] in
  // Spark 4): callers must pass array<double>, checked here instead
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_gramian expects array<double>, got ${other.catalogString}")
    }
  override def prettyName: String = "graft_gramian"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("i", IntegerType, nullable = false),
      StructField("j", IntegerType, nullable = false),
      StructField("s", DoubleType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): GramianBuffer = new GramianBuffer()

  override def update(buffer: GramianBuffer, input: InternalRow): GramianBuffer = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[ArrayData])
    buffer
  }

  override def merge(buffer: GramianBuffer, other: GramianBuffer): GramianBuffer = {
    buffer.mergeIn(other)
    buffer
  }

  override def eval(buffer: GramianBuffer): Any = buffer.result()

  override def serialize(buffer: GramianBuffer): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(
      4 + 8 * buffer.sums.length + 8 * buffer.seen.length)
    bb.putInt(buffer.d)
    buffer.sums.foreach(bb.putDouble)
    buffer.seen.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): GramianBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val d = bb.getInt
    val sums = new Array[Double](d * d)
    var i = 0
    while (i < sums.length) { sums(i) = bb.getDouble; i += 1 }
    val seen = new Array[Long]((d * d + 63) >> 6)
    i = 0
    while (i < seen.length) { seen(i) = bb.getLong; i += 1 }
    new GramianBuffer(d, sums, seen)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GramianAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GramianAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): GramianAgg =
    copy(child = newChild)
}

/** Per-index running sums and non-null counts for [[VecMeanAgg]];
  * grows to the longest row seen (an index "exists" once any row's
  * array covers it, elements null or not — posexplode emits a row per
  * index regardless of element nullity).
  */
final class VecMeanBuffer(var d: Int, var sums: Array[Double], var counts: Array[Long]) {
  def this() = this(0, Array.emptyDoubleArray, Array.emptyLongArray)

  def ensure(newD: Int): Unit = {
    if (newD <= d) return
    sums = java.util.Arrays.copyOf(sums, newD)
    counts = java.util.Arrays.copyOf(counts, newD)
    d = newD
  }

  def add(v: ArrayData): Unit = {
    val n = v.numElements()
    if (n == 0) return
    ensure(n)
    var i = 0
    while (i < n) {
      if (!v.isNullAt(i)) { sums(i) += v.getDouble(i); counts(i) += 1L }
      i += 1
    }
  }

  def mergeIn(o: VecMeanBuffer): Unit = {
    ensure(o.d)
    var i = 0
    while (i < o.d) { sums(i) += o.sums(i); counts(i) += o.counts(i); i += 1 }
  }
}

/** Per-index mean of a vector column: `VecMeanAgg(v)` returns
  * `array<double>` of length max-row-length whose element i is the
  * mean of the non-null values at index i (null where every value was
  * null), or NULL when no row contributed a non-empty array.
  *
  * Value-contract with the posexplode form it replaces
  * (`posexplode(v) → groupBy(key, dim).agg(avg(x)) → groupBy(key)
  * .collect_list sorted by dim`): avg is sum-of-non-nulls over
  * count-of-non-nulls, so element i carries the identical quotient up
  * to round-6-absorbed addition order; a dim whose every value is
  * null keeps its (null) slot exactly as avg's null did; a group
  * whose every vector is null/empty evaluates to NULL so the caller
  * can drop it, replaying posexplode's emit-nothing (the key never
  * reached the old aggregation).
  *
  * Scale shape: corpus×d exploded rows through Generate plus a
  * (key, dim)-keyed hash aggregate collapse to one fused per-row
  * vector add and a d-bounded partial per (partition, key) — the
  * shuffle carries keys·d doubles either way, but the map side does
  * corpus vector-adds instead of corpus×d row generations and probes,
  * and one exchange (the re-assembly groupBy) disappears.
  */
case class VecMeanAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VecMeanBuffer] with UnaryLike[Expression] {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_vec_mean expects array<double>, got ${other.catalogString}")
    }
  override def prettyName: String = "graft_vec_mean"
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)

  override def createAggregationBuffer(): VecMeanBuffer = new VecMeanBuffer()

  override def update(buffer: VecMeanBuffer, input: InternalRow): VecMeanBuffer = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[ArrayData])
    buffer
  }

  override def merge(buffer: VecMeanBuffer, other: VecMeanBuffer): VecMeanBuffer = {
    buffer.mergeIn(other)
    buffer
  }

  override def eval(buffer: VecMeanBuffer): Any = {
    if (buffer.d == 0) return null
    val out = new Array[Any](buffer.d)
    var i = 0
    while (i < buffer.d) {
      out(i) =
        if (buffer.counts(i) == 0L) null
        else java.lang.Double.valueOf(buffer.sums(i) / buffer.counts(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buffer: VecMeanBuffer): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 16 * buffer.d)
    bb.putInt(buffer.d)
    buffer.sums.foreach(bb.putDouble)
    buffer.counts.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): VecMeanBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val d = bb.getInt
    val sums = new Array[Double](d)
    var i = 0
    while (i < d) { sums(i) = bb.getDouble; i += 1 }
    val counts = new Array[Long](d)
    i = 0
    while (i < d) { counts(i) = bb.getLong; i += 1 }
    new VecMeanBuffer(d, sums, counts)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VecMeanAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VecMeanAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): VecMeanAgg =
    copy(child = newChild)
}

/** Weighted per-index sum of a vector column:
  * `VecWeightedSumAgg(v, w)` returns `array<double>` of length
  * max-row-length whose element i is `Σ rows w·vᵢ` over the non-null
  * products (null where every product was null — a null weight or a
  * null element contributes nothing), or NULL when no row contributed
  * a non-empty array.
  *
  * Value-contract with the posexplode form it replaces
  * (`select(w, posexplode(v)) → groupBy(dim).agg(sum(w * x))`):
  * identical product multiset per index (null products vanish from
  * `sum` exactly as here), addition order partition-local instead of
  * hash-aggregate order — the callers' round-6 weight updates absorb
  * it. The distributed-GD gradient is the canonical use: corpus
  * vector-FMAs and one (nDims+1)-double partial per partition instead
  * of corpus×dims generated rows through Generate + hash aggregation.
  */
case class VecWeightedSumAgg(
    vec: Expression,
    weight: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VecMeanBuffer]
  with org.apache.spark.sql.catalyst.trees.BinaryLike[Expression] {

  override def left: Expression = vec
  override def right: Expression = weight
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (vec.dataType, weight.dataType) match {
      case (ArrayType(DoubleType, _), DoubleType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_vec_wsum expects (array<double>, double), got $other")
    }
  override def prettyName: String = "graft_vec_wsum"
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)

  override def createAggregationBuffer(): VecMeanBuffer = new VecMeanBuffer()

  override def update(buffer: VecMeanBuffer, input: InternalRow): VecMeanBuffer = {
    val v = vec.eval(input)
    if (v != null) {
      val a = v.asInstanceOf[ArrayData]
      val n = a.numElements()
      if (n > 0) {
        buffer.ensure(n)
        val wv = weight.eval(input)
        if (wv != null) {
          val w = wv.asInstanceOf[Double]
          var i = 0
          while (i < n) {
            if (!a.isNullAt(i)) {
              buffer.sums(i) += w * a.getDouble(i)
              buffer.counts(i) += 1L
            }
            i += 1
          }
        }
      }
    }
    buffer
  }

  override def merge(buffer: VecMeanBuffer, other: VecMeanBuffer): VecMeanBuffer = {
    buffer.mergeIn(other)
    buffer
  }

  override def eval(buffer: VecMeanBuffer): Any = {
    if (buffer.d == 0) return null
    val out = new Array[Any](buffer.d)
    var i = 0
    while (i < buffer.d) {
      out(i) =
        if (buffer.counts(i) == 0L) null
        else java.lang.Double.valueOf(buffer.sums(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buffer: VecMeanBuffer): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 16 * buffer.d)
    bb.putInt(buffer.d)
    buffer.sums.foreach(bb.putDouble)
    buffer.counts.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): VecMeanBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val d = bb.getInt
    val sums = new Array[Double](d)
    var i = 0
    while (i < d) { sums(i) = bb.getDouble; i += 1 }
    val counts = new Array[Long](d)
    i = 0
    while (i < d) { counts(i) = bb.getLong; i += 1 }
    new VecMeanBuffer(d, sums, counts)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VecWeightedSumAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VecWeightedSumAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecWeightedSumAgg =
    copy(vec = newLeft, weight = newRight)
}
