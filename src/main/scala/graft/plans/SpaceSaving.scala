package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * SpaceSaving heavy-hitters sketch (Metwally, Agrawal, El Abbadi, "Efficient
 * Computation of Frequent and Top-k Elements in Data Streams", ICDT 2005) as
 * a native Catalyst [[TypedImperativeAggregate]] — the partial/merge/final
 * contract means Spark runs it map-side per partition and merges fixed-size
 * sketches at the exchange, so finding heavy keys over 100 TB shuffles
 * O(partitions × capacity) bytes instead of one row per distinct key
 * (contrast `groupBy(key).count()`, whose shuffle is ∝ distinct keys).
 *
 * Guarantees (single stream and after merges, "Mergeable Summaries",
 * Agarwal et al., PODS 2012): for every item,
 * `count_min <= true_count <= count_max`, and any item with
 * `true_count > N / capacity` is retained in the sketch.
 *
 * Output: `array<struct<item, count_min, count_max>>` sorted by count_max
 * descending, item ascending (deterministic for equal bounds).
 *
 * SQL: `space_saving_topk(expr, capacity)` via [[GraftFunctions.register]] /
 * [[GraftExtensions]].
 */
case class SpaceSavingTopK(
    child: Expression,
    capacityExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SpaceSavingSketch] {

  private lazy val capacity: Int = capacityExpr.eval(InternalRow.empty) match {
    case i: Int => i
    case l: Long => l.toInt
    case other => throw new IllegalArgumentException(
      s"space_saving_topk capacity must be a constant int, got $other")
  }

  override def children: Seq[Expression] = Seq(child, capacityExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType),
    StructField("count_min", LongType),
    StructField("count_max", LongType))))
  override def prettyName: String = "space_saving_topk"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (child.dataType != StringType)
      TypeCheckFailure(s"space_saving_topk expects a string item, got ${child.dataType}")
    else if (!capacityExpr.foldable || capacityExpr.dataType != IntegerType)
      TypeCheckFailure("space_saving_topk capacity must be a constant int")
    else TypeCheckSuccess
  }

  override def createAggregationBuffer(): SpaceSavingSketch =
    new SpaceSavingSketch(capacity)

  override def update(buf: SpaceSavingSketch, input: InternalRow): SpaceSavingSketch = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[UTF8String].toString, 1L)
    buf
  }

  override def merge(buf: SpaceSavingSketch, other: SpaceSavingSketch): SpaceSavingSketch = {
    buf.mergeWith(other)
    buf
  }

  override def eval(buf: SpaceSavingSketch): Any = {
    val rows = buf.entries
      .map { case (item, c, e) => (item, c - e, c) } // (item, min, max)
      .sortBy { case (item, _, mx) => (-mx, item) }
      .map { case (item, mn, mx) =>
        InternalRow(UTF8String.fromString(item), mn, mx) }
    new GenericArrayData(rows.toArray[Any]): ArrayData
  }

  override def serialize(buf: SpaceSavingSketch): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    val es = buf.entries
    out.writeInt(buf.capacity)
    out.writeInt(es.length)
    es.foreach { case (item, c, e) =>
      // length-prefixed UTF-8, not writeUTF: writeUTF throws
      // UTFDataFormatException past 65535 encoded bytes, and a single long
      // item would fail the whole aggregation at partial-serialize time
      val bytes = item.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(bytes.length); out.write(bytes)
      out.writeLong(c); out.writeLong(e)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): SpaceSavingSketch = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val sk = new SpaceSavingSketch(in.readInt())
    var n = in.readInt()
    while (n > 0) {
      val len = in.readInt()
      val bytes = new Array[Byte](len)
      in.readFully(bytes)
      val item = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
      sk.restore(item, in.readLong(), in.readLong())
      n -= 1
    }
    sk
  }

  override def withNewMutableAggBufferOffset(n: Int): SpaceSavingTopK =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): SpaceSavingTopK =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), capacityExpr = newChildren(1))
}

/**
 * KMV k-minimum-values buffer as a native Catalyst
 * [[TypedImperativeAggregate]]: the k smallest DISTINCT int64 values of the
 * child column (callers feed it a uniform hash — see
 * [[graft.operators.Sketches.kmvSketch]]). The partial/merge/final contract
 * makes the distinct-count sketch run map-side with O(k) state per
 * partition/window — the streaming path's state-store buffer is k longs no
 * matter how many distinct keys flow through (StreamingKmv), and the batch
 * path shuffles O(partitions × k) instead of one row per distinct key.
 * Exact by construction: the k-min SET is associative/commutative under
 * merge, so batch/stream/any-partitioning all yield the identical array
 * (the law SketchesSpec pins).
 *
 * Output: `array<long>` sorted ascending (h_(1) … h_(k)).
 *
 * SQL: `kmv_kmin(expr, k)` via [[GraftFunctions.register]] /
 * [[GraftExtensions]].
 */
case class KmvKMin(
    child: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvBuffer] {

  private lazy val k: Int = kExpr.eval(InternalRow.empty) match {
    case i: Int => i
    case l: Long => l.toInt
    case other => throw new IllegalArgumentException(
      s"kmv_kmin k must be a constant int, got $other")
  }

  override def children: Seq[Expression] = Seq(child, kExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "kmv_kmin"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (child.dataType != LongType)
      TypeCheckFailure(s"kmv_kmin expects an int64 hash, got ${child.dataType}")
    else if (!kExpr.foldable || kExpr.dataType != IntegerType)
      TypeCheckFailure("kmv_kmin k must be a constant int")
    else {
      // k < 1 would build a KmvBuffer whose add() calls set.last on an
      // empty TreeSet — reject at analysis time, not execution time
      val kv = kExpr.eval(InternalRow.empty)
      if (kv == null || kv.asInstanceOf[Int] < 1)
        TypeCheckFailure(s"kmv_kmin k must be >= 1, got $kv")
      else TypeCheckSuccess
    }
  }

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  override def update(buf: KmvBuffer, input: InternalRow): KmvBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: KmvBuffer, other: KmvBuffer): KmvBuffer = {
    buf.mergeWith(other)
    buf
  }

  override def eval(buf: KmvBuffer): Any =
    new GenericArrayData(buf.values.toArray[Any]): ArrayData

  override def serialize(buf: KmvBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    val vs = buf.values
    out.writeInt(buf.k)
    out.writeInt(vs.length)
    vs.foreach(out.writeLong)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): KmvBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val b = new KmvBuffer(in.readInt())
    var n = in.readInt()
    while (n > 0) { b.add(in.readLong()); n -= 1 }
    b
  }

  override def withNewMutableAggBufferOffset(n: Int): KmvKMin =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): KmvKMin =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), kExpr = newChildren(1))
}

/**
 * Count-min grid (Cormode & Muthukrishnan 2005) as a native Catalyst
 * [[TypedImperativeAggregate]] — the streaming-frequency member of the
 * sketch family ([[SpaceSavingTopK]] = heavy hitters, [[KmvKMin]] =
 * distinct count, this = point frequency). The buffer is the DENSE
 * `depth`×`width` int64 cell grid (row-major), updated in O(depth) per
 * row and merged CELL-WISE (the grid is additive), so Structured
 * Streaming's aggregation state store carries `depth·width` longs per
 * window regardless of key cardinality, and micro-batch partials merge
 * into the stored grid exactly as a batch build over the union — the
 * same associativity law SketchesSpec pins for [[KmvKMin]].
 *
 * The row hashes are EXACTLY [[graft.operators.Sketches]]' cmsCol
 * arithmetic (((key pmod M)·a_r + b_r) pmod M mod width, every
 * intermediate exact int64, floorMod for negative keys), so point
 * estimates `min_r grid[r·width + h_r(key)]` replay verbatim in DuckDB
 * SQL — never undercounting, over by > 2N/width with prob ≤ 2^-depth.
 *
 * Output: `array<long>` of length depth·width, row-major; absent cells
 * are genuine zeros (dense), so `element_at(grid, r·width + c + 1)` is
 * the estimate probe with no COALESCE needed.
 *
 * SQL: `cms_grid(expr, depth, width)` via [[GraftFunctions.register]] /
 * [[GraftExtensions]].
 */
case class CmsGrid(
    child: Expression,
    depthExpr: Expression,
    widthExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  private lazy val depth: Int =
    depthExpr.eval(InternalRow.empty).asInstanceOf[Int]
  private lazy val width: Int =
    widthExpr.eval(InternalRow.empty).asInstanceOf[Int]

  override def children: Seq[Expression] = Seq(child, depthExpr, widthExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "cms_grid"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (child.dataType != LongType)
      TypeCheckFailure(s"cms_grid expects an int64 key, got ${child.dataType}")
    else if (!depthExpr.foldable || depthExpr.dataType != IntegerType ||
             !widthExpr.foldable || widthExpr.dataType != IntegerType)
      TypeCheckFailure("cms_grid depth and width must be constant ints")
    else {
      val d = depthExpr.eval(InternalRow.empty)
      val w = widthExpr.eval(InternalRow.empty)
      if (d == null || w == null)
        TypeCheckFailure("cms_grid depth and width must be non-null")
      else {
        val di = d.asInstanceOf[Int]; val wi = w.asInstanceOf[Int]
        if (di < 1 || di > CmsGrid.A.length)
          TypeCheckFailure(s"cms_grid depth must be in [1, ${CmsGrid.A.length}], got $di")
        else if (wi < 2) TypeCheckFailure(s"cms_grid width must be >= 2, got $wi")
        else if (di.toLong * wi > (1 << 20))
          // the grid IS the per-group state — bound it explicitly
          TypeCheckFailure(s"cms_grid depth*width must be <= 2^20, got ${di.toLong * wi}")
        else TypeCheckSuccess
      }
    }
  }

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val k = v.asInstanceOf[Long]
      var r = 0
      while (r < depth) {
        buf(r * width + CmsGrid.cell(k, r, width)) += 1L
        r += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any =
    new GenericArrayData(buf.map(x => x: Any)): ArrayData

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.length)
    buf.foreach(out.writeLong)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val b = new Array[Long](n)
    var i = 0
    while (i < n) { b(i) = in.readLong(); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(n: Int): CmsGrid =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): CmsGrid =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), depthExpr = newChildren(1),
      widthExpr = newChildren(2))
}

object CmsGrid {
  /** Mirrors [[graft.operators.Sketches]]' CmsMod/CmsA/CmsB — the single
    * hash family both the batch cell tables and this aggregate use, so
    * grids and cell tables built either way probe identically. */
  val M: Long = 1000000007L
  val A: Array[Long] = Array(31L, 131L, 1031L, 8191L, 127L, 2053L, 257L, 4099L)
  val B: Array[Long] = Array(17L, 29L, 101L, 3L, 211L, 53L, 401L, 7L)

  /** h_r(key) ∈ [0, width): floorMod ≡ SQL pmod on every reduction. */
  def cell(key: Long, r: Int, width: Int): Int =
    (java.lang.Math.floorMod(
      java.lang.Math.floorMod(key, M) * A(r) + B(r), M) % width).toInt
}

/**
 * `bloom_agg(key, mBits, numHashes)` over an int64 OR string key column
 * (strings — URLs, doc ids — are the common LLM-pipeline key and stream
 * without a pre-hash; both forms hash `md5(cast(key as string))`): the dense
 * m/62-word bloom filter AS an aggregation buffer — set-bits on update,
 * word-wise OR on merge — so a bloom filter can live per GROUP (and, as
 * streaming state, per WINDOW: the membership cell of the streaming
 * sketch matrix next to SpaceSaving / kmv_kmin / cms_grid / histogram).
 * State is mBits/62 longs per group regardless of key cardinality; the
 * hash family is exactly [[graft.operators.Bloom]]'s double-hashed md5
 * (JVM twin pinned value-identical in BloomSpec), so drained word arrays
 * probe with the same [[graft.operators.Bloom.containsColumn]] predicate
 * and replay bit-for-bit in DuckDB. Eval emits the dense array<long>.
 */
case class BloomWordsAgg(
    child: Expression,
    mBitsExpr: Expression,
    numHashesExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  private lazy val mBits: Int =
    mBitsExpr.eval(InternalRow.empty).asInstanceOf[Int]
  private lazy val numHashes: Int =
    numHashesExpr.eval(InternalRow.empty).asInstanceOf[Int]

  override def children: Seq[Expression] = Seq(child, mBitsExpr, numHashesExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bloom_agg"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (child.dataType != LongType && child.dataType != StringType)
      TypeCheckFailure(s"bloom_agg expects an int64 or string key, got ${child.dataType}")
    else if (!mBitsExpr.foldable || mBitsExpr.dataType != IntegerType ||
             !numHashesExpr.foldable || numHashesExpr.dataType != IntegerType)
      TypeCheckFailure("bloom_agg mBits and numHashes must be constant ints")
    else {
      val m = mBitsExpr.eval(InternalRow.empty)
      val k = numHashesExpr.eval(InternalRow.empty)
      if (m == null || k == null)
        TypeCheckFailure("bloom_agg mBits and numHashes must be non-null")
      else {
        val mi = m.asInstanceOf[Int]; val ki = k.asInstanceOf[Int]
        if (mi < 62 || mi % 62 != 0)
          TypeCheckFailure(s"bloom_agg mBits must be a positive multiple of 62, got $mi")
        else if (mi > (1 << 26))
          // the word array IS the per-group state — bound it explicitly
          TypeCheckFailure(s"bloom_agg mBits must be <= 2^26, got $mi")
        else if (ki < 1 || ki > 8)
          TypeCheckFailure(s"bloom_agg numHashes must be in [1, 8], got $ki")
        else TypeCheckSuccess
      }
    }
  }

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](mBits / 62)

  private lazy val keyIsString: Boolean = child.dataType == StringType

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      // the exact byte stream Spark's md5(cast(key as string)) digests:
      // a string key's raw UTF-8 bytes, an int64 key's decimal string
      val bits =
        if (keyIsString)
          graft.operators.Bloom.bitPositionsJvm(
            v.asInstanceOf[UTF8String].getBytes, mBits, numHashes)
        else
          graft.operators.Bloom.bitPositionsJvm(
            v.asInstanceOf[Long], mBits, numHashes)
      var i = 0
      while (i < bits.length) {
        buf(bits(i) / 62) |= 1L << (bits(i) % 62)
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) |= other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any =
    new GenericArrayData(buf.map(x => x: Any)): ArrayData

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.length)
    buf.foreach(out.writeLong)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val b = new Array[Long](n)
    var i = 0
    while (i < n) { b(i) = in.readLong(); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(n: Int): BloomWordsAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): BloomWordsAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), mBitsExpr = newChildren(1),
      numHashesExpr = newChildren(2))
}

/**
 * `moment_grid(e, dim)` over rows carrying a length-`dim` array<long> of
 * 1e-6-unit quantized values: ONE aggregation whose buffer IS the exact
 * moment table — `[n, Σe_i (d cells), Σe_i·e_j (upper triangle,
 * d(d+1)/2 cells)]` as int64 — replacing [[graft.operators.Pca]]'s
 * N·d² posexplode² + hash aggregate with a tight per-row triple loop
 * (and HALF the multiplies: the pair matrix is symmetric, so only j ≥ i
 * is accumulated; eval mirrors). Identical exact values in any
 * partitioning (int64 addition commutes), so the derived moments are
 * byte-identical to the explode formulation.
 *
 * This is the LONG FAST PATH only: callers must enforce the
 * maxAbs/pairSafe regime ([[graft.operators.Pca.moments]] does, with a
 * decimal fallback) — per-term products and corpus sums must stay clear
 * of Long.MaxValue. Buffer is 1 + d + d(d+1)/2 longs (~17 KB at d=64),
 * shuffled once per partition — the map-side-combine shape with none of
 * the exploded-row traffic. Rows that are null or of the wrong arity are
 * ignored (the caller's clean filter owns that contract).
 *
 * Eval emits the FULL dense table as array<long>:
 * `[n, mean sums (d), pair sums row-major (d²)]`.
 */
case class MomentGrid(
    child: Expression,
    dimExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  private lazy val dim: Int =
    dimExpr.eval(InternalRow.empty).asInstanceOf[Int]

  override def children: Seq[Expression] = Seq(child, dimExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "moment_grid"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    child.dataType match {
      case ArrayType(LongType, _) =>
        if (!dimExpr.foldable || dimExpr.dataType != IntegerType)
          TypeCheckFailure("moment_grid dim must be a constant int")
        else {
          val d = dimExpr.eval(InternalRow.empty)
          if (d == null) TypeCheckFailure("moment_grid dim must be non-null")
          else {
            val di = d.asInstanceOf[Int]
            if (di < 1 || di > 1024)
              // the buffer is the per-group state — bound it explicitly
              TypeCheckFailure(s"moment_grid dim must be in [1, 1024], got $di")
            else TypeCheckSuccess
          }
        }
      case t => TypeCheckFailure(s"moment_grid expects array<bigint>, got $t")
    }
  }

  // buffer layout: [0] = n, [1..d] = mean sums, then the upper triangle
  // row-major: (i, j ≥ i) at 1 + d + i*d - i*(i-1)/2 + (j - i)
  private def triBase(i: Int): Int = 1 + dim + i * dim - i * (i - 1) / 2

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](1 + dim + dim * (dim + 1) / 2)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      if (arr.numElements() == dim) {
        buf(0) += 1L
        val e = new Array[Long](dim)
        var i = 0
        while (i < dim) { e(i) = arr.getLong(i); buf(1 + i) += e(i); i += 1 }
        i = 0
        while (i < dim) {
          val ei = e(i)
          val base = triBase(i) - i
          var j = i
          while (j < dim) { buf(base + j) += ei * e(j); j += 1 }
          i += 1
        }
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = {
    val out = new Array[Any](1 + dim + dim * dim)
    out(0) = buf(0)
    var i = 0
    while (i < dim) { out(1 + i) = buf(1 + i); i += 1 }
    i = 0
    while (i < dim) {
      var j = 0
      while (j < dim) {
        val (a, b) = if (i <= j) (i, j) else (j, i)
        out(1 + dim + i * dim + j) = buf(triBase(a) - a + b)
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out): ArrayData
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.length)
    buf.foreach(out.writeLong)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val b = new Array[Long](n)
    var i = 0
    while (i < n) { b(i) = in.readLong(); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(n: Int): MomentGrid =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): MomentGrid =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), dimExpr = newChildren(1))
}

/** k smallest distinct longs; O(log k) insert, no-op once a value is
  * present or above the current k-th minimum on a full buffer. */
final class KmvBuffer(val k: Int) {
  private val set = mutable.TreeSet.empty[Long]

  def values: Seq[Long] = set.toSeq // TreeSet iterates ascending

  def add(h: Long): Unit =
    if (set.size < k) { set.add(h); () }
    else if (h < set.last && set.add(h)) { set.remove(set.last); () }

  def mergeWith(other: KmvBuffer): Unit = other.values.foreach(add)
}

/**
 * Stream-summary state: item → (count upper bound, error). `byCount` mirrors
 * the map ordered by (count, item) so eviction of the minimum is O(log k);
 * per-row cost is O(log k) worst case, O(1) amortized on hits.
 */
final class SpaceSavingSketch(val capacity: Int) {
  private val counts = mutable.HashMap.empty[String, (Long, Long)]
  private val byCount = mutable.TreeSet.empty[(Long, String)]

  def entries: Seq[(String, Long, Long)] =
    counts.iterator.map { case (i, (c, e)) => (i, c, e) }.toSeq

  private def minCount: Long = if (byCount.isEmpty) 0L else byCount.head._1

  /** Raw re-insertion during deserialize (no eviction logic). */
  def restore(item: String, c: Long, e: Long): Unit = {
    counts.put(item, (c, e))
    byCount.add((c, item))
  }

  def add(item: String, inc: Long): Unit = counts.get(item) match {
    case Some((c, e)) =>
      byCount.remove((c, item))
      counts.put(item, (c + inc, e))
      byCount.add((c + inc, item))
    case None =>
      if (counts.size < capacity) {
        counts.put(item, (inc, 0L))
        byCount.add((inc, item))
      } else {
        // classic replacement: the new item inherits the evicted minimum as
        // its error (true count of the newcomer is at most min + inc)
        val (mc, mi) = byCount.head
        byCount.remove((mc, mi))
        counts.remove(mi)
        counts.put(item, (mc + inc, mc))
        byCount.add((mc + inc, item))
      }
  }

  /**
   * Mergeable-summaries combine: an item absent from one side gets that
   * side's minimum count as both count and error contribution (its true
   * count there is at most that minimum); then trim back to capacity by
   * evicting the smallest counts. Bounds and the N/capacity retention
   * guarantee survive the merge.
   */
  def mergeWith(other: SpaceSavingSketch): Unit = {
    val thisFullMin = if (counts.size >= capacity) minCount else 0L
    val otherFullMin = if (other.counts.size >= other.capacity) other.minCount else 0L
    val merged = mutable.HashMap.empty[String, (Long, Long)]
    counts.foreach { case (i, (c, e)) =>
      other.counts.get(i) match {
        case Some((oc, oe)) => merged.put(i, (c + oc, e + oe))
        case None => merged.put(i, (c + otherFullMin, e + otherFullMin))
      }
    }
    other.counts.foreach { case (i, (oc, oe)) =>
      if (!counts.contains(i)) merged.put(i, (oc + thisFullMin, oe + thisFullMin))
    }
    counts.clear(); byCount.clear()
    merged.toSeq
      .sortBy { case (i, (c, _)) => (-c, i) }
      .take(capacity)
      .foreach { case (i, (c, e)) => counts.put(i, (c, e)); byCount.add((c, i)) }
  }
}
