package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitters sketch as a native Catalyst aggregate
  * (Misra & Gries 1982, "Finding repeated elements"; merge rule from
  * Agarwal et al. 2013, "Mergeable Summaries", PODS'12): at most `k`
  * counters per aggregation state, ever — map-side partial aggregation
  * carries k entries per partition, the shuffle carries k entries per
  * partition, the final state is k entries. The guarantee: every item
  * with true frequency > n/(k+1) is present, and each reported count
  * under-counts by at most n/(k+1). This is the one-pass bounded-state
  * answer to "top tokens over 100 TB" — the exact GROUP-BY spelling
  * shuffles one row per DISTINCT item (vocabulary-sized, fine for
  * words, fatal for URLs/ngrams/ids), while this never materializes
  * more than partitions·k rows.
  *
  * When k ≥ the true distinct count no counter is ever evicted and the
  * sketch IS the exact count table — the regime the oracle row pins
  * end to end (the test corpus has 31 distinct tokens; the driver
  * compares against DuckDB's GROUP BY). The approximate regime
  * (k < distinct) is pinned by guarantee-based tests.
  *
  * Result: `array<struct<item: string, cnt: long>>`, sorted
  * (cnt desc, item asc), at most k entries.
  */
case class HeavyHittersAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[String, Array[Long]]]
  with UnaryLike[Expression] {

  require(k >= 1, s"sketch size must be >= 1, got $k")

  override def prettyName: String = "graft_heavy_hitters"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false))), containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.sql}")

  override def createAggregationBuffer(): java.util.HashMap[String, Array[Long]] =
    new java.util.HashMap[String, Array[Long]](k * 2)

  /** Classic MG step: count if tracked or room left; else decrement
    * every counter (evicting zeros) — O(k) only on eviction. */
  override def update(
      buf: java.util.HashMap[String, Array[Long]],
      input: InternalRow): java.util.HashMap[String, Array[Long]] = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.asInstanceOf[UTF8String].toString
      val c = buf.get(item)
      if (c != null) c(0) += 1
      else if (buf.size < k) buf.put(item, Array(1L))
      else {
        val it = buf.values().iterator()
        while (it.hasNext) {
          val o = it.next()
          o(0) -= 1
          if (o(0) == 0) it.remove()
        }
      }
    }
    buf
  }

  /** Mergeable-summaries rule: sum counters, then (if over k) subtract
    * the (k+1)-largest counter from all and drop non-positives — the
    * error bounds add, the state stays ≤ k. */
  override def merge(
      buf: java.util.HashMap[String, Array[Long]],
      other: java.util.HashMap[String, Array[Long]]): java.util.HashMap[String, Array[Long]] = {
    val oit = other.entrySet().iterator()
    while (oit.hasNext) {
      val e = oit.next()
      val c = buf.get(e.getKey)
      if (c != null) c(0) += e.getValue()(0)
      else buf.put(e.getKey, Array(e.getValue()(0)))
    }
    if (buf.size > k) {
      val vals = new Array[Long](buf.size)
      var i = 0
      val vit = buf.values().iterator()
      while (vit.hasNext) { vals(i) = vit.next()(0); i += 1 }
      java.util.Arrays.sort(vals)
      val d = vals(buf.size - k - 1) // (k+1)-th largest
      val it = buf.values().iterator()
      while (it.hasNext) {
        val o = it.next()
        o(0) -= d
        if (o(0) <= 0) it.remove()
      }
    }
    buf
  }

  override def eval(buf: java.util.HashMap[String, Array[Long]]): Any = {
    val entries = new Array[(String, Long)](buf.size)
    var i = 0
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      entries(i) = (e.getKey, e.getValue()(0))
      i += 1
    }
    // tie-break in codepoint (= UTF-8 binary) order, the order the SQL
    // oracle's ORDER BY item and Spark's UTF8String sort use — Java
    // String.compareTo (UTF-16 code units) diverges above the BMP
    java.util.Arrays.sort(entries, new java.util.Comparator[(String, Long)] {
      override def compare(a: (String, Long), b: (String, Long)): Int =
        if (a._2 != b._2) java.lang.Long.compare(b._2, a._2)
        else NativeTextImpl.cpCompare(a._1, b._1)
    })
    new GenericArrayData(entries.map { case (item, cnt) =>
      new GenericInternalRow(
        Array[Any](UTF8String.fromString(item), cnt)): Any
    })
  }

  override def serialize(buf: java.util.HashMap[String, Array[Long]]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val b = e.getKey.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(b.length)
      out.write(b)
      out.writeLong(e.getValue()(0))
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[String, Array[Long]] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val m = new java.util.HashMap[String, Array[Long]](n * 2)
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      m.put(new String(b, java.nio.charset.StandardCharsets.UTF_8),
        Array(in.readLong()))
      i += 1
    }
    m
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHittersAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHittersAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HeavyHittersAgg =
    copy(child = newChild)
}

/** K-minimum-values distinct-count sketch as a native Catalyst
  * aggregate (Bar-Yossef et al. 2002, "Counting distinct elements in a
  * data stream", RANDOM'02; unbiased estimator from Beyer et al. 2007,
  * "On synopses for distinct-value estimation under multiset
  * operations", SIGMOD'07: D̂ = (k−1)/U₍ₖ₎ with U₍ₖ₎ the k-th
  * smallest normalized hash). State is the k smallest DISTINCT hash
  * values ever — map-side partials carry ≤k longs per partition, the
  * shuffle carries ≤k longs, merge is a bounded set-union: the one-pass
  * bounded-state answer to "distinct count over 100 TB" where the
  * exact COUNT(DISTINCT) spelling shuffles one row per distinct value.
  * Unlike HLL (`approx_count_distinct`) the sketch is DETERMINISTIC
  * given the hash column, so the DuckDB oracle replays it value for
  * value (k smallest distinct hashes per group), and it supports
  * set-intersection estimates (Jaccard over two sketches) HLL cannot.
  *
  * Input must be an already-hashed long (the house convention:
  * `conv(substring(md5(x),1,15),16,10)` — 60-bit positive, identical
  * in DuckDB as `CAST(concat('0x', substr(md5(x),1,15)) AS BIGINT)`).
  * Collisions fold identically in both engines. Result: `array<long>`,
  * the ≤k smallest distinct hashes ascending.
  */
case class KmvMinHashesAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {

  require(k >= 2, s"sketch size must be >= 2, got $k")

  override def prettyName: String = "graft_kmv_min_hashes"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a long (pre-hashed) input, got ${child.dataType.sql}")

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def insert(buf: java.util.TreeSet[java.lang.Long], h: Long): Unit =
    if (buf.size < k) { buf.add(h); () }
    else if (h < buf.last()) { if (buf.add(h)) { buf.pollLast(); () } }

  override def update(
      buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) insert(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(
      buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) insert(buf, it.next())
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Any](buf.size)
    var i = 0
    val it = buf.iterator() // TreeSet iterates ascending
    while (it.hasNext) { out(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.size * 8)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val s = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { s.add(bb.getLong()); i += 1 }
    s
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvMinHashesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvMinHashesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvMinHashesAgg =
    copy(child = newChild)
}

/** Exact integer scatter/Gram statistics of a quantized vector column,
  * in ONE pass: row count n, per-component sums s_i, and the upper
  * triangle of G_ij = Σ_rows q_i·q_j. This is the distributed half of
  * PCA: the d×d scatter aggregates map-side in a d(d+1)/2-long buffer
  * (d=64 → 2 080 longs ≈ 17 KB per partition state), the shuffle
  * carries ONE buffer per partition, and the eigen-iteration then runs
  * on the driver over a d×d matrix — config-sized, like the kmeans
  * centroid collect. The naive spelling (posexplode twice + groupBy)
  * multiplies the corpus by d² rows before combining; this never
  * materializes more than partitions·d² longs.
  *
  * Exactness bound: |q_i| ≤ 10⁴ (the repo-wide quantization), so each
  * product ≤ 10⁸ and the long accumulator is exact up to ~9·10¹⁰ rows;
  * beyond that, shard the aggregation and merge in decimal (same
  * escalation note as centroidCosine's Σ S²).
  *
  * Result: struct<n: long, s: array<long>, g: array<long>> with g in
  * row-major upper-triangle order ((i,j), i ≤ j). */
case class GramMatrixAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] {

  override def prettyName: String = "graft_gram_matrix"
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("s", ArrayType(LongType, containsNull = false),
      nullable = false),
    StructField("g", ArrayType(LongType, containsNull = false),
      nullable = false)))
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<long> (quantized vector), got ${t.sql}")
    }

  // buffer layout: [d, n, s_0..s_{d-1}, G_00, G_01, .., G_0{d-1}, G_11, ..]
  // d is fixed by the FIRST vector seen (empty marker: length-0 array)
  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  private def init(d: Int): Array[Long] = {
    val buf = new Array[Long](2 + d + d * (d + 1) / 2)
    buf(0) = d
    buf
  }

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val d = arr.numElements()
    val b = if (buf.isEmpty) init(d) else buf
    require(b(0) == d,
      s"$prettyName: inconsistent vector dims (${b(0)} vs $d)")
    b(1) += 1
    var i = 0
    var gBase = 2 + d
    while (i < d) {
      val qi = arr.getLong(i)
      b(2 + i) += qi
      var j = i
      while (j < d) {
        b(gBase + (j - i)) += qi * arr.getLong(j)
        j += 1
      }
      gBase += d - i
      i += 1
    }
    b
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] =
    if (other.isEmpty) buf
    else if (buf.isEmpty) other.clone()
    else {
      require(buf(0) == other(0),
        s"$prettyName: inconsistent vector dims (${buf(0)} vs ${other(0)})")
      var i = 1
      while (i < buf.length) { buf(i) += other(i); i += 1 }
      buf
    }

  override def eval(buf: Array[Long]): Any = {
    val b = if (buf.isEmpty) init(0) else buf
    val d = b(0).toInt
    new GenericInternalRow(Array[Any](
      b(1),
      new GenericArrayData(java.util.Arrays.copyOfRange(b, 2, 2 + d)),
      new GenericArrayData(
        java.util.Arrays.copyOfRange(b, 2 + d, b.length))))
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.length * 8)
    bb.putInt(buf.length)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) { out(i) = bb.getLong(); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GramMatrixAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GramMatrixAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(
      newChild: Expression): GramMatrixAgg =
    copy(child = newChild)
}

/** Mutable state of the KLL-style mergeable quantile sketch (Karnin,
  * Lang & Liberty 2016, "Optimal quantile approximation in streams",
  * FOCS'16; compactor hierarchy from Manku, Rajagopalan & Lindsay
  * 1998, SIGMOD'98). Level h holds items of weight 2^h; a level past
  * `k` items sorts and promotes every other element (an odd leftover
  * stays — total weight is conserved EXACTLY, so `n` is always the
  * true count). Compaction keeps even/odd positions ALTERNATELY via a
  * deterministic flip — no randomness, so a given merge tree always
  * yields the same sketch (replays converge bit-for-bit) and the
  * classic deterministic-compactor rank bound applies (error from one
  * level-h compaction ≤ 2^h; the empirical bound is pinned by
  * KllSpec across partitionings).
  *
  * EXACT REGIME: while total inserted count ≤ k nothing ever
  * compacts — level 0 IS the data and every quantile is the exact
  * lower discrete quantile (rank max(1, ⌈q·n⌉), the
  * [[graft.operators.Quantiles]] convention), independent of
  * partitioning and merge order. The oracle row pins that regime
  * end to end; the approximate regime is pinned by bound tests. */
final class KllState(val k: Int) extends Serializable {
  var n: Long = 0L
  private[functions] var flip: Boolean = false
  val levels = scala.collection.mutable.ArrayBuffer(
    new scala.collection.mutable.ArrayBuffer[Double]())

  def insert(v: Double): Unit = {
    levels(0) += v
    n += 1L
    compress()
  }

  def mergeIn(o: KllState): Unit = {
    require(o.k == k, s"KLL sketch size mismatch: $k vs ${o.k}")
    var h = 0
    while (h < o.levels.size) {
      if (h >= levels.size)
        levels += new scala.collection.mutable.ArrayBuffer[Double]()
      levels(h) ++= o.levels(h)
      h += 1
    }
    n += o.n
    flip ^= o.flip
    compress()
  }

  private def compress(): Unit = {
    var h = 0
    while (h < levels.size) {
      if (levels(h).size > k) {
        val arr = levels(h).toArray
        java.util.Arrays.sort(arr)
        if (h + 1 >= levels.size)
          levels += new scala.collection.mutable.ArrayBuffer[Double]()
        // an odd count leaves the LARGEST element behind at level h so
        // promoted pairs conserve weight exactly
        val even = arr.length - (arr.length & 1)
        val off = if (flip) 1 else 0
        flip = !flip
        levels(h).clear()
        if (even < arr.length) levels(h) += arr(arr.length - 1)
        var i = off
        while (i < even) {
          levels(h + 1) += arr(i)
          i += 2
        }
      }
      h += 1
    }
  }

  /** Lower discrete quantiles at the given fractions: smallest value
    * whose cumulative weight reaches max(1, ⌈q·n⌉). Null (None) when
    * the sketch is empty. */
  def quantiles(qs: Seq[Double]): Option[Array[Double]] = {
    if (n == 0L) return None
    var m = 0
    levels.foreach(m += _.size)
    val vs = new Array[Double](m)
    val ws = new Array[Long](m)
    var p = 0
    var h = 0
    while (h < levels.size) {
      val w = 1L << h
      val lvl = levels(h)
      var i = 0
      while (i < lvl.size) { vs(p) = lvl(i); ws(p) = w; p += 1; i += 1 }
      h += 1
    }
    // sort (value, weight) pairs by value — index sort over the pair
    val idx = Array.range(0, m).sortBy(vs(_))
    val out = new Array[Double](qs.size)
    var qi = 0
    while (qi < qs.size) {
      val target = math.max(1L, math.ceil(qs(qi) * n).toLong)
      var cum = 0L
      var j = 0
      var found = false
      while (j < m && !found) {
        cum += ws(idx(j))
        if (cum >= target) { out(qi) = vs(idx(j)); found = true }
        j += 1
      }
      if (!found) out(qi) = vs(idx(m - 1)) // cum==n ≥ target always; safety
      qi += 1
    }
    Some(out)
  }

  /** Two-sample Kolmogorov–Smirnov distance against another sketch:
    * max over the union of stored support points of
    * |F_this(v) − F_other(v)|, F the right-continuous weighted CDF
    * (cum/n in IEEE double — the same arithmetic a SQL window
    * spelling produces, so the exact regime hash-compares across
    * engines). EXACT when both sketches are in the exact regime (they
    * hold all their data); compacted, the error is bounded by the sum
    * of the two sketches' rank-error bounds over min(n_a, n_b). None
    * when either side is empty. */
  def ksAgainst(o: KllState): Option[Double] = {
    if (n == 0L || o.n == 0L) return None
    def points(s: KllState): (Array[Double], Array[Long]) = {
      var m = 0
      s.levels.foreach(m += _.size)
      val vs = new Array[Double](m)
      val ws = new Array[Long](m)
      var p = 0
      var h = 0
      while (h < s.levels.size) {
        val w = 1L << h
        val lvl = s.levels(h)
        var i = 0
        while (i < lvl.size) { vs(p) = lvl(i); ws(p) = w; p += 1; i += 1 }
        h += 1
      }
      val idx = Array.range(0, m).sortBy(vs(_))
      (idx.map(vs), idx.map(ws))
    }
    val (av, aw) = points(this)
    val (bv, bw) = points(o)
    val na = n.toDouble
    val nb = o.n.toDouble
    var i = 0
    var j = 0
    var ca = 0L
    var cb = 0L
    var d = 0.0d
    while (i < av.length || j < bv.length) {
      // advance over the smallest remaining value on BOTH sides (ties
      // across sides fold before F is evaluated — the RANGE-frame
      // window convention)
      val v =
        if (j >= bv.length || (i < av.length && av(i) <= bv(j))) av(i)
        else bv(j)
      while (i < av.length && av(i) == v) { ca += aw(i); i += 1 }
      while (j < bv.length && bv(j) == v) { cb += bw(j); j += 1 }
      val gap = math.abs(ca / na - cb / nb)
      if (gap > d) d = gap
    }
    Some(d)
  }

  def serialized: Array[Byte] = {
    var m = 0
    levels.foreach(m += _.size)
    val bb = java.nio.ByteBuffer.allocate(4 + 8 + 1 + 4 +
      levels.size * 4 + m * 8)
    bb.putInt(k)
    bb.putLong(n)
    bb.put(if (flip) 1.toByte else 0.toByte)
    bb.putInt(levels.size)
    levels.foreach { lvl =>
      bb.putInt(lvl.size)
      lvl.foreach(bb.putDouble)
    }
    bb.array()
  }
}

object KllState {
  def deserialize(bytes: Array[Byte]): KllState = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val s = new KllState(bb.getInt())
    s.n = bb.getLong()
    val flip = bb.get() == 1.toByte
    val nLevels = bb.getInt()
    var h = 0
    while (h < nLevels) {
      if (h >= s.levels.size)
        s.levels += new scala.collection.mutable.ArrayBuffer[Double]()
      var c = bb.getInt()
      while (c > 0) { s.levels(h) += bb.getDouble(); c -= 1 }
      h += 1
    }
    s.flip = flip
    s
  }
}

/** KLL quantile sketch aggregate: double column → BINARY serialized
  * [[KllState]]. The missing piece VERDICT r13 named (#5 in "Next
  * round"): a MERGEABLE quantile summary — map-side partials carry
  * O(k·log(n/k)) doubles, the shuffle carries one buffer per
  * partition, and the stored bytes re-merge across micro-batches
  * ([[graft.streaming.Streams.kllMergeBatch]]) — percentile state
  * with NO pre-declared bucket grid, the thing the drift monitor's
  * [[graft.operators.Quantiles.gridQuantiles]] could not give. NULL
  * and NaN inputs are excluded, the [[graft.operators.Quantiles]]
  * convention. */
case class KllSketchAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllState]
  with UnaryLike[Expression] {

  require(k >= 8, s"sketch size must be >= 8, got $k")
  override def prettyName: String = "graft_kll_sketch"
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a double input, got ${child.dataType.sql}")

  override def createAggregationBuffer(): KllState = new KllState(k)
  override def update(buf: KllState, input: InternalRow): KllState = {
    val v = child.eval(input)
    if (v != null) {
      val d = v.asInstanceOf[Double]
      if (!java.lang.Double.isNaN(d)) buf.insert(d)
    }
    buf
  }
  override def merge(buf: KllState, other: KllState): KllState = {
    buf.mergeIn(other)
    buf
  }
  override def eval(buf: KllState): Any = buf.serialized
  override def serialize(buf: KllState): Array[Byte] = buf.serialized
  override def deserialize(bytes: Array[Byte]): KllState =
    KllState.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KllSketchAgg =
    copy(child = newChild)
}

/** Merge aggregate over SERIALIZED sketches: binary column of
  * [[KllState]] bytes → one merged BINARY state. The streaming fold's
  * merge half: stored state ∪ the micro-batch's partial re-aggregate
  * with this, exactly like the KMV union. */
case class KllMergeAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllState]
  with UnaryLike[Expression] {

  require(k >= 8, s"sketch size must be >= 8, got $k")
  override def prettyName: String = "graft_kll_merge"
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary (serialized sketch) input, got " +
        child.dataType.sql)

  override def createAggregationBuffer(): KllState = new KllState(k)
  override def update(buf: KllState, input: InternalRow): KllState = {
    val v = child.eval(input)
    if (v != null) buf.mergeIn(KllState.deserialize(v.asInstanceOf[Array[Byte]]))
    buf
  }
  override def merge(buf: KllState, other: KllState): KllState = {
    buf.mergeIn(other)
    buf
  }
  override def eval(buf: KllState): Any = buf.serialized
  override def serialize(buf: KllState): Array[Byte] = buf.serialized
  override def deserialize(bytes: Array[Byte]): KllState =
    KllState.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KllMergeAgg =
    copy(child = newChild)
}

/** Scalar half of the KLL pair: BINARY serialized [[KllState]] →
  * array<double> of the lower discrete quantiles at the given
  * fractions. Codegen'd (one virtual call); null state or an empty
  * sketch (all-null group) yields null, the `percentile` convention.
  * Runs over group-count-sized frames (aggregate outputs / stored
  * drift state), never the corpus. */
case class KllQuantilesExpr(child: Expression, qs: Seq[Double])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0),
    s"quantile fractions must be in (0, 1], got $qs")
  override def prettyName: String = "graft_kll_quantiles"
  // null for an EMPTY sketch (all-null group), whatever the child's
  // own nullability — the `percentile` convention
  override def nullable: Boolean = true
  override def dataType: DataType =
    ArrayType(DoubleType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary (serialized sketch) input, got " +
        child.dataType.sql)

  /** Called from generated code; null for an empty sketch. */
  def quantilesOf(bytes: Array[Byte]): GenericArrayData =
    KllState.deserialize(bytes).quantiles(qs) match {
      case Some(vs) => new GenericArrayData(vs.map(v => v: Any))
      case None => null
    }

  override protected def nullSafeEval(input: Any): Any =
    quantilesOf(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("kllQuantiles", this,
      "graft.functions.KllQuantilesExpr")
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = $ref.quantilesOf($c);
      ${ev.isNull} = ${ev.value} == null;
    """)
  }
  override protected def withNewChildInternal(
      newChild: Expression): KllQuantilesExpr =
    copy(child = newChild)
}

/** (binary, binary) → double: two-sample KS distance between two
  * serialized [[KllState]] sketches — the GRID-FREE drift score
  * ([[graft.operators.Quantiles.gridQuantiles]]/`ksAgainst` need
  * bucket bounds declared before the stream starts; two sketches
  * need nothing). Codegen'd; null when either sketch is empty. Exact
  * when both sketches are exact-regime (oracle row v_kll_ks);
  * compacted, bounded by the two rank-error bounds. */
case class KllKsExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def prettyName: String = "graft_kll_ks"
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two binary (serialized sketch) inputs, got " +
        s"${left.dataType.sql}, ${right.dataType.sql}")

  /** Called from generated code; null when either sketch is empty. */
  def ks(a: Array[Byte], b: Array[Byte]): Any =
    KllState.deserialize(a).ksAgainst(KllState.deserialize(b)) match {
      case Some(d) => java.lang.Double.valueOf(d)
      case None => null
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ks(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("kllKs", this,
      "graft.functions.KllKsExpr")
    // freshName: a fixed local (`Object r`) would redeclare when two
    // KllKsExpr instances with non-nullable children land in one
    // generated projection (nullSafeExec emits unbraced code there) —
    // janino then fails and the WHOLE projection silently falls back
    // to interpreted
    val r = ctx.freshName("kllKsRes")
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      Object $r = $ref.ks($a, $b);
      if ($r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ((java.lang.Double) $r).doubleValue(); }
    """)
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KllKsExpr =
    copy(left = newLeft, right = newRight)
}

object NativeAgg {
  /** Column wrapper: `heavyHitters(items, k)` aggregates a string
    * column into the ≤k-entry Misra-Gries summary. */
  def heavyHitters(items: Column, k: Int): Column =
    GraftShims.column(
      HeavyHittersAgg(GraftShims.expression(items), k).toAggregateExpression())

  /** Column wrapper: `kmvMinHashes(hash, k)` aggregates a pre-hashed
    * long column into the ≤k smallest distinct hashes, ascending. */
  def kmvMinHashes(hash: Column, k: Int): Column =
    GraftShims.column(
      KmvMinHashesAgg(GraftShims.expression(hash), k).toAggregateExpression())

  /** Column wrapper: `gramMatrix(quantizedVec)` aggregates an
    * array<long> column into (n, component sums, upper-triangle Gram
    * matrix) — the one-pass scatter statistics PCA needs. */
  def gramMatrix(vec: Column): Column =
    GraftShims.column(
      GramMatrixAgg(GraftShims.expression(vec)).toAggregateExpression())

  /** Column wrapper: `kllSketch(x, k)` aggregates a double column into
    * a serialized mergeable KLL sketch (binary).
    *
    * Double-domain contract (VERDICT r14 #5, the `bucketOf`
    * non-numeric-rejection precedent): every caller — vKllQuantiles,
    * [[graft.streaming.Streams.kllMergeBatch]], profileFrame's approx
    * median — casts its input to DOUBLE before sketching. A decimal or
    * 64-bit-integer column whose values differ only beyond the 53-bit
    * double significand (|x| > 2⁵³ ≈ 9.0·10¹⁵, or a decimal with more
    * than ~15–16 significant digits) COLLIDES distinct values onto one
    * double; the sketch then sees them as equal and any returned
    * quantile is the shared double, not one of the original values.
    * Fine for the drift-monitoring role (rank error already dominates
    * one-ulp collisions); use `Quantiles.exactQuantiles` when exact
    * value identity on wide decimals matters. KllSpec pins the
    * boundary. */
  def kllSketch(x: Column, k: Int): Column =
    GraftShims.column(
      KllSketchAgg(GraftShims.expression(x), k).toAggregateExpression())

  /** Column wrapper: `kllMerge(state, k)` merges serialized sketches. */
  def kllMerge(state: Column, k: Int): Column =
    GraftShims.column(
      KllMergeAgg(GraftShims.expression(state), k).toAggregateExpression())

  /** Column wrapper: quantiles out of a serialized sketch column. */
  def kllStateQuantiles(state: Column, qs: Seq[Double]): Column =
    GraftShims.column(KllQuantilesExpr(GraftShims.expression(state), qs))

  /** One-step aggregate: the lower discrete quantiles of a double
    * column at the given fractions through a k-sized mergeable KLL
    * sketch — EXACT while the group's (non-null, non-NaN) count stays
    * ≤ k, rank-error-bounded beyond (KllSpec pins both regimes). */
  def kllQuantiles(x: Column, k: Int, qs: Seq[Double]): Column =
    kllStateQuantiles(kllSketch(x, k), qs)

  /** Column wrapper: two-sample KS distance between two serialized
    * sketch columns (grid-free drift score). */
  def kllKs(a: Column, b: Column): Column =
    GraftShims.column(KllKsExpr(
      GraftShims.expression(a), GraftShims.expression(b)))
}
