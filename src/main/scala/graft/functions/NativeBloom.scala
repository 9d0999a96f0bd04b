package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** Bloom-filter sketch over a 64-bit key column, as a native Catalyst
  * aggregate + probe expression (Bloom 1970; bit indexes by the
  * Kirsch–Mitzenmacher 2006 double-hashing construction, "Less
  * hashing, same performance"). The cross-snapshot dedup primitive:
  * build once over the historical index's content hashes (map-only
  * pass, fixed-size mergeable state), broadcast the sketch, and
  * prefilter an arriving batch MAP-SIDE — rows the bloom rejects are
  * DEFINITELY new (no false negatives, the property
  * [[graft.dedup.Dedup.bloomDedupNewVsIndex]] and the spec lean on);
  * only bloom-positive rows pay any join at all.
  *
  * State: one long-array bitset per aggregation buffer — map-side
  * partials are each `numBits/8` bytes and merge by OR, so the shuffle
  * carries one bitset per partition regardless of row count. Sizing is
  * the standard optimum ([[NativeBloom.optimalBits]]): m = −n·ln p /
  * (ln 2)², k = (m/n)·ln 2. Practical bound (documented, not hidden):
  * the finished sketch lives on the driver and broadcasts, so n is
  * bounded by driver/executor memory — n = 10⁸ keys at 1% fp is
  * ~120 MB; beyond ~10⁹ keys shard the index (per-range blooms) or
  * use the candidate-hash pushdown path (Dedup d8) instead.
  */
object NativeBloom {

  /** Optimal bit count for `n` expected items at false-positive rate
    * `p` (rounded up to a multiple of 64, minimum one word). */
  def optimalBits(n: Long, p: Double): Int = {
    require(n > 0 && p > 0 && p < 1, s"need n>0, 0<p<1; got n=$n p=$p")
    val m = math.ceil(-n * math.log(p) / (math.log(2) * math.log(2)))
    val bits = math.min(m, Int.MaxValue.toDouble - 64).toLong
    (((bits + 63) / 64) * 64).toInt.max(64)
  }

  /** Optimal hash count for `n` items in `m` bits (≥ 1). */
  def optimalHashes(n: Long, m: Int): Int =
    math.max(1, math.round(m.toDouble / n * math.log(2)).toInt)

  /** Aggregate: build the bloom over a LONG key column → binary. */
  def bloomBuild(key: Column, numBits: Int, numHashes: Int): Column =
    GraftShims.column(
      BloomBuildAgg(GraftShims.expression(key), numBits, numHashes)
        .toAggregateExpression())

  /** Probe: true iff `key` MAY be in the sketch (false ⇒ definitely
    * absent). The sketch is a driver-side value bound into codegen
    * once, not a per-row column. */
  def bloomContains(key: Column, bloom: Array[Byte]): Column =
    GraftShims.column(BloomContainsExpr(GraftShims.expression(key), bloom))
}

/** Static kernels shared by interpreted eval and codegen. */
object NativeBloomImpl {

  /** splitmix64 finalizer — the second hash for double hashing. */
  def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def set(words: Array[Long], key: Long, numBits: Int, numHashes: Int): Unit = {
    val h1 = mix(key)
    val h2 = mix(key ^ 0x5851f42d4c957f2dL) | 1L
    var i = 0
    while (i < numHashes) {
      val bit = java.lang.Math.floorMod(h1 + i.toLong * h2, numBits.toLong).toInt
      words(bit >>> 6) |= (1L << (bit & 63))
      i += 1
    }
  }

  def contains(words: Array[Long], key: Long, numBits: Int,
      numHashes: Int): Boolean = {
    val h1 = mix(key)
    val h2 = mix(key ^ 0x5851f42d4c957f2dL) | 1L
    var i = 0
    while (i < numHashes) {
      val bit = java.lang.Math.floorMod(h1 + i.toLong * h2, numBits.toLong).toInt
      if ((words(bit >>> 6) & (1L << (bit & 63))) == 0L) return false
      i += 1
    }
    true
  }

  /** Wire format: [int numBits][int numHashes][numBits/64 longs]. */
  def encode(numBits: Int, numHashes: Int, words: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + words.length * 8)
    bb.putInt(numBits).putInt(numHashes)
    var i = 0
    while (i < words.length) { bb.putLong(words(i)); i += 1 }
    bb.array()
  }

  def decode(bytes: Array[Byte]): (Int, Int, Array[Long]) = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val numBits = bb.getInt
    val numHashes = bb.getInt
    val words = new Array[Long]((bytes.length - 8) / 8)
    var i = 0
    while (i < words.length) { words(i) = bb.getLong; i += 1 }
    (numBits, numHashes, words)
  }
}

/** TypedImperativeAggregate building the bitset; merge is word-wise OR
  * (set union — the sketch of a union is the OR of the sketches). */
case class BloomBuildAgg(
    child: Expression,
    numBits: Int,
    numHashes: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] {

  require(numBits >= 64 && numBits % 64 == 0,
    s"numBits must be a positive multiple of 64, got $numBits")
  require(numHashes >= 1, s"numHashes must be >= 1, got $numHashes")

  override def prettyName: String = "graft_bloom_build"
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint key column, got ${child.dataType.sql}")

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](numBits / 64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null)
      NativeBloomImpl.set(buf, v.asInstanceOf[Long], numBits, numHashes)
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) |= other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any =
    NativeBloomImpl.encode(numBits, numHashes, buf)

  override def serialize(buf: Array[Long]): Array[Byte] =
    NativeBloomImpl.encode(numBits, numHashes, buf)

  override def deserialize(bytes: Array[Byte]): Array[Long] =
    NativeBloomImpl.decode(bytes)._3

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomBuildAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomBuildAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BloomBuildAgg =
    copy(child = newChild)
}

/** bigint key → boolean membership against a FIXED sketch: the bitset
  * is decoded once at plan construction and bound into generated code
  * as a reference object — per-row work is numHashes bit probes inside
  * whole-stage codegen, no per-row decode. */
case class BloomContainsExpr(child: Expression, bloom: Array[Byte])
    extends UnaryExpression {

  @transient private lazy val decoded = NativeBloomImpl.decode(bloom)

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_bloom_contains"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint key, got ${child.dataType.sql}")

  override protected def nullSafeEval(input: Any): Any = {
    val (bits, hashes, words) = decoded
    NativeBloomImpl.contains(words, input.asInstanceOf[Long], bits, hashes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wordsRef = ctx.addReferenceObj("bloomWords", decoded._3, "long[]")
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = graft.functions.NativeBloomImpl.contains(
       |  $wordsRef, $c, ${decoded._1}, ${decoded._2});
     """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): BloomContainsExpr =
    copy(child = newChild)

  // Array[Byte] field breaks case-class equality; compare by content
  override def equals(o: Any): Boolean = o match {
    case b: BloomContainsExpr =>
      b.child == child && java.util.Arrays.equals(b.bloom, bloom)
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + java.util.Arrays.hashCode(bloom)
}
