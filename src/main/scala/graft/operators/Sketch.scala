package graft.operators

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Count-Min sketch heavy hitters — the streaming-sketch shape of
  * vocabulary statistics at 10^12-document scale.
  *
  * Exact heavy-hitter counting (`q_vocab_topk`) shuffles one row per
  * DISTINCT word: at web scale the long vocabulary tail (typos, ids, urls)
  * makes that shuffle vocabulary-sized. The sketch path never shuffles the
  * vocabulary at all:
  *
  *   1. ONE pass builds a d×w Count-Min sketch (Cormode & Muthukrishnan
  *      2005) as a custom Catalyst [[TypedImperativeAggregate]]: each
  *      partition accumulates a flat `Array[Long](d*w)` buffer (map-side
  *      partial aggregation — the ObjectHashAggregate partial/final split
  *      Spark gives every declarative aggregate), and the exchange carries
  *      only the d·w longs per partition, NEVER per-word rows.
  *   2. The collected sketch (d·w longs — bytes, not gigabytes) returns to
  *      the plan as a LITERAL array; a second pass probes it per token with
  *      pure built-in expressions (`least(element_at…)`) and keeps only
  *      tokens whose estimate clears the threshold. CMS error is strictly
  *      one-sided (estimate ≥ true count), so no true heavy hitter is ever
  *      lost; the final `distinct` shuffles survivors only — a handful of
  *      rows, not the vocabulary.
  *
  * Bucket hashing is md5-based — deliberately: the exact same bucket falls
  * out of JVM MessageDigest (aggregate update), Spark SQL
  * `conv(substr(md5(…),1,8),16,10)` (probe side), and DuckDB's nibble-sum
  * recipe (oracle), so `q_heavy_hitters` is bit-exact cross-engine. A
  * production deployment would swap in xxHash; the sketch shape (and the
  * plan) are identical.
  */
object Sketch {

  /** Sketch geometry: depth 3 (error probability ≤ exp(-3) per query),
    * width 64 (ε = e/64 ≈ 4.2% of the stream length at sf-test scale; at
    * 100 TB you widen w — the aggregate is parameterized).
    */
  val cmsDepth = 3
  val cmsWidth = 64

  /** Bucket of word `w` in sketch row `r`: first 4 bytes of
    * md5("r:w") as an unsigned 32-bit value, mod width. Must stay in
    * lock-step with [[bucketSql]] and the DuckDB oracle.
    */
  private val mdLocal = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  def bucket(r: Int, w: String, width: Int): Int = {
    val md = mdLocal.get()
    md.reset()
    val d = md.digest(s"$r:$w".getBytes(StandardCharsets.UTF_8))
    val u = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    (u % width).toInt
  }

  /** The same bucket as a Spark SQL expression over column `col`. */
  def bucketSql(r: Int, col: String, width: Int): String =
    s"CAST(conv(substr(md5(concat('$r:', $col)), 1, 8), 16, 10) AS BIGINT) % $width"

  /** The same bucket as a DuckDB expression (no conv(); the proven
    * nibble-positional-sum idiom from the simhash/mix-sample oracles).
    */
  def bucketDuck(r: Int, col: String, width: Int): String = {
    val terms = (1 to 8)
      .map(j => s"(strpos('0123456789abcdef', substr(md5('$r:' || $col), $j, 1)) - 1) * ${1L << (4 * (8 - j))}")
      .mkString(" + ")
    s"($terms) % $width"
  }

  /** Register the aggregate so `expr("cms_sketch(w)")` / SQL resolve it. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("cms_sketch"),
      new ExpressionInfo("graft.operators.Sketch", "cms_sketch"),
      (args: Seq[Expression]) => CountMinAgg(args.head, cmsDepth, cmsWidth))

  /** Heavy hitters over a single string column `w`: all words whose CMS
    * estimate is ≥ `minCount`, with the estimate. Superset semantics by
    * construction (one-sided error); with the planted test corpora the
    * collision overestimate is far below the threshold gap, so the output
    * EQUALS the exact heavy-hitter set and the DuckDB oracle replays the
    * sketch bit-for-bit.
    */
  def heavyHitters(words: DataFrame, minCount: Long): DataFrame =
    probe(words, sketchOf(words), minCount)

  /** Heavy hitters with a self-calibrating threshold: ≥ 1/denom of the
    * stream. The stream length is the sum of any one sketch row (every
    * token increments exactly one bucket per row), so NO extra count job —
    * the sketch pass pays for both the estimates and the threshold.
    */
  def heavyHittersFrac(words: DataFrame, denom: Long): DataFrame = {
    val sk = sketchOf(words)
    val n = sk.take(cmsWidth).sum
    probe(words, sk, math.max(1L, n / denom))
  }

  /** Pass 1: build the sketch (one partial-agged job; d·w longs to the
    * driver — bytes, regardless of corpus size).
    */
  def sketchOf(words: DataFrame): Array[Long] = {
    register(words.sparkSession)
    words.agg(expr("cms_sketch(w)").as("sk")).head().getSeq[Long](0).toArray
  }

  /** Pass 2: probe the literal sketch per token with built-in expressions
    * only, keep survivors, distinct (shuffles survivors, not the vocab).
    */
  private def probe(words: DataFrame, sk: Array[Long], minCount: Long): DataFrame = {
    val skCol = lit(sk)
    val est = (0 until cmsDepth)
      .map(r => element_at(skCol, (expr(bucketSql(r, "w", cmsWidth)) + lit(r * cmsWidth + 1)).cast("int")))
      .reduce((a, b) => least(a, b))
    words
      .withColumn("est", est)
      .where(col("est") >= lit(minCount))
      .distinct()
      .select(col("w"), col("est").cast("long").as("est"))
  }
}

/** Count-Min sketch as a typed imperative aggregate: buffer = flat
  * Array[Long](depth*width), update = +1 in one bucket per row, merge =
  * element-wise sum — associative/commutative, so Spark's partial/final
  * aggregation split (and AQE re-planning) is free to place it anywhere.
  */
case class CountMinAgg(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val w = v.asInstanceOf[UTF8String].toString
      var r = 0
      while (r < depth) {
        buf(r * width + Sketch.bucket(r, w, width)) += 1L
        r += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = ArrayData.toArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CountMinAgg =
    copy(child = newChild)
  override def prettyName: String = "cms_sketch"
}
