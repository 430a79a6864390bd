package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Random-projection LSH bucket ids for a cosine embedding, one per hash
  * table: `bucket[t] = floor(dot(normalize(e), w_t) / bucketLength)`.
  *
  * The projection vectors are NOT random state: entry `w[t][i]` derives
  * from SHA-256("rp:t:i") (first 4 bytes, big-endian, mapped to [-1, 1)).
  * That makes the bucketing a pure function of the input — reproducible
  * run-to-run, across engines, and in the DuckDB oracle, which recomputes
  * the same weights in SQL. Every arithmetic step (norm, division, dot,
  * floor) is sequential IEEE f64, so bucket ids are bit-identical across
  * engines.
  *
  * Zero vectors (undefined direction) get the sentinel bucket Long.MinValue
  * in every table; callers exclude the sentinel from candidate joins.
  *
  * Complements the MLlib BucketedRandomProjectionLSH path: same candidate
  * geometry, but codegen'd map-only hashing, plain (table, long) join keys
  * instead of ML Vector keys, and oracle-checkable candidates.
  */
case class RandProjBuckets(child: Expression, numTables: Int,
                           bucketLength: Double) extends UnaryExpression {
  require(numTables > 0 && numTables <= 64, s"numTables out of range: $numTables")
  require(bucketLength > 0, s"bucketLength must be positive: $bucketLength")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"rand_proj_buckets requires array<float|double>, got ${child.dataType.sql}")
  }

  // resolved lazily: child.dataType is only legal after analysis
  private def elemType = child.dataType match {
    case ArrayType(et, _) => et
    case _ => FloatType
  }

  override def nullSafeEval(input: Any): Any =
    RandProjBuckets.compute(input.asInstanceOf[ArrayData],
      elemType == DoubleType, numTables, bucketLength)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val isDouble = elemType == DoubleType
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.RandProjBuckets.compute($c, $isDouble, $numTables, $bucketLength)")
  }

  override def prettyName: String = "rand_proj_buckets"

  override protected def withNewChildInternal(newChild: Expression): RandProjBuckets =
    copy(child = newChild)
}

object RandProjBuckets {
  val ZeroVectorBucket: Long = Long.MinValue

  // weight matrices are pure functions of (tables, dim) — cache per executor
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Array[Double]]]()

  /** w[t][i] = u/2^32*2-1, u = first 4 big-endian bytes of sha256("rp:t:i").
    * All steps exact in f64 (u/2^32 is a power-of-two division), so the SQL
    * twin produces bit-identical weights. */
  def weights(numTables: Int, dim: Int): Array[Array[Double]] =
    cache.computeIfAbsent((numTables, dim), { _ =>
      val md = MessageDigest.getInstance("SHA-256")
      Array.tabulate(numTables, dim) { (t, i) =>
        md.reset()
        val d = md.digest(s"rp:$t:$i".getBytes("UTF-8"))
        val u = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
          ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
        u / 4294967296.0 * 2.0 - 1.0
      }
    })

  def compute(arr: ArrayData, isDouble: Boolean, numTables: Int,
              bucketLength: Double): ArrayData = {
    val n = arr.numElements()
    val v = new Array[Double](n)
    var i = 0
    var sumSq = 0.0
    while (i < n) {
      v(i) = if (isDouble) arr.getDouble(i) else arr.getFloat(i).toDouble
      sumSq += v(i) * v(i)
      i += 1
    }
    val out = new Array[Any](numTables)
    // non-finite (NaN/Inf component) would otherwise floor to bucket 0 in
    // every table and near-cross-join with half the corpus — sentinel it
    // like the zero vector (undefined direction either way)
    if (sumSq == 0.0 || !java.lang.Double.isFinite(sumSq)) {
      java.util.Arrays.fill(out.asInstanceOf[Array[AnyRef]],
        Long.box(ZeroVectorBucket))
      return new GenericArrayData(out)
    }
    val norm = math.sqrt(sumSq)
    val w = weights(numTables, n)
    var t = 0
    while (t < numTables) {
      val wt = w(t)
      var dot = 0.0
      var j = 0
      while (j < n) {
        dot += (v(j) / norm) * wt(j)
        j += 1
      }
      out(t) = math.floor(dot / bucketLength).toLong
      t += 1
    }
    new GenericArrayData(out)
  }
}
