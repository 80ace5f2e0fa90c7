package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: all `nb` sign-LSH band buckets of a FLOAT
  * vector in one pass — `sign_lsh_buckets(embedding, np, nb, seed)` →
  * `ARRAY<BIGINT>` of length `nb`, where bucket `j` packs the sign bits of
  * hyperplanes `j·np .. j·np+np-1` (bit k = plane j·np+k, matching the SQL
  * formulation's `shiftleft(b, p % np)`).
  *
  * Semantically IDENTICAL to the relational formulation both engines share
  * (see `VectorQueries.bandedCtes`): hyperplane weight w(p, i) is the
  * first md5 nibble of `"<seed><p>:<i>"` minus 7.5 (p 0-based plane,
  * i 1-based dimension, i ≤ 64 as in the SQL plane table), the sign bit is
  * `round(Σᵢ xᵢ·w(p,i), 6) > 0` with Spark's HALF_UP rounding, and floats
  * widen to double before multiplying. The DuckDB oracle keeps running the
  * relational form — an independent re-derivation of every bucket.
  *
  * Tolerance note: the two engines sum the same N·d terms in DIFFERENT
  * orders (fixed index order here, hash-aggregate order there), so a true
  * sum lying within FP noise of a 6-decimal rounding boundary could in
  * principle round to different signs. The kernel uses a Kahan-compensated
  * sum (< 1 ulp from exact for these ≤ 64 bounded terms), so the window is
  * the oracle's own summation error — ~1e-13 relative, against a 5e-7
  * boundary granularity; no corpus row has ever landed in it.
  *
  * What the native version removes is the join that computed the signs:
  * `flat ⋈ planes` materializes N·d·(nb·np) rows through a shuffle and a
  * hash aggregate (683 M rows at sf0.1 once the recall fix grew the e02
  * index to 64 bands × 10 planes — 7.5 s of an 8.6 s query). Here the
  * whole index row is one allocation-free kernel inside the scan's
  * whole-stage-codegen projection: zero shuffle, zero intermediate rows,
  * weights materialized once per executor and cached by (seed, planes).
  */
case class SignLshBuckets(first: Expression, second: Expression,
                          third: Expression, fourth: Expression)
    extends QuaternaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val vecOk = first.dataType match {
      case ArrayType(FloatType, _) => true
      case _                       => false
    }
    if (vecOk && second.dataType == IntegerType &&
        third.dataType == IntegerType && fourth.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (ARRAY<FLOAT>, INT np, INT nb, STRING seed), got " +
        Seq(first, second, third, fourth).map(_.dataType.sql).mkString(", "))
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "sign_lsh_buckets"

  override def nullSafeEval(v: Any, np: Any, nb: Any, seed: Any): Any =
    SignLshBuckets.compute(v.asInstanceOf[ArrayData], np.asInstanceOf[Int],
      nb.asInstanceOf[Int], seed.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, np, nb, seed) =>
      s"${ev.value} = graft.functions.SignLshBuckets.compute($v, $np, $nb, $seed.toString());")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): SignLshBuckets =
    copy(first = newFirst, second = newSecond,
      third = newThird, fourth = newFourth)
}

object SignLshBuckets {

  /** The SQL plane table generates weights for dimensions 1..64 only; a
    * longer vector's extra dimensions drop out of the join there, so the
    * kernel honors the same bound.
    */
  private val MaxDims = 64

  // weights are a pure function of (seed, plane count): materialize once
  // per executor, not once per row
  private val cache = new java.util.concurrent.ConcurrentHashMap[
    (String, Int), Array[Array[Double]]]()

  private def weights(seed: String, planes: Int): Array[Array[Double]] =
    cache.computeIfAbsent((seed, planes), { _ =>
      val md = java.security.MessageDigest.getInstance("MD5")
      Array.tabulate(planes) { p =>
        Array.tabulate(MaxDims) { i0 =>
          md.reset()
          val dig = md.digest(s"$seed$p:${i0 + 1}".getBytes("UTF-8"))
          ((dig(0) & 0xFF) >>> 4) - 7.5 // first hex char's nibble − 7.5
        }
      }
    })

  def compute(vec: ArrayData, np: Int, nb: Int, seed: String): GenericArrayData = {
    val planes = np * nb
    val dims = math.min(vec.numElements(), MaxDims)
    val w = weights(seed, planes)
    val out = new Array[Long](nb)
    var p = 0
    while (p < planes) {
      val wp = w(p)
      // Kahan-compensated sum: the oracle's hash aggregate adds the same
      // terms in ARBITRARY order, so both engines sit within their own FP
      // error of the exact sum. Compensation pins this side to < 1 ulp of
      // exact, shrinking the only disagreement window — a true sum within
      // FP noise of a 6-decimal rounding boundary — to the oracle's error
      // alone. (64 bounded terms: never observed in practice; see the
      // class scaladoc tolerance note.)
      var sum = 0.0
      var comp = 0.0
      var i = 0
      while (i < dims) {
        val y = vec.getFloat(i).toDouble * wp(i) - comp
        val t = sum + y
        comp = (t - sum) - y
        sum = t
        i += 1
      }
      // Spark round(x, 6): BigDecimal HALF_UP — same boundary behavior as
      // the SQL `round(sum(x*w), 6) > 0` sign test. Fast path first: any
      // sum ≥ 1e-6 rounds positive and any sum ≤ 0 rounds non-positive
      // under HALF_UP, exactly — only the (0, 1e-6) sliver needs the
      // decimal check. Without it the rounding allocates two BigDecimals
      // per plane per vector (5.8e9 allocations at a 5 M-vector corpus ×
      // 64 bands — a measurable slice of the index build for a branch
      // whose outcome the comparison already determines).
      if (sum >= 1e-6 ||
          (sum > 0.0 && java.math.BigDecimal.valueOf(sum)
            .setScale(6, java.math.RoundingMode.HALF_UP).signum() > 0))
        out(p / np) |= 1L << (p % np)
      p += 1
    }
    new GenericArrayData(out)
  }
}
