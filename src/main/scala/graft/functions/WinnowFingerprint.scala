package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: winnowing document fingerprints (char
  * [[WinnowFingerprint.Gram]]-gram md5 rolling hashes, window-
  * [[WinnowFingerprint.Window]] minima) summarized per document as
  * `struct(n_fingerprints BIGINT, min_fingerprint STRING)`.
  *
  * Semantically IDENTICAL to the SQL formulation both engines share
  * (`md5(substr(text, i, 8))` per position, `min` over each 4-wide window,
  * distinct count + global min) — hex strings order exactly like unsigned
  * digest bytes, so comparing raw digests changes nothing. What the native
  * version removes is the per-position expression-tree round trip: one
  * reused MessageDigest per row instead of ~len md5 expression calls, byte
  * compares instead of 32-char string compares, and hex materialized once
  * per document for the single output value rather than once per position.
  * This is the suite's hottest per-byte loop at 10× scale (the SQL array
  * form measured ~59 s there); the per-row shape keeps the operator a
  * zero-shuffle narrow projection inside whole-stage codegen.
  */
case class WinnowFingerprint(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING argument, got ${child.dataType.sql}")

  override def dataType: DataType = StructType(Seq(
    StructField("n_fingerprints", LongType, nullable = false),
    StructField("min_fingerprint", StringType, nullable = false)))

  override def prettyName: String = "winnow_fp"

  override def nullSafeEval(input: Any): Any =
    WinnowFingerprint.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WinnowFingerprint.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprint =
    copy(child = newChild)
}

/** Native Catalyst expression: the full distinct winnowing-fingerprint set
  * of a document as `ARRAY<STRING>` (hex, ascending) — same selection as
  * [[WinnowFingerprint]] but returning the posting list instead of the
  * summary, for cross-document duplicated-span detection (explode →
  * fingerprint postings → docs sharing a fingerprint).
  */
case class WinnowFingerprintSet(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING argument, got ${child.dataType.sql}")

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)

  override def prettyName: String = "winnow_fp_set"

  override def nullSafeEval(input: Any): Any =
    WinnowFingerprint.computeSet(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WinnowFingerprint.computeSet($c)")

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprintSet =
    copy(child = newChild)
}

object WinnowFingerprint {

  /** Char n-gram width and winnowing window (SURVEY §2 fingerprints). */
  val Gram = 8
  val Window = 4

  private val HexTab = "0123456789abcdef".toCharArray

  private def less(a: Array[Byte], b: Array[Byte]): Boolean = {
    var k = 0
    while (k < a.length) {
      val x = a(k) & 0xFF
      val y = b(k) & 0xFF
      if (x != y) return x < y
      k += 1
    }
    false
  }

  /** Shared winnowing core: the sorted (unsigned byte order) set of
    * DISTINCT window-minimum gram digests. Substrings are CODE-POINT-based
    * (like SQL substr in both engines — supplementary-plane characters
    * count as 1, unlike java.lang.String's UTF-16 units) and hashed as
    * their UTF-8 bytes — exactly what `md5(substr(text, i, 8))` digests.
    * Code-point start offsets are indexed once up front so each gram is a
    * direct byte-slice digest, keeping the loop O(len).
    */
  private def selectedMins(text: UTF8String): java.util.TreeSet[Array[Byte]] = {
    val bytes = text.getBytes
    val starts = new Array[Int](bytes.length + 1)
    var len = 0
    var p = 0
    while (p < bytes.length) {
      starts(len) = p
      len += 1
      p += UTF8String.numBytesForFirstByte(bytes(p))
    }
    starts(len) = bytes.length
    val n = math.max(len - (Gram - 1), 1)
    val md = java.security.MessageDigest.getInstance("MD5")
    val digests = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      md.reset()
      val from = starts(i)
      md.update(bytes, from, starts(math.min(i + Gram, len)) - from)
      digests(i) = md.digest()
      i += 1
    }
    val distinct = new java.util.TreeSet[Array[Byte]](
      (a: Array[Byte], b: Array[Byte]) => java.util.Arrays.compareUnsigned(a, b))
    var j = 0
    while (j < n) {
      var m = digests(j)
      val e = math.min(j + Window, n)
      var k = j + 1
      while (k < e) {
        if (less(digests(k), m)) m = digests(k)
        k += 1
      }
      distinct.add(m)
      j += 1
    }
    distinct
  }

  private def hex32(d: Array[Byte]): UTF8String = {
    val out = new Array[Char](32)
    var h = 0
    while (h < 16) {
      val v = d(h) & 0xFF
      out(h * 2) = HexTab(v >> 4)
      out(h * 2 + 1) = HexTab(v & 0xF)
      h += 1
    }
    UTF8String.fromString(new String(out))
  }

  /** Per-doc summary (the `winnow_fp` value): distinct count + global
    * minimum. Unsigned digest order equals hex-string order, so the tree's
    * first element IS the min fingerprint.
    */
  def compute(text: UTF8String): InternalRow = {
    val distinct = selectedMins(text)
    InternalRow(distinct.size().toLong, hex32(distinct.first()))
  }

  /** Full distinct fingerprint set, hex, ascending — the per-doc posting
    * list the cross-document span-dup join (d26) explodes.
    */
  def computeSet(text: UTF8String): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val distinct = selectedMins(text)
    val out = new Array[Any](distinct.size())
    val it = distinct.iterator()
    var i = 0
    while (it.hasNext) { out(i) = hex32(it.next()); i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** DataFrame-API door; resolves through the session function registry. */
  def apply(c: Column): Column =
    org.apache.spark.sql.functions.call_function("winnow_fp", c)
}
