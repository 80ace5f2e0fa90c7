package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: 64-bit SimHash of a document's
  * space-separated tokens, returned as the four 16-bit band values
  * `ARRAY<BIGINT>[b0, b1, b2, b3]` the pigeonhole pair join (d08) keys on.
  *
  * Semantically IDENTICAL to the relational formulation both engines share
  * (and the oracle still runs): tokens are `split(text, ' ')` — single
  * space, empty tokens kept; per-token weight is its term frequency; bit p
  * (0..63) of `md5(token)` is bit (3 − p%4) of hex nibble p/4, i.e. bit
  * (63 − p) of the digest's first 8 bytes read big-endian; the doc's bit p
  * is set iff Σ tf·(2·bit_p − 1) > 0 (strict — a zero sum clears the
  * bit, matching `CASE WHEN s > 0`); band b packs bits [16b, 16b+16) with
  * bit p contributing 1 << (15 − p%16).
  *
  * What the native form removes is the plan shape, not the math: the SQL
  * version explodes every token occurrence into a (doc_id, token) shuffle
  * for the tf GROUP BY, joins a distinct-token md5 table (a second
  * shuffle), and re-aggregates 64 weighted sums per doc (a third) — at the
  * 1000× corpus that is ~10⁹ exploded rows and ~40 GB of shuffle files
  * whose leftovers then starved the d08 band join into ENOSPC (the
  * round-9 fifth-decade trap, SCALE.md). Per-doc, the whole computation
  * is local — the same observation that turned d09's winnowing from a
  * 60 M-row exchange into a projection — so this kernel runs it inside
  * whole-stage codegen: one token-frequency map and one md5 per DISTINCT
  * token per document (the tok-CTE optimization, applied per row), zero
  * exchanges. Like every graft kernel it must sit above the rows-not-bytes
  * spread exchange (PlanAudit's kernel-above-spread gate).
  */
case class SimhashFingerprint(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING argument, got ${child.dataType.sql}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "simhash_fp"

  override def nullSafeEval(input: Any): Any =
    SimhashFingerprint.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimhashFingerprint.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimhashFingerprint =
    copy(child = newChild)
}

object SimhashFingerprint {

  /** Per-document SimHash band values. Tokens are raw byte slices split on
    * 0x20 (a space byte never occurs inside a multi-byte UTF-8 sequence,
    * so byte-splitting equals code-point splitting here); consecutive /
    * leading / trailing spaces yield empty tokens exactly like
    * `split(text, ' ')` with Spark's keep-trailing-empties semantics.
    */
  def compute(text: UTF8String): GenericArrayData = {
    val bytes = text.getBytes
    // tf per distinct token within the doc: md5 runs once per distinct
    // token (the Zipf argument of the SQL's tok CTE, applied per row)
    val tf = new java.util.HashMap[String, Array[Int]]()
    var start = 0
    var p = 0
    while (p <= bytes.length) {
      if (p == bytes.length || bytes(p) == ' ') {
        val tok = new String(bytes, start, p - start,
          java.nio.charset.StandardCharsets.UTF_8)
        val c = tf.get(tok)
        if (c == null) tf.put(tok, Array(1)) else c(0) += 1
        start = p + 1
      }
      p += 1
    }
    val sums = new Array[Long](64)
    val md = java.security.MessageDigest.getInstance("MD5")
    val it = tf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      md.reset()
      val d = md.digest(e.getKey.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      // first 8 digest bytes big-endian: bit p of the SQL's nibble walk
      var fp = 0L
      var i = 0
      while (i < 8) { fp = (fp << 8) | (d(i) & 0xFFL); i += 1 }
      val w = e.getValue()(0)
      var b = 0
      while (b < 64) {
        sums(b) += (if (((fp >>> (63 - b)) & 1L) == 1L) w.toLong else -w.toLong)
        b += 1
      }
    }
    val bands = new Array[Any](4)
    var bi = 0
    while (bi < 4) {
      var v = 0L
      var j = 0
      while (j < 16) {
        if (sums(bi * 16 + j) > 0) v |= (1L << (15 - j))
        j += 1
      }
      bands(bi) = v
      bi += 1
    }
    new GenericArrayData(bands)
  }
}
