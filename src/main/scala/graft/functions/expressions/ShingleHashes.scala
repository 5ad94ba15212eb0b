package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: distinct xxhash64 values of every
  * word `n`-gram of a string, in one zero-allocation pass.
  *
  * Equivalent declarative formulation (what this replaces):
  * {{{
  *   array_distinct(transform(sequence(1, size(ws)-n+1),
  *     i => xxhash64(array_join(slice(ws, i, n), " "))))
  *   // ws = split(text, " ")
  * }}}
  * Spark evaluates higher-order functions interpreted, per element,
  * and the composition above materializes every shingle as a new
  * string before hashing — the dominant cost of shingle-based dedup.
  * This kernel exploits the identity that a `split(' ')` +
  * `array_join(' ')` round-trip reproduces the ORIGINAL byte span
  * (single-space separators are preserved either way, and 0x20 never
  * occurs inside a UTF-8 multibyte sequence), so each shingle is
  * hashed directly from the input string's bytes with the same XXH64
  * (seed 42) the built-in `xxhash64` uses — values are bit-for-bit
  * identical to the declarative form, with zero per-shingle
  * allocation.
  *
  * Returns null for texts with fewer than `n` words (mirroring the
  * `when(size(ws) >= n, ...)` guard of the declarative form);
  * duplicate shingles keep first-occurrence order.
  *
  * `distinct = false` emits EVERY n-gram instance's hash in document
  * order (no dedup pass) — the per-instance shape LM scoring needs
  * ([[graft.functions.TextAnalysis.unigramLogprob]]/`bigramLogprob`),
  * where each hash equals `xxhash64(concat_ws(" ", w_i, …, w_{i+n-1}))`
  * by the same byte-span identity.
  */
case class ShingleHashes(child: Expression, n: Int, distinct: Boolean = true)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && n >= 1) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string, n >= 1), got ${child.dataType.simpleString}, n=$n")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "shingle_hashes"

  override def nullSafeEval(input: Any): Any =
    ShingleHashes.compute(input.asInstanceOf[UTF8String], n, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = ShingleHashes.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
        ${ev.value} = $cls.compute($c, $n, $distinct);
        if (${ev.value} == null) { ${ev.isNull} = true; }
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleHashes {
  private val Seed = 42L // the built-in xxhash64's seed

  /** One pass: locate space positions, hash each n-gram byte span,
    * dedup into an open-addressed long set (first-occurrence order).
    * Null when the text has fewer than n words.
    */
  def compute(text: UTF8String, n: Int): ArrayData = compute(text, n, true)

  def compute(text: UTF8String, n: Int, distinct: Boolean): ArrayData = {
    val base = text.getBaseObject
    val off = text.getBaseOffset
    val len = text.numBytes()
    // word ends: every space position, plus the end of string
    var words = 1
    var i = 0
    while (i < len) {
      if (text.getByte(i) == ' '.toByte) words += 1
      i += 1
    }
    val shingles = words - n + 1
    if (shingles <= 0) return null
    val ends = new Array[Int](words)
    var w = 0
    i = 0
    while (i < len) {
      if (text.getByte(i) == ' '.toByte) { ends(w) = i; w += 1 }
      i += 1
    }
    ends(w) = len
    if (!distinct) {
      // per-instance mode: every n-gram hash in document order
      val out = new Array[Long](shingles)
      var s = 0
      while (s < shingles) {
        val start = if (s == 0) 0 else ends(s - 1) + 1
        val end = ends(s + n - 1)
        out(s) = XXH64.hashUnsafeBytes(base, off + start, end - start, Seed)
        s += 1
      }
      return ArrayData.toArrayData(out)
    }
    // open-addressed set sized to the next power of two >= 2x load
    var cap = 4
    while (cap < shingles * 2) cap <<= 1
    val mask = cap - 1
    val table = new Array[Long](cap)
    val used = new Array[Boolean](cap)
    val out = new Array[Long](shingles)
    var outN = 0
    var s = 0
    while (s < shingles) {
      val start = if (s == 0) 0 else ends(s - 1) + 1
      val end = ends(s + n - 1)
      val h = XXH64.hashUnsafeBytes(base, off + start, end - start, Seed)
      var slot = (h.toInt & mask)
      var dup = false
      while (used(slot) && !dup) {
        if (table(slot) == h) dup = true else slot = (slot + 1) & mask
      }
      if (!dup) {
        used(slot) = true; table(slot) = h
        out(outN) = h; outN += 1
      }
      s += 1
    }
    ArrayData.toArrayData(java.util.Arrays.copyOf(out, outN))
  }
}
