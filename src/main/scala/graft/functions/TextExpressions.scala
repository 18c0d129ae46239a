package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass text statistics kernel for the text-analysis tier.
  *
  * The declarative forms in [[graft.operators.TextAnalysis]] hit the
  * same Catalyst landmine the Shingles3 kernel documents: `toks` (a
  * full regex tokenization) is aliased once but REFERENCED four times
  * (filter, size, two `aggregate` lambdas), and PushDownPredicates /
  * CollapseProject inline the alias into each reference — so every
  * document is tokenized several times, the `aggregate` higher-order
  * lambdas run interpreted (HigherOrderFunction has no codegen), and
  * two more whole-string regex passes (`regexp_extract_all`,
  * `regexp_replace`) count what a byte scan can count directly. This
  * kernel computes all of it in two linear scans (original bytes +
  * lowered bytes), allocation-free per row.
  *
  * Exactness contract (what the DuckDB oracle checks):
  *  - tokens  == `filter(split(lower(text), '[^a-z0-9]+'), x -> x != '')`:
  *    maximal runs of [a-z0-9] in `lower(text)` (the SAME
  *    UTF8String.toLowerCase Spark's `lower` uses, applied once);
  *    n_tokens counts runs, sum_tok_len sums their lengths (members
  *    are ASCII, so bytes == codepoints).
  *  - n_bpe   == `size(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]'))`:
  *    letter runs + digit runs + one per remaining non-space
  *    codepoint, over the ORIGINAL text. Java regex character classes
  *    match per codepoint and its default `\s` is ASCII-only
  *    [ \t\n\x0B\f\r] — the scan reproduces both exactly (a non-ASCII
  *    codepoint is never a letter/digit/space here, so it counts as
  *    one symbol; continuation bytes are skipped).
  *  - n_punct == `length(regexp_replace(lower(text), '[a-z0-9 ]', ''))`:
  *    codepoints of the LOWERED text outside [a-z0-9 ].
  *  - n_stop  == `size(filter(toks, x -> array_contains(stops, x)))`:
  *    tokens (with duplicates) byte-equal to any entry of `stops`.
  */
object TextKernels {

  val tokStatsSchema: StructType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("sum_tok_len", IntegerType, nullable = false),
    StructField("n_bpe", IntegerType, nullable = false),
    StructField("n_punct", IntegerType, nullable = false),
    StructField("n_stop", IntegerType, nullable = false)))

  private def isLetter(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z')
  private def isDigit(b: Byte): Boolean = b >= '0' && b <= '9'
  private def isAsciiSpace(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  private def isStop(lb: Array[Byte], start: Int, len: Int, stops: ArrayData): Boolean = {
    var s = 0
    val n = stops.numElements()
    while (s < n) {
      val w = stops.getUTF8String(s)
      if (w != null && w.numBytes == len) {
        var k = 0
        var ok = true
        while (ok && k < len) {
          if (w.getByte(k) != lb(start + k)) ok = false
          k += 1
        }
        if (ok) return true
      }
      s += 1
    }
    false
  }

  def tokStats(text: UTF8String, stops: ArrayData): InternalRow = {
    // pass 1 — ORIGINAL bytes: BPE-ish segment count
    val tb = text.getBytes
    var nBpe = 0
    var i = 0
    while (i < tb.length) {
      val b = tb(i)
      if (isLetter(b)) {
        nBpe += 1
        while (i < tb.length && isLetter(tb(i))) i += 1
      } else if (isDigit(b)) {
        nBpe += 1
        while (i < tb.length && isDigit(tb(i))) i += 1
      } else if (isAsciiSpace(b)) {
        i += 1
      } else if ((b & 0x80) == 0) { // ASCII symbol
        nBpe += 1
        i += 1
      } else { // non-ASCII codepoint: one symbol, skip continuations
        nBpe += 1
        i += 1
        while (i < tb.length && (tb(i) & 0xC0) == 0x80) i += 1
      }
    }

    // pass 2 — LOWERED bytes: tokens, punct codepoints, stopword hits
    val lb = text.toLowerCase.getBytes
    var nTok = 0
    var sumLen = 0
    var nPunct = 0
    var nStop = 0
    var runStart = -1
    i = 0
    def closeRun(end: Int): Unit = if (runStart >= 0) {
      nTok += 1
      sumLen += end - runStart
      if (isStop(lb, runStart, end - runStart, stops)) nStop += 1
      runStart = -1
    }
    while (i < lb.length) {
      val b = lb(i)
      if ((b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')) {
        if (runStart < 0) runStart = i
        i += 1
      } else {
        closeRun(i)
        if (b == ' ') {
          i += 1
        } else if ((b & 0x80) == 0) {
          nPunct += 1
          i += 1
        } else {
          nPunct += 1
          i += 1
          while (i < lb.length && (lb(i) & 0xC0) == 0x80) i += 1
        }
      }
    }
    closeRun(lb.length)

    new GenericInternalRow(Array[Any](nTok, sumLen, nBpe, nPunct, nStop))
  }

  /** Codepoints of a UTF8String as an int array; ASCII fast path
    * avoids the UTF-16 round trip. */
  private def codepoints(s: UTF8String): Array[Int] = {
    val nb = s.numBytes
    if (nb == s.numChars) { // pure ASCII: bytes ARE the codepoints
      val out = new Array[Int](nb)
      var i = 0
      while (i < nb) { out(i) = s.getByte(i) & 0xFF; i += 1 }
      out
    } else s.toString.codePoints().toArray
  }

  /** Threshold-banded Levenshtein over codepoints: the distance when
    * ≤ k, else −1 — value-identical to Spark's built-in
    * `levenshtein(l, r, k)` (FunctionsSpec pins the equivalence on
    * property inputs, unicode and threshold edges included). Exists
    * because the built-in costs ~0.77 ms per ~300-char pair at k=10 —
    * two orders of magnitude over the ~6,300 banded DP cells actually
    * required — and the dedup verification path calls it once per
    * candidate pair (hundreds of thousands of rows). One linear band
    * per row, two reused int rows, early abandon when a full band row
    * exceeds k. */
  /** LONG-threshold entry point (the SQL surface declares BIGINT so a
    * wide threshold is never silently truncated mod 2³² — e.g.
    * k = 4294967299L must behave as unbounded, not as k = 3). Any
    * k ≥ max(|l|,|r|) already means "exact distance", so clamping to
    * 2³⁰ is value-identical for every real string while keeping the
    * kernel's `inf = k + 1` arithmetic overflow-free. */
  def levBanded(l: UTF8String, r: UTF8String, k: Long): Int =
    levBanded(l, r, math.max(-1L, math.min(k, 1L << 30)).toInt)

  def levBanded(l: UTF8String, r: UTF8String, k: Int): Int = {
    if (k < 0) return -1
    var a = codepoints(l)
    var b = codepoints(r)
    if (a.length > b.length) { val t = a; a = b; b = t }
    val n = a.length
    val m = b.length
    if (m - n > k) return -1
    val inf = k + 1
    var prev = new Array[Int](m + 1)
    var cur = new Array[Int](m + 1)
    java.util.Arrays.fill(prev, inf)
    var j = 0
    while (j <= math.min(m, k)) { prev(j) = j; j += 1 }
    var i = 1
    while (i <= n) {
      val lo = math.max(1, i - k)
      val hi = math.min(m, i + k)
      java.util.Arrays.fill(cur, inf)
      var rowMin = inf
      if (i <= k) { cur(0) = i; rowMin = i }
      j = lo
      while (j <= hi) {
        val cost = if (a(i - 1) == b(j - 1)) 0 else 1
        var d = prev(j - 1) + cost
        val del = prev(j) + 1
        if (del < d) d = del
        val ins = cur(j - 1) + 1
        if (ins < d) d = ins
        if (d > inf) d = inf
        cur(j) = d
        if (d < rowMin) rowMin = d
        j += 1
      }
      if (rowMin >= inf) return -1
      val t = prev; prev = cur; cur = t
      i += 1
    }
    if (prev(m) > k) -1 else prev(m)
  }

  /** Per-document term counts over a token array, first-occurrence
    * order — see [[TokCounts]]. Null entries are skipped: the
    * tokenizers never emit them, and admitting one would put a null
    * `term` under a containsNull=false element schema, which an
    * unsafe writer would then dereference (the function is registered
    * for general SQL use, so a hand-built array with nulls is in
    * scope). */
  def tokCounts(toks: ArrayData): ArrayData = {
    val n = toks.numElements()
    val counts = new java.util.LinkedHashMap[UTF8String, Array[Int]]()
    var i = 0
    while (i < n) {
      val t = if (toks.isNullAt(i)) null else toks.getUTF8String(i)
      if (t != null) {
        val c = counts.get(t)
        if (c == null) counts.put(t, Array(1)) else c(0) += 1
      }
      i += 1
    }
    val out = new Array[Any](counts.size)
    val it = counts.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      out(j) = new GenericInternalRow(Array[Any](e.getKey, e.getValue()(0)))
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** `tok_counts(toks: array<string>) -> array<struct<term, tf>>` —
  * per-document term frequencies computed IN-ROW (first-occurrence
  * order). Exists because `explode(toks)` + `groupBy(doc_id, term)`
  * computes a value that is local to each document through a full
  * exchange: every (doc_id, term) key lives in exactly one input
  * partition, so the hash partial aggregation already produces the
  * final counts map-side and the shuffle that follows moves finished
  * rows around purely to satisfy the aggregate's distribution
  * requirement. One kernel call per document emits the same rows with
  * zero exchange; downstream joins/windows impose their own
  * distributions as before. Equivalent composition is pinned in
  * FunctionsSpec. */
object TokCounts {
  import org.apache.spark.sql.types.{ArrayType, StringType}
  val elemType: StructType = StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("tf", IntegerType, nullable = false)))
  val dataType: ArrayType = ArrayType(elemType, containsNull = false)
}

case class TokCounts(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ImplicitCastInputTypes {

  override def dataType: DataType = TokCounts.dataType
  override def prettyName: String = "tok_counts"
  // registered for general SQL use: a wrong-typed argument must fail
  // at ANALYSIS with a named error (and compatible types get an
  // implicit cast), not as a runtime ClassCastException mid-query
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))

  override protected def nullSafeEval(a: Any): Any =
    TextKernels.tokCounts(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.TextKernels.tokCounts($a)")

  override protected def withNewChildInternal(newChild: Expression): TokCounts =
    copy(child = newChild)
}

/** `lev_banded(l, r, k) -> int` — threshold Levenshtein, −1 past k;
  * see [[TextKernels.levBanded]]. */
case class LevBanded(first: Expression, second: Expression, third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression
    with ImplicitCastInputTypes {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "lev_banded"
  // analysis-time typing for the SQL surface: the threshold is BIGINT
  // (INT literals upcast losslessly), so an out-of-int-range k is
  // never truncated mod 2³² into a silently-narrow band — the kernel's
  // Long entry point clamps it to "unbounded" instead
  override def inputTypes: Seq[DataType] =
    Seq(StringType, StringType, LongType)

  override protected def nullSafeEval(l: Any, r: Any, k: Any): Any =
    TextKernels.levBanded(l.asInstanceOf[UTF8String],
      r.asInstanceOf[UTF8String], k.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (l, r, k) => s"graft.functions.TextKernels.levBanded($l, $r, $k)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): LevBanded =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** `tok_stats(text, stops: array<string>) -> struct(n_tokens,
  * sum_tok_len, n_bpe, n_punct, n_stop)` — see [[TextKernels]]. */
case class TokStats(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def dataType: DataType = TextKernels.tokStatsSchema
  override def prettyName: String = "tok_stats"
  override def inputTypes: Seq[DataType] =
    Seq(StringType, ArrayType(StringType))

  override protected def nullSafeEval(t: Any, s: Any): Any =
    TextKernels.tokStats(t.asInstanceOf[UTF8String], s.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (t, s) => s"graft.functions.TextKernels.tokStats($t, $s)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TokStats =
    copy(left = newLeft, right = newRight)
}
