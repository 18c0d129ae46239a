package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType}

/** Native Catalyst expressions for the embedding-similarity hot path.
  *
  * The declarative alternative — `aggregate(zip_with(a, b, (x, y) ->
  * x*y), 0D, (acc, v) -> acc + v)` — is semantically identical but
  * runs the lambda interpreter per element: on an all-pairs similarity
  * scan (|V|²/2 pairs × dim multiply-adds) that interpreter dispatch
  * IS the query cost. These expressions generate a tight primitive
  * loop inside whole-stage codegen instead; same ascending-index
  * summation order, so results are bit-identical to the built-in
  * composition (and to the DuckDB oracle's `list_reduce`).
  */
case class DotProductFloat(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_dot"

  /** Mismatched dimensions are corrupt data, not a shorter loop:
    * truncating to the common prefix would rank a bad row with a
    * plausible-looking score. Return null so it surfaces. */
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductFloat =
    copy(left = newLeft, right = newRight)
}

/** L2 norm of a float vector: sqrt of the self dot product. */
case class NormFloat(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_norm"

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getFloat(i).toDouble * x.getFloat(i).toDouble; i += 1 }
    math.sqrt(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => {
      val fn = ctx.addNewFunction("graftVecNorm",
        s"""
           |private double graftVecNorm(org.apache.spark.sql.catalyst.util.ArrayData arr) {
           |  int n = arr.numElements();
           |  double s = 0.0;
           |  for (int i = 0; i < n; i++) {
           |    s += (double) arr.getFloat(i) * (double) arr.getFloat(i);
           |  }
           |  return java.lang.Math.sqrt(s);
           |}
         """.stripMargin)
      s"$fn($a)"
    })

  override protected def withNewChildInternal(newChild: Expression): NormFloat =
    copy(child = newChild)
}

/** 128 random-hyperplane sign bits packed into two longs — the
  * signature behind LSH-banded embedding dedup ([[graft.operators.Dedup
  * .embeddingLsh]]). Planes are iid standard Gaussians from a fixed
  * splitmix64-seeded stream (Box–Muller), so directions are uniform on
  * the sphere and the per-plane agreement probability for a pair at
  * cosine c is exactly p(c) = 1 − acos(c)/π — the quantity every
  * banding miss bound is computed from. Deterministic across JVMs,
  * executors, and runs (no java.util.Random); the plane matrix is
  * built once per (dim) and cached, so the per-row cost is 128 dim-
  * length dot products in a primitive loop. */
object HyperplaneSig {
  val NBits = 128
  private val Seed = 0x67A5F1DE2026L
  // Hard cap on requested signature width: the plane matrix is
  // nBits×dim doubles per (dim, nBits) cache entry, and anything past
  // a few thousand bits signals a unit mix-up at the call site, not a
  // real banding scheme. 8192 admits the (24-bit × 225-band) LSH rung
  // (113 words = 7232 bits; ~3.7 MB of planes at dim 64 — still a
  // per-JVM constant, not a per-row cost).
  val MaxBits = 8192

  private def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** (0,1] uniform from the top 53 bits (never 0 — safe for log). */
  private def unit(z: Long): Double = ((mix(z) >>> 11) + 1).toDouble / (1L << 53).toDouble

  // Keyed map, not a single slot: two datasets with different embedding
  // dims (or two banding schemes with different signature widths) in
  // one JVM would thrash a last-value cache and rebuild the nBits×dim
  // Gaussian matrix per row. (dim, nBits) combos in practice number a
  // handful, so the map stays tiny. The plane STREAM is a fixed
  // function of (plane j, coord i) alone — widening a signature
  // extends it with new planes while the first 128 stay bit-identical
  // to the original vec_sig128.
  private val cache = new java.util.concurrent.ConcurrentHashMap[Long, Array[Array[Double]]]()

  def planes(dim: Int, nBits: Int): Array[Array[Double]] =
    cache.computeIfAbsent((dim.toLong << 32) | nBits.toLong, _ =>
      Array.tabulate(nBits) { j =>
        Array.tabulate(dim) { i =>
          val base = Seed + j.toLong * 2097169L + i.toLong * 2L
          math.sqrt(-2.0 * math.log(unit(base))) * math.cos(2.0 * math.Pi * unit(base + 1))
        }
      })

  /** Packed signature: plane j's sign lands in bit (j % 64) of word
    * (j / 64) — for nBits = 128 that is bits 0–63 in element 0,
    * 64–127 in element 1, byte-compatible with the original
    * vec_sig128. */
  def compute(arr: ArrayData, nBits: Int): ArrayData = {
    require(nBits > 0 && nBits <= MaxBits && nBits % 64 == 0,
      s"vec_sig width must be a positive multiple of 64 <= $MaxBits, got $nBits")
    val dim = arr.numElements()
    val pl = planes(dim, nBits)
    val v = new Array[Double](dim)
    var i = 0
    while (i < dim) { v(i) = arr.getFloat(i).toDouble; i += 1 }
    val words = new Array[Long](nBits / 64)
    var j = 0
    while (j < nBits) {
      val w = pl(j)
      var s = 0.0
      var k = 0
      while (k < dim) { s += v(k) * w(k); k += 1 }
      if (s > 0.0) words(j / 64) |= 1L << (j % 64)
      j += 1
    }
    new GenericArrayData(words)
  }

  def compute(arr: ArrayData): ArrayData = compute(arr, NBits)
}

/** `vec_sig128(array<float>) -> array<bigint>` (two packed longs). */
case class HyperplaneSig128(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "vec_sig128"

  override protected def nullSafeEval(a: Any): Any =
    HyperplaneSig.compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.HyperplaneSig.compute($a)")

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSig128 =
    copy(child = newChild)
}

/** `vec_sig(array<float>, nbits) -> array<bigint>` (nbits/64 packed
  * longs) — the width-parameterized form of [[HyperplaneSig128]],
  * drawing planes from the SAME fixed stream (a 128-bit request is
  * byte-identical to vec_sig128). Exists so LSH callers can widen
  * bands with corpus size — the in-bucket pairing term of banded LSH
  * is b·n²/2^(r+1), so r must grow with log n or candidate
  * enumeration goes quadratic (see [[graft.operators.Dedup
  * .embeddingLsh]]'s geometry pick); nbits is a query constant in
  * every sane plan and is validated per evaluation either way. */
case class HyperplaneSigN(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "vec_sig"
  // registered for general SQL use: a non-integer width (e.g.
  // vec_sig(v, '128') where the string isn't castable, or an array)
  // must fail at ANALYSIS with a named error, not as a janino compile
  // error / ClassCastException from the (int) cast at execution —
  // the same analysis-time typing contract the text kernels carry
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(FloatType), IntegerType)

  override protected def nullSafeEval(a: Any, b: Any): Any =
    HyperplaneSig.compute(a.asInstanceOf[ArrayData],
      b.asInstanceOf[Number].intValue())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.HyperplaneSig.compute($a, (int)$b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): HyperplaneSigN =
    copy(left = newLeft, right = newRight)
}
