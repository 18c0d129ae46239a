package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** `SparkSessionExtensions` injector for the graft native functions —
  * the cluster-wide deployment path:
  *
  * {{{
  * spark-submit --conf spark.sql.extensions=graft.functions.GraftExtensions ...
  * }}}
  *
  * makes `vec_dot`/`vec_norm`/`simhash60`/`shingles3`/`minhash_sig64`
  * available in every session's SQL and `expr()` without per-session
  * registration (GraftFunctions.register stays as the programmatic
  * fallback the operators call themselves).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, clazz: Class[_]) =
    new ExpressionInfo(clazz.getCanonicalName, name)

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("vec_dot"),
      info("vec_dot", classOf[DotProductFloat]),
      (c: Seq[Expression]) => DotProductFloat(c(0), c(1))))
    ext.injectFunction((FunctionIdentifier("vec_norm"),
      info("vec_norm", classOf[NormFloat]),
      (c: Seq[Expression]) => NormFloat(c.head)))
    ext.injectFunction((FunctionIdentifier("simhash60"),
      info("simhash60", classOf[SimHash60]),
      (c: Seq[Expression]) => SimHash60(c.head)))
    ext.injectFunction((FunctionIdentifier("shingles3"),
      info("shingles3", classOf[Shingles3]),
      (c: Seq[Expression]) => Shingles3(c.head)))
    ext.injectFunction((FunctionIdentifier("minhash_sig64"),
      info("minhash_sig64", classOf[MinHashSig64]),
      (c: Seq[Expression]) => MinHashSig64(c.head)))
  }
}
