package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions._

/** Session extensions entry point:
  *
  *   SparkSession.builder()
  *     .config("spark.sql.extensions", "graft.plans.GraftExtensions")
  *
  * installs (a) the engine's custom SQL functions in every new session
  * (the per-call `ensureRegistered` path used by [[graft.Tables]] remains
  * for sessions built without the config) and (b) the [[VecDotRewrite]]
  * optimizer rule, so composed HOF dot products compile to the native
  * codegen'd expression.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def fn(name: String, clazz: Class[_], builder: Seq[Expression] => Expression) =
    (FunctionIdentifier(name), new ExpressionInfo(clazz.getName, name), builder)

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(fn("polyhash", classOf[PolyHash], exprs => PolyHash(exprs.head)))
    e.injectFunction(fn("wide_polyhash", classOf[WidePolyHash],
      exprs => WidePolyHash(exprs.head)))
    e.injectFunction(fn("third_polyhash", classOf[ThirdPolyHash],
      exprs => ThirdPolyHash(exprs.head)))
    e.injectFunction(fn("third_window_hashes", classOf[ThirdWindowHashes],
      exprs => ThirdWindowHashes(exprs(0), exprs(1))))
    e.injectFunction(fn("word_shingles", classOf[WordShingles],
      exprs => WordShingles(exprs.head)))
    e.injectFunction(fn("word_shingle_set", classOf[WordShingleSet],
      exprs => WordShingleSet(exprs.head)))
    e.injectFunction(fn("minhash_sig", classOf[MinHashSig],
      exprs => MinHashSig(exprs.head)))
    e.injectFunction(fn("vec_dot", classOf[VecDot],
      exprs => VecDot(exprs(0), exprs(1))))
    e.injectFunction(fn("hyperplane_bucket", classOf[HyperplaneBucket],
      exprs => HyperplaneBucket(exprs.head)))
    e.injectFunction(fn("hyperplane_sig", classOf[HyperplaneSig],
      exprs => HyperplaneSig(exprs.head)))
    e.injectFunction(fn("hyperplane_sig_hi", classOf[HyperplaneSig],
      exprs => HyperplaneSig(exprs.head, offset = HyperplaneSig.HiOffset)))
    e.injectFunction(fn("simhash_sig", classOf[SimHashSig],
      exprs => SimHashSig(exprs.head)))
    e.injectOptimizerRule(_ => VecDotRewrite)
  }
}
