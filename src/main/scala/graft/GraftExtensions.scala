package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.plans.{DotProduct, Fingerprint, IntersectSortedLongSize, IntersectSortedSize, MinhashBands, Ngram3Hashes, Norm2, OphBands, SimhashSig, VectorSum, WordNgramHashes}

/** SparkSessionExtensions entry point: makes the graft native expressions
  * first-class SQL functions in any session built with
  * `spark.sql.extensions=graft.GraftExtensions` (spark-submit/cluster) —
  * the packaged twin of VectorFunctions.register, which operators call for
  * sessions created without the config. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        DotProduct(exprs.head, exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_norm2"),
      new ExpressionInfo(classOf[Norm2].getName, "graft_norm2"),
      exprs => Norm2(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_intersect_size"),
      new ExpressionInfo(classOf[IntersectSortedSize].getName, "graft_intersect_size"),
      exprs => IntersectSortedSize(exprs.head, exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_intersect_long_size"),
      new ExpressionInfo(classOf[IntersectSortedLongSize].getName, "graft_intersect_long_size"),
      exprs => IntersectSortedLongSize(exprs.head, exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_fingerprint"),
      new ExpressionInfo(classOf[Fingerprint].getName, "graft_fingerprint"),
      exprs => Fingerprint(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_minhash_bands"),
      new ExpressionInfo(classOf[MinhashBands].getName, "graft_minhash_bands"),
      exprs => MinhashBands(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_oph_bands"),
      new ExpressionInfo(classOf[OphBands].getName, "graft_oph_bands"),
      exprs => OphBands(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_ngram3"),
      new ExpressionInfo(classOf[Ngram3Hashes].getName, "graft_ngram3"),
      exprs => Ngram3Hashes(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[SimhashSig].getName, "graft_simhash"),
      exprs => SimhashSig(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_word_ngrams"),
      new ExpressionInfo(classOf[WordNgramHashes].getName, "graft_word_ngrams"),
      exprs =>
        if (exprs.length > 1) WordNgramHashes(exprs.head, WordNgramHashes.widthOf(exprs(1)))
        else WordNgramHashes(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_vec_sum"),
      new ExpressionInfo(classOf[VectorSum].getName, "graft_vec_sum"),
      exprs => VectorSum(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_vec_scale"),
      new ExpressionInfo(classOf[graft.plans.ScaleArray].getName, "graft_vec_scale"),
      exprs => graft.plans.ScaleArray(exprs.head, exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_pq_adc"),
      new ExpressionInfo(classOf[graft.plans.PqAdc].getName, "graft_pq_adc"),
      exprs => graft.plans.PqAdc(exprs.head, exprs(1))))
    ext.injectOptimizerRule(_ => graft.plans.IntersectRewrite)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}
