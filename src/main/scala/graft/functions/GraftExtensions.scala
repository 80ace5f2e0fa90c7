package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Session extensions registering graft's native functions so they are
  * callable from SQL (`SELECT cosine_sim(a, b)`) as well as the DataFrame
  * API. Installed by [[graft.GraftSession]] via `withExtensions`; also
  * usable through `spark.sql.extensions=graft.functions.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        if (exprs.length != 2)
          throw new org.apache.spark.sql.AnalysisException(
            "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
            Map("functionName" -> "`cosine_sim`", "expectedNum" -> "2",
              "actualNum" -> exprs.length.toString, "docroot" -> ""))
        CosineSimilarity(exprs(0), exprs(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        if (exprs.length != 2)
          throw new org.apache.spark.sql.AnalysisException(
            "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
            Map("functionName" -> "`dot_product`", "expectedNum" -> "2",
              "actualNum" -> exprs.length.toString, "docroot" -> ""))
        DotProduct(exprs(0), exprs(1))
      }))
    // Spark ships codegen'd Bloom expressions (BloomFilterAggregate /
    // BloomFilterMightContain) for its runtime join filters but does not
    // register them in the SQL function registry; exposing them here gives
    // the decontamination pipeline (d17) a native, whole-stage-codegen
    // bit-test instead of a per-row Scala UDF over a broadcast sketch.
    ext.injectFunction((
      new FunctionIdentifier("graft_bloom_agg"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
        "graft_bloom_agg"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        if (exprs.length != 3)
          throw new org.apache.spark.sql.AnalysisException(
            "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
            Map("functionName" -> "`graft_bloom_agg`", "expectedNum" -> "3",
              "actualNum" -> exprs.length.toString, "docroot" -> ""))
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
          exprs(0), exprs(1), exprs(2))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_might_contain"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        "graft_might_contain"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        if (exprs.length != 2)
          throw new org.apache.spark.sql.AnalysisException(
            "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
            Map("functionName" -> "`graft_might_contain`", "expectedNum" -> "2",
              "actualNum" -> exprs.length.toString, "docroot" -> ""))
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          exprs(0), exprs(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("winnow_fp"),
      new ExpressionInfo(classOf[WinnowFingerprint].getName, "winnow_fp"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        if (exprs.length != 1)
          throw new org.apache.spark.sql.AnalysisException(
            "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
            Map("functionName" -> "`winnow_fp`", "expectedNum" -> "1",
              "actualNum" -> exprs.length.toString, "docroot" -> ""))
        WinnowFingerprint(exprs(0))
      }))
    ext.injectFunction((
      new FunctionIdentifier("simhash_fp"),
      new ExpressionInfo(classOf[SimhashFingerprint].getName, "simhash_fp"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        if (exprs.length != 1)
          throw new org.apache.spark.sql.AnalysisException(
            "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
            Map("functionName" -> "`simhash_fp`", "expectedNum" -> "1",
              "actualNum" -> exprs.length.toString, "docroot" -> ""))
        SimhashFingerprint(exprs(0))
      }))
    ext.injectFunction((
      new FunctionIdentifier("winnow_fp_set"),
      new ExpressionInfo(classOf[WinnowFingerprintSet].getName, "winnow_fp_set"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        if (exprs.length != 1)
          throw new org.apache.spark.sql.AnalysisException(
            "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
            Map("functionName" -> "`winnow_fp_set`", "expectedNum" -> "1",
              "actualNum" -> exprs.length.toString, "docroot" -> ""))
        WinnowFingerprintSet(exprs(0))
      }))
    ext.injectFunction((
      new FunctionIdentifier("sign_lsh_buckets"),
      new ExpressionInfo(classOf[SignLshBuckets].getName, "sign_lsh_buckets"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        if (exprs.length != 4)
          throw new org.apache.spark.sql.AnalysisException(
            "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
            Map("functionName" -> "`sign_lsh_buckets`", "expectedNum" -> "4",
              "actualNum" -> exprs.length.toString, "docroot" -> ""))
        SignLshBuckets(exprs(0), exprs(1), exprs(2), exprs(3))
      }))
    ext.injectFunction((
      new FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        if (exprs.length != 1)
          throw new org.apache.spark.sql.AnalysisException(
            "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
            Map("functionName" -> "`nfc_normalize`", "expectedNum" -> "1",
              "actualNum" -> exprs.length.toString, "docroot" -> ""))
        NfcNormalize(exprs(0))
      }))
  }
}
