package graft.functions

import org.apache.spark.sql.{GraftShim, SparkSession}

/** SQL-surface registration of the engine's native expressions, so
  * `spark.sql("SELECT safe_iri(c) ...")` works alongside the Column API —
  * the engine's equivalent of the reference exposing its term functions to
  * every entry point. */
object GraftFunctions {
  def registerAll(spark: SparkSession): Unit = {
    GraftShim.registerFunction(spark, "safe_iri", es => SafeIriExpr(es.head))
    GraftShim.registerFunction(spark, "clean_blank_node", es => CleanBlankNodeExpr(es.head))
    GraftShim.registerFunction(spark, "iri_is_valid", es => IriIsValidExpr(es.head))
    GraftShim.registerFunction(spark, "simhash64", es => SimHash64Expr(es.head, 42L))
    GraftShim.registerFunction(spark, "rolling_fingerprint", es => RollingFingerprintExpr(es.head, 16))
    GraftShim.registerFunction(spark, "minhash_sig", es => MinHashSigExpr(es.head, 5, 128, 42L))
    GraftShim.registerFunction(spark, "shingle_hashes", es => ShingleHashesExpr(es.head, 5, 42L))
    GraftShim.registerFunction(spark, "hamming64", es => HammingDistExpr(es(0), es(1)))
    GraftShim.registerFunction(spark, "sorted_intersect_count",
      es => SortedIntersectCountExpr(es(0), es(1)))
    GraftShim.registerFunction(spark, "cosine_pair", es => CosinePairExpr(es(0), es(1)))
    GraftShim.registerFunction(spark, "sign_lsh_bucket", es => SignLshBucketExpr(es.head, 16, 42L))
  }
}
