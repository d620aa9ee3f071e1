package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.{GraftShim => EU}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native Catalyst expressions for the training-data pipeline primitives
 * (dedup signatures, fingerprints, embedding similarity). Each generates a
 * single static Java call so the whole document pipeline stays inside one
 * WholeStageCodegen span — the codegen-friendly alternative to Scala UDFs
 * or interpreted higher-order functions.
 */
case class MinHashSigExpr(child: Expression, k: Int, n: Int, seed: Long)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    TextHashes.minHashSig(v.asInstanceOf[UTF8String].toString, k, n, seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextHashes.minHashSig($c.toString(), $k, $n, ${seed}L)")
  override protected def withNewChildInternal(c: Expression): MinHashSigExpr = copy(child = c)
  override def prettyName: String = "minhash_sig"
}

case class MinHashBandsExpr(child: Expression, k: Int, bands: Int,
    rowsPerBand: Int, seed: Long) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    TextHashes.minHashBands(v.asInstanceOf[UTF8String].toString, k, bands, rowsPerBand, seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextHashes.minHashBands($c.toString(), $k, $bands, $rowsPerBand, ${seed}L)")
  override protected def withNewChildInternal(c: Expression): MinHashBandsExpr = copy(child = c)
  override def prettyName: String = "minhash_bands"
}

case class SimHash64Expr(child: Expression, seed: Long) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    TextHashes.simHash64(v.asInstanceOf[UTF8String].toString, seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashes.simHash64($c.toString(), ${seed}L)")
  override protected def withNewChildInternal(c: Expression): SimHash64Expr = copy(child = c)
  override def prettyName: String = "simhash64"
}

case class RollingFingerprintExpr(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    TextHashes.rollingFingerprint(v.asInstanceOf[UTF8String].toString, k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashes.rollingFingerprint($c.toString(), $k)")
  override protected def withNewChildInternal(c: Expression): RollingFingerprintExpr = copy(child = c)
  override def prettyName: String = "rolling_fingerprint"
}

case class ShingleHashesExpr(child: Expression, k: Int, seed: Long) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    TextHashes.shingleHashes(v.asInstanceOf[UTF8String].toString, k, seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextHashes.shingleHashes($c.toString(), $k, ${seed}L)")
  override protected def withNewChildInternal(c: Expression): ShingleHashesExpr = copy(child = c)
  override def prettyName: String = "shingle_hashes"
}

case class HammingDistExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def nullSafeEval(a: Any, b: Any): Any =
    TextHashes.hamming64(a.asInstanceOf[Long], b.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"java.lang.Long.bitCount($a ^ $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): HammingDistExpr =
    copy(left = l, right = r)
  override def prettyName: String = "hamming64"
}

/** Intersection size of two SORTED `array<long>` columns (merge scan). */
case class SortedIntersectCountExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def nullSafeEval(a: Any, b: Any): Any =
    TextHashes.sortedIntersectCount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.TextHashes.sortedIntersectCount($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SortedIntersectCountExpr =
    copy(left = l, right = r)
  override def prettyName: String = "sorted_intersect_count"
}

/** Pairwise cosine of two `array<float>` columns — one static call per row
  * (replaces a zip_with+aggregate HOF chain on the near-dup verify path). */
case class CosinePairExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorMath.cosinePair(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorMath.cosinePair($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosinePairExpr =
    copy(left = l, right = r)
  override def prettyName: String = "cosine_pair"
}

/** Cosine similarity of an `array<float>` column against a fixed query
  * vector (the brute-force ANN baseline). The query array rides along as a
  * codegen reference object. */
case class CosineToQueryExpr(child: Expression, query: Array[Double])
    extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(v: Any): Any =
    VectorMath.cosineToQuery(v.asInstanceOf[ArrayData], query)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val q = ctx.addReferenceObj("graftQuery", query, "double[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.VectorMath.cosineToQuery($c, $q)")
  }
  override protected def withNewChildInternal(c: Expression): CosineToQueryExpr = copy(child = c)
  override def prettyName: String = "cosine_to_query"
}

/** Sign-bit random-hyperplane LSH bucket id for an `array<float>` vector. */
case class SignLshBucketExpr(child: Expression, bits: Int, seed: Long)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    VectorMath.signLshBucket(v.asInstanceOf[ArrayData], bits, seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.VectorMath.signLshBucket($c, $bits, ${seed}L)")
  override protected def withNewChildInternal(c: Expression): SignLshBucketExpr = copy(child = c)
  override def prettyName: String = "sign_lsh_bucket"
}

/** Multi-band sign-LSH bucket array (`bands` longs) for an `array<float>`
  * vector — the recall-engineered near-dup banding (TextHashes.signLshBands). */
case class SignLshBandsExpr(child: Expression, bands: Int, bitsPerBand: Int,
    seed: Long) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    VectorMath.signLshBands(v.asInstanceOf[ArrayData], bands, bitsPerBand, seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.VectorMath.signLshBands($c, $bands, $bitsPerBand, ${seed}L)")
  override protected def withNewChildInternal(c: Expression): SignLshBandsExpr = copy(child = c)
  override def prettyName: String = "sign_lsh_bands"
}

/** IVF assignment: index of the nearest (max-cosine) coarse centroid for an
  * `array<float>` vector. The centroid matrix rides along as a codegen
  * reference object. */
case class NearestCentroidExpr(child: Expression, cents: Array[Array[Double]])
    extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullSafeEval(v: Any): Any =
    VectorMath.nearestCentroid(v.asInstanceOf[ArrayData], cents)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = ctx.addReferenceObj("graftCentroids", cents, "double[][]")
    defineCodeGen(ctx, ev, x => s"graft.functions.VectorMath.nearestCentroid($x, $c)")
  }
  override protected def withNewChildInternal(c: Expression): NearestCentroidExpr = copy(child = c)
  override def prettyName: String = "nearest_centroid"
}

/** Single-pass whitespace token count (see [[TextStats]] — replaces the
  * CodegenFallback HOF chain size(filter(split(...)))). */
case class TokenCountExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullSafeEval(v: Any): Any =
    TextStats.tokenCount(v.asInstanceOf[UTF8String].toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextStats.tokenCount($c.toString())")
  override protected def withNewChildInternal(c: Expression): TokenCountExpr = copy(child = c)
  override def prettyName: String = "token_count"
}

/** Single-pass BPE-ish subword count: sum of ceil(tokenLen/4). */
case class BpeishTokenCountExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullSafeEval(v: Any): Any =
    TextStats.bpeishTokenCount(v.asInstanceOf[UTF8String].toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextStats.bpeishTokenCount($c.toString())")
  override protected def withNewChildInternal(c: Expression): BpeishTokenCountExpr = copy(child = c)
  override def prettyName: String = "bpeish_token_count"
}

/** Single-pass count of tokens matching a fixed word list (the word array
  * rides into codegen as a reference object). */
case class StopwordCountExpr(child: Expression, words: Array[String])
    extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullSafeEval(v: Any): Any =
    TextStats.stopwordCount(v.asInstanceOf[UTF8String].toString, words)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val w = ctx.addReferenceObj("graftStopwords", words, "java.lang.String[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.TextStats.stopwordCount($c.toString(), $w)")
  }
  override protected def withNewChildInternal(c: Expression): StopwordCountExpr = copy(child = c)
  override def prettyName: String = "stopword_count"
}

/** Single-pass language id: argmax of per-language stopword hits, first
  * max wins, "und" on all-zero — one tokenization pass for every list. */
case class LangIdExpr(child: Expression, langs: Array[String],
    lists: Array[Array[String]]) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any =
    TextStats.langId(v.asInstanceOf[UTF8String].toString, langs, lists)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val l = ctx.addReferenceObj("graftLangs", langs, "java.lang.String[]")
    val w = ctx.addReferenceObj("graftLangLists", lists, "java.lang.String[][]")
    defineCodeGen(ctx, ev, c => s"graft.functions.TextStats.langId($c.toString(), $l, $w)")
  }
  override protected def withNewChildInternal(c: Expression): LangIdExpr = copy(child = c)
  override def prettyName: String = "lang_id"
}

/** The token array (== filter(split(s, "\\s+"), _ != "")) without the
  * interpreted HOF filter — feeds vocabulary's explode. */
case class TokensExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    TextStats.tokens(v.asInstanceOf[UTF8String].toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextStats.tokens($c.toString())")
  override protected def withNewChildInternal(c: Expression): TokensExpr = copy(child = c)
  override def prettyName: String = "tokens_of"
}

/** Column-level API. */
object TextFunctions {
  def token_count(c: Column): Column = EU.column(TokenCountExpr(EU.expression(c)))
  def bpeish_token_count(c: Column): Column =
    EU.column(BpeishTokenCountExpr(EU.expression(c)))
  def stopword_count(c: Column, words: Seq[String]): Column =
    EU.column(StopwordCountExpr(EU.expression(c), words.toArray))
  def lang_id(c: Column, langs: Seq[(String, Seq[String])]): Column =
    EU.column(LangIdExpr(EU.expression(c), langs.map(_._1).toArray,
      langs.map(_._2.toArray).toArray))
  def tokens_of(c: Column): Column = EU.column(TokensExpr(EU.expression(c)))
  def minhash_sig(c: Column, k: Int = 5, n: Int = 128, seed: Long = 42L): Column =
    EU.column(MinHashSigExpr(EU.expression(c), k, n, seed))
  def minhash_bands(c: Column, k: Int = 5, bands: Int = 16, rowsPerBand: Int = 8,
      seed: Long = 42L): Column =
    EU.column(MinHashBandsExpr(EU.expression(c), k, bands, rowsPerBand, seed))
  def simhash64(c: Column, seed: Long = 42L): Column =
    EU.column(SimHash64Expr(EU.expression(c), seed))
  def rolling_fingerprint(c: Column, k: Int = 16): Column =
    EU.column(RollingFingerprintExpr(EU.expression(c), k))
  def shingle_hashes(c: Column, k: Int = 5, seed: Long = 42L): Column =
    EU.column(ShingleHashesExpr(EU.expression(c), k, seed))
  def hamming64(a: Column, b: Column): Column =
    EU.column(HammingDistExpr(EU.expression(a), EU.expression(b)))
  def sorted_intersect_count(a: Column, b: Column): Column =
    EU.column(SortedIntersectCountExpr(EU.expression(a), EU.expression(b)))
  def cosine_pair(a: Column, b: Column): Column =
    EU.column(CosinePairExpr(EU.expression(a), EU.expression(b)))
  def cosine_to_query(c: Column, query: Array[Double]): Column =
    EU.column(CosineToQueryExpr(EU.expression(c), query))
  def sign_lsh_bucket(c: Column, bits: Int = 16, seed: Long = 42L): Column =
    EU.column(SignLshBucketExpr(EU.expression(c), bits, seed))
  def sign_lsh_bands(c: Column, bands: Int = 32, bitsPerBand: Int = 10,
      seed: Long = 42L): Column =
    EU.column(SignLshBandsExpr(EU.expression(c), bands, bitsPerBand, seed))
  def nearest_centroid(c: Column, cents: Array[Array[Double]]): Column =
    EU.column(NearestCentroidExpr(EU.expression(c), cents))
}
