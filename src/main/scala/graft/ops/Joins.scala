package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Scale-safe join operators Spark lacks as primitives — engine extensions
 * beyond the reference's inner equi-join (SURVEY.md §2.2), built the
 * Spark-first way: both compile to ONE keyed shuffle + narrow operators,
 * never a nested-loop or per-key explode.
 */
object Joins {

  /** AS-OF join: for every left row, the single latest right row whose
    * `rightOrd` ≤ the left row's `leftOrd`, per key (inclusive — the
    * time-series/CDC "most recent fact at event time" join).
    *
    * Plan: tag sides, align schemas, UNION, then one window per key ordered
    * by (ord, side) with `last(value, ignoreNulls)` carrying the most
    * recent right values forward into each left row. ONE exchange on the
    * key, no range explosion, no per-key nested loop — the carried-forward
    * union is the scalable as-of idiom (parallelism = #keys × AQE splits,
    * and keys are high-cardinality in time-series data by construction).
    *
    * @param valueCols right-side columns to carry onto left rows (null
    *                  when no right row precedes the left row) */
  def asofJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftOrd: String, rightOrd: String, valueCols: Seq[String]): DataFrame = {
    val leftPayload = left.columns.filterNot(c => keyCols.contains(c) || c == leftOrd).toSeq
    // aligned union schema: keys ++ _ord ++ _side ++ left payload ++ carried values
    val l = left.select(
      keyCols.map(col) ++ Seq(col(leftOrd).as("_ord"), lit(1).as("_side")) ++
        leftPayload.map(col) ++ valueCols.map(c => lit(null).cast(right.schema(c).dataType).as(c)): _*)
    val r = right.select(
      keyCols.map(col) ++ Seq(col(rightOrd).as("_ord"), lit(0).as("_side")) ++
        leftPayload.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++ valueCols.map(col): _*)
    // right rows sort BEFORE left rows at equal ord (side 0 < 1) → inclusive ≤
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("_ord").asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // ONE struct built only on right-side rows carries ALL value columns
    // together: the struct is non-null even when its members are null, so a
    // genuinely-NULL latest right value propagates (per-column
    // last(ignoreNulls) would skip it and resurrect an older row's value)
    // and every output value comes from the SAME right row.
    val carried = l.unionByName(r)
      .withColumn("_vals", last(
        when(col("_side") === 0, struct(valueCols.map(col): _*)),
        ignoreNulls = true).over(w))
    valueCols.foldLeft(carried) { (df, c) => df.withColumn(c, col(s"_vals.$c")) }
      .filter(col("_side") === 1)
      .select(keyCols.map(col) ++ Seq(col("_ord").as(leftOrd)) ++
        (leftPayload ++ valueCols).map(col): _*)
  }

  /** Range (interval-containment) join: points `p` ∈ intervals [lo, hi],
    * executed as a BINNED equi-join — intervals explode to the integer
    * bins they cover, points map to their single bin, the join runs on the
    * bin key, and the exact predicate filters residuals. Turns what Spark
    * would plan as a BroadcastNestedLoopJoin into a hash join whose cost is
    * O(points + intervals × span/binWidth); `binWidth` should be ≥ the
    * typical interval width so each interval covers O(1) bins. */
  def rangeJoin(points: DataFrame, pointCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      binWidth: Double): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val p = points.withColumn("_bin", floor(col(pointCol) / binWidth).cast("long"))
    val i = intervals
      .withColumn("_bin", explode(sequence(
        floor(col(loCol) / binWidth).cast("long"),
        floor(col(hiCol) / binWidth).cast("long"))))
    p.join(i, Seq("_bin"), "inner")
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("_bin")
  }
}
