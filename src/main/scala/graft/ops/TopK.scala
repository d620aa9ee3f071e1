package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Scale-safe top-k per group. A plain `row_number().over(partitionBy(g))`
 * caps parallelism at the number of DISTINCT GROUPS — with 5 groups a
 * 1000-executor cluster runs 5 tasks, and every row of a group funnels
 * through one task (the classic low-cardinality window trap). The salted
 * two-stage plan restores full parallelism:
 *
 *   stage 1: partition by (group, salt) — `salt` slices per group — and
 *            keep each slice's local top-k (correct because the global
 *            top-k of a union is contained in the union of local top-ks);
 *   stage 2: re-window the ≤ groups×salt×k survivors by group alone —
 *            trivially small — to produce the exact ranks.
 *
 * Output = input columns + `rn` (1..k per group), identical to the naive
 * single-window plan row-for-row when `ordering` is total (ties broken).
 */
object TopK {

  /** @param ordering  sort expressions, most-significant first, must
    *                  totally order rows within a group (break ties with a
    *                  unique key) so results are deterministic
    * @param saltExpr  deterministic expression spreading each group's rows
    *                  across slices — hash of a unique/high-cardinality
    *                  column (NOT the group key)
    * @param salt      slices per group; parallelism becomes groups×salt */
  def topKPerGroup(df: DataFrame, groupCols: Seq[String], ordering: Seq[Column],
      k: Int, saltExpr: Column, salt: Int = 32): DataFrame = {
    val gcols = groupCols.map(col)
    val sliced = df.withColumn("_salt", pmod(saltExpr, lit(salt)))
    val stage1 = sliced
      .withColumn("_rn1", row_number().over(
        Window.partitionBy((gcols :+ col("_salt")): _*).orderBy(ordering: _*)))
      .filter(col("_rn1") <= k)
      .drop("_salt", "_rn1")
    stage1
      .withColumn("rn", row_number().over(
        Window.partitionBy(gcols: _*).orderBy(ordering: _*)))
      .filter(col("rn") <= k)
  }
}
