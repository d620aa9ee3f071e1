package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TopKRewriteSpec extends SparkSpec {
  import spark.implicits._

  private def naiveTopK = {
    val df = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select("o_orderpriority", "o_orderkey", "o_totalprice")
    df.withColumn("rn", row_number().over(
        Window.partitionBy(col("o_orderpriority"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)))
      .filter(col("rn") <= 3)
  }

  private def withRule[T](enabled: Boolean)(body: => T): T = {
    val clz = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val before = clz.experimental.extraOptimizations
    clz.experimental.extraOptimizations = before :+ TopKPerGroupRewrite
    spark.conf.set("spark.graft.topkRewrite.enabled", enabled.toString)
    try body
    finally {
      clz.experimental.extraOptimizations = before
      spark.conf.unset("spark.graft.topkRewrite.enabled")
    }
  }

  test("optimizer rule rewrites naive window top-k into the salted two-stage plan") {
    val expected = naiveTopK.collect().map(_.toString).sorted.toSeq

    val (rows, plan) = withRule(enabled = true) {
      val df = naiveTopK
      (df.collect().map(_.toString).sorted.toSeq,
        df.queryExecution.optimizedPlan.toString)
    }
    assert(plan.contains("__graft_rn1"), s"rewrite did not fire:\n$plan")
    assert("Window".r.findAllIn(plan).length >= 2, s"expected two windows:\n$plan")
    assert(rows == expected, "rewritten plan must be row-identical")

    val planOff = withRule(enabled = false) {
      naiveTopK.queryExecution.optimizedPlan.toString
    }
    assert(!planOff.contains("__graft_rn1"), "rule must be conf-gated off by default")
  }

  test("all-ties ORDER BY: rewrite degrades to one effective slice but stays row-correct") {
    // every row of a group carries the SAME order value → hash(O)%S is one
    // slice per group; stage 1 = naive window + k-filter, stage 2 re-ranks
    // the k survivors — correct output, no speedup (the documented
    // degradation mode of the order-expr salt)
    val df = (0 until 1000).map(i => (i % 3, i, 7L)).toDF("grp", "id", "tied")
    def q = df.withColumn("rn", row_number().over(
        Window.partitionBy(col("grp")).orderBy(col("tied").desc)))
      .filter(col("rn") <= 5)
    val expectedCounts = withRule(enabled = false) {
      q.groupBy("grp").count().as[(Int, Long)].collect().toMap
    }
    val (counts, plan) = withRule(enabled = true) {
      (q.groupBy("grp").count().as[(Int, Long)].collect().toMap,
        q.queryExecution.optimizedPlan.toString)
    }
    assert(plan.contains("__graft_rn1"), "rewrite still fires on tied orderings")
    // among total ties any k rows are a valid top-k; row counts per group
    // are the deterministic part of the contract
    assert(counts == expectedCounts && counts.values.forall(_ == 5L),
      s"all-ties group must still yield exactly k rows per group: $counts")
  }

  test("rewrite is idempotent under the optimizer's fixed-point loop") {
    withRule(enabled = true) {
      val plan = naiveTopK.queryExecution.optimizedPlan.toString
      assert("__graft_rn1".r.findAllIn(plan).length <= 2, // alias decl + attr use
        s"rule reapplied to its own output:\n$plan")
    }
  }
}
