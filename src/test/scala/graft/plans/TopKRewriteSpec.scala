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

  test("rewrite is idempotent under the optimizer's fixed-point loop") {
    withRule(enabled = true) {
      val plan = naiveTopK.queryExecution.optimizedPlan.toString
      assert("__graft_rn1".r.findAllIn(plan).length <= 2, // alias decl + attr use
        s"rule reapplied to its own output:\n$plan")
    }
  }
}
