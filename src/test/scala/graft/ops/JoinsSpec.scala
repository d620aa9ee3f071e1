package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class JoinsSpec extends SparkSpec {
  import spark.implicits._

  test("asofJoin: latest right value at or before each left row, per key") {
    val left = Seq((1L, 10L, "a"), (1L, 20L, "b"), (1L, 5L, "early"), (2L, 15L, "c"), (3L, 9L, "nokey"))
      .toDF("k", "t", "pay")
    val right = Seq((1L, 5L, 100.0), (1L, 20L, 200.0), (1L, 30L, 999.0), (2L, 30L, 300.0))
      .toDF("k", "rt", "v")
    val got = Joins.asofJoin(left, right, Seq("k"), "t", "rt", Seq("v"))
      .select("k", "t", "pay", "v").as[(Long, Long, String, Option[Double])]
      .collect().toSet
    assert(got == Set(
      (1L, 5L, "early", Some(100.0)), // inclusive: rt == t matches
      (1L, 10L, "a", Some(100.0)),
      (1L, 20L, "b", Some(200.0)),
      (2L, 15L, "c", None),           // right rows only after t
      (3L, 9L, "nokey", None)))       // no right rows for key
  }

  test("asofJoin equals scala brute-force oracle on random data") {
    val rnd = new scala.util.Random(3)
    val lrows = (0 until 300).map(i => (rnd.nextInt(10).toLong, rnd.nextInt(1000).toLong, i.toLong))
    val rrows = (0 until 200).map(i => (rnd.nextInt(10).toLong, rnd.nextInt(1000).toLong, i * 1.5))
    // make right (k, rt) unique so the expected value is well-defined
    val runiq = rrows.groupBy(r => (r._1, r._2)).map(_._2.maxBy(_._3)).toSeq
    val got = Joins.asofJoin(lrows.toDF("k", "t", "id"), runiq.toDF("k", "rt", "v"),
        Seq("k"), "t", "rt", Seq("v"))
      .select("k", "t", "id", "v").as[(Long, Long, Long, Option[Double])]
      .collect().map(r => (r._1, r._2, r._3) -> r._4).toMap
    lrows.foreach { case (k, t, id) =>
      val exp = runiq.filter(r => r._1 == k && r._2 <= t).sortBy(_._2).lastOption.map(_._3)
      assert(got((k, t, id)) == exp, s"key=$k t=$t")
    }
  }

  test("asofJoin: NULL right values propagate; multi-column values stay row-consistent") {
    // right row at rt=20 has v1=NULL — the as-of result at t>=20 must carry
    // that NULL (not resurrect rt=5's 100.0), and v2 must come from the
    // SAME right row as v1
    val left = Seq((1L, 25L, "x"), (1L, 7L, "y")).toDF("k", "t", "pay")
    val right = Seq(
      (1L, 5L, Some(100.0), Some("a")),
      (1L, 20L, None: Option[Double], Some("b"))).toDF("k", "rt", "v1", "v2")
    val got = Joins.asofJoin(left, right, Seq("k"), "t", "rt", Seq("v1", "v2"))
      .select("k", "t", "v1", "v2").as[(Long, Long, Option[Double], Option[String])]
      .collect().toSet
    assert(got == Set(
      (1L, 25L, None, Some("b")),      // rt=20 row: v1 genuinely NULL, v2 "b"
      (1L, 7L, Some(100.0), Some("a")))) // rt=5 row intact
  }

  test("rangeJoin: binned equi-join equals brute-force predicate join") {
    val rnd = new scala.util.Random(5)
    val pts = (0 until 500).map(i => (i.toLong, rnd.nextDouble() * 1000)).toDF("pid", "v")
    val ivs = (0 until 80).map { i =>
      val lo = rnd.nextDouble() * 950
      (i.toLong, lo, lo + rnd.nextDouble() * 40)
    }.toDF("iid", "lo", "hi")
    val got = Joins.rangeJoin(pts, "v", ivs, "lo", "hi", binWidth = 50)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    val brute = pts.as("p").join(ivs.as("i"),
        col("p.v") >= col("i.lo") && col("p.v") <= col("i.hi"))
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got == brute)
    assert(got.nonEmpty, "fixture should produce matches")
    // plan sanity: the binned join must be a hash/sort-merge join on _bin,
    // not a nested loop
    val plan = Joins.rangeJoin(pts, "v", ivs, "lo", "hi", 50)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
