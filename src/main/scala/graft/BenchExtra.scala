package graft

import org.apache.spark.sql.SparkSession

/** Optimization-round measurement harness (guide §1): NOT part of the
  * frozen driver bench. For each declared query it
  *   - dumps `.explain("formatted")` to $SPARK_GRAFT_PLANS_DIR/<name>.txt
  *     (the plan evidence committed under plans/r06/), and
  *   - times construction + count() (the driver's action) and a noop-sink
  *     run (computes every column, § 1.4) over `reps` repetitions.
  * Query subset selectable via args; prints one JSON line per query. */
object BenchExtra {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val plansDir = sys.env.getOrElse("SPARK_GRAFT_PLANS_DIR", "")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val noop = sys.env.getOrElse("SPARK_GRAFT_NOOP", "1") == "1"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val filter = args.toSet
    val names = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => filter.isEmpty || filter.contains(n) }
    // warm-up (codegen/JIT) with the first selected query
    try names.head._2(spark, sfDir).count() catch { case _: Throwable => () }
    names.foreach { case (name, fn) =>
      spark.sparkContext.setJobDescription(name)
      val times = (0 until reps).map { _ =>
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val tBuild = System.nanoTime()
        df.count()
        val tCount = System.nanoTime()
        if (noop) df.write.format("noop").mode("overwrite").save()
        val tNoop = System.nanoTime()
        ((tBuild - t0) / 1e9, (tCount - tBuild) / 1e9, (tNoop - tCount) / 1e9)
      }
      if (plansDir.nonEmpty) {
        val df = fn(spark, sfDir)
        val s = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(plansDir))
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$plansDir/$name.txt"), s)
      }
      val b = times.map(_._1).min; val c = times.map(_._2).min; val n = times.map(_._3).min
      println(f"""{"q":"$name","build_s":$b%.3f,"count_s":$c%.3f,"noop_s":$n%.3f,"total_min_s":${b + c}%.3f}""")
      spark.sparkContext.setJobDescription(null)
    }
    spark.stop()
  }
}
