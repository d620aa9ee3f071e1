package graft

import org.apache.spark.sql.SparkSession

/**
 * Scaling-efficiency evidence (BASELINE.json north_rule: ≥0.8 from N to 4N
 * executors; sandbox substitute per BASELINE.md: same job at local[8] vs
 * local[32] on the same input). The log is generated once and replayed at
 * both parallelism levels; each level gets a warm-up replay plus `reps`
 * measured replays with the best taken — the sandbox host has co-tenant
 * CPU noise (observed 4× run-to-run swings), so min-of-N is the honest
 * low-interference estimate.
 *
 * Usage: sbt "runMain graft.ScalingBench [numEvents] [reps]"
 */
object ScalingBench {

  private def session(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      // benchmark batches are MBs, not the GBs of the real deployment: AQE
      // would coalesce post-shuffle partitions to 1-2 (64MB advisory) and
      // mask the parallelism under test — keep skew handling, disable
      // small-data coalescing
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def main(args: Array[String]): Unit = {
    val numEvents = args.headOption.map(_.toLong).getOrElse(8000000L)
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val (n, n4) = (8, 32)
    val work = java.nio.file.Files.createTempDirectory("graft-scaling").toString

    def measure(cores: Int): (Double, Double) = {
      val s = session(cores)
      val segments = Bench.genLog(s, work, numEvents, 8)
      Bench.replayOnce(s, segments, numEvents, buckets = 32) // warm-up
      val runs = (1 to reps).map(_ => Bench.replayOnce(s, segments, numEvents, buckets = 32))
      s.stop()
      SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
      runs.minBy(_._1)
    }

    val (secN, epsN) = measure(n)
    val (sec4N, eps4N) = measure(n4)
    Bench.deleteRec(work)

    val efficiency = (eps4N / epsN) / (n4.toDouble / n)
    println(f"""{"bench":"scaling","events":$numEvents,"reps":$reps,"local[$n]_events_per_sec":$epsN%.0f,"local[$n4]_events_per_sec":$eps4N%.0f,"local[$n]_sec":$secN%.2f,"local[$n4]_sec":$sec4N%.2f,"scaling_efficiency":$efficiency%.3f}""")
  }
}
