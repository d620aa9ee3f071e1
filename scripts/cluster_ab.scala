// One-off A/B for CLUSTERED (sort-ordered) compaction vs the default
// hash-salted (binpack) rewrite at 2M events / 32 buckets: build cost,
// files touched per point read, and point-read wall time. Usage:
//   /opt/spark/bin/spark-shell --master 'local[16]' \
//     --jars target/scala-2.13/flexrmlspark_2.13-0.1.0.jar \
//     --conf spark.ui.enabled=false -I scripts/cluster_ab.scala
{
  import graft.cdc.CdcApply
  import graft.lake.LakeTable
  // NOTE: with numBuckets >= cores the default compact writes ONE file per
  // bucket and point-read pruning is already perfect — clustering only
  // changes anything when buckets carry MULTIPLE salted slices (hot-bucket
  // salting, or buckets << cores). Measure that regime: 8 buckets at
  // local[16] -> 2 slices per bucket.
  val BUCKETS = sys.env.getOrElse("AB_BUCKETS", "8").toInt
  val work = java.nio.file.Files.createTempDirectory("graft-cluster-ab").toString
  val segments = graft.Bench.genLog(spark, work, 2000000L, 4)
  def build(clustered: Boolean): (LakeTable, Double) = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft-clus-$clustered").toString
    val t = new LakeTable(spark, dir, numBuckets = BUCKETS)
    t.create(graft.model.Model.transcriptSchema)
    val t0 = System.nanoTime
    CdcApply.replay(spark, t, segments, CdcApply.Options(mergeOnRead = true,
      compactEvery = 16, clusteredCompaction = clustered))
    t.compact(clustered = clustered) // final fold: base now dominates reads
    (t, (System.nanoTime - t0) / 1e9)
  }
  // interleave reps so JVM/codegen warmup doesn't favor whichever runs
  // second; report the min (calmest) build per mode
  val (_, warmA) = build(false); val (_, warmB) = build(true)
  val (tA, secA0) = build(false)
  val (tB, secB0) = build(true)
  val secA = math.min(warmA, secA0); val secB = math.min(warmB, secB0)
  val convs = tA.read().select("conv_id").distinct().orderBy("conv_id")
    .limit(500).collect().map(_.getString(0))
  val sample = convs.indices.filter(_ % 25 == 0).map(convs).toSeq
  val filesA = sample.map(c => tA.filesForConv(c).size)
  val filesB = sample.map(c => tB.filesForConv(c).size)
  def timeReads(t: LakeTable): Double = {
    val s = System.nanoTime; sample.foreach(c => t.readConv(c).count())
    (System.nanoTime - s) / 1e9
  }
  val rA = timeReads(tA); val rB = timeReads(tB)
  val cA = tA.read().count(); val cB = tB.read().count()
  println(f"CLUSTER-AB build_sec unclustered=$secA%.2f clustered=$secB%.2f ratio=${secB / secA}%.3f")
  println(f"CLUSTER-AB files_per_point_read unclustered=${filesA.sum.toDouble / filesA.size}%.1f clustered=${filesB.sum.toDouble / filesB.size}%.1f (n=${sample.size})")
  println(f"CLUSTER-AB point_reads_sec n=${sample.size} unclustered=$rA%.2f clustered=$rB%.2f speedup=${rA / rB}%.2f")
  println(s"CLUSTER-AB rows unclustered=$cA clustered=$cB equal=${cA == cB}")
}
sys.exit(0)
