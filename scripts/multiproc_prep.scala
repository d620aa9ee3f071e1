// 64M-event log split into 4 conv-hash shards of ~16M each
import graft.gen.ChangeLogGen
import org.apache.spark.sql.functions._
val work = "target/shardrun2"
val cfg = ChangeLogGen.Config(numEvents = 64000000L, numConversations = 128000L, maxTurns = 64)
for (p <- 0 until 4) {
  val evolveAt = (cfg.numEvents * cfg.evolveFrac).toLong
  val per = cfg.numEvents / 8
  val cuts = ((0L until cfg.numEvents by per) ++ Seq(evolveAt, cfg.numEvents)).distinct.sorted
  cuts.zip(cuts.tail).zipWithIndex.foreach { case ((lo, hi), i) =>
    ChangeLogGen.events(spark, cfg, lo, hi, withToolCol = lo >= evolveAt)
      .filter(pmod(xxhash64(col("conv_id"), lit(42)), lit(4)) === p)
      .repartition(16)
      .write.mode("overwrite").parquet(f"$work/shard$p/segment-$i%05d")
  }
}
println("SHARDS done")
System.exit(0)
