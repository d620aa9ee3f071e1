package graft.lake

import graft.SparkSpec
import graft.cdc.CdcApply
import graft.model.Model
import org.apache.spark.sql.DataFrame

/** Pure-batch stress for the background-compaction / ordered-commit race:
  * many small MoR batches with an aggressive compaction trigger on the
  * maintenance thread, then full-state comparison against an in-memory
  * LWW oracle. No streaming involved — isolates the LakeTable layer
  * (the round-6 forensic dump of the abort-restart divergence showed every
  * journaled batch applied with exact footer counts, so the loss had to be
  * in the fold/read layer, not recovery). */
class CompactRaceSpec extends SparkSpec {
  import spark.implicits._

  private def randomEvents(seed: Long, n: Int): Seq[(Long, String, String, Int, String, String)] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      val op = rnd.nextInt(10) match { case 0 => "D"; case x if x < 4 => "U"; case _ => "I" }
      (i.toLong, op, s"c${rnd.nextInt(40)}", rnd.nextInt(8), "user", s"t-$i")
    }
  }

  private def toDf(rows: Seq[(Long, String, String, Int, String, String)]): DataFrame =
    rows.toDF("lsn", "op", "conv_id", "turn_idx", "role", "text")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_seconds(
        org.apache.spark.sql.functions.col("lsn") + 1700000000L))

  test("200 small MoR batches + aggressive background compaction == LWW oracle") {
    val rows = randomEvents(1234L, 4000)
    val table = new LakeTable(spark, tmpDir("crace-table"), numBuckets = 2)
    table.create(Model.transcriptSchema)
    val opts = CdcApply.Options(mergeOnRead = true, compactEvery = 2,
      pipelineDepth = 1)
    rows.grouped(20).zipWithIndex.foreach { case (chunk, i) =>
      CdcApply.applyBatch(table, toDf(chunk), i.toLong, opts)
    }
    table.awaitMaintenance()
    // in-memory oracle: max-lsn winner per key, deletes drop the key
    val winners = rows.groupBy(r => (r._3, r._4)).map { case (k, evs) =>
      k -> evs.maxBy(_._1)
    }
    val expect = winners.collect { case (k, e) if e._2 != "D" => k -> e._6 }.toMap
    val got = table.read().collect()
      .map(r => ((r.getString(0), r.getInt(1)), r.getString(3))).toMap
    assert(got == expect,
      s"missing=${expect.keySet -- got.keySet} extra=${got.keySet -- expect.keySet} " +
        s"stale=${(got.keySet & expect.keySet).filter(k => got(k) != expect(k))}")
  }
}
