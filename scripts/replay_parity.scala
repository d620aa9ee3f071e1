// Replay a jsonpath parity fixture (JSONL of {doc, path, expected})
// against RmlMapper.loadJson and print mismatches. Exploration harness
// for alternate-seed fuzzing — the canonical fixture is replayed by the
// RmlSpec test instead. Usage:
//   python3 scripts/gen_jsonpath_parity.py 12345 /tmp/fix.jsonl
//   FIXTURE=/tmp/fix.jsonl /opt/spark/bin/spark-shell --master 'local[8]' \
//     --jars target/scala-2.13/flexrmlspark_2.13-0.1.0.jar \
//     --conf spark.ui.enabled=false -I scripts/replay_parity.scala
{
  val fixture = sys.env.getOrElse("FIXTURE", "/tmp/fix.jsonl")
  val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
  val lines = scala.io.Source.fromFile(fixture, "UTF-8").getLines().toVector
  val dir = java.nio.file.Files.createTempDirectory("parity-replay")
  var bad = 0
  import scala.jdk.CollectionConverters._
  for ((line, i) <- lines.zipWithIndex) {
    val node = mapper.readTree(line)
    val path = node.get("path").asText()
    val expected = node.get("expected").elements().asScala.map(_.asText()).toVector.sorted
    val f = dir.resolve(s"case$i.json")
    java.nio.file.Files.writeString(f, node.get("doc").toString)
    try {
      val got = graft.rml.RmlMapper.loadJson(spark, f.toString, Some(path))
        .collect().map(_.getString(0)).toVector.sorted
      if (got != expected) { bad += 1
        println(s"PARITY-MISMATCH case $i path '$path': got $got, jsonpath_ng $expected")
        println(s"  doc: ${node.get("doc").toString.take(400)}")
      }
    } catch { case e: Throwable => bad += 1
      println(s"PARITY-ERROR case $i path '$path': ${e.getClass.getSimpleName} ${Option(e.getMessage).getOrElse("").take(300)}")
      println(s"  doc: ${node.get("doc").toString.take(400)}")
    }
  }
  println(s"PARITY-DONE cases=${lines.size} mismatches=$bad")
}
