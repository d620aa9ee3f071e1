package graft.rml

import org.apache.spark.sql.SparkSession

/**
 * CLI parity with the reference's `flexrml` entry point
 * (flexcore.py:307-367):
 *
 *   runMain graft.rml.RmlCli -m mapping.ttl -o out.nt [-b baseIri]
 *                            [--continue-on-error] [-gp plan.bin]
 *                            [-p plan.bin]
 *
 *  -m   mapping Turtle file (frontend: parse → normalize → compile)
 *  -o   N-Triples/N-Quads output path
 *  -b   base IRI for relative-IRI resolution
 *  -gp  compile the mapping, serialize the PLAN to this path, and stop
 *       (reference flexcore.py:266-268)
 *  -p   skip the frontend: execute a previously saved plan
 *       (reference flexcore.py:274-282)
 *  --continue-on-error  skip rows producing invalid IRIs instead of
 *       failing (reference default is hard exit; flexcore.py:318)
 */
object RmlCli {

  def main(args: Array[String]): Unit = {
    val opts = parse(args.toList, Map.empty)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, opts) finally spark.stop()
  }

  private[rml] def run(spark: SparkSession, opts: Map[String, String]): Unit = {
    val baseIri = opts.getOrElse("base", "http://example.com/base/")
    val strict = !opts.contains("continue-on-error")
    (opts.get("mapping"), opts.get("genPlan"), opts.get("plan")) match {
      case (Some(m), Some(planOut), _) =>
        val ttl = java.nio.file.Files.readString(java.nio.file.Paths.get(m))
        RmlMapper.savePlan(RmlCompiler.compile(ttl), planOut)
        println(s"plan written: $planOut")
      case (_, None, Some(planIn)) =>
        val out = opts.getOrElse("out", sys.error("missing -o <out>"))
        val compiled = RmlMapper.loadPlan(planIn)
        graft.rules.RdfEngine.serialize(
          RmlMapper.executeCompiled(spark, compiled, baseIri = baseIri, strict = strict))
          .coalesce(1).write.mode("overwrite").text(out)
      case (Some(m), None, None) =>
        val out = opts.getOrElse("out", sys.error("missing -o <out>"))
        val ttl = java.nio.file.Files.readString(java.nio.file.Paths.get(m))
        graft.rules.RdfEngine.serialize(
          RmlMapper.execute(spark, ttl, baseIri = baseIri, strict = strict))
          .coalesce(1).write.mode("overwrite").text(out)
      case _ => sys.error("usage: -m mapping.ttl -o out.nt | -m mapping.ttl -gp plan.bin | -p plan.bin -o out.nt")
    }
  }

  @annotation.tailrec
  private def parse(args: List[String], acc: Map[String, String]): Map[String, String] =
    args match {
      case "-m" :: v :: rest => parse(rest, acc + ("mapping" -> v))
      case "-o" :: v :: rest => parse(rest, acc + ("out" -> v))
      case "-b" :: v :: rest => parse(rest, acc + ("base" -> v))
      case "-gp" :: v :: rest => parse(rest, acc + ("genPlan" -> v))
      case "-p" :: v :: rest => parse(rest, acc + ("plan" -> v))
      case "--continue-on-error" :: rest => parse(rest, acc + ("continue-on-error" -> "1"))
      case Nil => acc
      case other :: _ => sys.error(s"unknown argument: $other")
    }
}
