package graft.rml

import graft.rules.RdfEngine
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * End-to-end RML execution — the engine's equivalents of the reference's
 * two entry points:
 *
 *  - CLI `flexrml -m mapping.ttl -o out.nt` (flexcore.py:307-367)
 *    → [[RmlMapper.executeToFile]]
 *  - library `flexrml.execute(mapping_source=…, data={…})`
 *    (flexcore.py:286-303) → [[RmlMapper.execute]] with `data` supplying
 *    in-memory relations (here: DataFrames or raw CSV strings).
 *
 * Source semantics mirrored from the reference: CSV sources are read with
 * a header row and every value as a string
 * (simple_executor.cpp:380-422); JSON sources are iterated with the
 * `rml:iterator` JSONPath, each match one row, scalar matches becoming a
 * single `value` column (backend.py:408-447). Unlike the reference, JSON
 * is NOT flattened to CSV text — it stays a native nested DataFrame and
 * the iterator compiles to getField/explode.
 */
object RmlMapper {

  /** Run a mapping over file-based sources; returns (s,p,o,g) rows.
    *
    * `csvData` supplies in-memory relations as RAW CSV STRINGS (header row,
    * all values strings) — the reference's library mode
    * `flexrml.execute(data={relation: csv_string})` (flexcore.py:286-303).
    * `strict=true` fails the job on the first invalid IRI (the reference's
    * DEFAULT; our default mirrors its `--continue-on-error` skip-row mode,
    * flexcore.py:318, utils.cpp:186-199). */
  def execute(spark: SparkSession, mappingTtl: String,
      data: Map[String, DataFrame] = Map.empty,
      baseIri: String = "http://example.com/base/",
      nowIso: () => String = null,
      csvData: Map[String, String] = Map.empty,
      strict: Boolean = false): DataFrame = {
    val compiled =
      if (nowIso == null) RmlCompiler.compile(mappingTtl)
      else RmlCompiler.compile(mappingTtl, nowIso)
    executeCompiled(spark, compiled,
      data ++ csvData.map { case (k, v) => k -> csvStringToDf(spark, v) },
      baseIri, strict)
  }

  /** Parse a raw in-memory CSV string exactly like a CSV file source:
    * first line is the header, every value a string
    * (reference simple_executor.cpp:121-131 `open_from_map_or_file`). */
  def csvStringToDf(spark: SparkSession, csv: String): DataFrame = {
    val lines = spark.createDataset(csv.split("\r?\n", -1).toSeq.filter(_.nonEmpty))(
      org.apache.spark.sql.Encoders.STRING)
    spark.read.option("header", "true").option("inferSchema", "false").csv(lines)
  }

  /** Serialized plan cache — the reference's `-gp` (generate plan) /
    * `-p <plan>` (execute saved plan) entry points (flexcore.py:266-282):
    * compile once offline, persist, execute many times without the
    * mapping frontend. The plan is the [[RmlCompiler.Compiled]] ADT
    * (plain serializable case classes). */
  def savePlan(compiled: RmlCompiler.Compiled, path: String): Unit = {
    val out = new java.io.ObjectOutputStream(
      java.nio.file.Files.newOutputStream(java.nio.file.Paths.get(path)))
    try out.writeObject(compiled) finally out.close()
  }

  def loadPlan(path: String): RmlCompiler.Compiled = {
    val in = new java.io.ObjectInputStream(
      java.nio.file.Files.newInputStream(java.nio.file.Paths.get(path)))
    try in.readObject().asInstanceOf[RmlCompiler.Compiled] finally in.close()
  }

  /** Compile-once / execute-many (the reference's plan-cache entry point,
    * `-gp`/`-p` at flexcore.py:266-282): the [[RmlCompiler.Compiled]] plan
    * is a plain value — compile offline, run it against fresh data any
    * number of times (or persist it with [[savePlan]]/[[loadPlan]]). */
  def executeCompiled(spark: SparkSession, compiled: RmlCompiler.Compiled,
      data: Map[String, DataFrame] = Map.empty,
      baseIri: String = "http://example.com/base/",
      strict: Boolean = false): DataFrame = {
    val sources: Map[String, DataFrame] = compiled.sources.map { case (name, spec) =>
      // in-memory relations take precedence (library mode), matched by
      // path/name as in the reference's {relation_name: data} map
      val df = data.get(spec.path).orElse(data.get(name)) match {
        case Some(d) => d
        case None => loadSource(spark, spec)
      }
      name -> df
    }
    RdfEngine.execute(compiled.rules, sources, baseIri, strict = strict)
  }

  /** CLI-equivalent: write N-Triples/N-Quads text output.
    *
    * NOTE the deliberate `coalesce(1)`: this is CLI parity with the
    * reference's single output file (flexcore.py `-o out.nt`), which makes
    * the write a single-task serialization point — fine for mapping-tool
    * outputs (MBs), wrong for bulk exports. Large-scale callers should use
    * [[executeToDir]], which shards the write across tasks. */
  def executeToFile(spark: SparkSession, mappingTtl: String, outPath: String,
      baseIri: String = "http://example.com/base/"): Unit =
    RdfEngine.serialize(execute(spark, mappingTtl, baseIri = baseIri))
      .coalesce(1).write.mode("overwrite").text(outPath)

  /** Sharded N-Triples/N-Quads output (one file per task) — the scalable
    * form of [[executeToFile]] for big mappings. */
  def executeToDir(spark: SparkSession, mappingTtl: String, outDir: String,
      baseIri: String = "http://example.com/base/"): Unit =
    RdfEngine.serialize(execute(spark, mappingTtl, baseIri = baseIri))
      .write.mode("overwrite").text(outDir)

  def loadSource(spark: SparkSession, spec: RmlCompiler.SourceSpec): DataFrame = {
    val path = spec.path
    if (path.endsWith(".json")) loadJson(spark, path, spec.iterator)
    else
      // header = schema, all strings (reference simple_executor.cpp:380-388)
      spark.read.option("header", "true").option("inferSchema", "false").csv(path)
  }

  /** Apply a JSONPath-subset iterator (`$.a.b[*].c`) to a JSON document:
    * each match = one row; object matches widen to columns (union of keys
    * via Spark schema inference); scalar matches become column `value`
    * (reference backend.py:408-447). */
  def loadJson(spark: SparkSession, path: String, iterator: Option[String]): DataFrame = {
    // multiLine handles a whole JSON document (object or array) per file
    val root = spark.read.option("multiLine", "true").json(path)
    iterator match {
      case None | Some("$") => root
      case Some(it) =>
        parseJsonPath(it).foldLeft(root) { (df, seg) =>
          seg match {
            case ArraySeg(name) if name.isEmpty =>
              df // top-level array: Spark's json reader already row-izes it
            case ArraySeg(name) =>
              val exploded = df.select(explode(col(name)).as("_row"))
              exploded.schema.head.dataType match {
                case _: org.apache.spark.sql.types.StructType =>
                  exploded.select("_row.*") // object match → union-of-keys columns
                case _ =>
                  exploded.select(col("_row").cast("string").as("value")) // scalar match
              }
            case IndexSeg(name, idx) =>
              if (name.isEmpty)
                throw RmlCompiler.RmlError(
                  s"unsupported JSONPath (index on top-level array): $it")
              // single element: `$.a[0]` — then widen objects. `get()`
              // (not getItem: ANSI mode throws on out-of-bounds) yields
              // NULL for an out-of-range index, which is then dropped:
              // NO MATCH = zero rows (jsonpath_ng semantics), not a
              // phantom all-NULL record.
              val item = df.select(get(col(name), lit(idx)).as("_row"))
                .filter(col("_row").isNotNull)
              item.schema.head.dataType match {
                case _: org.apache.spark.sql.types.StructType => item.select("_row.*")
                case _ => item.select(col("_row").cast("string").as("value"))
              }
            case FieldSeg(name) => df.select(col(name + ".*"))
            case DescendSeg(target) =>
              // schema-resolved `$..target`: find every parent path whose
              // struct holds a field `target` (descending through arrays);
              // exactly one may exist — jsonpath_ng's multi-match union is
              // out of the bounded form, so ambiguity fails loudly
              import org.apache.spark.sql.types.{ArrayType, StructType}
              def paths(dt: org.apache.spark.sql.types.DataType,
                  prefix: List[String]): List[List[String]] = dt match {
                case st: StructType => st.fields.toList.flatMap { f =>
                  (if (f.name == target) List(prefix) else Nil) ++
                    paths(f.dataType, prefix :+ f.name)
                }
                case at: ArrayType => paths(at.elementType, prefix)
                case _ => Nil
              }
              paths(df.schema, Nil) match {
                case Nil =>
                  throw RmlCompiler.RmlError(
                    s"JSONPath '$$..$target': no field '$target' anywhere in the document schema")
                case path :: Nil =>
                  path.foldLeft(df) { (d, fname) =>
                    var cur = d.select(col(fname).as("_d"))
                    while (cur.schema.head.dataType.isInstanceOf[ArrayType])
                      cur = cur.select(explode(col("_d")).as("_d"))
                    cur.select("_d.*") // guaranteed struct: path came from the schema
                  }
                case many =>
                  throw RmlCompiler.RmlError(
                    s"JSONPath '$$..$target' is ambiguous (${many.size} paths: " +
                      many.map(p => ("$" +: p).mkString(".")).mkString(", ") +
                      ") — bounded descent requires a unique target")
              }
          }
        }
    }
  }

  private sealed trait Seg
  private final case class FieldSeg(name: String) extends Seg
  private final case class ArraySeg(name: String) extends Seg
  private final case class IndexSeg(name: String, idx: Int) extends Seg
  /** `$..name` — descend to the UNIQUE schema path whose parent holds a
    * field `name` (exploding any arrays along the way), then continue with
    * the normal segments. Ambiguous/absent targets are rejected loudly. */
  private final case class DescendSeg(target: String) extends Seg

  /** Parse the `$.students[*]` / `$['students'][*]` / `$.students[0]`
    * subset — dot form plus bracket notation (single or double quotes) plus
    * numeric indices, the shapes the reference accepts after its
    * `$.`/bracket stripping (flexcore.py:261-264; the reference delegates
    * the full grammar to jsonpath_ng, backend.py:408-447). Unsupported
    * jsonpath_ng forms — recursive descent `$..`, filters `[?...]`, slices
    * `[a:b]`, bare-word wildcard `.*` — are REJECTED loudly instead of
    * being misread as field names. Bracket segments are normalized to dot
    * form first. */
  private def parseJsonPath(p: String): Seq[Seg] = {
    import RmlCompiler.RmlError
    // bounded recursive descent: a single LEADING `$..name` is supported
    // (resolved against the inferred schema to its unique path, see
    // loadJson); `..` anywhere else keeps the loud reject
    if (p.startsWith("$..")) {
      val rest = p.drop(3)
      val ident = """^([A-Za-z_][A-Za-z0-9_]*)""".r
      ident.findFirstIn(rest) match {
        case Some(target) if !rest.contains("..") =>
          return DescendSeg(target) +: parseJsonPath("$." + rest)
        case _ =>
          throw RmlError(s"unsupported JSONPath (recursive descent form): $p")
      }
    }
    if (p.contains(".."))
      throw RmlError(s"unsupported JSONPath (recursive descent '..'): $p")
    if (p.contains("[?"))
      throw RmlError(s"unsupported JSONPath (filter expression): $p")
    if ("""\[\s*[-0-9]*\s*:""".r.findFirstIn(p).isDefined)
      throw RmlError(s"unsupported JSONPath (slice): $p")
    val normalized = p.replaceAll("""\[\s*['"]([^'"\]]+)['"]\s*\]""", ".$1")
    val trimmed = normalized.stripPrefix("$").stripPrefix(".")
    // name group must be bracket-free: a compound segment like `a[*][0]`
    // or `a[0][1]` must fall through to the loud-rejection branch, not be
    // misread as a column named "a[*]"
    val idxPat = """([^\[\]]*)\[(\d+)\]$""".r
    if (trimmed.isEmpty) Nil
    else trimmed.split('.').toSeq.filter(_.nonEmpty).map { seg =>
      if (seg == "*") throw RmlError(s"unsupported JSONPath (wildcard member '*'): $p")
      else if (seg.endsWith("[*]")) ArraySeg(seg.dropRight(3))
      else seg match {
        case idxPat(name, i) => IndexSeg(name, i.toInt)
        case _ =>
          if (seg.contains("[") || seg.contains("]"))
            throw RmlError(s"unsupported JSONPath segment '$seg' in: $p")
          FieldSeg(seg)
      }
    }
  }
}
