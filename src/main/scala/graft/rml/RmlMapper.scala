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

  /** Apply a JSONPath iterator to a JSON document: each match = one row;
    * object matches widen to columns (union of keys via Spark schema
    * inference); scalar matches become column `value` (reference
    * backend.py:408-447). The grammar matches what the reference's
    * `jsonpath_ng` (BASE grammar, backend.py:7) accepts: dot + bracket
    * fields (quoted names may contain dots), `[*]`, numeric indices
    * (incl. negative), Python slices `[a:b:c]` (positive step), member
    * wildcard `.*`, index unions `[0,2]`, field unions `['a','b']`, and
    * recursive descent `..name` at any position (schema-resolved;
    * multiple target paths union). jsonpath_ng's singleton-wrap quirk is
    * honored: `[*]` and slices on a NON-list value treat it as a
    * one-element list (`$.o[*]` matches the object itself). Filter
    * expressions `[?...]` are a loud reject HERE AND in the reference
    * (base jsonpath_ng lexes them as errors — only the unused
    * `jsonpath_ng.ext` grammar has filters); numeric indexing a
    * non-array follows the probed library behavior (see
    * [[indexNonArray]]): strings char-index, dicts/nulls match
    * nothing, numbers/booleans loud-reject, and lexemes a non-string
    * reading would crash on raise at runtime rather than answer
    * silently. */
  def loadJson(spark: SparkSession, path: String, iterator: Option[String]): DataFrame = {
    // multiLine handles a whole JSON document (object or array) per file
    val root = spark.read.option("multiLine", "true").json(path)
    iterator match {
      case None | Some("$") => root
      case Some(it) =>
        val segs = parseJsonPath(it)
        // jsonpath_ng field access on an ARRAY-rooted document matches
        // nothing (Fields falls through on lists) — and that includes
        // every named form: $.a, $.*, $['a','b'], $.a[*], $.a[0],
        // $.a[0,1], $.a[1:3] all start with Fields and so all match
        // NOTHING on an array root. Spark has already row-ized the
        // array, so silently treating elements as the root object would
        // fabricate matches — reject loudly instead. `$[*]` (iterate
        // the root array) and `..` descent (which DOES enter list
        // elements in jsonpath_ng) stay valid.
        val headIsFieldAccess = segs.headOption.exists {
          case FieldSeg(_) | WildcardSeg | FieldUnionSeg(_, _) => true
          case ArraySeg(n) => n.nonEmpty
          case IndexSeg(n, _) => n.nonEmpty
          case IndexUnionSeg(n, _) => n.nonEmpty
          case SliceSeg(n, _, _, _) => n.nonEmpty
          case _ => false
        }
        if (headIsFieldAccess && jsonRootIsArray(path))
          throw RmlCompiler.RmlError(
            s"JSONPath '$it': the document root is an array — field access on an " +
              "array root matches nothing in jsonpath_ng; iterate it with $[*] (or use ..descent)")
        applyAll(root, segs.toList, it)
    }
  }

  /** Peek the first non-whitespace byte: '[' = array-rooted document.
    * For a DIRECTORY source (spark.read.json accepts one, row-izing each
    * file) the files share a root shape in practice, so peek the first
    * regular file — without this, the array-root guard would silently
    * skip exactly the multi-file case where Spark fabricates one row per
    * array element. Globs/URIs and any read trouble conservatively
    * report false (documented single-path heuristic). */
  private def jsonRootIsArray(path: String): Boolean = {
    try {
      val f = new java.io.File(path)
      val probe: Option[java.io.File] =
        if (f.isFile) Some(f)
        else if (f.isDirectory)
          Option(f.listFiles()).toSeq.flatten
            .filter(c => c.isFile && !c.getName.startsWith(".") && !c.getName.startsWith("_"))
            .sortBy(_.getName).headOption
        else None
      probe.exists { pf =>
        val in = new java.io.FileInputStream(pf)
        try {
          val buf = new Array[Byte](512)
          val n = in.read(buf)
          (0 until math.max(n, 0)).iterator.map(buf(_).toChar)
            .find(!_.isWhitespace).contains('[')
        } finally in.close()
      }
    } catch { case _: Throwable => false }
  }

  import org.apache.spark.sql.types.{ArrayType, DataType, NullType, StringType, StructType}
  import org.apache.spark.sql.Column

  /** Backtick-quote a field name for string-based column access when it
    * contains anything beyond identifier characters (e.g. a literal dot
    * from `$['a.b']`). */
  private def q(name: String): String =
    if (name.matches("[A-Za-z_][A-Za-z0-9_]*")) name
    else "`" + name.replace("`", "``") + "`"

  /** Row-ize a single-column frame of match values: object matches widen
    * to union-of-keys columns, scalar matches become a `value` column
    * (reference preprocess_json, backend.py:430-447). A match that is
    * itself an array needs an explicit `[*]`/index/slice to iterate.
    * `what` names the offending construct in the array-reject message. */
  private def widen(matches: DataFrame, it: String, what: String): DataFrame = {
    val c = matches.columns.head
    matches.schema.head.dataType match {
      case _: StructType => matches.select(q(c) + ".*")
      case _: ArrayType =>
        throw RmlCompiler.RmlError(
          s"JSONPath '$it': $what is an array — append [*], an index or a slice to iterate it")
      case _ => matches.select(col(q(c)).cast("string").as("value", scalarMatchMeta))
    }
  }

  /** Explode a single-column frame through any depth of array nesting.
    * This is the shape `..`-descent enters: jsonpath_ng's Descendants
    * walks list elements (unlike plain field/index access, which falls
    * through on lists), so a segment whose match is array-valued must
    * flatten to the elements before a following descent resolves within
    * them. No-op on non-array frames. */
  private def flattenArrays(df: DataFrame): DataFrame = {
    var cur = df
    while (cur.schema.head.dataType.isInstanceOf[ArrayType]) {
      val c = cur.schema.head.name
      cur = cur.select(explode(col(q(c))).as(c))
    }
    cur
  }

  /** What the NEXT segment needs from the current match: `Plain` rows
    * widen immediately; a following `..` flattens arrays first
    * (Descendants enters lists); a following chained bracket group
    * (`a[*][-1]`) consumes the RAW single-column match unwidened. */
  private sealed trait Next
  private object Next {
    case object Plain extends Next
    case object Descend extends Next
    case object Chain extends Next
  }
  private def nextOf(rest: List[Seg]): Next = rest.headOption match {
    case Some(_: DescendSeg) => Next.Descend
    case Some(_: ChainSeg) => Next.Chain
    case _ => Next.Plain
  }

  /** Finalize a raw single-column (`_row`) match frame per what the
    * next segment needs — see [[Next]]. */
  private def finishMatch(raw: DataFrame, it: String, what: String,
      next: Next): DataFrame = next match {
    case Next.Chain => raw
    case Next.Descend => widen(flattenArrays(raw), it, what)
    case Next.Plain => widen(raw, it, what)
  }

  /** True iff `name` is an ARRAY field; absent fields throw the loud
    * no-field RmlError. Non-array presence routes [*]/slices to the
    * jsonpath_ng singleton-wrap quirk in [[applySeg]]. */
  private def isArrayField(df: DataFrame, name: String, it: String): Boolean =
    df.schema.find(_.name == name).map(_.dataType) match {
      case Some(_: ArrayType) => true
      case Some(_) => false
      case None =>
        throw RmlCompiler.RmlError(
          s"JSONPath '$it': no field '$name' in the document schema")
    }

  /** Numeric index on a NON-array match value — probed base jsonpath_ng
    * 1.8.0 semantics (2026-08-18): STRINGS char-index (`$.a[0]` on "hi"
    * matches 'h') with Python negative indexes; out-of-range positive =
    * no match, out-of-range negative IndexErrors in the reference
    * (graceful no-match is our documented superset, same as the array
    * path); DICTS and JSON nulls yield no value (index ≥ len(dict) is
    * `[]`, below it a KeyError — no-match is the honest non-crashing
    * behavior, mirroring that negative-index policy); NUMBERS/BOOLEANS
    * are a pure TypeError crash surface → loud reject. `raw` is a
    * single-column match frame; returns the raw `_row` frame.
    *
    * A StringType column is only PROBABLY a genuine JSON string: Spark's
    * schema unification stringifies numbers/booleans in mixed-type
    * fields, and array-vs-object conflicts degrade a field to its raw
    * JSON text — lexemes byte-identical to genuine strings that crash
    * the reference when read as their non-string type. So in-range
    * char-indexing RAISES at runtime on any lexeme that also parses as
    * a non-string JSON value (first char `-0-9{[`, or exactly
    * true/false/null) — never a silent answer either reading would
    * dispute. Out-of-range stays quiet no-match: the string reading
    * matches nothing there, making it the usual documented superset of
    * the non-string reading's crash. */
  private def indexNonArray(raw: DataFrame, idx: Int, it: String,
      disp: String): DataFrame = {
    val c = raw.columns.head
    raw.schema.head.dataType match {
      case StringType =>
        val s0 = col(q(c))
        raw.select(s0.as("_s"),
            (if (idx >= 0) lit(idx) else length(s0) + idx).as("_at"),
            length(s0).as("_n"))
          .filter(col("_at") >= 0 && col("_at") < col("_n"))
          .select(when(
              col("_s").rlike("^[-0-9{\\[]") ||
                col("_s").isin("true", "false", "null"),
              raise_error(concat(
                lit(s"JSONPath '$it': char-index [$idx] on a lexeme " +
                  "indistinguishable from a non-string JSON value " +
                  "(base jsonpath_ng crashes on the non-string reading): "),
                col("_s"))))
            .otherwise(substring(col("_s"), col("_at") + 1, lit(1)))
            .as("_row"))
      case (_: StructType) | NullType =>
        raw.select(col(q(c)).as("_row")).where(lit(false))
      case other =>
        throw RmlCompiler.RmlError(
          s"JSONPath '$it': index [$idx] on $disp of type ${other.simpleString} " +
            "(base jsonpath_ng crashes here)")
    }
  }

  /** True when the optimizer proves `df` matches nothing (our dict/null
    * no-match frames fold to an empty LocalRelation through any stack of
    * selects/filters). Branch navigation drops such finals before the
    * scalar-vs-object shape check: a branch that CANNOT match must not
    * veto the shape of branches that do — jsonpath_ng simply yields the
    * live branches' matches. */
  private def staticallyNoMatch(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan match {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation =>
        l.data.isEmpty
      case _ => false
    }

  /** `$.a[i]` with Python negative-index semantics; out-of-range = NO
    * match (zero rows), not a phantom all-NULL record. The no-match
    * filter is on the normalized INDEX vs the array length — not on the
    * value — so a genuine JSON null element at an in-range position IS
    * a match (jsonpath_ng matches None there), consistent with the
    * slice path's posexplode. `get()` (not getItem) because ANSI mode
    * throws on out-of-bounds. A null/absent array: size() is NULL under
    * ANSI, the range predicate is NULL, the row drops — no match. */
  private def indexSelect(df: DataFrame, name: String, idx: Int): DataFrame = {
    val arr = col(q(name))
    val at = if (idx >= 0) lit(idx) else size(arr) + idx
    df.select(get(arr, at).as("_row"), at.as("_at"), size(arr).as("_n"))
      .filter(col("_at") >= 0 && col("_at") < col("_n"))
      .select("_row")
  }

  /** Python slice semantics against the per-row array length: negative
    * bounds count from the end, omitted bounds span the array, step
    * strides from the (normalized) start. Returns the raw `_row` frame
    * of kept elements. */
  private def sliceArray(df: DataFrame, name: String, startO: Option[Int],
      endO: Option[Int], step: Int): DataFrame = {
    val arr = col(q(name))
    val exploded = df.select(size(arr).as("_n"), posexplode(arr).as(Seq("_i", "_row")))
    val n = col("_n")
    def norm(v: Int): Column = if (v < 0) greatest(n + v, lit(0)) else least(lit(v), n)
    val lo = startO.map(norm).getOrElse(lit(0))
    val hi = endO.map(norm).getOrElse(n)
    exploded
      .filter(col("_i") >= lo && col("_i") < hi && (col("_i") - lo) % step === 0)
      .select(col("_row"))
  }

  /** A bracket group CHAINED after another on the same token
    * (`a[*][-1]`) applies to the previous group's RAW match in `_row`.
    * On an array match, index/slice/[*] select within it (jsonpath_ng
    * navigates each match's list); on a non-array match, [*] and slices
    * singleton-wrap (the value itself matches, window permitting) while
    * a numeric index routes to [[indexNonArray]] (strings char-index,
    * dicts/nulls no-match, other scalars loud-reject — probed against
    * jsonpath_ng 1.8.0 on 2026-08-18). */
  private def applyChained(df: DataFrame, op: Seg, it: String,
      next: Next): DataFrame = {
    val isArr = df.schema.head.dataType.isInstanceOf[ArrayType]
    op match {
      case ArraySeg(_) =>
        if (isArr)
          finishMatch(df.select(explode(col("_row")).as("_row")), it,
            "a chained [*] element", next)
        else finishMatch(df, it, "a chained [*] match", next)
      case SliceSeg(_, startO, endO, step) =>
        if (isArr)
          finishMatch(sliceArray(df, "_row", startO, endO, step), it,
            "a chained slice element", next)
        else {
          // singleton wrap: [value] sliced — hit iff the normalized
          // window includes index 0 (same rule as the named slice quirk)
          val hit = startO.forall(_ <= 0) && endO.forall(_ >= 1)
          finishMatch(if (hit) df else df.where(lit(false)), it,
            "a chained slice match", next)
        }
      case IndexSeg(_, idx) =>
        val sel = if (isArr) indexSelect(df, "_row", idx)
        else indexNonArray(df, idx, it, "a chained match")
        finishMatch(sel, it, "a chained index match", next)
      case IndexUnionSeg(_, idxs) =>
        val sel = if (isArr) idxs.map(indexSelect(df, "_row", _))
        else idxs.map(indexNonArray(df, _, it, "a chained match"))
        finishMatch(sel.reduce(_ unionAll _), it, "a chained index match", next)
      case other =>
        throw new IllegalStateException(s"not a chainable segment: $other") // unreachable
    }
  }

  /** Union the member VALUES at struct-field paths `members` (wildcard
    * `.*` and field unions `['a','b']`): struct members widen and union
    * by name (union-of-keys, missing → NULL), scalar members stack into
    * `value`. Mixed struct/scalar or array members are rejected loudly
    * — except that when trailing segments remain, [[applyAll]] routes
    * shape-conflicted unions to per-member branch navigation instead of
    * calling this. Each member is (pre-quoted access path, display
    * path, type). */
  private def memberUnion(df: DataFrame, members: Seq[(String, String, DataType)],
      it: String): DataFrame = {
    rejectArrayMembers(members, it)
    if (members.map(m => memberKind(m._3)).distinct.size > 1)
      throw RmlCompiler.RmlError(
        s"JSONPath '$it': wildcard/union mixes object and scalar members (" +
          members.map(m => s"${m._2}:${memberKind(m._3)}").mkString(", ") + ")")
    unionFrames(members.map(m => memberFrame(df, m._1, m._3)), it, "wildcard/union member")
  }

  private def memberKind(dt: DataType): String = dt match {
    case _: StructType => "object"
    case _: ArrayType => "array"
    case _ => "scalar"
  }

  private def rejectArrayMembers(members: Seq[(String, String, DataType)], it: String): Unit =
    members.find(m => memberKind(m._3) == "array").foreach { case (_, disp, _) =>
      throw RmlCompiler.RmlError(
        s"JSONPath '$it': member '$disp' is an array — iterate it explicitly with [*]/index/slice")
    }

  /** The row frame for one wildcard/union member. Null member values
    * are NO match (same policy as FieldSeg): after explode +
    * union-of-keys, an instance lacking the member carries NULL here,
    * and jsonpath_ng's `.*`/union matches only the members the instance
    * actually has. */
  private def memberFrame(df: DataFrame, p: String, dt: DataType): DataFrame = dt match {
    case _: StructType => df.filter(col(p).isNotNull).select(col(p + ".*"))
    case _ => df.filter(col(p).isNotNull).select(col(p).cast("string").as("value", scalarMatchMeta))
  }

  /** Marks the single `value` column of a SCALAR-match frame, so later
    * segments can tell it apart from a real object that happens to have
    * one member named "value". In jsonpath_ng NO segment matches inside
    * a scalar (fields/wildcard/union/descent all fall through, and the
    * parser already rejects post-value [*]/slice chains), so navigating
    * onward from a marked frame is a loud no-match reject — which the
    * descent/union branch policies drop per-branch. */
  private val scalarMatchMeta =
    new org.apache.spark.sql.types.MetadataBuilder()
      .putBoolean("graft.scalarMatch", true).build()

  private def isScalarFrame(df: DataFrame): Boolean = {
    val fs = df.schema.fields
    fs.length == 1 && fs(0).name == "value" && fs(0).metadata.contains("graft.scalarMatch")
  }

  /** Union row frames that may disagree on column types. Columns typed
    * differently across frames would make unionByName coerce — under
    * ANSI a long column receiving another frame's string value CRASHES
    * at runtime, not plan time. Harmonize SCALAR-type conflicts to
    * string plan-side (lexeme-preserving, the per-instance value
    * jsonpath_ng yields); container-vs-anything conflicts stay a loud
    * plan-time reject. */
  private def unionFrames(frames: Seq[DataFrame], it: String, what: String): DataFrame = {
    val typesByName = frames.flatMap(_.schema.fields).groupBy(_.name)
      .map { case (n, fs) => n -> fs.map(_.dataType).distinct }
    typesByName.find { case (_, ts) =>
      ts.size > 1 && ts.exists(t => t.isInstanceOf[StructType] || t.isInstanceOf[ArrayType])
    }.foreach { case (n, ts) =>
      throw RmlCompiler.RmlError(
        s"JSONPath '$it': $what key '$n' has conflicting shapes (" +
          ts.map(_.simpleString).mkString(" vs ") + ")")
    }
    val harmonize = typesByName.collect { case (n, ts) if ts.size > 1 => n }.toSet
    val aligned = frames.map { f =>
      f.select(f.columns.map(c =>
        if (harmonize(c)) col(q(c)).cast("string").as(c) else col(q(c))): _*)
    }
    try aligned.reduce(_.unionByName(_, allowMissingColumns = true))
    catch {
      case e: org.apache.spark.sql.AnalysisException =>
        throw RmlCompiler.RmlError(
          s"JSONPath '$it': $what frames have conflicting shapes (${e.getMessage})")
    }
  }

  /** True when the shared keys of all-struct union members carry
    * container-type conflicts that [[unionFrames]] cannot harmonize —
    * the signal to navigate trailing segments per member instead of
    * through one flattened frame. */
  private def structKeyShapesConflict(members: Seq[(String, String, DataType)]): Boolean =
    members.flatMap(m => m._3 match {
      case st: StructType => st.fields.toSeq
      case _ => Nil
    }).groupBy(_.name).values.exists { fs =>
      val ts = fs.map(_.dataType).distinct
      ts.size > 1 && ts.exists(t => t.isInstanceOf[StructType] || t.isInstanceOf[ArrayType])
    }

  /** Navigate to a descent parent path (exploding arrays along the way)
    * and widen to its columns. `path` came from the schema, so every hop
    * is a struct (possibly behind arrays). */
  private def navigateParent(df: DataFrame, path: List[String]): DataFrame =
    path.foldLeft(df) { (d, fname) =>
      flattenArrays(d.select(col(q(fname)).as("_d"))).select("_d.*")
    }

  /** `next` describes the following segment (see [[Next]]): a `..`
    * flattens array-valued matches into their elements (Descendants
    * enters lists) instead of hitting [[widen]]'s iterate-it-explicitly
    * reject; a chained bracket group takes the raw match unwidened. */
  private def applySeg(df: DataFrame, seg: Seg, it: String,
      next: Next): DataFrame = seg match {
    case ArraySeg(name) if name.isEmpty =>
      df // top-level array: Spark's json reader already row-izes it
    case ArraySeg(name) if !isArrayField(df, name, it) =>
      // base jsonpath_ng Slice quirk: [*] on a NON-list wraps the value
      // in a singleton list, so it matches the value itself — same as
      // plain field access ($.o[*] matches the dict, $.s[*] the string)
      applySeg(df, FieldSeg(name), it, next)
    case ArraySeg(name) =>
      finishMatch(df.select(explode(col(q(name))).as("_row")), it,
        s"an element of '$name'", next)
    case ChainSeg(op) =>
      // the previous bracket group left its raw match in `_row`
      applyChained(df, op, it, next)
    case IndexSeg(name, idx) =>
      if (name.isEmpty)
        throw RmlCompiler.RmlError(
          s"unsupported JSONPath (index on top-level array): $it")
      if (isArrayField(df, name, it))
        finishMatch(indexSelect(df, name, idx), it, s"'$name[$idx]'", next)
      else
        finishMatch(
          indexNonArray(df.select(col(q(name)).as("_row")), idx, it, s"'$name'"),
          it, s"'$name[$idx]'", next)
    case IndexUnionSeg(name, idxs) =>
      if (name.isEmpty)
        throw RmlCompiler.RmlError(
          s"unsupported JSONPath (index union on top-level array): $it")
      // one frame per index, unioned — preserves jsonpath_ng's multiset
      // semantics ($.s[0,0] matches the element twice)
      if (isArrayField(df, name, it))
        finishMatch(idxs.map(indexSelect(df, name, _)).reduce(_ unionAll _), it,
          s"an element of '$name'", next)
      else {
        val raw = df.select(col(q(name)).as("_row"))
        finishMatch(idxs.map(indexNonArray(raw, _, it, s"'$name'"))
          .reduce(_ unionAll _), it, s"an element of '$name'", next)
      }
    case SliceSeg(name, startO, endO, _) if name.nonEmpty && !isArrayField(df, name, it) =>
      // singleton-wrap quirk for slices too: jsonpath_ng slices [value],
      // so the value matches iff the normalized window includes index 0
      // of a length-1 list — statically start<=0 (or omitted) and end>=1
      // (or omitted); step never matters for the single element
      val hit = startO.forall(_ <= 0) && endO.forall(_ >= 1)
      val base = applySeg(df, FieldSeg(name), it, next)
      if (hit) base else base.where(lit(false))
    case SliceSeg(name, startO, endO, step) =>
      if (name.isEmpty)
        throw RmlCompiler.RmlError(
          s"unsupported JSONPath (slice on top-level array): $it")
      finishMatch(sliceArray(df, name, startO, endO, step), it,
        s"an element of '$name'", next)
    case WildcardSeg | FieldUnionSeg(_, _) =>
      throw new IllegalStateException("wildcard/union segments are handled by applyAll") // unreachable
    case FieldSeg(name) =>
      df.schema.find(_.name == name) match {
        case Some(_) =>
          // Null values are NO match, not a phantom all-NULL record:
          // after a union-of-keys stage (wildcard/union/descent) a
          // member lacking this field carries NULL here, and jsonpath_ng
          // yields no match for an absent key. Spark's schema union
          // cannot distinguish that from a present-but-null key (which
          // jsonpath_ng DOES match, as None) — we drop both; an explicit
          // JSON null would be discarded by RML null-skip downstream
          // anyway (reference definitions.h:6).
          finishMatch(df.select(col(q(name)).as("_row")).filter(col("_row").isNotNull),
            it, s"field '$name'", next)
        case None =>
          throw RmlCompiler.RmlError(
            s"JSONPath '$it': no field '$name' in the document schema")
      }
    case DescendSeg(_) =>
      throw new IllegalStateException("DescendSeg is handled by applyAll") // unreachable
  }

  /** The (pre-quoted access path, display path, type) members a
    * wildcard or field union selects from `df`'s current record shape. */
  private def unionMembers(df: DataFrame, seg: Seg, it: String): Seq[(String, String, DataType)] =
    seg match {
      case WildcardSeg =>
        df.schema.fields.toSeq.map(f => (q(f.name), f.name, f.dataType))
      case FieldUnionSeg(name, fields) =>
        val base = if (name.isEmpty) df.schema
        else df.schema.find(_.name == name).map(_.dataType) match {
          case Some(st: StructType) => st
          case Some(other) =>
            throw RmlCompiler.RmlError(
              s"JSONPath '$it': field union on non-object '$name' (${other.simpleString})")
          case None =>
            throw RmlCompiler.RmlError(s"JSONPath '$it': no field '$name' in the document schema")
        }
        val (ap, dp) = if (name.isEmpty) ("", "") else (q(name) + ".", name + ".")
        // a listed member absent from the schema = no match for it
        // (jsonpath_ng semantics: $.b['c','zzz'] yields just c's value)
        val present = fields.flatMap(f =>
          base.find(_.name == f).map(sf => (ap + q(f), dp + f, sf.dataType)))
        if (present.isEmpty)
          throw RmlCompiler.RmlError(
            s"JSONPath '$it': none of the union fields ${fields.mkString("['", "','", "']")} exist in the document schema")
        present
      case other =>
        throw new IllegalStateException(s"not a union segment: $other") // unreachable
    }

  /** Apply the segment list left to right. Descent is handled HERE, not
    * in [[applySeg]]: `..target` resolves to every schema path whose
    * parent struct holds a field `target` (descending through arrays),
    * and with MULTIPLE parent paths the REMAINING segments apply to each
    * branch independently before the final frames union — jsonpath_ng
    * applies trailing segments per match instance, so branches may hold
    * the target under conflicting shapes (scalar here, struct there) as
    * long as each branch's own application is consistent. A branch whose
    * remaining segments don't fit its shape (array access on a scalar,
    * absent member) contributes NO matches — jsonpath_ng's fall-through
    * — unless EVERY branch fails, which rethrows the first error. Final
    * frames union by key (missing → NULL); mixing scalar-final and
    * object-final branches is rejected loudly (an RML iterator needs one
    * record shape). Single-parent descent keeps loud errors: the only
    * possible instance shape conflicts with the path. */
  private def applyAll(df: DataFrame, segs: List[Seg], it: String): DataFrame = segs match {
    case Nil => df
    case _ :: _ if isScalarFrame(df) =>
      // Scalar-widened frames cast every JSON type to one string column,
      // so a genuine "hi" and a number 5 are indistinguishable here —
      // jsonpath_ng CHAR-indexes the former but TypeErrors on the
      // latter, and field access matches nothing in either. Char-index
      // parity lives where the schema still carries the type
      // ([[indexNonArray]]); after widening, loud is the only honest
      // answer. Dropped per-branch under descent/union navigation.
      throw RmlCompiler.RmlError(
        s"JSONPath '$it': trailing segments apply to a scalar match — no jsonpath_ng match is possible")
    case DescendSeg(target) :: rest =>
      def paths(dt: DataType, prefix: List[String]): List[List[String]] = dt match {
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
            s"JSONPath '$it' ('..$target'): no field '$target' anywhere in the document schema")
        case path :: Nil => applyAll(navigateParent(df, path), rest, it)
        case many =>
          val attempts = many.map(p =>
            try Right(applyAll(navigateParent(df, p), rest, it))
            catch { case e: RmlCompiler.RmlError => Left(e) })
          val finals = attempts.collect { case Right(f) => f }
          if (finals.isEmpty) throw attempts.collectFirst { case Left(e) => e }.get
          // provably-empty finals (dict/null index no-matches) must not
          // veto the live branches' shape — see [[staticallyNoMatch]]
          val live = finals.filterNot(staticallyNoMatch)
          val keep = if (live.nonEmpty) live else finals.take(1)
          // the metadata marker, not the column NAME: an object final
          // whose record shape is exactly {value: ...} is still an object
          if (keep.map(isScalarFrame).distinct.size > 1)
            throw RmlCompiler.RmlError(
              s"JSONPath '$it' ('..$target'): descent branches mix scalar and object matches (" +
                many.map(p => ("$" +: p).mkString(".")).mkString(", ") + ")")
          unionFrames(keep, it, s"'..$target' branch")
      }
    case (seg @ (WildcardSeg | FieldUnionSeg(_, _))) :: rest =>
      val members = unionMembers(df, seg, it)
      val mixedKinds = members.map(m => memberKind(m._3)).distinct.size > 1
      // a following `..` lets ARRAY members participate (Descendants
      // enters lists) — route them through per-member navigation with
      // flattening instead of memberUnion's loud array reject
      val descendNext = rest.headOption.exists(_.isInstanceOf[DescendSeg])
      val arrayMembers = members.exists(m => memberKind(m._3) == "array")
      if (rest.isEmpty ||
          !(mixedKinds || structKeyShapesConflict(members) || (descendNext && arrayMembers)))
        applyAll(memberUnion(df, members, it), rest, it)
      else {
        // jsonpath_ng applies trailing segments to each member match
        // INDEPENDENTLY, so members may hold conflicting shapes (scalar
        // here, struct there; a shared key typed long in one member and
        // object in another) as long as each member's own navigation is
        // consistent — one flattened union frame cannot represent that,
        // so navigate the remainder per member and union the finals
        // (same branch policy as multi-parent descent above: a member
        // whose navigation fails contributes NO matches unless EVERY
        // member fails, which rethrows the first error).
        if (!descendNext) rejectArrayMembers(members, it)
        val attempts = members.map { case (p, disp, dt) =>
          // a scalar member's marked frame makes applyAll reject any
          // trailing segment (jsonpath_ng matches nothing inside a
          // scalar), so it lands in Left and contributes no matches
          try Right {
            val frame = dt match {
              case _: ArrayType if descendNext =>
                // list member before `..`: flatten into its elements
                finishMatch(df.filter(col(p).isNotNull).select(col(p).as("_row")),
                  it, s"member '$disp'", Next.Descend)
              case _ => memberFrame(df, p, dt)
            }
            applyAll(frame, rest, it)
          }
          catch { case e: RmlCompiler.RmlError => Left(e) }
        }
        val finals = attempts.collect { case Right(f) => f }
        if (finals.isEmpty) throw attempts.collectFirst { case Left(e) => e }.get
        // provably-empty finals must not veto live-branch shape — see
        // [[staticallyNoMatch]]
        val live = finals.filterNot(staticallyNoMatch)
        val keep = if (live.nonEmpty) live else finals.take(1)
        // metadata marker, not column name — see the descent check above
        if (keep.map(isScalarFrame).distinct.size > 1)
          throw RmlCompiler.RmlError(
            s"JSONPath '$it': union branches mix scalar and object matches")
        unionFrames(keep, it, "union branch")
      }
    case seg :: rest =>
      // tell the segment what follows: a `..` flattens array-valued
      // matches into their elements (jsonpath_ng's Descendants enters
      // lists; widen's array reject would silently drop a
      // `..a..name`/`..x[0]..name` branch's matches otherwise), and a
      // chained bracket group consumes the raw match unwidened
      applyAll(applySeg(df, seg, it, nextOf(rest)), rest, it)
  }

  private sealed trait Seg
  private final case class FieldSeg(name: String) extends Seg
  private final case class ArraySeg(name: String) extends Seg
  private final case class IndexSeg(name: String, idx: Int) extends Seg
  private final case class IndexUnionSeg(name: String, idxs: Seq[Int]) extends Seg
  private final case class SliceSeg(name: String, start: Option[Int],
      end: Option[Int], step: Int) extends Seg
  private final case class FieldUnionSeg(name: String, fields: Seq[String]) extends Seg
  /** `.*` — every member value of the current object(s). */
  private case object WildcardSeg extends Seg
  /** A bracket group chained after another on the same token
    * (`a[*][-1]`); `op` is an array segment with an empty name, applied
    * to the previous group's raw `_row` match — see [[applyChained]]. */
  private final case class ChainSeg(op: Seg) extends Seg
  /** `..name` — descend to every schema path whose parent holds a field
    * `name` (exploding arrays along the way), then continue with the
    * normal segments (the following segment consumes `name` itself). */
  private final case class DescendSeg(target: String) extends Seg

  /** Split the path into dot-level tokens, respecting brackets and quoted
    * names (a quoted name may contain dots/commas). An empty token marks
    * a `..` descent applying to the next token. */
  private def lexJsonPath(p: String): Seq[String] = {
    import RmlCompiler.RmlError
    val toks = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var depth = 0
    var quote: Char = 0
    for (c <- p) {
      if (quote != 0) { cur += c; if (c == quote) quote = 0 }
      else c match {
        case '\'' | '"' if depth > 0 => quote = c; cur += c
        case '[' => depth += 1; cur += c
        case ']' =>
          depth -= 1
          if (depth < 0) throw RmlError(s"unsupported JSONPath (unbalanced ']'): $p")
          cur += c
        case '.' if depth == 0 => toks += cur.result(); cur.clear()
        case _ => cur += c
      }
    }
    if (depth != 0 || quote != 0)
      throw RmlError(s"unsupported JSONPath (unterminated bracket or quote): $p")
    toks += cur.result()
    // "$.a" lexes to ["", "a"] — drop the one leading empty from the "$."
    // form so only a SECOND dot ("$..a") reads as a descent marker
    val t = toks.toSeq
    if (t.headOption.contains("")) t.drop(1) else t
  }

  /** Parse the reference-parity JSONPath grammar (see [[loadJson]]).
    * The reference strips `$.`/brackets at flexcore.py:261-264 and
    * delegates the full grammar to base jsonpath_ng (backend.py:7,
    * 408-447). Forms base jsonpath_ng itself rejects — filters `[?...]`
    * — are rejected here too; negative slice steps (order reversal,
    * meaningless over an unordered row set) and top-level array indexing
    * are rejected as out of scope; chained bracket groups (`a[*][0]`,
    * `a[0][1][2]`) parse to [[ChainSeg]]s applied to the previous
    * group's raw match. */
  private def parseJsonPath(p: String): Seq[Seg] = {
    import RmlCompiler.RmlError
    if (p.contains("[?"))
      throw RmlError(
        s"unsupported JSONPath (filter expression — base jsonpath_ng rejects these too): $p")
    val stripped = p.stripPrefix("$")
    if (stripped.isEmpty) return Nil
    val out = scala.collection.mutable.ArrayBuffer.empty[Seg]
    var pendingDescend = false
    for (tok <- lexJsonPath(stripped)) {
      if (tok.isEmpty) {
        if (pendingDescend)
          throw RmlError(s"unsupported JSONPath (consecutive descents '...'): $p")
        pendingDescend = true
      } else {
        val segs = parseToken(tok, p)
        if (pendingDescend) {
          val target = segs.head match {
            case FieldSeg(n) => n
            case ArraySeg(n) => n
            case IndexSeg(n, _) => n
            case IndexUnionSeg(n, _) => n
            case SliceSeg(n, _, _, _) => n
            case FieldUnionSeg(n, _) => n
            case _ => ""
          }
          if (target.isEmpty)
            throw RmlError(s"unsupported JSONPath (descent into '$tok'): $p")
          out += DescendSeg(target)
          pendingDescend = false
        }
        out ++= segs
      }
    }
    if (pendingDescend)
      throw RmlError(s"unsupported JSONPath (trailing '.' or '..'): $p")
    out.toSeq
  }

  private val tokenPat = """([^\[\]]*)((?:\[[^\[\]]*\])*)""".r
  private val groupPat = """\[([^\[\]]*)\]""".r
  private val quotedSingle = """\s*(['"])([^'"]*)\1\s*""".r
  private val intPat = """(-?\d+)""".r
  private val intListPat = """(-?\d+(?:\s*,\s*-?\d+)+)""".r
  private val slicePat = """(-?\d*):(-?\d*)(?::(-?\d*))?""".r
  private val quotedListPat = """((?:\s*['"][^'"]*['"]\s*,?)+)""".r

  /** Expand one dot-level token (name + bracket groups) into segments:
    * a quoted-single group `['x']` is sugar for `.x`; one (final or
    * field-followed) array-ish group binds to the preceding name. */
  private def parseToken(tok: String, p: String): Seq[Seg] = {
    import RmlCompiler.RmlError
    val (namePart, groupsPart) = tok match {
      case tokenPat(n, g) => (n, g)
      case _ => throw RmlError(s"unsupported JSONPath segment '$tok' in: $p")
    }
    val groups = groupPat.findAllMatchIn(groupsPart).map(_.group(1)).toList
    val out = scala.collection.mutable.ArrayBuffer.empty[Seg]
    var pending = namePart
    var pendingIsName = namePart.nonEmpty // distinguish `a[...]` from `[...]`
    def flushPending(): Unit = if (pendingIsName) {
      out += (if (pending == "*") WildcardSeg else FieldSeg(pending))
      pending = ""; pendingIsName = false
    }
    if (!pendingIsName && groups.isEmpty) {
      // bare dot segment: field or wildcard
      return Seq(if (tok == "*") WildcardSeg else FieldSeg(tok))
    }
    if (pendingIsName && pending.contains("]"))
      throw RmlError(s"unsupported JSONPath segment '$tok' in: $p")
    for (g <- groups) g match {
      case quotedSingle(_, name) =>
        flushPending()
        pending = name; pendingIsName = true
      case _ if quotedListPat.pattern.matcher(g.trim).matches() =>
        // a multi-name quoted group is a FIELD union: with a pending
        // name it unions that struct's members (a['b','c']); chained
        // after an array access OR a wildcard it unions the members of
        // the CURRENT matched objects (b[-1]['cc','name'], *['a','b'] —
        // legal jsonpath_ng; `*` is a wildcard segment, never a field)
        val name = if (pendingIsName && pending != "*") pending else ""
        if (pendingIsName && pending == "*") flushPending()
        out += parseBracket(name, g.trim, p)
        pending = ""; pendingIsName = false
      case _ =>
        // an array-ish group consumes the pending name as the array field;
        // '*' is NEVER a field name — binding it here would either loudly
        // look up a field '*' or, on a doc that genuinely has a "*" key,
        // silently navigate that key instead of the wildcard, so reject
        // the (legal-but-rare) jsonpath_ng form `*[...]` explicitly
        if (pendingIsName && pending == "*")
          throw RmlError(
            s"unsupported JSONPath (array access directly on wildcard matches '*[$g]' — name the member, or union fields with *['a','b']): $p")
        val name = if (pendingIsName) pending else ""
        if (!pendingIsName && out.nonEmpty) out.last match {
          // a second/third bracket group on the same token applies to
          // the previous group's raw match (jsonpath_ng `a[*][-1]`);
          // only array-producing groups can host one
          case _: ChainSeg | ArraySeg(_) | IndexSeg(_, _) | IndexUnionSeg(_, _) |
              SliceSeg(_, _, _, _)
              if !rootArrayToken(out.head) =>
            out += ChainSeg(parseBracket("", g.trim, p))
          case _ =>
            // chained on the document root ($[*][0] — the reader already
            // row-ized the root array, there is no raw match column) or
            // after a field union: out of scope, reject loudly
            throw RmlError(
              s"unsupported JSONPath (chained array access '$tok'): $p")
        }
        else out += parseBracket(name, g.trim, p)
        pending = ""; pendingIsName = false
    }
    flushPending()
    if (out.isEmpty) throw RmlError(s"unsupported JSONPath segment '$tok' in: $p")
    out.toSeq
  }

  /** True iff the token's first segment is a NAMELESS array group —
    * the `$[*]`/`$[0]` document-root forms, which have no raw match
    * column to chain further groups onto. */
  private def rootArrayToken(head: Seg): Boolean = head match {
    case ArraySeg("") | IndexSeg("", _) | IndexUnionSeg("", _) |
        SliceSeg("", _, _, _) => true
    case _ => false
  }

  private def parseBracket(name: String, content: String, p: String): Seg = {
    import RmlCompiler.RmlError
    content match {
      case "*" => ArraySeg(name)
      case intPat(i) => IndexSeg(name, i.toInt)
      case intListPat(is) => IndexUnionSeg(name, is.split(',').toSeq.map(_.trim.toInt))
      case slicePat(s, e, st) =>
        val step = Option(st).filter(_.nonEmpty).map(_.toInt).getOrElse(1)
        if (step <= 0)
          throw RmlError(s"unsupported JSONPath (non-positive slice step $step): $p")
        SliceSeg(name, Some(s).filter(_.nonEmpty).map(_.toInt),
          Some(e).filter(_.nonEmpty).map(_.toInt), step)
      case quotedListPat(qs) =>
        val names = """['"]([^'"]*)['"]""".r.findAllMatchIn(qs).map(_.group(1)).toSeq
        if (names.isEmpty)
          throw RmlError(s"unsupported JSONPath segment '[$content]' in: $p")
        FieldUnionSeg(name, names)
      case _ =>
        throw RmlError(s"unsupported JSONPath segment '[$content]' in: $p")
    }
  }
}
