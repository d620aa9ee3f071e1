package graft.rules

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Inner equi-join of a child source against a parent source — the only
  * join form the reference supports (single condition, inner;
  * reference ra_converter_rml_core.cpp:607-628, complex_executor.cpp).
  * `broadcastParent` hints Spark to broadcast the build side, matching the
  * reference's always-in-memory build (complex_executor.cpp:85-168) when
  * the parent is a small lookup — at 100 TB a non-broadcastable parent
  * falls back to Spark's shuffled/sort-merge join with spill, which the
  * reference cannot do at all (SURVEY.md §4 "No spill"). */
final case class JoinSpec(
    parentSource: String,
    childKey: String,
    parentKey: String,
    broadcastParent: Boolean = true)

/** One mapping rule: a triples-map over a named source, optionally joined
  * to a parent source. When `join` is set, rule templates/references must
  * use prefix-qualified column names `<sourceName>_<col>` — the same
  * combined-header convention the reference uses
  * (complex_executor.cpp:39-52). */
final case class MappingRule(
    name: String,
    source: String,
    rule: TripleRule,
    join: Option[JoinSpec] = None)

/**
 * The mapping-engine core: applies declarative rules to sources and unions
 * the results — the Spark-native equivalent of the reference's whole
 * execution pipeline (scan → π → σ(null) → δ → ⋈ → create → ∪ → δ;
 * SURVEY.md §2). Output is a DataFrame of (s, p, o, g) serialized RDF
 * terms; `serialize` renders N-Triples/N-Quads lines.
 *
 * The reference's signature optimization — output-partition inference
 * (ra_expression_partitioner.cpp:124-256): rules whose static output
 * prefixes cannot collide skip cross-rule distinct entirely. Here that
 * saves whole shuffles: each non-colliding group gets at most a
 * group-local `dropDuplicates`, never a global one.
 */
object RdfEngine {

  /** Execute all rules; union results. `distinctWithinGroups=true`
    * reproduces the reference's set semantics (cross-plan dedup,
    * executor.cpp:196-229) at minimum shuffle cost. */
  def execute(
      rules: Seq[MappingRule],
      sources: Map[String, DataFrame],
      baseIri: String = "",
      distinctWithinGroups: Boolean = true,
      strict: Boolean = false): DataFrame = {
    require(rules.nonEmpty, "no rules")
    // forward baseIri so grouping sees the same resolved prefixes that
    // compile()/invariantPrefix produce (a relative constant that resolves
    // to another rule's absolute constant must land in the same group)
    val groups = DedupScope.group(rules, baseIri)
    val perGroup = groups.map { g =>
      val dfs = g.map(r => executeOne(r, sources, baseIri, strict))
      val u = dfs.reduce(_ unionByName _)
      // only rules in the SAME collision group can emit identical records;
      // dedup is scoped to the group (reference backend.py:586-590)
      if (distinctWithinGroups && (g.size > 1)) u.distinct() else u
    }
    perGroup.reduce(_ unionByName _)
  }

  /** Run one rule: project → null-skip → per-scan dedup → (join) →
    * create() columns → validity filter. `strict=true` raises on the first
    * row whose IRI is invalid instead of skipping it — the reference's
    * default hard-exit behavior (utils.cpp:186-199); strict=false is its
    * `--continue-on-error` (flexcore.py:318). */
  def executeOne(
      rule: MappingRule,
      sources: Map[String, DataFrame],
      baseIri: String = "",
      strict: Boolean = false): DataFrame = {
    val needed = RuleCompiler.referencedColumns(rule.rule)
    val base: DataFrame = rule.join match {
      case None =>
        val src = sources.getOrElse(rule.source,
          sys.error(s"unknown source '${rule.source}'"))
        scanSide(src, needed)
      case Some(j) =>
        val childRaw = sources.getOrElse(rule.source,
          sys.error(s"unknown source '${rule.source}'"))
        val parentRaw = sources.getOrElse(j.parentSource,
          sys.error(s"unknown source '${j.parentSource}'"))
        // prefix-rename both sides (reference complex_executor.cpp:39-52)
        val child = prefixed(childRaw, rule.source)
        val parent = prefixed(parentRaw, j.parentSource)
        val ck = s"${rule.source}_${j.childKey}"
        val pk = s"${j.parentSource}_${j.parentKey}"
        val childNeeded = (needed.filter(child.columns.contains) :+ ck).distinct
        val parentNeeded = (needed.filter(parent.columns.contains) :+ pk).distinct
        // null-skip + dedup are applied to BOTH sides pre-join
        // (reference complex_executor.cpp:113-135 build, 268-284 probe)
        val c = scanSide(child, childNeeded)
        val p0 = scanSide(parent, parentNeeded)
        val p = if (j.broadcastParent) broadcast(p0) else p0
        c.join(p, col(ck) === col(pk), "inner")
    }
    val (cols, rowFilter) = RuleCompiler.compileTriple(rule.rule, baseIri, strict)
    val withG: Seq[(String, Column)] =
      if (cols.exists(_._1 == "g")) cols
      else cols :+ ("g" -> lit(null).cast("string"))
    base.filter(rowFilter)
      .select(withG.map { case (n, c) => c.as(n) }: _*)
  }

  /** Natural-join degenerate: same source on both sides with no join
    * condition collapses to a single scan with merged projections
    * (reference backend.py:151-156, 181-183). With our API that is simply a
    * rule without `join` — provided for parity with the reference's RML
    * surface via [[graft.rml.RmlCompiler]]. */
  def scanSide(df: DataFrame, needed: Seq[String]): DataFrame = {
    val present = needed.filter(df.columns.contains)
    require(present.size == needed.size,
      s"missing columns: ${needed.diff(present).mkString(",")}") // reference: hard error, simple_executor.cpp:112-115
    df.select(present.map(col): _*)
      .filter(RuleCompiler.nullSkipPredicate(present))
      .dropDuplicates(present) // per-scan row dedup (reference utils.cpp:77-84 hash set)
  }

  private def prefixed(df: DataFrame, name: String): DataFrame =
    df.select(df.columns.map(c => col(c).as(s"${name}_$c")).toSeq: _*)

  /** Render N-Triples (g null) / N-Quads lines
    * (reference simple_executor.cpp:232-246, complex_executor.cpp:651). */
  def serialize(df: DataFrame): DataFrame =
    df.select(
      when(col("g").isNull, concat_ws(" ", col("s"), col("p"), col("o"), lit(".")))
        .otherwise(concat_ws(" ", col("s"), col("p"), col("o"), col("g"), lit(".")))
        .as("line"))
}

/**
 * Output-partition inference (dedup scoping) — semantic reimplementation of
 * the reference's `ra_expression_partitioner.cpp:105-256`: compute each
 * rule's static *invariant prefix* per output dimension (S, P, O, G); two
 * rules may emit an identical record only if, in EVERY dimension, one
 * prefix is a prefix of the other. Rules are grouped by connected
 * components of that "may collide" relation; distinct() runs only within a
 * group.
 */
object DedupScope {

  /** Prefix terminator sentinel: NUL cannot occur in a serialized RDF term,
    * so appending it makes a *complete* value never a proper prefix of a
    * longer one (kept as an escape, not a raw byte, so the file stays
    * text-diffable). */
  private val Terminator = "\u0000"

  /** Invariant serialized prefix of a term (reference
    * ra_expression_partitioner.cpp:105-121: constant → full value;
    * template → prefix before first `{`; reference → empty). Decoration
    * (`<`, `"`, `_:`) is part of the prefix, which separates IRIs from
    * literals from blank nodes for free. Blank nodes share a single
    * nondeterministic-prefix class (reference :132-138 forces group 0). */
  def invariantPrefix(t: TermRule, baseIri: String): String = {
    import TermKind._
    import TermMap._
    val lexPrefix = t.map match {
      case Constant(v) => v + Terminator // full value, terminated = cannot subsume longer prefixes
      case Template(p) =>
        val parsed = RuleCompiler.parseTemplate(p)
        if (parsed.slots.isEmpty) parsed.segments.head + Terminator
        else parsed.segments.head
      case Reference(_) => ""
    }
    t.kind match {
      case Iri =>
        val resolved =
          if (lexPrefix.startsWith("http://") || lexPrefix.startsWith("https://") || lexPrefix.isEmpty) lexPrefix
          else baseIri + lexPrefix
        "<" + resolved
      case BlankNode => "_:" // all blank-node rules may collide with each other
      case Lit(_, _) => "\"" + lexPrefix
    }
  }

  private def mayCollide(a: String, b: String): Boolean =
    a.startsWith(b) || b.startsWith(a)

  private def ruleMayCollide(x: MappingRule, y: MappingRule, baseIri: String): Boolean = {
    def dims(r: MappingRule): Seq[Option[TermRule]] =
      Seq(Some(r.rule.subject), Some(r.rule.predicate), Some(r.rule.obj), r.rule.graph)
    dims(x).zip(dims(y)).forall {
      case (Some(a), Some(b)) => mayCollide(invariantPrefix(a, baseIri), invariantPrefix(b, baseIri))
      case (None, None) => true
      case _ => false // one has a graph, the other not → different record shape
    }
  }

  /** Connected components of the may-collide relation. */
  def group(rules: Seq[MappingRule], baseIri: String = ""): Seq[Seq[MappingRule]] = {
    val n = rules.size
    val parent = Array.tabulate(n)(identity)
    def find(i: Int): Int = if (parent(i) == i) i else { parent(i) = find(parent(i)); parent(i) }
    for (i <- 0 until n; j <- (i + 1) until n)
      if (ruleMayCollide(rules(i), rules(j), baseIri)) parent(find(i)) = find(j)
    rules.indices.groupBy(find).values.map(_.map(rules)).toSeq
  }
}
