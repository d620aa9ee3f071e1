package graft.rules

import graft.functions.RdfFunctions._
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Declarative per-row mapping rules — the engine's equivalent of the
 * reference's term maps (reference ra_converter_rml_core.cpp:27-53) and
 * `create()` operator (reference utils.cpp:246-311), re-expressed as an ADT
 * that compiles to Catalyst `Column` trees. Catalyst then constant-folds
 * all-constant rules (reference's "preformatted" fast path,
 * backend.py:300-354) for free.
 */
sealed trait TermMap
object TermMap {
  /** `"http://ex.org/p/{id}/{name}"` — `{col}` slots filled per row, `\{`
    * escapes a literal brace (reference utils.cpp:126-146, 227-244). */
  final case class Template(pattern: String) extends TermMap
  /** Raw column value (rml:reference). */
  final case class Reference(column: String) extends TermMap
  /** Fixed value (rml:constant). */
  final case class Constant(value: String) extends TermMap
}

sealed trait TermKind
object TermKind {
  case object Iri extends TermKind
  case object BlankNode extends TermKind
  /** Datatype wins over language tag (reference utils.cpp:210-215). */
  final case class Lit(lang: Option[String] = None, datatype: Option[String] = None) extends TermKind
}

/** One output-term rule: how to build S, P, O or G for each input row. */
final case class TermRule(map: TermMap, kind: TermKind)

/** One triples-map rule: S/P/O plus optional named graph
  * (reference ra_converter_rml_core.cpp:988-1009). */
final case class TripleRule(
    subject: TermRule,
    predicate: TermRule,
    obj: TermRule,
    graph: Option[TermRule] = None)

/** A parsed template: literal segments interleaved with column slots.
  * `segments.size == slots.size + 1`. */
final case class ParsedTemplate(segments: Seq[String], slots: Seq[String])

object RuleCompiler {
  import TermKind._
  import TermMap._

  /** Parse `{col}` slots; `\{`/`\}` are escaped literal braces
    * (reference utils.cpp:126-146 `extract_substrings` + 227-244 unmask). */
  def parseTemplate(pattern: String): ParsedTemplate = {
    val segs = Seq.newBuilder[String]
    val slots = Seq.newBuilder[String]
    val cur = new StringBuilder
    var i = 0
    while (i < pattern.length) {
      val c = pattern.charAt(i)
      if (c == '\\' && i + 1 < pattern.length &&
          (pattern.charAt(i + 1) == '{' || pattern.charAt(i + 1) == '}')) {
        cur.append(pattern.charAt(i + 1)); i += 2
      } else if (c == '{') {
        val end = pattern.indexOf('}', i)
        if (end < 0) { cur.append(pattern.substring(i)); i = pattern.length } // unmatched: literal
        else {
          segs += cur.toString; cur.clear()
          slots += pattern.substring(i + 1, end)
          i = end + 1
        }
      } else { cur.append(c); i += 1 }
    }
    segs += cur.toString
    ParsedTemplate(segs.result(), slots.result())
  }

  /** Columns a rule reads — drives projection pushdown, null-skip and
    * dedup scoping (reference ra_converter_rml_core.cpp:684-737). */
  def referencedColumns(rule: TermRule): Seq[String] = rule.map match {
    case Template(p) => parseTemplate(p).slots.distinct
    case Reference(c) => Seq(c)
    case Constant(_) => Seq.empty
  }

  def referencedColumns(rule: TripleRule): Seq[String] =
    (Seq(rule.subject, rule.predicate, rule.obj) ++ rule.graph)
      .flatMap(referencedColumns).distinct

  /** The reference drops a row when ANY projected value is NULL, `""` or
    * the literal string `"NULL"` (reference definitions.h:6,
    * simple_executor.cpp:400-409). */
  def nullSkipPredicate(cols: Seq[String]): Column =
    cols.map { c =>
      // compare on the string form: the reference's model is all-string CSV
      // (SURVEY.md §1.2); on typed columns a bare `col === ""` would make
      // ANSI-mode Spark cast "" to the column type and throw
      val s = col(c).cast("string")
      col(c).isNotNull && s =!= "" && s =!= "NULL"
    }.reduceOption(_ && _).getOrElse(lit(true))

  /** Build the *lexical* term value (before term-type decoration). */
  private def lexical(map: TermMap, iriSafe: Boolean): Column = map match {
    case Constant(v) => lit(v)
    case Reference(c) => col(c).cast("string")
    case Template(p) =>
      val t = parseTemplate(p)
      if (t.slots.isEmpty) lit(t.segments.head)
      else {
        val parts = Seq.newBuilder[Column]
        t.segments.zipAll(t.slots.map(Option(_)), "", None).foreach { case (seg, slot) =>
          if (seg.nonEmpty) parts += lit(seg)
          slot.foreach { s =>
            val v = col(s).cast("string")
            parts += (if (iriSafe) safe_iri(v) else v)
          }
        }
        concat(parts.result(): _*)
      }
  }

  /** Resolve relative IRIs against the base (reference utils.cpp:278-282:
    * prefix base unless value starts with http:// or https://). */
  private def resolveBase(c: Column, baseIri: String): Column =
    when(c.startsWith("http://") || c.startsWith("https://"), c)
      .otherwise(concat(lit(baseIri), c))

  /** Compile one term rule to the final serialized RDF term
    * (reference `create_operator`, utils.cpp:246-311). */
  def compile(rule: TermRule, baseIri: String = ""): Column = rule.kind match {
    case Iri =>
      val lex = rule.map match {
        // constants are emitted as-is, no base resolution
        // (reference utils.cpp:301-303 goes straight to handle_term_type)
        case Constant(v) => lit(v)
        case m => resolveBase(lexical(m, iriSafe = true), baseIri)
      }
      concat(lit("<"), lex, lit(">"))
    case BlankNode =>
      concat(lit("_:"), clean_blank_node(lexical(rule.map, iriSafe = false)))
    case Lit(lang, dtype) =>
      val quoted = concat(lit("\""), lexical(rule.map, iriSafe = false), lit("\""))
      (dtype, lang) match {
        case (Some(d), _) => concat(quoted, lit("^^<" + d + ">"))
        case (None, Some(l)) => concat(quoted, lit("@" + l))
        case _ => quoted
      }
  }

  /** Predicate that the term produces a VALID final value; rows failing it
    * are skipped under continue-on-error semantics (reference
    * utils.cpp:186-199, flexcore.py:318) or raise in strict mode. Only IRIs
    * from non-template maps can be invalid: templates %-encode every
    * error character before the check. */
  def validityPredicate(rule: TermRule, baseIri: String = ""): Column = rule.kind match {
    case Iri => rule.map match {
      case Constant(v) => lit(graft.functions.RdfStrings.iriIsValid(v))
      case m => iri_is_valid(resolveBase(lexical(m, iriSafe = true), baseIri))
    }
    case _ => lit(true)
  }

  /** Compile a whole triples-map rule into (columns, rowFilter):
    * S/P/O(/G) output columns named s,p,o,g plus the combined
    * null-skip + IRI-validity filter. With `strict=true` an invalid IRI
    * FAILS the job (reference's default hard exit, utils.cpp:186-199)
    * instead of being skipped; null-skip rows are dropped in both modes
    * (they are data-model semantics, not errors — definitions.h:6). */
  def compileTriple(rule: TripleRule, baseIri: String = "",
      strict: Boolean = false): (Seq[(String, Column)], Column) = {
    val terms = Seq(
      "s" -> rule.subject, "p" -> rule.predicate, "o" -> rule.obj) ++
      rule.graph.map("g" -> _)
    val cols = terms.map { case (n, t) => n -> compile(t, baseIri) }
    val nullSkip = nullSkipPredicate(referencedColumns(rule))
    val validity = terms.map { case (_, t) => validityPredicate(t, baseIri) }.reduce(_ && _)
    val filter =
      if (strict)
        nullSkip && when(validity, lit(true)).otherwise(
          raise_error(concat(lit("invalid IRI in rule output (strict mode); row s="),
            cols.head._2.cast("string"))))
      else nullSkip && validity
    (cols, filter)
  }
}
