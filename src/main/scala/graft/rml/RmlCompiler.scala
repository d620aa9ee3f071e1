package graft.rml

import graft.rules._
import Turtle.{BNode, Iri, Lit, Term, Triple}

/**
 * Compile an RML mapping document (Turtle) into the engine's
 * [[MappingRule]]s — the Spark-native equivalent of the reference frontend
 * pipeline parse → normalize → resolve-functions → RA-convert
 * (reference flexcore.py:229-282). Semantics mirrored:
 *
 *  - vocabulary: new-generation RML `http://w3id.org/rml/`
 *    (reference ra_converter_rml_core.cpp throughout)
 *  - normalizer rewrites (reference rml_core_normalizer.cpp:111-606):
 *    `rml:class` → rdf:type POM; shortcuts `rml:subject/predicate/object/
 *    graph/datatype/language` → explicit Map + constant; POM n-predicates ×
 *    m-objects cartesian expansion; one rule per (TriplesMap, POM, P, O,
 *    graph-variant)
 *  - term-type defaults (ra_converter_rml_core.cpp:390-596): subject=iri
 *    (Literal forbidden), predicate=iri, object: reference→literal,
 *    template→iri, constant→iri iff it starts with "http"
 *  - `@lang` suffix sniffing on object constants/references/templates with
 *    whitelist (ra_converter_rml_core.cpp:55-76, 116-135)
 *  - graph maps: subject-level + POM-level fan out to up to two rules;
 *    defaultGraph → no graph term (ra_converter_rml_core.cpp:283-387)
 *  - referencing-object-map: joinCondition → equi join; no condition +
 *    same source → single-scan collapse (backend.py:151-156,181-183); no
 *    condition + different sources → unsupported (backend.py:153-155)
 *  - function maps: plan-time resolution, sole function grel:date_now →
 *    constant ISO timestamp (reference rml_functions.cpp:100-220)
 */
object RmlCompiler {

  private val RML = "http://w3id.org/rml/"
  private val RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
  private val GREL_DATE_NOW = "http://users.ugent.be/~bjdmeest/function/grel.ttl#date_now"
  private val DEFAULT_GRAPHS = Set(RML + "defaultGraph", "http://www.w3.org/ns/r2rml#defaultGraph")

  /** reference ra_converter_rml_core.cpp:55-76 */
  val validLanguageSubtags: Set[String] = Set(
    "en", "es", "fr", "de", "zh", "it", "ja", "ko", "no", "pt",
    "ru", "ar", "cs", "da", "nl", "fi", "el", "hi", "hu", "ro")

  /** A compiled mapping: rules + the per-source descriptors needed to load
    * the data (path, optional JSON iterator). */
  final case class Compiled(
      rules: Seq[MappingRule],
      sources: Map[String, SourceSpec])

  final case class SourceSpec(path: String, iterator: Option[String])

  final case class RmlError(msg: String) extends RuntimeException(msg)

  // ---- graph access helpers ----

  private final class G(triples: Seq[Triple]) {
    private val byS: Map[Term, Seq[Triple]] = triples.groupBy(_.s)
    def objects(s: Term, p: String): Seq[Term] =
      byS.getOrElse(s, Nil).filter(_.p.value == p).map(_.o)
    def obj1(s: Term, p: String): Option[Term] = objects(s, p) match {
      case Seq(o) => Some(o)
      case Seq() => None
      case many => Some(many.head)
    }
    def subjects(p: String, o: Term): Seq[Term] =
      triples.filter(t => t.p.value == p && t.o == o).map(_.s)
    def subjectsWith(p: String): Seq[Term] = triples.filter(_.p.value == p).map(_.s).distinct
  }

  private def termValue(t: Term): String = t match {
    case Iri(v) => v
    case Lit(v, _, _) => v
    case BNode(l) => l
  }

  def compile(mappingTtl: String, nowIso: () => String = defaultNow): Compiled =
    compileGraph(Turtle.parse(mappingTtl), nowIso)

  private def defaultNow(): String =
    java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss")
      .format(java.time.LocalDateTime.now())

  def compileGraph(triples: Seq[Triple], nowIso: () => String): Compiled = {
    val g = new G(triples)
    val sources = scala.collection.mutable.LinkedHashMap[String, SourceSpec]()
    val rules = Seq.newBuilder[MappingRule]

    // a TriplesMap = any subject with rml:logicalSource
    val tms = g.subjectsWith(RML + "logicalSource")
    if (tms.isEmpty) throw RmlError("no triples maps (rml:logicalSource) found")

    def sourceOf(tm: Term): (String, Option[String]) = {
      val ls = g.obj1(tm, RML + "logicalSource")
        .getOrElse(throw RmlError(s"missing logicalSource on $tm"))
      val path = g.obj1(ls, RML + "source") match {
        case Some(srcNode: BNode) =>
          termValue(g.obj1(srcNode, RML + "path")
            .getOrElse(throw RmlError("rml:source without rml:path")))
        case Some(other) => termValue(other) // plain literal/iri source
        case None => throw RmlError("logicalSource without rml:source")
      }
      val iter = g.obj1(ls, RML + "iterator").map(termValue)
      (path, iter)
    }

    /** register a source; name = sanitized path (stable, readable). */
    def registerSource(tm: Term): String = {
      val (path, iter) = sourceOf(tm)
      val name = path.replaceAll("[^A-Za-z0-9_]", "_").replaceAll("^_+", "")
        .replaceAll("_(csv|json)$", "")
      sources.get(name) match {
        case Some(existing) if existing.path != path =>
          throw RmlError(s"source name collision: $path vs ${existing.path}")
        case _ => sources(name) = SourceSpec(path, iter)
      }
      name
    }

    /** term-map node behind `<kind>Map` or the `<kind>` constant shortcut
      * (normalizer shortcut expansion, rml_core_normalizer.cpp:171-218). */
    def mapNode(parent: Term, kind: String): Option[Either[Term, Term]] =
      g.obj1(parent, RML + kind + "Map").map(Left(_))
        .orElse(g.obj1(parent, RML + kind).map(Right(_))) // Right = constant shortcut value

    /** resolve function executions: a map node carrying
      * rml:functionExecution is rewritten to a constant (plan-time). */
    def functionConstant(node: Term): Option[String] =
      g.obj1(node, RML + "functionExecution").map { fe =>
        val fn = g.obj1(fe, RML + "function").map(termValue)
          .getOrElse(throw RmlError("functionExecution without rml:function"))
        fn match {
          case GREL_DATE_NOW => nowIso()
          case other => throw RmlError(s"unsupported mapping function: $other") // rml_functions.cpp:166-171
        }
      }

    /** extract (map, explicit termType?) from a term-map node. */
    def extractMap(node: Term): (Option[TermMap], Option[String]) = {
      val tt = g.obj1(node, RML + "termType").map(termValue)
      val m: Option[TermMap] = functionConstant(node).map(TermMap.Constant(_))
        .orElse(g.obj1(node, RML + "constant").map(v => TermMap.Constant(termValue(v))))
        .orElse(g.obj1(node, RML + "reference").map(v => TermMap.Reference(termValue(v))))
        .orElse(g.obj1(node, RML + "template").map(v => TermMap.Template(termValue(v))))
      (m, tt)
    }

    /** `@lang` suffix sniffing (ra_converter_rml_core.cpp:116-135). */
    def sniffLang(value: String, current: Option[String]): (String, Option[String]) =
      if (current.isDefined) (value, current)
      else {
        val idx = value.lastIndexOf('@')
        if (idx >= 0) {
          val tag = value.substring(idx + 1)
          if (validLanguageSubtags.contains(tag))
            (value.substring(0, idx), Some(tag))
          else (value, current)
        } else (value, current)
      }

    def applySniff(m: TermMap, lang: Option[String]): (TermMap, Option[String]) = m match {
      case TermMap.Constant(v) => val (v2, l) = sniffLang(v, lang); (TermMap.Constant(v2), l)
      case TermMap.Reference(v) => val (v2, l) = sniffLang(v, lang); (TermMap.Reference(v2), l)
      case TermMap.Template(v) => val (v2, l) = sniffLang(v, lang); (TermMap.Template(v2), l)
    }

    def subjectRule(tm: Term): TermRule = {
      mapNode(tm, "subject") match {
        case Some(Left(node)) =>
          val (m, tt) = extractMap(node)
          val kind = tt match {
            case Some(t) if t == RML + "BlankNode" => TermKind.BlankNode
            case Some(t) if t == RML + "Literal" =>
              throw RmlError("Literal subject not supported") // ra_converter:408-410
            case _ => TermKind.Iri
          }
          TermRule(m.getOrElse(throw RmlError("empty subjectMap")), kind)
        case Some(Right(const)) =>
          TermRule(TermMap.Constant(termValue(const)), TermKind.Iri)
        case None => throw RmlError(s"triples map $tm without subject map") // normalizer:672-690
      }
    }

    /** graph term rules of (subjectMap, pom): 0, 1 or 2 variants
      * (ra_converter_rml_core.cpp:283-387). None in list = no graph. */
    def graphVariants(tm: Term, pom: Option[Term]): Seq[Option[TermRule]] = {
      def fromHolder(holder: Term): Option[Option[TermRule]] =
        mapNode(holder, "graph") match {
          case Some(Left(node)) =>
            val (m, _) = extractMap(node)
            m.map {
              case TermMap.Constant(v) if DEFAULT_GRAPHS.contains(v) => None
              case other => Some(TermRule(other, TermKind.Iri))
            }
          case Some(Right(const)) =>
            val v = termValue(const)
            Some(if (DEFAULT_GRAPHS.contains(v)) None else Some(TermRule(TermMap.Constant(v), TermKind.Iri)))
          case None => None
        }
      val subjNode: Option[Term] = mapNode(tm, "subject") match {
        case Some(Left(n)) => Some(n); case _ => None
      }
      val variants = subjNode.flatMap(fromHolder).toSeq ++ pom.flatMap(fromHolder).toSeq
      if (variants.isEmpty) Seq(None) else variants.distinct
    }

    def objectRule(objNode: Either[Term, Term]): TermRule = objNode match {
      case Right(const) => // object shortcut: literal stays literal, IRI value → iri
        const match {
          case Iri(v) => TermRule(TermMap.Constant(v), TermKind.Iri)
          case Lit(v, lang, dtype) =>
            val (v2, l2) = sniffLang(v, lang)
            TermRule(TermMap.Constant(v2), TermKind.Lit(l2, dtype))
          case BNode(v) => TermRule(TermMap.Constant(v), TermKind.BlankNode)
        }
      case Left(node) =>
        val (m0, tt) = extractMap(node)
        val m = m0.getOrElse(throw RmlError("objectMap without constant/reference/template"))
        // language / datatype maps (+ shortcuts); datatype beats lang (utils.cpp:210-215)
        val lang = mapNode(node, "language").flatMap {
          case Left(ln) => extractMap(ln)._1.collect { case TermMap.Constant(v) => v }
          case Right(v) => Some(termValue(v))
        }
        lang.foreach { l =>
          if (!validLanguageSubtags.contains(l))
            throw RmlError(s"Language tag is not supported: $l") // ra_converter:500-506
        }
        val dtype = mapNode(node, "datatype").flatMap {
          case Left(dn) => extractMap(dn)._1.collect { case TermMap.Constant(v) => v }
          case Right(v) => Some(termValue(v))
        }
        val explicit = tt.map {
          case t if t == RML + "IRI" => TermKind.Iri
          case t if t == RML + "BlankNode" => TermKind.BlankNode
          case t if t == RML + "Literal" => TermKind.Lit(lang, dtype)
          case other => throw RmlError(s"unknown termType $other")
        }
        val (m2, lang2) = applySniff(m, lang)
        val kind = explicit.getOrElse(m2 match {
          // defaults per ra_converter_rml_core.cpp:541-575,596-600
          case TermMap.Constant(v) => if (v.startsWith("http")) TermKind.Iri else TermKind.Lit(lang2, dtype)
          case TermMap.Reference(_) => TermKind.Lit(lang2, dtype)
          case TermMap.Template(_) => TermKind.Iri
        })
        val kind2 = kind match { // re-attach sniffed lang when literal
          case TermKind.Lit(l, d) => TermKind.Lit(lang2.orElse(l), dtype.orElse(d))
          case k => k
        }
        TermRule(m2, kind2)
    }

    def prefixTermMap(m: TermMap, prefix: String): TermMap = m match {
      case TermMap.Reference(c) => TermMap.Reference(s"${prefix}_$c")
      case TermMap.Template(p) =>
        val parsed = RuleCompiler.parseTemplate(p)
        val rebuilt = new StringBuilder
        parsed.segments.zipAll(parsed.slots.map(Option(_)), "", None).foreach {
          case (seg, slot) =>
            rebuilt.append(seg.replace("{", "\\{").replace("}", "\\}"))
            slot.foreach(s => rebuilt.append("{").append(prefix).append("_").append(s).append("}"))
        }
        TermMap.Template(rebuilt.toString)
      case c => c
    }
    def prefixRule(r: TermRule, prefix: String): TermRule =
      r.copy(map = prefixTermMap(r.map, prefix))

    // ---- main loop: one rule per (TM, POM, P, O, graph variant) --------
    tms.zipWithIndex.foreach { case (tm, tmIdx) =>
      val srcName = registerSource(tm)
      val subj = subjectRule(tm)
      val poms = g.objects(tm, RML + "predicateObjectMap")

      // rml:class → rdf:type POM (rml_core_normalizer.cpp:111-167)
      val subjNodeOpt: Option[Term] = mapNode(tm, "subject") match {
        case Some(Left(n)) => Some(n); case _ => None
      }
      val classRules: Seq[(TermRule, TermRule)] = subjNodeOpt.toSeq.flatMap(sn =>
        g.objects(sn, RML + "class").map(cls =>
          (TermRule(TermMap.Constant(RDF_TYPE), TermKind.Iri),
            TermRule(TermMap.Constant(termValue(cls)), TermKind.Iri))))

      classRules.zipWithIndex.foreach { case ((p, o), i) =>
        graphVariants(tm, None).zipWithIndex.foreach { case (gv, gi) =>
          rules += MappingRule(s"tm${tmIdx}_class${i}_g$gi", srcName,
            TripleRule(subj, p, o, gv))
        }
      }

      poms.zipWithIndex.foreach { case (pom, pomIdx) =>
        // predicate maps + shortcuts (possibly several → cartesian)
        val predNodes: Seq[Either[Term, Term]] =
          g.objects(pom, RML + "predicateMap").map(Left(_)) ++
            g.objects(pom, RML + "predicate").map(Right(_))
        val preds = predNodes.map {
          case Left(n) =>
            val (m, _) = extractMap(n)
            TermRule(m.getOrElse(throw RmlError("empty predicateMap")), TermKind.Iri)
          case Right(v) => TermRule(TermMap.Constant(termValue(v)), TermKind.Iri)
        }
        if (preds.isEmpty) throw RmlError(s"POM without predicate in $tm")

        val objNodes: Seq[Either[Term, Term]] =
          g.objects(pom, RML + "objectMap").map(Left(_)) ++
            g.objects(pom, RML + "object").map(Right(_))
        if (objNodes.isEmpty) throw RmlError(s"POM without object in $tm")

        objNodes.zipWithIndex.foreach { case (objNode, objIdx) =>
          val parentTm: Option[Term] = objNode match {
            case Left(n) => g.obj1(n, RML + "parentTriplesMap")
            case _ => None
          }
          parentTm match {
            case None =>
              val obj = objectRule(objNode)
              preds.zipWithIndex.foreach { case (p, pi) =>
                graphVariants(tm, Some(pom)).zipWithIndex.foreach { case (gv, gi) =>
                  rules += MappingRule(
                    s"tm${tmIdx}_pom${pomIdx}_p${pi}_o${objIdx}_g$gi", srcName,
                    TripleRule(subj, p, obj, gv))
                }
              }
            case Some(ptm) =>
              // referencing-object map (ra_converter get_object_w_join)
              val parentName0 = registerSource(ptm)
              val cond = objNode.swap.toOption.flatMap(_ => None)
                .orElse(objNode.left.toOption.flatMap(n => g.obj1(n, RML + "joinCondition")))
              val parentSubjNode = mapNode(ptm, "subject") match {
                case Some(Left(n)) => n
                case Some(Right(c)) => c
                case None => throw RmlError("parent TM without subjectMap")
              }
              val (pm0, _) = extractMap(parentSubjNode)
              val parentSubjMap = mapNode(ptm, "subject") match {
                case Some(Right(c)) => TermMap.Constant(termValue(c))
                case _ => pm0.getOrElse(throw RmlError("parent subjectMap empty"))
              }
              // parent-subject term-type defaults (get_object_w_join):
              // constant http→iri else literal; reference→literal; template→iri
              val parentKind = parentSubjMap match {
                case TermMap.Constant(v) => if (v.startsWith("http")) TermKind.Iri else TermKind.Lit()
                case TermMap.Reference(_) => TermKind.Lit()
                case TermMap.Template(_) => TermKind.Iri
              }
              cond match {
                case None =>
                  // natural join: same source → collapse to single scan
                  // (backend.py:151-156,181-183); different → unsupported
                  if (sources(parentName0).path != sources(srcName).path)
                    throw RmlError("natural join across different sources is unsupported") // backend.py:153-155
                  val obj = TermRule(parentSubjMap, parentKind)
                  preds.zipWithIndex.foreach { case (p, pi) =>
                    graphVariants(tm, Some(pom)).zipWithIndex.foreach { case (gv, gi) =>
                      rules += MappingRule(
                        s"tm${tmIdx}_pom${pomIdx}_p${pi}_o${objIdx}_g$gi", srcName,
                        TripleRule(subj, p, obj, gv))
                    }
                  }
                case Some(cn) =>
                  val child = termValue(g.obj1(cn, RML + "child")
                    .getOrElse(throw RmlError("joinCondition without child")))
                  val parent = termValue(g.obj1(cn, RML + "parent")
                    .getOrElse(throw RmlError("joinCondition without parent")))
                  // same file on both sides needs distinct relation names
                  val parentName = if (parentName0 == srcName) {
                    val alias = parentName0 + "__p"
                    sources(alias) = sources(parentName0)
                    alias
                  } else parentName0
                  val obj = TermRule(prefixTermMap(parentSubjMap, parentName), parentKind)
                  preds.zipWithIndex.foreach { case (p, pi) =>
                    graphVariants(tm, Some(pom)).zipWithIndex.foreach { case (gv, gi) =>
                      rules += MappingRule(
                        s"tm${tmIdx}_pom${pomIdx}_p${pi}_o${objIdx}_g$gi", srcName,
                        TripleRule(
                          prefixRule(subj, srcName), prefixRule(p, srcName), obj,
                          gv.map(prefixRule(_, srcName))),
                        join = Some(JoinSpec(parentName, child, parent)))
                    }
                  }
              }
          }
        }
      }
    }
    Compiled(rules.result(), sources.toMap)
  }
}
