package graft.rml

/**
 * Minimal Turtle parser covering the subset RML mapping documents use:
 * prefix/base directives, prefixed names, IRIs, literals (lang/datatype),
 * blank-node labels and anonymous property lists, `a`, `;` `,` punctuation
 * and comments. The reference parses mappings with the Serd Turtle reader
 * (reference rdf_parser.cpp:124-156 with prefix/curie expansion :76-82);
 * this is a from-scratch Scala equivalent, not a port.
 */
object Turtle {

  sealed trait Term
  final case class Iri(value: String) extends Term
  final case class BNode(label: String) extends Term
  final case class Lit(value: String, lang: Option[String] = None,
      datatype: Option[String] = None) extends Term

  final case class Triple(s: Term, p: Iri, o: Term)

  def parse(input: String): Seq[Triple] = new Parser(input).parseDoc()

  private final class Parser(in: String) {
    private var pos = 0
    private var base = ""
    private val prefixes = scala.collection.mutable.Map[String, String]()
    private val out = Seq.newBuilder[Triple]
    private var bnodeCounter = 0

    def parseDoc(): Seq[Triple] = {
      skipWs()
      while (pos < in.length) {
        if (peekKeyword("@prefix")) { pos += 7; prefixDirective(sparqlStyle = false) }
        else if (peekKeyword("@base")) { pos += 5; baseDirective(sparqlStyle = false) }
        else if (peekKeywordCi("PREFIX")) { pos += 6; prefixDirective(sparqlStyle = true) }
        else if (peekKeywordCi("BASE")) { pos += 4; baseDirective(sparqlStyle = true) }
        else triples()
        skipWs()
      }
      out.result()
    }

    private def prefixDirective(sparqlStyle: Boolean): Unit = {
      skipWs()
      val name = readUntil(':'); expect(':'); skipWs()
      val iri = readIriRef(); skipWs()
      if (!sparqlStyle) expect('.')
      prefixes(name) = iri
    }

    private def baseDirective(sparqlStyle: Boolean): Unit = {
      skipWs(); base = readIriRef(); skipWs()
      if (!sparqlStyle) expect('.')
    }

    private def triples(): Unit = {
      val subj = node() match {
        case t: Iri => t
        case b: BNode => b
        case other => err(s"subject cannot be $other")
      }
      predicateObjectList(subj)
      skipWs(); expect('.')
    }

    private def predicateObjectList(subj: Term): Unit = {
      var more = true
      while (more) {
        skipWs()
        val pred = verb()
        objectList(subj, pred)
        skipWs()
        if (pos < in.length && in.charAt(pos) == ';') {
          pos += 1; skipWs()
          // allow trailing ';' before '.' or ']'
          more = pos < in.length && in.charAt(pos) != '.' && in.charAt(pos) != ']'
        } else more = false
      }
    }

    private def objectList(subj: Term, pred: Iri): Unit = {
      var more = true
      while (more) {
        skipWs()
        val obj = node()
        out += Triple(subj, pred, obj)
        skipWs()
        if (pos < in.length && in.charAt(pos) == ',') { pos += 1 } else more = false
      }
    }

    private def verb(): Iri = {
      skipWs()
      if (pos < in.length && in.charAt(pos) == 'a' &&
          (pos + 1 >= in.length || !isPnChar(in.charAt(pos + 1)))) {
        pos += 1
        Iri("http://www.w3.org/1999/02/22-rdf-syntax-ns#type")
      } else node() match {
        case i: Iri => i
        case other => err(s"predicate must be IRI, got $other")
      }
    }

    /** iri | blank node | literal | [ propertyList ] */
    private def node(): Term = {
      skipWs()
      if (pos >= in.length) err("unexpected EOF")
      in.charAt(pos) match {
        case '<' => Iri(resolve(readIriRef()))
        case '"' | '\'' => literal()
        case '[' =>
          pos += 1; skipWs()
          bnodeCounter += 1
          val b = BNode(s"genid$bnodeCounter")
          if (in.charAt(pos) != ']') predicateObjectList(b)
          skipWs(); expect(']')
          b
        case '_' =>
          pos += 1; expect(':')
          BNode(readWhile(isPnChar))
        case c if c.isDigit || c == '+' || c == '-' =>
          val num = readWhile(ch => ch.isDigit || ch == '.' || ch == '+' || ch == '-' || ch == 'e' || ch == 'E')
          Lit(num, datatype = Some(
            if (num.contains('.') || num.toLowerCase.contains('e'))
              "http://www.w3.org/2001/XMLSchema#decimal"
            else "http://www.w3.org/2001/XMLSchema#integer"))
        case _ if peekKeyword("true") => pos += 4; Lit("true", datatype = Some("http://www.w3.org/2001/XMLSchema#boolean"))
        case _ if peekKeyword("false") => pos += 5; Lit("false", datatype = Some("http://www.w3.org/2001/XMLSchema#boolean"))
        case _ =>
          // prefixed name
          val prefix = readWhile(c => isPnChar(c) && c != ':')
          expect(':')
          val local = readWhile(c => isPnChar(c) || c == '%')
          val ns = prefixes.getOrElse(prefix, err(s"unknown prefix '$prefix'"))
          Iri(ns + local)
      }
    }

    private def literal(): Lit = {
      val quote = in.charAt(pos)
      val isLong = in.regionMatches(pos, s"$quote$quote$quote", 0, 3)
      val value = if (isLong) {
        pos += 3
        val end = in.indexOf(s"$quote$quote$quote", pos)
        if (end < 0) err("unterminated long string")
        val v = in.substring(pos, end); pos = end + 3; v
      } else {
        pos += 1
        val sb = new StringBuilder
        while (pos < in.length && in.charAt(pos) != quote) {
          val c = in.charAt(pos)
          if (c == '\\' && pos + 1 < in.length) {
            pos += 1
            sb.append(in.charAt(pos) match {
              case 'n' => '\n'; case 't' => '\t'; case 'r' => '\r'
              case '\\' => '\\'; case '"' => '"'; case '\'' => '\''
              case other => other match { case 'u' | 'U' => err("\\u escapes unsupported"); case x => x }
            })
            pos += 1
          } else { sb.append(c); pos += 1 }
        }
        expect(quote)
        sb.toString
      }
      // lang tag or datatype
      if (pos < in.length && in.charAt(pos) == '@') {
        pos += 1
        Lit(value, lang = Some(readWhile(c => c.isLetterOrDigit || c == '-')))
      } else if (pos + 1 < in.length && in.charAt(pos) == '^' && in.charAt(pos + 1) == '^') {
        pos += 2
        val dt = node() match {
          case Iri(v) => v
          case other => err(s"datatype must be IRI: $other")
        }
        Lit(value, datatype = Some(dt))
      } else Lit(value)
    }

    // --- lexing helpers ---
    private def resolve(iri: String): String =
      if (iri.isEmpty || iri.contains("://") || base.isEmpty) iri else base + iri

    private def readIriRef(): String = {
      expect('<')
      val v = readUntil('>'); expect('>'); v
    }

    private def isPnChar(c: Char): Boolean =
      c.isLetterOrDigit || c == '_' || c == '-' || c == '.' || c == ':'

    private def peekKeyword(k: String): Boolean = in.regionMatches(pos, k, 0, k.length)
    private def peekKeywordCi(k: String): Boolean =
      in.regionMatches(true, pos, k, 0, k.length) &&
        (pos + k.length >= in.length || in.charAt(pos + k.length).isWhitespace)

    private def readUntil(c: Char): String = {
      val end = in.indexOf(c, pos)
      if (end < 0) err(s"expected '$c'")
      val v = in.substring(pos, end); pos = end; v
    }

    private def readWhile(p: Char => Boolean): String = {
      val start = pos
      while (pos < in.length && p(in.charAt(pos))) pos += 1
      in.substring(start, pos)
    }

    private def expect(c: Char): Unit = {
      if (pos >= in.length || in.charAt(pos) != c)
        err(s"expected '$c' got '${if (pos < in.length) in.charAt(pos) else "EOF"}'")
      pos += 1
    }

    private def skipWs(): Unit = {
      var go = true
      while (go && pos < in.length) {
        val c = in.charAt(pos)
        if (c.isWhitespace) pos += 1
        else if (c == '#') { while (pos < in.length && in.charAt(pos) != '\n') pos += 1 }
        else go = false
      }
    }

    private def err(msg: String): Nothing = {
      val line = in.substring(0, math.min(pos, in.length)).count(_ == '\n') + 1
      throw new IllegalArgumentException(s"Turtle parse error line $line: $msg")
    }
  }
}
