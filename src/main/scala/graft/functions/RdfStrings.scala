package graft.functions

/**
 * Pure string helpers implementing the reference's RDF term-sanitization
 * semantics. Kept as static methods so both the interpreted `eval` path and
 * generated Java code of the Catalyst expressions in [[RdfExpressions]] can
 * call them (the same pattern Spark itself uses with UTF8String helpers —
 * a static call stays inside whole-stage codegen).
 *
 * Semantics ported from the reference (behavior, not code):
 *  - %-encoding table:  reference utils.cpp:148-175 (`make_safe_iri`)
 *  - IRI-invalid charset: reference utils.cpp:184-201 (`handle_term_type`)
 *  - blank-node cleanup:  reference utils.cpp:95-121 (`clean_blank_node`)
 *  - template unmasking:  reference utils.cpp:227-244 (`unmaskString`)
 */
object RdfStrings {

  /** Characters that `make_safe_iri` percent-encodes
    * (reference utils.cpp:150-158). Index = char code; null = pass-through. */
  private val encodeTable: Array[String] = {
    val t = new Array[String](128)
    val pairs = Seq(
      ' ' -> "%20", '!' -> "%21", '"' -> "%22", '#' -> "%23", '$' -> "%24",
      '%' -> "%25", '&' -> "%26", '\'' -> "%27", '(' -> "%28", ')' -> "%29",
      '*' -> "%2A", '+' -> "%2B", ',' -> "%2C", '/' -> "%2F", ':' -> "%3A",
      ';' -> "%3B", '<' -> "%3C", '=' -> "%3D", '>' -> "%3E", '?' -> "%3F",
      '@' -> "%40", '[' -> "%5B", '\\' -> "%5C", ']' -> "%5D", '{' -> "%7B",
      '|' -> "%7C", '}' -> "%7D")
    pairs.foreach { case (c, enc) => t(c.toInt) = enc }
    t
  }

  /** Percent-encode IRI-unsafe characters (reference utils.cpp:148-175). */
  def safeIri(s: String): String = {
    var i = 0
    val n = s.length
    // fast path: nothing to encode
    var needs = false
    while (i < n && !needs) {
      val c = s.charAt(i)
      if (c < 128 && encodeTable(c.toInt) != null) needs = true
      i += 1
    }
    if (!needs) return s
    val sb = new java.lang.StringBuilder(n + 16)
    i = 0
    while (i < n) {
      val c = s.charAt(i)
      val enc = if (c < 128) encodeTable(c.toInt) else null
      if (enc != null) sb.append(enc) else sb.append(c)
      i += 1
    }
    sb.toString
  }

  /** Characters that make a final IRI invalid — a row producing such an IRI
    * is rejected (reference utils.cpp:186-199: {' ','!','"','\'','(',')',
    * ',','[',']'}; with continue_on_error the row is skipped). */
  def iriIsValid(s: String): Boolean = {
    var i = 0
    val n = s.length
    while (i < n) {
      (s.charAt(i): @annotation.switch) match {
        case ' ' | '!' | '"' | '\'' | '(' | ')' | ',' | '[' | ']' => return false
        case _ =>
      }
      i += 1
    }
    true
  }

  /** Sanitize a blank-node label: keep `[A-Za-z0-9_.-]`, trim leading `.`/`-`
    * and trailing `.` (reference utils.cpp:95-121). The reference falls back
    * to a global counter `bnode<N>` when nothing survives; for distributed
    * determinism we instead derive the fallback from a hash of the raw value
    * (documented deviation — the reference's counter is itself
    * nondeterministic across runs under threading). */
  def cleanBlankNode(raw: String): String = {
    val sb = new java.lang.StringBuilder(raw.length)
    var i = 0
    while (i < raw.length) {
      val c = raw.charAt(i)
      if ((c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
          (c >= '0' && c <= '9') || c == '_' || c == '.' || c == '-')
        sb.append(c)
      i += 1
    }
    var start = 0
    while (start < sb.length && (sb.charAt(start) == '.' || sb.charAt(start) == '-')) start += 1
    var end = sb.length
    while (end > start && sb.charAt(end - 1) == '.') end -= 1
    val out = sb.substring(start, end)
    if (out.isEmpty) "bnode" + java.lang.Long.toUnsignedString(fnv1a(raw))
    else out
  }

  private def fnv1a(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) { h ^= s.charAt(i).toLong; h *= 0x100000001b3L; i += 1 }
    h
  }

  /** Remove the escaping backslash in front of `{` / `}`
    * (reference utils.cpp:227-244). */
  def unmask(s: String): String = {
    if (s.indexOf('\\') < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length && (s.charAt(i + 1) == '{' || s.charAt(i + 1) == '}')) {
        sb.append(s.charAt(i + 1)); i += 2
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }
}
