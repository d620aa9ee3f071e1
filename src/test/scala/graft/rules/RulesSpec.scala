package graft.rules

import graft.SparkSpec
import graft.functions.RdfStrings
import org.apache.spark.sql.functions._

class RdfStringsSpec extends org.scalatest.funsuite.AnyFunSuite {
  test("safeIri percent-encodes the reference's table (utils.cpp:150-158)") {
    assert(RdfStrings.safeIri("a b") == "a%20b")
    assert(RdfStrings.safeIri("x!\"#$%&'()*+,/:;<=>?@[\\]{|}") ==
      "x%21%22%23%24%25%26%27%28%29%2A%2B%2C%2F%3A%3B%3C%3D%3E%3F%40%5B%5C%5D%7B%7C%7D")
    assert(RdfStrings.safeIri("plain-value_ok.123~^") == "plain-value_ok.123~^")
    assert(RdfStrings.safeIri("") == "")
  }

  test("iriIsValid rejects the reference's error charset (utils.cpp:186)") {
    assert(RdfStrings.iriIsValid("http://ex.org/ok-%20"))
    for (c <- " !\"'(),[]") assert(!RdfStrings.iriIsValid(s"http://ex.org/a${c}b"), s"char $c")
  }

  test("cleanBlankNode keeps [A-Za-z0-9_.-], trims, falls back (utils.cpp:95-121)") {
    assert(RdfStrings.cleanBlankNode("a:b/c d") == "abcd")
    assert(RdfStrings.cleanBlankNode("..--x.y.") == "x.y")
    assert(RdfStrings.cleanBlankNode("Ch arlie") == "Charlie")
    assert(RdfStrings.cleanBlankNode(":::").startsWith("bnode"))
  }

  test("unmask removes backslash before braces (utils.cpp:227-244)") {
    assert(RdfStrings.unmask("""a\{b\}c""") == "a{b}c")
    assert(RdfStrings.unmask("""a\nb""") == """a\nb""")
  }
}

class RuleCompilerSpec extends SparkSpec {
  import TermKind._
  import TermMap._

  test("parseTemplate extracts slots, honors escapes (utils.cpp:126-146)") {
    val t = RuleCompiler.parseTemplate("http://ex.org/p/{id}/{name}")
    assert(t.slots == Seq("id", "name"))
    assert(t.segments == Seq("http://ex.org/p/", "/", ""))
    val esc = RuleCompiler.parseTemplate("""a\{not\}/{x}""")
    assert(esc.slots == Seq("x"))
    assert(esc.segments == Seq("a{not}/", ""))
  }

  test("template IRI with %-encoding and base resolution (utils.cpp:246-311)") {
    import spark.implicits._
    val df = Seq((1, "Ali ce"), (2, "Bob")).toDF("id", "name")
    val rule = TermRule(Template("person/{id}/{name}"), Iri)
    val out = df.select(RuleCompiler.compile(rule, "http://base.org/").as("t"))
      .as[String].collect().sorted
    assert(out.toSeq == Seq(
      "<http://base.org/person/1/Ali%20ce>",
      "<http://base.org/person/2/Bob>"))
  }

  test("absolute http templates skip base; constants emitted as-is") {
    import spark.implicits._
    val df = Seq(Tuple1("7")).toDF("id")
    val abs = RuleCompiler.compile(TermRule(Template("https://ex.org/{id}"), Iri), "http://b/")
    assert(df.select(abs).as[String].head == "<https://ex.org/7>")
    val const = RuleCompiler.compile(TermRule(Constant("http://ex.org/type"), Iri), "http://b/")
    assert(df.select(const).as[String].head == "<http://ex.org/type>")
  }

  test("literal: datatype beats lang tag (utils.cpp:210-215)") {
    import spark.implicits._
    val df = Seq(Tuple1("30")).toDF("age")
    def lit1(k: TermKind) = df.select(RuleCompiler.compile(TermRule(Reference("age"), k))).as[String].head
    assert(lit1(Lit()) == "\"30\"")
    assert(lit1(Lit(lang = Some("en"))) == "\"30\"@en")
    assert(lit1(Lit(lang = Some("en"), datatype = Some("http://www.w3.org/2001/XMLSchema#integer"))) ==
      "\"30\"^^<http://www.w3.org/2001/XMLSchema#integer>")
  }

  test("blanknode sanitization as column") {
    import spark.implicits._
    val df = Seq(Tuple1("Ch arlie")).toDF("n")
    val out = df.select(RuleCompiler.compile(TermRule(Reference("n"), BlankNode))).as[String].head
    assert(out == "_:Charlie")
  }

  test("null-skip predicate drops NULL/empty rows (definitions.h:6)") {
    import spark.implicits._
    val df = Seq(("1", "a"), ("2", ""), ("3", "NULL"), (null, "x")).toDF("id", "v")
    val kept = df.filter(RuleCompiler.nullSkipPredicate(Seq("id", "v"))).count()
    assert(kept == 1)
  }

  test("constant-only rule folds to a literal plan (backend.py:300-354 parity)") {
    val rule = TripleRule(
      TermRule(TermMap.Constant("http://ex.org/s"), Iri),
      TermRule(TermMap.Constant("http://ex.org/p"), Iri),
      TermRule(TermMap.Constant("v"), Lit()))
    val (cols, _) = RuleCompiler.compileTriple(rule)
    val df = spark.range(1).select(cols.map { case (n, c) => c.as(n) }: _*)
    // Catalyst ConstantFolding collapses to a LocalRelation-style project of literals
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("concat"), s"not folded:\n$optimized")
    assert(df.collect().head.getString(0) == "<http://ex.org/s>")
  }
}

class RdfEngineSpec extends SparkSpec {
  import TermKind._
  import TermMap._

  private def studentDf = {
    import spark.implicits._
    // FIXTURES.md §B student.csv, incl. duplicate row + NULL/empty values
    Seq(
      ("1", "Alice", "30", "Berlin"),
      ("2", "Bob", "NULL", "Munich"),
      ("2", "Bob", "NULL", "Munich"),
      ("3", "Ch arlie", "25", "")).toDF("id", "name", "age", "city")
  }

  test("simple rule: project, null-skip, dedup, create (ops 1,4,5,6,9)") {
    import spark.implicits._
    val rule = MappingRule("m1", "student", TripleRule(
      TermRule(Template("student/{id}"), Iri),
      TermRule(Constant("http://xmlns.com/foaf/0.1/age"), Iri),
      TermRule(Reference("age"), Lit())))
    val out = RdfEngine.executeOne(rule, Map("student" -> studentDf), "http://ex.org/")
      .select("s", "p", "o").as[(String, String, String)].collect().toSet
    // rows 2,2 dropped (age=NULL); row 3 kept (city not referenced)
    assert(out == Set(
      ("<http://ex.org/student/1>", "<http://xmlns.com/foaf/0.1/age>", "\"30\""),
      ("<http://ex.org/student/3>", "<http://xmlns.com/foaf/0.1/age>", "\"25\"")))
  }

  test("join rule: prefix-renamed equi-join (op 7; complex_executor.cpp)") {
    import spark.implicits._
    val stopTimes = Seq(("08:00", "S1", "T1"), ("08:05", "S2", "T1"), ("09:00", "S1", "T2"))
      .toDF("arrival_time", "stop_id", "trip_id")
    val trips = Seq(("T1", "R9"), ("T2", "R7")).toDF("trip_id", "route")
    val rule = MappingRule("j1", "stop_times", TripleRule(
      TermRule(Template("stop/{stop_times_stop_id}"), Iri),
      TermRule(Constant("http://ex.org/onRoute"), Iri),
      TermRule(Template("route/{trips_route}"), Iri)),
      join = Some(JoinSpec("trips", "trip_id", "trip_id")))
    val out = RdfEngine.executeOne(rule, Map("stop_times" -> stopTimes, "trips" -> trips), "http://ex.org/")
      .select("s", "o").as[(String, String)].collect().toSet
    assert(out == Set(
      ("<http://ex.org/stop/S1>", "<http://ex.org/route/R9>"),
      ("<http://ex.org/stop/S2>", "<http://ex.org/route/R9>"),
      ("<http://ex.org/stop/S1>", "<http://ex.org/route/R7>")))
  }

  test("dedup scoping groups only colliding rules (ra_expression_partitioner)") {
    def r(name: String, subjPrefix: String) = MappingRule(name, "student", TripleRule(
      TermRule(Template(subjPrefix + "{id}"), Iri),
      TermRule(Constant("http://p/x"), Iri),
      TermRule(Reference("name"), Lit())))
    val a = r("a", "http://ex.org/person/")
    val b = r("b", "http://ex.org/person/sub/") // prefix of a's outputs → may collide
    val c = r("c", "http://other.org/thing/")   // disjoint
    val groups = DedupScope.group(Seq(a, b, c)).map(_.map(_.name).toSet)
    assert(groups.toSet == Set(Set("a", "b"), Set("c")))
  }

  test("union + distinct within collision group (ops 11,13) and serialization (op 10)") {
    import spark.implicits._
    def rule(name: String) = MappingRule(name, "student", TripleRule(
      TermRule(Template("student/{id}"), Iri),
      TermRule(Constant("http://ex.org/name"), Iri),
      TermRule(Reference("name"), Lit())))
    // two identical rules → identical outputs → distinct must collapse them
    val out = RdfEngine.execute(Seq(rule("r1"), rule("r2")),
      Map("student" -> studentDf), "http://ex.org/")
    assert(out.count() == 3) // students 1,2,3 (2's dup row deduped; all valid since age unused)
    val lines = RdfEngine.serialize(out).as[String].collect()
    assert(lines.forall(_.endsWith(" .")))
    assert(lines.exists(_ == "<http://ex.org/student/1> <http://ex.org/name> \"Alice\" ."))
  }
}
