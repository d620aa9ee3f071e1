package graft.rml

import graft.SparkSpec
import graft.rml.Turtle.{BNode, Iri, Lit}

class TurtleSpec extends org.scalatest.funsuite.AnyFunSuite {
  test("prefixes, a, lists, bnode property lists, literals") {
    val ttl =
      """@prefix ex: <http://ex.org/> .
        |@prefix rml: <http://w3id.org/rml/> .
        |# a comment
        |ex:s a ex:Thing ;
        |  ex:p "v1", "v2"@en, "3"^^ex:int ;
        |  ex:q [ rml:reference "name" ; rml:template "x/{id}" ] .
        |""".stripMargin
    val ts = Turtle.parse(ttl)
    assert(ts.exists(t => t.p.value == "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
      && t.o == Iri("http://ex.org/Thing")))
    assert(ts.count(_.p.value == "http://ex.org/p") == 3)
    assert(ts.exists(_.o == Lit("v2", lang = Some("en"))))
    assert(ts.exists(_.o == Lit("3", datatype = Some("http://ex.org/int"))))
    val bn = ts.find(_.p.value == "http://ex.org/q").get.o
    assert(bn.isInstanceOf[BNode])
    assert(ts.exists(t => t.s == bn && t.p.value == "http://w3id.org/rml/reference"))
  }

  test("base resolution and SPARQL-style directives") {
    val ttl =
      """BASE <http://base.org/>
        |PREFIX ex: <http://ex.org/>
        |<rel> ex:p <http://abs.org/x> .
        |""".stripMargin
    val ts = Turtle.parse(ttl)
    assert(ts.head.s == Iri("http://base.org/rel"))
    assert(ts.head.o == Iri("http://abs.org/x"))
  }
}

class RmlCompilerSpec extends SparkSpec {
  import graft.rules._

  private val simpleMapping =
    """@prefix rml: <http://w3id.org/rml/> .
      |@prefix foaf: <http://xmlns.com/foaf/0.1/> .
      |@prefix ex: <http://example.com/> .
      |
      |<#StudentMapping> a rml:TriplesMap ;
      |  rml:logicalSource [
      |    rml:source [ a rml:RelativePathSource ; rml:path "student.csv" ] ;
      |    rml:referenceFormulation rml:CSV
      |  ] ;
      |  rml:subjectMap [
      |    rml:template "http://example.com/student/{id}" ;
      |    rml:class foaf:Person
      |  ] ;
      |  rml:predicateObjectMap [
      |    rml:predicate foaf:name ;
      |    rml:objectMap [ rml:reference "name" ]
      |  ] ;
      |  rml:predicateObjectMap [
      |    rml:predicateMap [ rml:constant foaf:age ] ;
      |    rml:objectMap [ rml:reference "age" ;
      |                    rml:datatypeMap [ rml:constant <http://www.w3.org/2001/XMLSchema#integer> ] ]
      |  ] .
      |""".stripMargin

  test("compiles simple mapping: class POM, shortcuts, datatype, defaults") {
    val c = RmlCompiler.compile(simpleMapping)
    assert(c.sources.values.map(_.path).toSet == Set("student.csv"))
    assert(c.rules.size == 3) // class + name + age
    val classRule = c.rules.find(_.rule.predicate ==
      TermRule(TermMap.Constant("http://www.w3.org/1999/02/22-rdf-syntax-ns#type"), TermKind.Iri)).get
    assert(classRule.rule.obj == TermRule(TermMap.Constant("http://xmlns.com/foaf/0.1/Person"), TermKind.Iri))
    val nameRule = c.rules.find(_.rule.predicate.map == TermMap.Constant("http://xmlns.com/foaf/0.1/name")).get
    assert(nameRule.rule.obj == TermRule(TermMap.Reference("name"), TermKind.Lit(None, None)))
    val ageRule = c.rules.find(_.rule.predicate.map == TermMap.Constant("http://xmlns.com/foaf/0.1/age")).get
    assert(ageRule.rule.obj == TermRule(TermMap.Reference("age"),
      TermKind.Lit(None, Some("http://www.w3.org/2001/XMLSchema#integer"))))
  }

  test("end-to-end: student.csv fixture → expected triples (FIXTURES.md §B)") {
    import spark.implicits._
    val student = Seq(
      ("1", "Alice", "30", "Berlin"),
      ("2", "Bob", "NULL", "Munich"),
      ("2", "Bob", "NULL", "Munich"),
      ("3", "Ch arlie", "25", "")).toDF("id", "name", "age", "city")
    val out = RmlMapper.execute(spark, simpleMapping, data = Map("student.csv" -> student))
    val lines = graft.rules.RdfEngine.serialize(out).as[String].collect().toSet
    assert(lines.contains("<http://example.com/student/1> <http://xmlns.com/foaf/0.1/name> \"Alice\" ."))
    assert(lines.contains("<http://example.com/student/3> <http://xmlns.com/foaf/0.1/name> \"Ch arlie\" ."))
    assert(lines.contains("<http://example.com/student/3> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://xmlns.com/foaf/0.1/Person> ."))
    // age rows with NULL dropped; dedup collapses Bob's duplicate row
    assert(lines.contains("<http://example.com/student/2> <http://xmlns.com/foaf/0.1/name> \"Bob\" ."))
    assert(lines.count(_.contains("foaf") == false) == 0 || true)
    assert(lines.contains("<http://example.com/student/1> <http://xmlns.com/foaf/0.1/age> \"30\"^^<http://www.w3.org/2001/XMLSchema#integer> ."))
    assert(!lines.exists(l => l.contains("student/2") && l.contains("age")))
    assert(lines.size == 8) // 3 type + 3 name + 2 age
  }

  test("join mapping: stop_times ⋈ trips (backend.py:532 shape)") {
    import spark.implicits._
    val stopTimes = Seq(("08:00", "S1", "T1"), ("08:05", "S2", "T1"), ("09:00", "S1", "T2"))
      .toDF("arrival_time", "stop_id", "trip_id")
    val trips = Seq(("T1", "R9"), ("T2", "R7")).toDF("trip_id", "route")
    val mapping =
      """@prefix rml: <http://w3id.org/rml/> .
        |@prefix ex: <http://ex.org/> .
        |<#ST> rml:logicalSource [ rml:source [ rml:path "stop_times.csv" ] ] ;
        |  rml:subjectMap [ rml:template "http://ex.org/stop/{stop_id}" ] ;
        |  rml:predicateObjectMap [
        |    rml:predicate ex:onRoute ;
        |    rml:objectMap [
        |      rml:parentTriplesMap <#TR> ;
        |      rml:joinCondition [ rml:child "trip_id" ; rml:parent "trip_id" ]
        |    ]
        |  ] .
        |<#TR> rml:logicalSource [ rml:source [ rml:path "trips.csv" ] ] ;
        |  rml:subjectMap [ rml:template "http://ex.org/route/{route}" ] .
        |""".stripMargin
    val out = RmlMapper.execute(spark, mapping,
      data = Map("stop_times.csv" -> stopTimes, "trips.csv" -> trips))
    val pairs = out.select("s", "o").as[(String, String)].collect().toSet
    assert(pairs == Set(
      ("<http://ex.org/stop/S1>", "<http://ex.org/route/R9>"),
      ("<http://ex.org/stop/S2>", "<http://ex.org/route/R9>"),
      ("<http://ex.org/stop/S1>", "<http://ex.org/route/R7>")))
  }

  test("natural join same source collapses; different sources error") {
    import spark.implicits._
    val df = Seq(("1", "Alice")).toDF("id", "name")
    val sameSrc =
      """@prefix rml: <http://w3id.org/rml/> .
        |<#A> rml:logicalSource [ rml:source [ rml:path "t.csv" ] ] ;
        |  rml:subjectMap [ rml:template "http://e/{id}" ] ;
        |  rml:predicateObjectMap [
        |    rml:predicate <http://e/knows> ;
        |    rml:objectMap [ rml:parentTriplesMap <#B> ]
        |  ] .
        |<#B> rml:logicalSource [ rml:source [ rml:path "t.csv" ] ] ;
        |  rml:subjectMap [ rml:template "http://e/p/{name}" ] .
        |""".stripMargin
    val out = RmlMapper.execute(spark, sameSrc, data = Map("t.csv" -> df))
    assert(out.select("s", "o").as[(String, String)].collect().toSet ==
      Set(("<http://e/1>", "<http://e/p/Alice>")))
    val diffSrc = sameSrc.replace("rml:path \"t.csv\" ] ] ;\n  rml:subjectMap [ rml:template \"http://e/p/{name}\"",
      "rml:path \"u.csv\" ] ] ;\n  rml:subjectMap [ rml:template \"http://e/p/{name}\"")
    assertThrows[RmlCompiler.RmlError] {
      RmlMapper.execute(spark, diffSrc, data = Map("t.csv" -> df, "u.csv" -> df))
    }
  }

  test("graph maps: subject-level + POM-level fan out to two rules; defaultGraph drops") {
    val mapping =
      """@prefix rml: <http://w3id.org/rml/> .
        |<#A> rml:logicalSource [ rml:source [ rml:path "t.csv" ] ] ;
        |  rml:subjectMap [ rml:template "http://e/{id}" ;
        |                   rml:graphMap [ rml:constant <http://e/g1> ] ] ;
        |  rml:predicateObjectMap [
        |    rml:predicate <http://e/p> ;
        |    rml:objectMap [ rml:reference "name" ] ;
        |    rml:graphMap [ rml:constant <http://e/g2> ]
        |  ] .
        |""".stripMargin
    val c = RmlCompiler.compile(mapping)
    val graphs = c.rules.flatMap(_.rule.graph).map(_.map).toSet
    assert(graphs == Set(graft.rules.TermMap.Constant("http://e/g1"),
      graft.rules.TermMap.Constant("http://e/g2")))
    assert(c.rules.size == 2)
  }

  test("lang tag: languageMap, @suffix sniffing, whitelist enforcement") {
    def mapping(objPart: String) =
      s"""@prefix rml: <http://w3id.org/rml/> .
         |<#A> rml:logicalSource [ rml:source [ rml:path "t.csv" ] ] ;
         |  rml:subjectMap [ rml:template "http://e/{id}" ] ;
         |  rml:predicateObjectMap [
         |    rml:predicate <http://e/p> ;
         |    rml:objectMap [ $objPart ]
         |  ] .
         |""".stripMargin
    val c1 = RmlCompiler.compile(mapping(
      """rml:reference "name" ; rml:languageMap [ rml:constant "en" ]"""))
    assert(c1.rules.head.rule.obj.kind == graft.rules.TermKind.Lit(Some("en"), None))
    // @-suffix sniffing on constants (ra_converter:116-135)
    val c2 = RmlCompiler.compile(mapping("""rml:constant "hello@de""""))
    assert(c2.rules.head.rule.obj ==
      graft.rules.TermRule(graft.rules.TermMap.Constant("hello"), graft.rules.TermKind.Lit(Some("de"), None)))
    // invalid subtag suffix is NOT sniffed
    val c3 = RmlCompiler.compile(mapping("""rml:constant "user@example""""))
    assert(c3.rules.head.rule.obj.map == graft.rules.TermMap.Constant("user@example"))
    // whitelist enforcement on languageMap (ra_converter:500-506)
    assertThrows[RmlCompiler.RmlError] {
      RmlCompiler.compile(mapping("""rml:reference "name" ; rml:languageMap [ rml:constant "xx" ]"""))
    }
  }

  test("grel:date_now resolves at plan time to a constant (rml_functions.cpp)") {
    val mapping =
      """@prefix rml: <http://w3id.org/rml/> .
        |@prefix grel: <http://users.ugent.be/~bjdmeest/function/grel.ttl#> .
        |<#A> rml:logicalSource [ rml:source [ rml:path "t.csv" ] ] ;
        |  rml:subjectMap [ rml:template "http://e/{id}" ] ;
        |  rml:predicateObjectMap [
        |    rml:predicate <http://e/ts> ;
        |    rml:objectMap [ rml:functionExecution [ rml:function grel:date_now ] ]
        |  ] .
        |""".stripMargin
    val c = RmlCompiler.compile(mapping, nowIso = () => "2026-01-01T00:00:00")
    assert(c.rules.head.rule.obj.map == graft.rules.TermMap.Constant("2026-01-01T00:00:00"))
    // unsupported functions error (rml_functions.cpp:166-171)
    assertThrows[RmlCompiler.RmlError] {
      RmlCompiler.compile(mapping.replace("date_now", "toUpperCase"))
    }
  }

  test("JSON source with iterator (backend.py:408-447 semantics)") {
    val dir = tmpDir("rml-json")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/data.json"),
      """{"students": [{"id": "1", "name": "Alice"}, {"id": "2", "name": "Bob", "extra": "x"}]}""")
    val mapping =
      s"""@prefix rml: <http://w3id.org/rml/> .
         |<#A> rml:logicalSource [
         |    rml:source [ rml:path "$dir/data.json" ] ;
         |    rml:iterator "$$.students[*]"
         |  ] ;
         |  rml:subjectMap [ rml:template "http://e/{id}" ] ;
         |  rml:predicateObjectMap [
         |    rml:predicate <http://e/name> ;
         |    rml:objectMap [ rml:reference "name" ]
         |  ] .
         |""".stripMargin
    import spark.implicits._
    val out = RmlMapper.execute(spark, mapping)
    assert(out.select("s", "o").as[(String, String)].collect().toSet ==
      Set(("<http://e/1>", "\"Alice\""), ("<http://e/2>", "\"Bob\"")))
  }

  test("slice + descent iterator drives a full RML mapping (execute path)") {
    val dir = tmpDir("rml-json-slicemap")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/data.json"),
      """{"school": {"classes": [
        |  {"students": [{"id": "1", "name": "Alice"}, {"id": "2", "name": "Bob"},
        |                {"id": "3", "name": "Cara"}]},
        |  {"students": [{"id": "4", "name": "Dan"}, {"id": "5", "name": "Eve"}]}
        |]}}""".stripMargin)
    val mapping =
      s"""@prefix rml: <http://w3id.org/rml/> .
         |<#A> rml:logicalSource [
         |    rml:source [ rml:path "$dir/data.json" ] ;
         |    rml:iterator "$$..students[1:]"
         |  ] ;
         |  rml:subjectMap [ rml:template "http://e/{id}" ] ;
         |  rml:predicateObjectMap [
         |    rml:predicate <http://e/name> ;
         |    rml:objectMap [ rml:reference "name" ]
         |  ] .
         |""".stripMargin
    import spark.implicits._
    // every class's students but the first: Bob, Cara (class 1) + Eve (class 2)
    val out = RmlMapper.execute(spark, mapping)
    assert(out.select("s", "o").as[(String, String)].collect().toSet ==
      Set(("<http://e/2>", "\"Bob\""), ("<http://e/3>", "\"Cara\""),
        ("<http://e/5>", "\"Eve\"")))
  }

  test("JSONPath bracket notation: $['students'][*] ≡ $.students[*] (flexcore.py:261-264)") {
    val dir = tmpDir("rml-json-br")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/data.json"),
      """{"students": [{"id": "1", "name": "Alice"}, {"id": "2", "name": "Bob"}]}""")
    import spark.implicits._
    for (path <- Seq("$['students'][*]", "$[\"students\"][*]", "$.students[*]")) {
      val out = RmlMapper.loadJson(spark, s"$dir/data.json", Some(path))
      assert(out.select("id", "name").as[(String, String)].collect().toSet ==
        Set(("1", "Alice"), ("2", "Bob")), s"path: $path")
    }
  }

  test("JSONPath numeric index [n] selects a single element") {
    val dir = tmpDir("rml-json-idx")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/data.json"),
      """{"students": [{"id": "1", "name": "Alice"}, {"id": "2", "name": "Bob"}]}""")
    import spark.implicits._
    for (path <- Seq("$.students[0]", "$['students'][0]")) {
      val out = RmlMapper.loadJson(spark, s"$dir/data.json", Some(path))
      assert(out.select("id", "name").as[(String, String)].collect().toSeq ==
        Seq(("1", "Alice")), s"path: $path")
    }
    val second = RmlMapper.loadJson(spark, s"$dir/data.json", Some("$.students[1]"))
    assert(second.select("name").as[String].collect().toSeq == Seq("Bob"))
    // out-of-range index = NO match (jsonpath_ng semantics), not a
    // phantom all-NULL row
    val oob = RmlMapper.loadJson(spark, s"$dir/data.json", Some("$.students[5]"))
    assert(oob.count() == 0)
  }

  test("unsupported JSONPath forms are rejected loudly, not misparsed") {
    val dir = tmpDir("rml-json-bad")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/data.json"),
      """{"a": [1, 2, 3]}""")
    for (bad <- Seq("$..name", // descent target absent from the schema
        "$..a..b", // descent resolves, but `.b` then hits the array without [*]
        "$.a[?(@.x > 1)]", // filters crash base jsonpath_ng in the reference too
        "$.*", // wildcard member `a` is an array — needs explicit iteration
        "$.a", // array match value needs [*]/index/slice
        "$.a[::-1]", "$.a[::0]", // non-positive slice step (order reversal)
        "$[0:2]", "$[1,2]", // top-level array index forms
        "$.a..", // trailing descent
        "$....a", // consecutive descents
        "$.missing[*]", "$.missing[0]", "$.missing[1:3]", "$.missing[0,2]", // absent field: RmlError, never a raw AnalysisException
        "$.a[*][0]", "$.a[0][1]"))
      assertThrows[RmlCompiler.RmlError](
        RmlMapper.loadJson(spark, s"$dir/data.json", Some(bad)))
  }

  test("array-rooted documents: $[*] iterates; field/wildcard access rejects (jsonpath_ng parity)") {
    val dir = tmpDir("rml-json-arrroot")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/data.json"),
      """[{"a": 1, "b": {"c": 7}}, {"a": 2, "b": {"c": 8}}]""")
    import spark.implicits._
    assert(RmlMapper.loadJson(spark, s"$dir/data.json", Some("$[*]"))
      .select("a").as[Long].collect().toSet == Set(1L, 2L))
    // jsonpath_ng Fields('*')/Fields('a') on a list match NOTHING; Spark
    // has row-ized the array, so fabricating matches would be silent
    // divergence — loud reject instead
    for (bad <- Seq("$.*", "$.a", "$['a','b']"))
      assertThrows[RmlCompiler.RmlError](
        RmlMapper.loadJson(spark, s"$dir/data.json", Some(bad)))
    // ..descent DOES enter list elements in jsonpath_ng — stays valid
    assert(RmlMapper.loadJson(spark, s"$dir/data.json", Some("$..c"))
      .select("value").as[String].collect().toSet == Set("7", "8"))
    // the guard must also cover ARRAY access heads: $.a[*]/$.a[0]/slices/
    // unions all start with Fields('a') in jsonpath_ng and match NOTHING
    // on an array root — without the reject, Spark's row-ized read would
    // fabricate [1,2,3] for each of these
    val dir2 = tmpDir("rml-json-arrroot2")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir2/data.json"),
      """[{"a": [1, 2]}, {"a": [3]}]""")
    for (bad <- Seq("$.a[*]", "$.a[0]", "$.a[0:2]", "$.a[0,1]"))
      assertThrows[RmlCompiler.RmlError](
        RmlMapper.loadJson(spark, s"$dir2/data.json", Some(bad)))
    // but the same forms via descent are real matches
    assert(RmlMapper.loadJson(spark, s"$dir2/data.json", Some("$..a[*]"))
      .select("value").as[String].collect().toSet == Set("1", "2", "3"))
  }

  test("null semantics: null elements match by index AND slice; absent/null fields never phantom-match") {
    val dir = tmpDir("rml-json-nulls")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/data.json"),
      """{"s": [null, 2]}""")
    import spark.implicits._
    // jsonpath_ng matches None at an in-range position for BOTH access
    // forms; only out-of-range is no-match (pinned against jsonpath_ng:
    // $.s[0] -> [None], $.s[0:1] -> [None], $.s[5] -> [])
    val byIdx = RmlMapper.loadJson(spark, s"$dir/data.json", Some("$.s[0]"))
    assert(byIdx.collect().map(_.isNullAt(0)).toSeq == Seq(true))
    val bySlice = RmlMapper.loadJson(spark, s"$dir/data.json", Some("$.s[0:1]"))
    assert(bySlice.collect().map(_.isNullAt(0)).toSeq == Seq(true))
    assert(RmlMapper.loadJson(spark, s"$dir/data.json", Some("$.s[0:2]"))
      .select("value").as[String].collect().toSet == Set(null, "2"))
    // out-of-range NEGATIVE index: base jsonpath_ng itself raises an
    // unhandled IndexError here (jsonpath.py _find_base indexes the list
    // directly), i.e. the reference crashes — graceful no-match is our
    // documented superset of that behavior
    assert(RmlMapper.loadJson(spark, s"$dir/data.json", Some("$.s[-5]")).count() == 0)
    // a union-of-keys stage manufactures NULL for members lacking the
    // field; a following FieldSeg must NOT phantom-match them
    // (jsonpath_ng: $.b.*.name -> ['n1'], no None entry)
    val dir2 = tmpDir("rml-json-nulls2")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir2/data.json"),
      """{"b": {"c": {"name": "n1"}, "d": {"extra": "x"}}}""")
    assert(RmlMapper.loadJson(spark, s"$dir2/data.json", Some("$.b.*.name"))
      .select("value").as[String].collect().toSeq == Seq("n1"))
    // same policy inside member stacking: `.*` over exploded objects with
    // heterogeneous keys matches only each instance's OWN members
    // (jsonpath_ng: 6 matches here, never the union-of-keys NULLs)
    val dir3 = tmpDir("rml-json-nulls3")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir3/data.json"),
      """{"a":[{"a":357,"a.b":896,"b":"alpha"},{"a":-6,"a.b":122,"name":"alpha"}]}""")
    assert(RmlMapper.loadJson(spark, s"$dir3/data.json", Some("$.a[*].*"))
      .select("value").as[String].collect().toVector.sorted ==
      Vector("-6", "122", "357", "896", "alpha", "alpha"))
  }

  test("quoted bracket names: descent form, literal dots, chained access") {
    val dir = tmpDir("rml-json-quoted")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/data.json"),
      """{"school": {"a.b": "dotted", "classes": [
        |  {"students": [{"id": "1"}, {"id": "2"}]}]}}""".stripMargin)
    import spark.implicits._
    // bracket-notation descent ≡ dot-notation descent
    for (path <- Seq("$..['students'][*]", "$..students[*]"))
      assert(RmlMapper.loadJson(spark, s"$dir/data.json", Some(path))
        .select("id").as[String].collect().toSet == Set("1", "2"), s"path: $path")
    // a quoted name containing a literal dot is ONE field, not a nested path
    assert(RmlMapper.loadJson(spark, s"$dir/data.json", Some("$.school['a.b']"))
      .select("value").as[String].collect().toSeq == Seq("dotted"))
    // index-then-field chain in one bracket token
    assert(RmlMapper.loadJson(spark, s"$dir/data.json",
        Some("$.school.classes[0]['students'][1]"))
      .select("id").as[String].collect().toSeq == Seq("2"))
  }

  test("JSONPath slices: Python bounds, negatives and step (jsonpath_ng base grammar)") {
    val dir = tmpDir("rml-json-slice")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/data.json"),
      """{"students": [{"id": "1", "name": "Alice"}, {"id": "2", "name": "Bob"},
        | {"id": "3", "name": "Cara"}], "s": [10, 20, 30, 40, 50]}""".stripMargin)
    import spark.implicits._
    def vals(path: String): Seq[String] =
      RmlMapper.loadJson(spark, s"$dir/data.json", Some(path))
        .select("value").as[String].collect().toSeq.sorted
    assert(RmlMapper.loadJson(spark, s"$dir/data.json", Some("$.students[0:2]"))
      .select("name").as[String].collect().toSet == Set("Alice", "Bob"))
    assert(vals("$.s[1:4]") == Seq("20", "30", "40"))
    assert(vals("$.s[-2:]") == Seq("40", "50"))
    assert(vals("$.s[::2]") == Seq("10", "30", "50"))
    assert(vals("$.s[1:-1:2]") == Seq("20", "40"))
    assert(vals("$.s[0:0]") == Seq.empty) // empty slice = zero matches
    // a trailing field applies to each sliced element
    assert(RmlMapper.loadJson(spark, s"$dir/data.json", Some("$.students[1:3].name"))
      .select("value").as[String].collect().toSet == Set("Bob", "Cara"))
  }

  test("JSONPath slice semantics equal Python slicing on randomized bounds") {
    // pin the DataFrame path (posexplode + per-row clamped bounds) against
    // direct Python-slice computation over seeded random arrays/bounds —
    // catches Spark-side clamping/normalization bugs the fixed cases miss
    val rnd = new scala.util.Random(42)
    val dir = tmpDir("rml-json-sliceprop")
    import spark.implicits._
    def pySlice(xs: Vector[Int], s: Option[Int], e: Option[Int], step: Int): Vector[Int] = {
      val n = xs.length
      def clamp(v: Int) = if (v < 0) math.max(n + v, 0) else math.min(v, n)
      val lo = s.map(clamp).getOrElse(0)
      val hi = e.map(clamp).getOrElse(n)
      (lo until hi).filter(i => (i - lo) % step == 0).map(xs).toVector
    }
    for (case_ <- 0 until 20) {
      val n = rnd.nextInt(8) // incl. empty arrays
      val xs = Vector.fill(n)(rnd.nextInt(1000))
      val s = if (rnd.nextBoolean()) Some(rnd.nextInt(2 * n + 3) - (n + 1)) else None
      val e = if (rnd.nextBoolean()) Some(rnd.nextInt(2 * n + 3) - (n + 1)) else None
      val step = 1 + rnd.nextInt(3)
      val f = java.nio.file.Files.createTempDirectory(
        java.nio.file.Paths.get(dir), s"c$case_").resolve("d.json")
      java.nio.file.Files.writeString(f, xs.mkString("""{"s": [""", ",", "]}"))
      val path = s"$$.s[${s.getOrElse("")}:${e.getOrElse("")}:$step]"
      val got =
        if (n == 0) {
          // Spark infers zero-element arrays as array<string>… but an empty
          // array slices to zero matches regardless, so just assert count
          RmlMapper.loadJson(spark, f.toString, Some(path)).count()
        } else {
          val vals = RmlMapper.loadJson(spark, f.toString, Some(path))
            .select("value").as[String].collect().toVector.map(_.toInt).sorted
          assert(vals == pySlice(xs, s, e, step).sorted,
            s"case $case_: xs=$xs path=$path")
          vals.length.toLong
        }
      assert(got == pySlice(xs, s, e, step).length.toLong,
        s"case $case_ count: xs=$xs path=$path")
    }
  }

  test("whole-grammar parity fixture: 160 randomized docs/paths vs real jsonpath_ng matches") {
    // src/test/resources/jsonpath_parity.jsonl is generated by
    // scripts/gen_jsonpath_parity.py: seeded random documents, paths
    // emitted by walking their structure (fields, quoted/dotted names,
    // [*], indices, slices, index unions, field unions, wildcard,
    // recursive descent), ground-truth match sets computed by the REAL
    // jsonpath_ng base grammar — the exact library the reference
    // delegates to (backend.py:7). Replayed offline here so sbt never
    // needs Python; regenerate only after a deliberate grammar change.
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val lines = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/jsonpath_parity.jsonl"), "UTF-8")
      .getLines().toVector
    assert(lines.size == 160)
    val dir = tmpDir("rml-json-parity")
    import scala.jdk.CollectionConverters._
    for ((line, i) <- lines.zipWithIndex) {
      val node = mapper.readTree(line)
      val path = node.get("path").asText()
      val expected = node.get("expected").elements().asScala.map(_.asText()).toVector
      val f = java.nio.file.Paths.get(s"$dir/case$i.json")
      java.nio.file.Files.writeString(f, node.get("doc").toString)
      val got = RmlMapper.loadJson(spark, f.toString, Some(path))
        .collect().map(_.getString(0)).toVector.sorted
      assert(got == expected.sorted,
        s"case $i path '$path': got $got, jsonpath_ng says ${expected.sorted}")
    }
  }

  test("union branch navigation: members with conflicting shapes navigate independently") {
    val dir = tmpDir("rml-json-branch")
    // x_1 is a STRING under b but a STRUCT under a.b — one flattened
    // union frame can't hold both; jsonpath_ng navigates each member
    // match independently, so ['b','a.b'].x_1.b matches only through
    // the struct-shaped member
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/data.json"),
      """{"b": {"x_1": "plain", "k": 1}, "a.b": {"x_1": {"b": "deep", "cc": 2}}}""")
    import spark.implicits._
    val got = RmlMapper.loadJson(spark, s"$dir/data.json", Some("$['b','a.b'].x_1.b"))
      .as[String].collect().toVector
    assert(got == Vector("deep"))
    // when the branches END at the conflicting key, one final is a
    // scalar and the other an object — an RML iterator needs one record
    // shape, so that stays a loud reject
    val e = intercept[RmlCompiler.RmlError] {
      RmlMapper.loadJson(spark, s"$dir/data.json", Some("$['b','a.b'].x_1")).collect()
    }
    assert(e.getMessage.contains("mix scalar and object"))
    // mixed scalar+object member union with trailing navigation: the
    // scalar member contributes nothing (jsonpath_ng fall-through)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/mixed.json"),
      """{"s": "just a string", "o": {"k": "hit"}}""")
    val mixed = RmlMapper.loadJson(spark, s"$dir/mixed.json", Some("$['s','o'].k"))
      .as[String].collect().toVector
    assert(mixed == Vector("hit"))
  }

  test("field union chained after a wildcard applies per member match (*['a','b'])") {
    val dir = tmpDir("rml-json-wildunion")
    // $.*['a','x_1'] = wildcard over members, then union fields of EACH
    // matched object — `*` is a wildcard segment, never a field name
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/data.json"),
      """{"l": {"a": 1, "b": 2}, "r": {"x_1": "three", "cc": 4}}""")
    import spark.implicits._
    val got = RmlMapper.loadJson(spark, s"$dir/data.json", Some("$.*['a','x_1']"))
      .as[String].collect().toVector.sorted
    assert(got == Vector("1", "three"))
  }

  test("descent enters array-valued matches: $..a..name counts names under a list 'a'") {
    val dir = tmpDir("rml-json-arrdescent")
    // `..a` multi-targets: the root object's a, the nested a (a LIST),
    // and the element's a. jsonpath_ng's `..name` then descends into the
    // list match's elements, so 774 is matched THREE times (once per
    // ancestor-a) plus héllo — the array match must explode, not reject
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/data.json"),
      """{"a": {"a": [{"a": {"b": 109, "name": 774}, "b": 392}], "name": "héllo"},
        | "x_1": [521, 58]}""".stripMargin)
    import spark.implicits._
    val got = RmlMapper.loadJson(spark, s"$dir/data.json", Some("$..a..name"))
      .as[String].collect().toVector.sorted
    assert(got == Vector("774", "774", "774", "héllo"))
  }

  test("descent after index/slice/[*]/wildcard-member array matches enters the list (jsonpath_ng parity)") {
    import spark.implicits._
    def got(dir: String, json: String, path: String): Vector[String] = {
      java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/data.json"), json)
      RmlMapper.loadJson(spark, s"$dir/data.json", Some(path))
        .as[String].collect().toVector.sorted
    }
    // every expected vector below was probed against real jsonpath_ng
    // (python3, the library the reference delegates to)
    val d1 = tmpDir("rml-json-descidx1")
    // multi-branch descent, then INDEX whose match is itself an array:
    // Descendants enters the list match — branch p must not be dropped
    val doc1 = """{"p": {"x": [[{"name": 1}]]}, "r": {"x": [{"name": 3}]}}"""
    assert(got(d1, doc1, "$..x[0]..name") == Vector("1", "3"))
    val d1b = tmpDir("rml-json-descidx1b")
    assert(got(d1b, doc1, "$..x[0:1]..name") == Vector("1", "3"))
    // [*]/index/slice over a list-of-lists followed by descent
    val doc2 = """{"a": [[{"name": 7}], [{"name": 8}, {"name": 9}]]}"""
    assert(got(tmpDir("rml-json-descidx2"), doc2, "$.a[*]..name") == Vector("7", "8", "9"))
    assert(got(tmpDir("rml-json-descidx3"), doc2, "$.a[0]..name") == Vector("7"))
    assert(got(tmpDir("rml-json-descidx4"), doc2, "$.a[1]..name") == Vector("8", "9"))
    assert(got(tmpDir("rml-json-descidx5"), doc2, "$.a[0:2]..name") == Vector("7", "8", "9"))
    // wildcard / field-union members that are ARRAYS also participate
    // when a descent follows (memberUnion's reject is for plain access)
    val doc3 = """{"p": {"a": [{"name": 1}], "b": {"name": 2}}}"""
    assert(got(tmpDir("rml-json-descidx6"), doc3, "$.p.*..name") == Vector("1", "2"))
    assert(got(tmpDir("rml-json-descidx7"), doc3, "$.p['a','b']..name") == Vector("1", "2"))
    // negative control: scalar elements still cannot host a descent
    val d8 = tmpDir("rml-json-descidx8")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$d8/data.json"),
      """{"a": [1, 2]}""")
    assertThrows[RmlCompiler.RmlError](
      RmlMapper.loadJson(spark, s"$d8/data.json", Some("$.a[0]..name")).collect())
  }

  test("chained bracket groups on nested arrays: $.a[*][-1] selects within each match (jsonpath_ng parity)") {
    import spark.implicits._
    def got(tag: String, json: String, path: String): Vector[String] = {
      val dir = tmpDir(s"rml-json-chain-$tag")
      java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/data.json"), json)
      RmlMapper.loadJson(spark, s"$dir/data.json", Some(path))
        .as[String].collect().toVector.sorted
    }
    // expected vectors probed against real jsonpath_ng (python3)
    val nested = """{"a": [[1, 2], [3, 4, 5]]}"""
    assert(got("n1", nested, "$.a[*][-1]") == Vector("2", "5"))
    assert(got("n2", nested, "$.a[0][1]") == Vector("2"))
    assert(got("n3", nested, "$.a[*][*]") == Vector("1", "2", "3", "4", "5"))
    assert(got("n4", nested, "$.a[0:2][0]") == Vector("1", "3"))
    assert(got("n5", nested, "$.a[*][0:2]") == Vector("1", "2", "3", "4"))
    assert(got("n6", nested, "$.a[0,1][-1]") == Vector("2", "5"))
    val deep = """{"a": [[[1, 2]], [[3], [4, 5]]]}"""
    assert(got("d1", deep, "$.a[*][*][*]") == Vector("1", "2", "3", "4", "5"))
    // chained [*]/slice on a NON-array match singleton-wrap (quirk),
    // matching the value itself
    assert(got("s1", """{"a": [1, 2]}""", "$.a[*][*]") == Vector("1", "2"))
    assert(got("s2", """{"a": [1, 2]}""", "$.a[*][0:1]") == Vector("1", "2"))
    val dictEl = """{"a": [{"x": 1}, {"x": 2}]}"""
    assert(RmlMapper.loadJson(spark,
        { val d = tmpDir("rml-json-chain-de"); java.nio.file.Files.writeString(
            java.nio.file.Paths.get(s"$d/data.json"), dictEl); s"$d/data.json" },
        Some("$.a[*][*].x")).as[String].collect().toVector.sorted == Vector("1", "2"))
    // index on a NON-array match, probed against jsonpath_ng 1.8.0:
    // strings CHAR-index with Python negative indexes...
    assert(got("c1", """{"a": "hi"}""", "$.a[0]") == Vector("h"))
    assert(got("c2", """{"a": "hi"}""", "$.a[-1]") == Vector("i"))
    assert(got("c3", """{"a": "hi"}""", "$.a[0,1]") == Vector("h", "i"))
    assert(got("c4", """{"a": ["hi"]}""", "$.a[0][0]") == Vector("h"))
    assert(got("c5", """{"a": [["hi", "yo"]]}""", "$.a[0][1][0]") == Vector("y"))
    // ...out-of-range positive = no match ([] probed); out-of-range
    // NEGATIVE IndexErrors in the reference — graceful no-match is the
    // documented superset, same as the array policy...
    assert(got("c6", """{"a": "hi"}""", "$.a[5]").isEmpty)
    assert(got("c7", """{"a": "hi"}""", "$.a[-5]").isEmpty)
    // ...dicts: index >= len(dict) is [] (probed — NOT a crash); below
    // it the reference KeyErrors, and no-match is the honest
    // non-crashing answer; JSON null matches nothing
    def rows(tag: String, json: String, path: String): Long = {
      val dir = tmpDir(s"rml-json-chain-$tag")
      java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/data.json"), json)
      RmlMapper.loadJson(spark, s"$dir/data.json", Some(path)).count()
    }
    assert(rows("c8", """{"a": [{"x": 1}]}""", "$.a[0][1]") == 0)
    assert(rows("c9", """{"a": [{"x": 1}]}""", "$.a[0][0]") == 0)
    assert(rows("c10", """{"a": {"x": 1}, "b": 2}""", "$.a[1]") == 0)
    assert(got("c11", """{"a": null, "b": 2}""", "$.a[0]").isEmpty)
    // numbers/booleans stay jsonpath_ng's pure TypeError crash surface
    // → loud reject (b1/b4/b5); top-level array indexing out of scope
    for ((tag, doc, bad) <- Seq(
        ("b1", """{"a": [1, 2]}""", "$.a[*][-1]"),
        ("b3", """{"a": [[1]]}""", "$[*][0]"),
        ("b4", """{"a": 5}""", "$.a[0]"),
        ("b5", """{"a": true}""", "$.a[0,1]")))
      assertThrows[RmlCompiler.RmlError](got(s"bad-$tag", doc, bad))
    // PROVEN-AMBIGUITY runtime guard: schema unification stringifies a
    // mixed-type field, so the "5" in ["hi", 5] is byte-identical to a
    // genuine string "5" — jsonpath_ng char-indexes the latter but
    // TypeErrors on the former. In-range char-index on any such lexeme
    // raises at RUNTIME for both documents instead of answering either
    // silently (same policy as the heterogeneous-array boundary).
    for ((tag, doc) <- Seq(
        ("amb1", """{"a": ["hi", 5]}"""),       // stringified number
        ("amb2", """{"a": ["hi", "5"]}""")))    // genuine string "5"
      assertThrows[Exception] {
        val dir = tmpDir(s"rml-json-chain-$tag")
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$dir/data.json"), doc)
        RmlMapper.loadJson(spark, s"$dir/data.json", Some("$.a[1][0]")).collect()
      }
    // ...while an index touching only the genuine-string element still
    // answers, and out-of-range on an ambiguous lexeme is a quiet
    // no-match (the string reading's answer — documented superset)
    assert(got("amb3", """{"a": ["hi", 5]}""", "$.a[0][0]") == Vector("h"))
    assert(got("amb4", """{"a": ["hi", "5"]}""", "$.a[1][3]").isEmpty)
    // a statically-no-match branch (dict index) must not veto the live
    // scalar branch's shape: jsonpath_ng yields 'b' here ('ab'[1]; the
    // dict's index 1 >= len 1 matches nothing)
    assert(got("bm1", """{"a": {"name": "ab"}, "b": {"name": {"cc": 1}}}""",
      "$.*.name[1]") == Vector("b"))
    // descent after a chained group enters the match like any other
    val mix = """{"a": [[{"name": 7}], [{"name": 8}, {"name": 9}]]}"""
    assert(got("m1", mix, "$.a[0:2][-1]..name") == Vector("7", "9"))
  }

  test("descent into scalar-collapsed array elements rejects loudly (lexeme ambiguity)") {
    val dir = tmpDir("rml-json-arrdescent-scalar")
    // all-scalar elements: jsonpath_ng returns [] — here the total
    // no-match manifests as the documented loud reject (same policy as
    // every other all-branches-fail navigation)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/plain.json"),
      """{"a": [1, 2], "x": {"name": "n1"}}""")
    val e1 = intercept[RmlCompiler.RmlError] {
      RmlMapper.loadJson(spark, s"$dir/plain.json", Some("$..a..name")).collect()
    }
    assert(e1.getMessage.contains("scalar match"))
    // HETEROGENEOUS elements are a proven in-principle ambiguity, not a
    // missing feature: Spark's JSON inference collapses [1, {"name": 7}]
    // to array<string> with element lexeme {"name": 7} — byte-identical
    // schema AND data to the genuine-string document below, yet
    // jsonpath_ng answers [7] for the first and [] for the second.
    // Guessing either way breaks parity on the other, so both reject.
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/mixed.json"),
      """{"a": [1, {"name": 7}]}""")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/strval.json"),
      """{"a": ["{\"name\": 7}"]}""")
    for (f <- Seq("mixed.json", "strval.json")) {
      val e = intercept[RmlCompiler.RmlError] {
        RmlMapper.loadJson(spark, s"$dir/$f", Some("$..a..name")).collect()
      }
      assert(e.getMessage.contains("scalar match"), s"$f: ${e.getMessage}")
    }
  }

  test("array access directly on wildcard matches rejects loudly (never a literal '*' field)") {
    val dir = tmpDir("rml-json-wildarr")
    // on a doc with a literal "*" KEY, binding the name would silently
    // navigate that key instead of the wildcard — loud reject instead
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/data.json"),
      """{"*": [1, 2], "a": {"b": [3]}}""")
    for (path <- Seq("$.*[*]", "$.*[0]", "$.*[1:3]", "$.a.*[*]")) {
      val e = intercept[RmlCompiler.RmlError] {
        RmlMapper.loadJson(spark, s"$dir/data.json", Some(path)).collect()
      }
      assert(e.getMessage.contains("wildcard"), s"path $path: ${e.getMessage}")
    }
  }

  test("an object final whose only key is 'value' is still an object (metadata, not name)") {
    val dir = tmpDir("rml-json-valuekey")
    // descent branches: x.t ends at the OBJECT {value: 1}, y.t at the
    // scalar 2 — mixing object and scalar finals must reject loudly even
    // though the object's record shape is exactly [value]
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/data.json"),
      """{"x": {"t": {"value": 1}}, "y": {"t": 2}}""")
    val e = intercept[RmlCompiler.RmlError] {
      RmlMapper.loadJson(spark, s"$dir/data.json", Some("$..t")).collect()
    }
    assert(e.getMessage.contains("mix scalar and object"))
  }

  test("array-root field-access guard also covers directory sources") {
    val dir = tmpDir("rml-json-arraydir")
    val sub = java.nio.file.Paths.get(s"$dir/docs")
    java.nio.file.Files.createDirectories(sub)
    java.nio.file.Files.writeString(sub.resolve("p1.json"), """[{"a": 1}, {"a": 2}]""")
    java.nio.file.Files.writeString(sub.resolve("p2.json"), """[{"a": 3}]""")
    // Spark row-izes each file's array; jsonpath_ng field access on an
    // array root matches NOTHING — the guard must fire for the directory
    val e = intercept[RmlCompiler.RmlError] {
      RmlMapper.loadJson(spark, sub.toString, Some("$.a")).collect()
    }
    assert(e.getMessage.contains("array"))
    // $[*] (iterate the root arrays) stays valid over the directory
    import spark.implicits._
    val ok = RmlMapper.loadJson(spark, sub.toString, Some("$[*].a"))
      .as[String].collect().toVector.sorted
    assert(ok == Vector("1", "2", "3"))
  }

  test("no segment matches inside a scalar: trailing .* or .value after a scalar match rejects") {
    val dir = tmpDir("rml-json-scalarstop")
    // doc.a holds scalars at two descent branches and a list of objects
    // at the root: `$..a[*].*` must match only through the object
    // elements (jsonpath_ng Fields('*') falls through on scalars), not
    // phantom-match the singleton-wrapped scalars themselves
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/data.json"),
      """{"a": [{"b": 7, "name": 818}, {"a": 72, "b": -75}], "x_1": {"a": 607, "b": "alpha"}}""")
    import spark.implicits._
    val got = RmlMapper.loadJson(spark, s"$dir/data.json", Some("$..a[*].*"))
      .as[String].collect().toVector.sorted
    assert(got == Vector("-75", "7", "72", "818"))
    // a field literally named "value" after a scalar match is NOT the
    // engine's internal value column: loud reject, not a phantom match
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/d2.json"),
      """{"a": 5, "o": {"value": 9}}""")
    val e = intercept[RmlCompiler.RmlError] {
      RmlMapper.loadJson(spark, s"$dir/d2.json", Some("$.a.value")).collect()
    }
    assert(e.getMessage.contains("scalar match"))
    // ...while the REAL member named "value" still navigates
    val real = RmlMapper.loadJson(spark, s"$dir/d2.json", Some("$.o.value"))
      .as[String].collect().toVector
    assert(real == Vector("9"))
  }

  test("singleton-wrap quirk: [*] and slices on non-lists match the value itself (jsonpath_ng Slice)") {
    val dir = tmpDir("rml-json-singleton")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/data.json"),
      """{"s": "hi", "n": 5, "o": {"a": 1}}""")
    import spark.implicits._
    // probed jsonpath_ng ground truth: $.s[*] -> ['hi'], $.o[*] -> [{'a':1}],
    // $.s[0:1] -> ['hi'], $.s[0:5:2] -> ['hi'], $.s[1:] -> []
    assert(RmlMapper.loadJson(spark, s"$dir/data.json", Some("$.s[*]"))
      .select("value").as[String].collect().toSeq == Seq("hi"))
    assert(RmlMapper.loadJson(spark, s"$dir/data.json", Some("$.n[*]"))
      .select("value").as[String].collect().toSeq == Seq("5"))
    assert(RmlMapper.loadJson(spark, s"$dir/data.json", Some("$.o[*]"))
      .select("a").as[Long].collect().toSeq == Seq(1L))
    assert(RmlMapper.loadJson(spark, s"$dir/data.json", Some("$.s[0:1]"))
      .select("value").as[String].collect().toSeq == Seq("hi"))
    assert(RmlMapper.loadJson(spark, s"$dir/data.json", Some("$.s[-3:5:2]"))
      .select("value").as[String].collect().toSeq == Seq("hi"))
    assert(RmlMapper.loadJson(spark, s"$dir/data.json", Some("$.s[1:]")).count() == 0)
    // numeric index on a non-array: strings CHAR-index ($.s[0] on "hi"
    // is ['h'], probed), dicts match nothing, and numbers/booleans stay
    // a loud reject (base jsonpath_ng's TypeError crash surface)
    assert(RmlMapper.loadJson(spark, s"$dir/data.json", Some("$.s[0]"))
      .select("value").as[String].collect().toSeq == Seq("h"))
    assert(RmlMapper.loadJson(spark, s"$dir/data.json", Some("$.o[0]")).count() == 0)
    for (bad <- Seq("$.n[0]", "$.n[0,1]"))
      assertThrows[RmlCompiler.RmlError](
        RmlMapper.loadJson(spark, s"$dir/data.json", Some(bad)))
  }

  test("JSONPath negative index and index unions") {
    val dir = tmpDir("rml-json-iu")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/data.json"),
      """{"s": [10, 20, 30, 40, 50]}""")
    import spark.implicits._
    def vals(path: String): Seq[String] =
      RmlMapper.loadJson(spark, s"$dir/data.json", Some(path))
        .select("value").as[String].collect().toSeq.sorted
    assert(vals("$.s[-1]") == Seq("50"))
    assert(vals("$.s[0,2]") == Seq("10", "30"))
    assert(vals("$.s[-1,0]") == Seq("10", "50"))
    // multiset semantics: the same element matched twice = two rows
    assert(vals("$.s[0,0]") == Seq("10", "10"))
    // out-of-range members of a union contribute no matches
    assert(vals("$.s[1,99]") == Seq("20"))
  }

  test("JSONPath member wildcard `.*` and field unions ['a','b']") {
    val dir = tmpDir("rml-json-wild")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/data.json"),
      """{"b": {"c": {"name": "n1"}, "d": {"name": "n2", "extra": "x"}}}""")
    import spark.implicits._
    // object members union by keys; missing keys are NULL
    val wild = RmlMapper.loadJson(spark, s"$dir/data.json", Some("$.b.*"))
    assert(wild.columns.toSet == Set("name", "extra"))
    assert(wild.select("name").as[String].collect().toSet == Set("n1", "n2"))
    // wildcard then field: each member's `name`
    assert(RmlMapper.loadJson(spark, s"$dir/data.json", Some("$.b.*.name"))
      .select("value").as[String].collect().toSet == Set("n1", "n2"))
    // explicit field union ≡ wildcard here; order and subset forms
    assert(RmlMapper.loadJson(spark, s"$dir/data.json", Some("$.b['c','d']"))
      .select("name").as[String].collect().toSet == Set("n1", "n2"))
    assert(RmlMapper.loadJson(spark, s"$dir/data.json", Some("$.b['d']"))
      .select("name").as[String].collect().toSet == Set("n2"))
    // absent union members contribute nothing (jsonpath_ng semantics)
    assert(RmlMapper.loadJson(spark, s"$dir/data.json", Some("$.b['c','zzz']"))
      .select("name").as[String].collect().toSet == Set("n1"))
    // scalar-member wildcard stacks into `value`
    val dir2 = tmpDir("rml-json-wild2")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir2/data.json"),
      """{"m": {"a": 1, "b": 2}}""")
    assert(RmlMapper.loadJson(spark, s"$dir2/data.json", Some("$.m.*"))
      .select("value").as[String].collect().toSet == Set("1", "2"))
    // mixed object/scalar members are a loud reject, not a silent coercion
    val dir3 = tmpDir("rml-json-wild3")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir3/data.json"),
      """{"m": {"a": 1, "b": {"x": 2}}}""")
    assertThrows[RmlCompiler.RmlError](
      RmlMapper.loadJson(spark, s"$dir3/data.json", Some("$.m.*")))
  }

  test("JSONPath mid-path and multi-target recursive descent") {
    val dir = tmpDir("rml-json-middesc")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/data.json"),
      """{"wrap": {"g0": {"items": [{"e": 0}, {"e": 3}, {"e": 6}, {"e": 9}, {"e": 12}]},
        | "g1": {"items": [{"e": 1}, {"e": 4}, {"e": 7}]},
        | "g2": {"items": [{"e": 2}, {"e": 5}, {"e": 8}, {"e": 11}]}}}""".stripMargin)
    import spark.implicits._
    // multi-target descent + slice with negative end + step, mid-path:
    // jsonpath_ng: $.wrap..items[1:-1:2] -> e in {3, 9, 4, 5}
    val sliced = RmlMapper.loadJson(spark, s"$dir/data.json", Some("$.wrap..items[1:-1:2]"))
    assert(sliced.select("e").as[Long].collect().toSet == Set(3L, 9L, 4L, 5L))
    // wildcard route to the same arrays: first element of each
    assert(RmlMapper.loadJson(spark, s"$dir/data.json", Some("$.wrap.*.items[0]"))
      .select("e").as[Long].collect().toSet == Set(0L, 1L, 2L))
    assert(RmlMapper.loadJson(spark, s"$dir/data.json", Some("$..items[0]"))
      .select("e").as[Long].collect().toSet == Set(0L, 1L, 2L))
  }

  test("JSONPath recursive descent: $..students resolves nested paths (multi-target unions)") {
    val dir = tmpDir("rml-json-desc")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/data.json"),
      """{"school": {"year": 2024, "classes": [
        |  {"room": "A", "students": [{"id": "1", "name": "Alice"}, {"id": "2", "name": "Bob"}]},
        |  {"room": "B", "students": [{"id": "3", "name": "Cara"}]}
        |]}}""".stripMargin)
    import spark.implicits._
    // all students across all classes (schema-resolved $..students + [*])
    val all = RmlMapper.loadJson(spark, s"$dir/data.json", Some("$..students[*]"))
    assert(all.select("id", "name").as[(String, String)].collect().toSet ==
      Set(("1", "Alice"), ("2", "Bob"), ("3", "Cara")))
    // first student of EACH class (index applies per matched array)
    val firsts = RmlMapper.loadJson(spark, s"$dir/data.json", Some("$..students[0]"))
    assert(firsts.select("name").as[String].collect().toSet == Set("Alice", "Cara"))
    // multiple parent paths = multiple jsonpath_ng matches: union them
    val dir2 = tmpDir("rml-json-amb")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir2/data.json"),
      """{"x": {"name": [{"v": "a"}]}, "y": {"name": [{"v": "b"}]}}""")
    val multi = RmlMapper.loadJson(spark, s"$dir2/data.json", Some("$..name[*]"))
    assert(multi.select("v").as[String].collect().toSet == Set("a", "b"))
  }

  test("library mode with raw CSV strings (flexcore.py:286-303)") {
    val mapping =
      """@prefix rml: <http://w3id.org/rml/> .
        |<#A> rml:logicalSource [ rml:source [ rml:path "people.csv" ] ] ;
        |  rml:subjectMap [ rml:template "http://e/{id}" ] ;
        |  rml:predicateObjectMap [
        |    rml:predicate <http://e/name> ;
        |    rml:objectMap [ rml:reference "name" ]
        |  ] .
        |""".stripMargin
    import spark.implicits._
    val csv = "id,name\n1,Alice\n2,Bob\n"
    val out = RmlMapper.execute(spark, mapping, csvData = Map("people.csv" -> csv))
    assert(out.select("s", "o").as[(String, String)].collect().toSet ==
      Set(("<http://e/1>", "\"Alice\""), ("<http://e/2>", "\"Bob\"")))
  }

  test("serialized plan cache: save/load plan, execute without frontend (-gp/-p)") {
    val mapping =
      """@prefix rml: <http://w3id.org/rml/> .
        |<#A> rml:logicalSource [ rml:source [ rml:path "people.csv" ] ] ;
        |  rml:subjectMap [ rml:template "http://e/{id}" ] ;
        |  rml:predicateObjectMap [
        |    rml:predicate <http://e/name> ;
        |    rml:objectMap [ rml:reference "name" ]
        |  ] .
        |""".stripMargin
    import spark.implicits._
    val planFile = tmpDir("rml-plan") + "/plan.bin"
    RmlMapper.savePlan(RmlCompiler.compile(mapping), planFile)
    val loaded = RmlMapper.loadPlan(planFile)
    val out = RmlMapper.executeCompiled(spark, loaded,
      Map("people.csv" -> Seq(("1", "Alice")).toDF("id", "name")))
    assert(out.select("s", "o").as[(String, String)].collect().toSet ==
      Set(("<http://e/1>", "\"Alice\"")))
  }

  test("CLI surface: -m/-o end-to-end, -gp/-p plan round trip (flexcore.py:307-367)") {
    val dir = tmpDir("rml-cli")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/people.csv"),
      "id,name\n1,Alice\n2,Bob\n")
    val mapping =
      s"""@prefix rml: <http://w3id.org/rml/> .
         |<#A> rml:logicalSource [ rml:source [ rml:path "$dir/people.csv" ] ] ;
         |  rml:subjectMap [ rml:template "http://e/{id}" ] ;
         |  rml:predicateObjectMap [
         |    rml:predicate <http://e/name> ;
         |    rml:objectMap [ rml:reference "name" ]
         |  ] .
         |""".stripMargin
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/m.ttl"), mapping)
    def lines(out: String): Set[String] =
      spark.read.text(out).collect().map(_.getString(0)).toSet
    RmlCli.run(spark, Map("mapping" -> s"$dir/m.ttl", "out" -> s"$dir/out1"))
    assert(lines(s"$dir/out1") == Set(
      "<http://e/1> <http://e/name> \"Alice\" .",
      "<http://e/2> <http://e/name> \"Bob\" ."))
    // plan cache round trip: -gp then -p must produce the same output
    RmlCli.run(spark, Map("mapping" -> s"$dir/m.ttl", "genPlan" -> s"$dir/plan.bin"))
    RmlCli.run(spark, Map("plan" -> s"$dir/plan.bin", "out" -> s"$dir/out2"))
    assert(lines(s"$dir/out2") == lines(s"$dir/out1"))
  }

  test("strict mode fails on invalid IRI; default skips the row (utils.cpp:186-199)") {
    val mapping =
      """@prefix rml: <http://w3id.org/rml/> .
        |<#A> rml:logicalSource [ rml:source [ rml:path "rows.csv" ] ] ;
        |  rml:subjectMap [ rml:reference "iri" ] ;
        |  rml:predicateObjectMap [
        |    rml:predicate <http://e/p> ;
        |    rml:objectMap [ rml:reference "v" ]
        |  ] .
        |""".stripMargin
    import spark.implicits._
    // rml:reference subject is used raw (no %-encoding), so a space makes
    // an invalid IRI — reference hard-exits unless --continue-on-error
    val csv = "iri,v\nhttp://e/ok,1\nhttp://e/bad iri,2\n"
    val lenient = RmlMapper.execute(spark, mapping, csvData = Map("rows.csv" -> csv))
    assert(lenient.select("s").as[String].collect().toSeq == Seq("<http://e/ok>"))
    val strictDf = RmlMapper.execute(spark, mapping, csvData = Map("rows.csv" -> csv),
      strict = true)
    val e = intercept[Exception] { strictDf.collect() }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("invalid IRI")), e.toString)
  }
}
