package graft

import graft.ops.QueryStringParser
import graft.ops.QueryStringParser._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The query_string mini-language: grammar productions, precedence,
  * error handling, and end-to-end compile semantics on a micro corpus. */
class QueryStringSpec extends SparkSpec {

  test("clause forms: bare term, field term, prefix, phrase") {
    assert(parse("spark") == Term(None, "spark"))
    assert(parse("lang:en") == Term(Some("lang"), "en"))
    assert(parse("que*") == Prefix(None, "que"))
    assert(parse("source:src1*") == Prefix(Some("source"), "src1"))
    assert(parse("\"data column\"") == Phrase(None, Seq("data", "column")))
    assert(parse("\"spark\"") == Term(None, "spark")) // 1-word phrase = term
  }

  test("precedence: NOT > AND > OR; implicit adjacency is AND") {
    // a OR b AND c == a OR (b AND c)
    assert(parse("a OR b AND c") ==
      Or(Term(None, "a"), And(Term(None, "b"), Term(None, "c"))))
    // implicit: a b == a AND b
    assert(parse("a b") == And(Term(None, "a"), Term(None, "b")))
    // NOT binds tightest; '-' is NOT
    assert(parse("NOT a b") == And(Not(Term(None, "a")), Term(None, "b")))
    assert(parse("-a b") == And(Not(Term(None, "a")), Term(None, "b")))
    // grouping overrides
    assert(parse("(a OR b) AND c") ==
      And(Or(Term(None, "a"), Term(None, "b")), Term(None, "c")))
  }

  test("parse errors: unbalanced paren, unterminated quote, trailing, empty phrase") {
    assert(intercept[ParseError](parse("(a OR b")).getMessage.contains("')'"))
    assert(intercept[ParseError](parse("\"a b")).getMessage.contains("unterminated"))
    assert(intercept[ParseError](parse("a )b")).getMessage.contains("trailing"))
    assert(intercept[ParseError](parse("\"  \"")).getMessage.contains("empty phrase"))
    assert(intercept[ParseError](parse("*")).getMessage.contains("wildcard"))
  }

  test("compile semantics on a micro corpus — every production") {
    import spark.implicits._
    val d = Seq(
      (1L, "spark join window", "en", "src1"),
      (2L, "data column agg", "en", "src2"),
      (3L, "column data slow", "fr", "src1"),
      (4L, "spark query table", "en", "src7"),
      (5L, "queue the row", "en", "src3")
    ).toDF("doc_id", "text", "lang", "source")
    def run(q: String): Set[Long] =
      d.filter(QueryStringParser.compile(parse(q), col("text"),
          Map("lang" -> col("lang"), "source" -> col("source"))))
        .select("doc_id").as[Long].collect().toSet
    assert(run("spark") == Set(1L, 4L))
    assert(run("lang:en spark") == Set(1L, 4L))
    assert(run("\"data column\"") == Set(2L)) // ordered phrase, not doc 3
    assert(run("que*") == Set(4L, 5L)) // query, queue
    assert(run("source:src1") == Set(1L, 3L))
    assert(run("spark OR \"data column\"") == Set(1L, 2L, 4L))
    assert(run("(spark OR \"data column\") -source:src7") == Set(1L, 2L))
    assert(run("lang:en AND (spark OR \"data column\") -source:src7 que*") == Set.empty)
    assert(run("lang:en que*") == Set(4L, 5L))
    assert(run("NOT lang:en") == Set(3L))
  }

  test("unknown field fails at compile time (lenient: false)") {
    val e = intercept[IllegalArgumentException] {
      QueryStringParser.compile(parse("bogus:x"), col("text"), Map.empty)
    }
    assert(e.getMessage.contains("unknown field"))
  }

  test("simple_query_string: symbol operators, OR adjacency, precedence - > + > |") {
    import graft.ops.SimpleQueryString
    // bare adjacency is the OR default_operator (query_string's is AND)
    assert(SimpleQueryString.parse("a b") == Or(Term(None, "a"), Term(None, "b")))
    // a + b | c == (a AND b) OR c
    assert(SimpleQueryString.parse("a + b | c") ==
      Or(And(Term(None, "a"), Term(None, "b")), Term(None, "c")))
    // '-' binds tightest
    assert(SimpleQueryString.parse("a + -b") ==
      And(Term(None, "a"), Not(Term(None, "b"))))
    assert(SimpleQueryString.parse("(a | b) + c") ==
      And(Or(Term(None, "a"), Term(None, "b")), Term(None, "c")))
    assert(SimpleQueryString.parse("\"x y\" que*") ==
      Or(Phrase(None, Seq("x", "y")), Prefix(None, "que")))
  }

  test("simple_query_string: the never-throws leniency contract") {
    import graft.ops.SimpleQueryString
    // structurally invalid input degrades to the OR of surviving words
    assert(SimpleQueryString.parseLenient("(a OR b") ==
      Some(Or(Or(Term(None, "a"), Term(None, "OR")), Term(None, "b"))))
    assert(SimpleQueryString.parseLenient("\"unterminated + x") ==
      Some(Or(Term(None, "unterminated"), Term(None, "x"))))
    assert(SimpleQueryString.parseLenient("que* +") ==
      Some(Prefix(None, "que")))
    // nothing parseable at all → None (ES matches no documents)
    assert(SimpleQueryString.parseLenient("+ | -").isEmpty)
  }
}
