package graft

import graft.ops.KqlParser
import graft.ops.KqlParser._
import org.apache.spark.sql.functions._

/** The KQL mini-language: grammar productions, precedence, value
  * groups, ranges, wildcard values, error handling, and end-to-end
  * compile semantics on a micro corpus. */
class KqlSpec extends SparkSpec {

  test("clause forms: bare term, field term, phrase, range, wildcard") {
    assert(parse("spark") == MatchQ(None, "spark"))
    assert(parse("lang:en") == MatchQ(Some("lang"), "en"))
    assert(parse("source:src1*") == MatchQ(Some("source"), "src1*"))
    assert(parse("\"data column\"") == PhraseQ(None, Seq("data", "column")))
    assert(parse("\"spark\"") == MatchQ(None, "spark")) // 1-word phrase = term
    assert(parse("n_chars >= 400") == RangeQ("n_chars", ">=", BigDecimal(400)))
    assert(parse("value < 1.5") == RangeQ("value", "<", BigDecimal("1.5")))
  }

  test("keywords are case-insensitive words; precedence not > and > or") {
    assert(parse("a OR b AND c") ==
      Or(MatchQ(None, "a"), And(MatchQ(None, "b"), MatchQ(None, "c"))))
    assert(parse("a or b and c") == parse("a OR b AND c"))
    assert(parse("not a and b") == And(Not(MatchQ(None, "a")), MatchQ(None, "b")))
    assert(parse("(a or b) and c") ==
      And(Or(MatchQ(None, "a"), MatchQ(None, "b")), MatchQ(None, "c")))
  }

  test("value groups distribute the field; no distribution without parens") {
    assert(parse("source:(src1 or src2)") ==
      Or(MatchQ(Some("source"), "src1"), MatchQ(Some("source"), "src2")))
    assert(parse("source:(a and not b)") ==
      And(MatchQ(Some("source"), "a"), Not(MatchQ(Some("source"), "b"))))
    // without parens, the `or` returns to the outer grammar: the right
    // operand is a DEFAULT-FIELD term, not source:b
    assert(parse("source:a or b") ==
      Or(MatchQ(Some("source"), "a"), MatchQ(None, "b")))
  }

  test("parse errors: unbalanced paren, unterminated quote, trailing, bad range") {
    assert(intercept[ParseError](parse("(a or b")).getMessage.contains("')'"))
    assert(intercept[ParseError](parse("\"a b")).getMessage.contains("unterminated"))
    assert(intercept[ParseError](parse("a )b")).getMessage.contains("trailing"))
    assert(intercept[ParseError](parse("n >= x")).getMessage.contains("number"))
    assert(intercept[ParseError](parse("and a")).getMessage.contains("clause"))
    assert(intercept[ParseError](parse("source:()")).getMessage.contains("value"))
  }

  test("compile semantics on a micro corpus — every production") {
    import spark.implicits._
    val d = Seq(
      (1L, "spark join window", "en", "src1", 100L),
      (2L, "data column agg", "en", "src2", 450L),
      (3L, "column data slow", "fr", "src1", 300L),
      (4L, "spark query table", "en", "src7", 500L),
      (5L, "queue the row", "en", "src13", 200L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    def run(q: String): Set[Long] =
      d.filter(KqlParser.compile(parse(q), col("text"),
          keywordFields = Map("lang" -> col("lang"), "source" -> col("source")),
          numericFields = Map("n_chars" -> col("n_chars"))))
        .select("doc_id").as[Long].collect().toSet
    assert(run("spark") == Set(1L, 4L))
    assert(run("lang:en and spark") == Set(1L, 4L))
    assert(run("text:\"data column\"") == Set(2L)) // ordered phrase, not doc 3
    assert(run("\"data column\"") == Set(2L))
    assert(run("source:src1") == Set(1L, 3L)) // exact, NOT prefix: src13 excluded
    assert(run("source:src1*") == Set(1L, 3L, 5L)) // wildcard: src13 included
    assert(run("text:qu*") == Set(4L, 5L)) // token wildcard: query, queue
    assert(run("n_chars >= 450") == Set(2L, 4L))
    assert(run("n_chars < 150") == Set(1L))
    assert(run("source:(src2 or src7)") == Set(2L, 4L))
    assert(run("lang:en and (source:(src2 or src7) or n_chars < 150)") == Set(1L, 2L, 4L))
    assert(run("not lang:en") == Set(3L))
    assert(run("spark and not source:src7") == Set(1L))
    assert(run("source:src1 or slow") == Set(1L, 3L)) // bare rhs on text
  }

  test("unknown fields fail at compile time (KQL is not lenient)") {
    val e = intercept[IllegalArgumentException] {
      KqlParser.compile(parse("bogus:x"), col("text"), Map.empty, Map.empty)
    }
    assert(e.getMessage.contains("unknown keyword field"))
    val e2 = intercept[IllegalArgumentException] {
      KqlParser.compile(parse("bogus >= 1"), col("text"), Map.empty, Map.empty)
    }
    assert(e2.getMessage.contains("unknown numeric field"))
  }
}
