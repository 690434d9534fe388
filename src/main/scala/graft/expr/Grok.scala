package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftshim.RegExpExtractStruct

/** Column wrapper for the single-pass multi-group regex extraction
  * expression (org.apache.spark.sql.graftshim.RegExpExtractStruct) —
  * the grok processor's shape (reference ingest/axway-ingest.json:4–12):
  * one pattern evaluation per line, all capture groups out at once.
  */
object GrokFunctions {
  import graft.Cols
  def regexp_extract_struct(c: Column, regex: String, fieldNames: Seq[String]): Column =
    Cols.column(RegExpExtractStruct(Cols.expr(c), regex, fieldNames))

  /** The ES|QL-dialect variant: fields are null on no-match (and for
    * non-participating groups) but keep `""` for matched-but-empty
    * captures; the struct carries a trailing `_matched` boolean. */
  def regexp_extract_struct_m(c: Column, regex: String, fieldNames: Seq[String]): Column =
    Cols.column(RegExpExtractStruct(Cols.expr(c), regex, fieldNames, matchedFlag = true))

  /** ES dissect's linear delimiter walk (graftshim.DissectExtract) —
    * O(line), no backtracking; the regex translation of the same
    * template is its semantic twin (ParserLawsSpec pins parity). */
  def dissect_extract(c: Column, template: String, fieldNames: Seq[String]): Column =
    Cols.column(org.apache.spark.sql.graftshim.DissectExtract(Cols.expr(c), template, fieldNames))

  /** Matched-flag variant of dissect (see regexp_extract_struct_m):
    * distinguishes ES dissect's matched-empty `""` from no-match null. */
  def dissect_extract_m(c: Column, template: String, fieldNames: Seq[String]): Column =
    Cols.column(org.apache.spark.sql.graftshim.DissectExtract(
      Cols.expr(c), template, fieldNames, matchedFlag = true))
}
