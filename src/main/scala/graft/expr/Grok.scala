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

  /** ES dissect's linear delimiter walk (graftshim.DissectExtract) —
    * O(line), no backtracking; the regex translation of the same
    * template is its semantic twin (ParserLawsSpec pins parity). */
  def dissect_extract(c: Column, template: String, fieldNames: Seq[String]): Column =
    Cols.column(org.apache.spark.sql.graftshim.DissectExtract(Cols.expr(c), template, fieldNames))
}
