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
}
