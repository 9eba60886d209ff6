package graft.plans

/** Backtick-quote a column name for embedding in SQL/`selectExpr`
  * strings — shared by the operators that build multi-aggregate
  * passes from column-name lists (DataProfiler, Quantiles,
  * DataChecks), so the escaping rule can't drift between them.
  */
object SqlIdent {
  def quote(name: String): String = s"`${name.replace("`", "``")}`"
}
