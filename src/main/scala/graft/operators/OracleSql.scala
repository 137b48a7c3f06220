package graft.operators

/** Canonical DuckDB spellings of the engine's portable primitives — ONE
  * definition each, shared by every oracle that mirrors them. Drift in
  * these fragments breaks cross-engine hash parity for whichever oracle
  * holds the stale copy, so new oracles must interpolate these rather
  * than inline the SQL.
  */
object OracleSql {

  /** Mirror of TextAnalysis.md5Long: lower 60 bits of md5 as BIGINT.
    * (DuckDB's CAST of a '0x…' literal parses hex; 15 hex chars keep the
    * value positive and inside BIGINT.)
    */
  def md5Long(e: String): String =
    s"CAST(('0x' || substring(md5($e), 18, 15)) AS BIGINT)"

  /** Mirror of TextAnalysis.wsTokens over a column/expression. */
  def wsTokens(e: String = "text"): String =
    s"list_filter(string_split_regex($e, '\\s+'), w -> w <> '')"
}
