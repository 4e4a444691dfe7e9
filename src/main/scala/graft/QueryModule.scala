package graft

/** One operator family = one module: named queries + matching DuckDB oracle
  * SQL. Queries without an oracle entry get the driver's weaker rows-only
  * check (ML fits, LSH internals — anything non-SQL-expressible).
  */
trait QueryModule {
  def queries: Map[String, Q]
  def oracles: Map[String, String]
}
