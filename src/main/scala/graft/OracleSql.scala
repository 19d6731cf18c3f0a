package graft

/** Oracle-SQL hygiene applied at dump time ([[Verify]]).
  *
  * DuckDB inlines every non-MATERIALIZED CTE at each reference, so a
  * multiply-referenced CTE — and especially a CHAIN of them (kcore's
  * d0..dN, graph_reach's frontier levels: 2 references per level is
  * already 2^N) — re-evaluates multiplicatively. That is invisible at
  * sf0.01 and fatal at sf1 (the r15 sweep: graph_modularity spilled
  * until the temp dir filled; graph_reach hung; the pagerank oracle
  * aborted the process). MATERIALIZED is an optimization fence with no
  * value semantics, so rather than hand-annotating ~350 oracle strings
  * the dump pass adds it MECHANICALLY to every WITH-chain CTE
  * referenced at least twice. Validated value-neutral by running the
  * full 351-entry suite against patched and unpatched oracles
  * (identical results, sf0.01 and generated data).
  */
object OracleSql {

  private val CteDef = """(\w+)\s+AS\s+\(""".r
  private val WindowName = """(?i)WINDOW\s+(\w+)\s+AS""".r

  /** Add MATERIALIZED to every ≥2-referenced CTE definition. Skips
    * WINDOW-clause names (not CTEs) and the recursive walk CTEs
    * (`uwk*` — DuckDB rejects MATERIALIZED on a recursive member).
    */
  def materializeCtes(sql: String): String = {
    val winNames = WindowName.findAllMatchIn(sql).map(_.group(1)).toSet
    CteDef.findAllMatchIn(sql).map(_.group(1)).distinct.foldLeft(sql) {
      (acc, name) =>
        if (winNames(name) || name.startsWith("uwk")) acc
        else {
          val uses =
            ("""\b""" + java.util.regex.Pattern.quote(name) + """\b""").r
              .findAllMatchIn(sql).size - 1
          if (uses < 2) acc
          else ("""\b""" + java.util.regex.Pattern.quote(name) +
            """\s+AS\s+\(""").r
            .replaceFirstIn(acc, name + " AS MATERIALIZED (")
        }
    }
  }
}
