package graft

/** The driver contract, pinned: every QueryDef name is unique (the
  * name→fn toMap would otherwise DROP a query silently), every query
  * carries a DuckDB oracle, and the flagship entry returns rows. */
class ContractSpec extends SparkSpec {

  test("query names are unique — nothing lost in the registry maps") {
    val defs = SparkEntry.allDefs
    assert(defs.map(_.name).distinct.size == defs.size,
      defs.map(_.name).groupBy(identity).filter(_._2.size > 1).keys.mkString(","))
    assert(SparkEntry.queries.size == defs.size)
  }

  test("every registered query has an oracle") {
    val missing = SparkEntry.allDefs.filter(_.oracle.isEmpty).map(_.name)
    assert(missing.isEmpty, s"rows-only queries: ${missing.mkString(",")}")
  }

  test("flagship entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
