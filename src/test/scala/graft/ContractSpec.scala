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

  test("every query's output column names are unique and appear in its " +
    "oracle") {
    // the driver sorts columns BY NAME before hashing: a duplicate
    // output name would silently mis-pair columns, and a Spark alias
    // the oracle doesn't carry fails only at driver time — catch both
    // at test time, schema-only (no query executes)
    val problems = SparkEntry.allDefs.flatMap { d =>
      val cols = d.fn(spark, sfDir).schema.fieldNames.toSeq
      val dups = cols.groupBy(identity).filter(_._2.size > 1).keys
      val missing = d.oracle match {
        case Some(sql) =>
          val lower = sql.toLowerCase
          cols.filterNot(c =>
            ("""(?<![a-z0-9_])""" + java.util.regex.Pattern.quote(
              c.toLowerCase) + """(?![a-z0-9_])""").r
              .findFirstIn(lower).isDefined)
        case None => Nil
      }
      (if (dups.nonEmpty) Seq(s"${d.name}: duplicate columns " +
        dups.mkString(",")) else Nil) ++
        (if (missing.nonEmpty) Seq(s"${d.name}: columns absent from " +
          s"oracle text: ${missing.mkString(",")}") else Nil)
    }
    assert(problems.isEmpty, problems.mkString("\n"))
  }
}
