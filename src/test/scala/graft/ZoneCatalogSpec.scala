package graft

import org.apache.spark.sql.functions._

/** The SQL face of the zone-map table format: DDL is directory
  * algebra, DML is the table's own transactional writer, reads are the
  * pruned v2 scan, and VERSION AS OF is the reader's asof pinning.
  * [[ZoneMapSourceSpec]] owns the connector internals; this spec owns
  * what a SQL user can do. */
class ZoneCatalogSpec extends SparkSpec {

  private lazy val wh: String = {
    val w = tmpDir("zone_warehouse")
    spark.conf.set("spark.sql.catalog.zmt",
      classOf[graft.sources.ZoneCatalog].getName)
    spark.conf.set("spark.sql.catalog.zmt.warehouse", w)
    w
  }

  private def rows = Tables(spark, sfDir, "lineitem").selectExpr(
    "l_orderkey * 10 + l_linenumber AS rid",
    "l_partkey AS a", "l_suppkey AS b")

  test("CREATE / INSERT / SELECT / VERSION AS OF / SHOW / RENAME / " +
    "DROP all work through plain SQL") {
    wh
    rows.createOrReplaceTempView("zc_src")
    spark.sql("CREATE TABLE zmt.db.t (rid BIGINT, a BIGINT, b BIGINT)")
    // an EMPTY created table loads (schema from the sidecar) and scans
    assert(spark.sql("SELECT * FROM zmt.db.t").count() == 0)
    spark.sql("INSERT INTO zmt.db.t SELECT * FROM zc_src WHERE rid % 2 = 0")
    spark.sql("INSERT INTO zmt.db.t SELECT * FROM zc_src WHERE rid % 2 = 1")
    assert(spark.sql("SELECT count(*) FROM zmt.db.t")
      .collect()(0).getLong(0) == rows.count())
    // auto-assigned batch ids 0 and 1; VERSION AS OF 0 = first insert
    assert(spark.sql("SELECT count(*) FROM zmt.db.t VERSION AS OF 0")
      .collect()(0).getLong(0) ==
      rows.filter(pmod(col("rid"), lit(2)) === 0).count())
    // the read is the pruned v2 scan (zone pruning visible in-plan)
    val boxed = spark.sql(
      "SELECT sum(rid) FROM zmt.db.t WHERE a >= 0 AND a <= 2")
    assert(boxed.queryExecution.executedPlan.toString
      .contains("zones kept"),
      boxed.queryExecution.executedPlan.toString)
    assert(boxed.collect()(0).getLong(0) ==
      rows.filter(col("a").between(0, 2))
        .agg(sum(col("rid"))).collect()(0).getLong(0))
    // catalog algebra
    assert(spark.sql("SHOW TABLES IN zmt.db").collect()
      .map(_.getString(1)).contains("t"))
    // the TO identifier is resolved within the table's own catalog
    spark.sql("ALTER TABLE zmt.db.t RENAME TO db.t2")
    assert(spark.sql("SELECT count(*) FROM zmt.db.t2")
      .collect()(0).getLong(0) == rows.count())
    intercept[Exception] {
      spark.sql("ALTER TABLE zmt.db.t2 ADD COLUMN c BIGINT")
    }
    spark.sql("DROP TABLE zmt.db.t2")
    assert(spark.sql("SHOW TABLES IN zmt.db").collect().isEmpty)
  }

  test("SQL DELETE publishes deletion vectors: counts drop exactly, " +
    "history stays retroactive, and untranslatable predicates are " +
    "rejected — never wrong rows") {
    wh
    rows.createOrReplaceTempView("zc_src_del")
    spark.sql("CREATE TABLE zmt.db.d (rid BIGINT, a BIGINT, b BIGINT)")
    spark.sql("INSERT INTO zmt.db.d SELECT * FROM zc_src_del")
    val (alo, ahi) = {
      val r = rows.agg(min(col("a")), max(col("a"))).collect()(0)
      val (mn, mx) = (r.getLong(0), r.getLong(1))
      (mn + (mx - mn + 1) / 4, mn + (mx - mn + 1) / 2 - 1)
    }
    spark.sql(s"DELETE FROM zmt.db.d WHERE a >= $alo AND a <= $ahi")
    val want = rows.filter(!col("a").between(alo, ahi))
    assert(spark.sql("SELECT count(*), sum(rid) FROM zmt.db.d")
      .collect()(0) ==
      want.agg(count(lit(1)), sum(col("rid"))).collect()(0))
    // deletes are retroactive: the batch-0 snapshot excludes them too
    assert(spark.sql("SELECT count(*) FROM zmt.db.d VERSION AS OF 0")
      .collect()(0).getLong(0) == want.count())
    // no data rewrite happened: the same single batch still backs it
    assert(graft.sources.ZoneMapSource.zoneRows(
      s"$wh/db/d").map(_.file) == Seq("batch=0"))
    // a predicate the translator cannot prove is rejected up front
    val e = intercept[Exception] {
      spark.sql("DELETE FROM zmt.db.d WHERE rid % 2 = 0")
    }
    assert(e.getMessage.toLowerCase.contains("delete"), e.getMessage)
    spark.sql("DROP TABLE zmt.db.d")
  }

  test("stored procedures: CALL optimize / history / dv_materialize " +
    "run the maintenance primitives and report through SQL") {
    wh
    rows.createOrReplaceTempView("zc_src_proc")
    spark.sql("CREATE TABLE zmt.db.p (rid BIGINT, a BIGINT, b BIGINT)")
    spark.sql(
      "INSERT INTO zmt.db.p SELECT * FROM zc_src_proc WHERE rid % 2 = 0")
    spark.sql(
      "INSERT INTO zmt.db.p SELECT * FROM zc_src_proc WHERE rid % 2 = 1")
    // history: one metadata row per visible part, no data read
    val hist = spark.sql("CALL zmt.system.history('db.p')").collect()
    assert(hist.map(_.getString(0)).sorted.toSeq ==
      Seq("batch=0", "batch=1"), hist.mkString(","))
    assert(hist.map(_.getLong(1)).sum == rows.count())
    // optimize: 2 raw batches re-cluster into Z-tiles
    val opt = spark.sql("CALL zmt.system.optimize('db.p')").collect()(0)
    assert(opt.getLong(0) == 2 && opt.getLong(1) >= 1, opt.toString)
    assert(spark.sql("SELECT count(*) FROM zmt.db.p")
      .collect()(0).getLong(0) == rows.count())
    // delete some rows, then materialize the vectors away
    spark.sql("DELETE FROM zmt.db.p WHERE b >= 0 AND b <= 1")
    val del = rows.filter(col("b").between(0, 1)).count()
    val mat = spark.sql("CALL zmt.system.dv_materialize('db.p')")
      .collect()(0)
    assert(mat.getLong(0) == del, s"$mat vs $del")
    assert(spark.sql("SELECT count(*) FROM zmt.db.p")
      .collect()(0).getLong(0) == rows.count() - del)
    spark.sql("DROP TABLE zmt.db.p")
  }

  test("namespaces are directory algebra: CREATE/SHOW/DROP, non-empty " +
    "drop refused without CASCADE, tables never list as namespaces") {
    wh
    spark.sql("CREATE NAMESPACE zmt.nsx")
    assert(spark.sql("SHOW NAMESPACES IN zmt").collect()
      .map(_.getString(0)).contains("nsx"))
    spark.sql("CREATE TABLE zmt.nsx.t1 (rid BIGINT, a BIGINT, b BIGINT)")
    // a TABLE directory must not masquerade as a namespace
    assert(!spark.sql("SHOW NAMESPACES IN zmt.nsx").collect()
      .map(_.getString(0)).contains("t1"))
    val e = intercept[Exception] { spark.sql("DROP NAMESPACE zmt.nsx") }
    assert(e.getMessage.toLowerCase.contains("empty"), e.getMessage)
    spark.sql("DROP NAMESPACE zmt.nsx CASCADE")
    assert(!spark.sql("SHOW NAMESPACES IN zmt").collect()
      .map(_.getString(0)).contains("nsx"))
  }

  test("bucket-file pruning: a bkt equality on a bucketed table reads " +
    "only that bucket's files, visible in-plan") {
    wh
    val dir = tmpDir("zonecat_bprune") + "/t"
    rows.write.format("graft.sources.ZoneMapSource")
      .option("batch", 0L).option("buckets", 8).mode("append").save(dir)
    val df = spark.read.format("graft.sources.ZoneMapSource").load(dir)
      .filter(col("bkt") === 3).select(col("rid"), col("a"))
    val want = rows.filter(pmod(col("rid"), lit(8)) === 3)
    assert(df.count() == want.count())
    assert(df.agg(sum(col("rid"))).collect()(0) ==
      want.agg(sum(col("rid"))).collect()(0))
    df.collect()
    assert(df.queryExecution.executedPlan.toString
      .contains("bucket pruned to b3"),
      df.queryExecution.executedPlan.toString)
  }

  test("the contract is enforced at DDL time: wrong schemas and " +
    "declared partitions are rejected, duplicate CREATE throws") {
    wh
    intercept[Exception] {
      spark.sql("CREATE TABLE zmt.db.bad (x STRING)")
    }
    intercept[Exception] {
      spark.sql("CREATE TABLE zmt.db.bad2 (rid BIGINT, a BIGINT, " +
        "b BIGINT) PARTITIONED BY (a)")
    }
    spark.sql("CREATE TABLE zmt.db.once (rid BIGINT, a BIGINT, b BIGINT)")
    intercept[Exception] {
      spark.sql("CREATE TABLE zmt.db.once (rid BIGINT, a BIGINT, " +
        "b BIGINT)")
    }
    spark.sql("DROP TABLE zmt.db.once")
  }
}
