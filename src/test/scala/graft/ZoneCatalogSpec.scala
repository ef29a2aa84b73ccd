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
    // a predicate the translator cannot prove no longer errors: it
    // falls back to the row-level delta path (tombstones via the same
    // dv table) — correctness is the same either way
    spark.sql("DELETE FROM zmt.db.d WHERE rid % 2 = 0")
    val want2 = want.filter(!(pmod(col("rid"), lit(2)) === 0))
    assert(spark.sql("SELECT count(*) FROM zmt.db.d")
      .collect()(0).getLong(0) == want2.count())
    spark.sql("DROP TABLE zmt.db.d")
  }

  test("SQL UPDATE is merge-on-read: tombstones + one append batch, " +
    "no data rewrite; non-provable DELETE takes the same path") {
    wh
    rows.createOrReplaceTempView("zu_src")
    spark.sql("CREATE TABLE zmt.db.u (rid BIGINT, a BIGINT, b BIGINT)")
    spark.sql("INSERT INTO zmt.db.u SELECT * FROM zu_src")
    val before = rows.count()
    spark.sql("UPDATE zmt.db.u SET b = b + 1000 WHERE rid % 7 = 3")
    // row count preserved, updated values visible, the rest untouched
    assert(spark.sql("SELECT count(*) FROM zmt.db.u")
      .collect()(0).getLong(0) == before)
    val expect = rows.selectExpr("rid", "a",
      "CASE WHEN rid % 7 = 3 THEN b + 1000 ELSE b END AS b")
    val got = spark.sql("SELECT * FROM zmt.db.u")
    assert(got.exceptAll(expect).count() == 0 &&
      expect.exceptAll(got).count() == 0)
    // merge-on-read: the original batch still backs the table (no
    // rewrite), the old rows died as dv tombstones, the new rows are
    // ONE fresh append batch
    val parts = graft.sources.ZoneMapSource.zoneRows(s"$wh/db/u")
      .map(_.file).sorted
    assert(parts == Seq("batch=0", "batch=1"), parts.toString)
    val nUpd = rows.filter(pmod(col("rid"), lit(7)) === 3).count()
    assert(graft.streaming.Streaming.dvDeletedCount(
      spark, s"$wh/db/u") == nUpd)
    // a DELETE the V2 predicate translator cannot prove falls back to
    // the same row-level path instead of erroring
    spark.sql("DELETE FROM zmt.db.u WHERE rid % 11 = 5")
    val want2 = rows.filter(!(pmod(col("rid"), lit(11)) === 5))
    assert(spark.sql("SELECT count(*) FROM zmt.db.u")
      .collect()(0).getLong(0) == want2.count())
    spark.sql("DROP TABLE zmt.db.u")
  }

  test("MERGE INTO upserts through the row-level surface: matched " +
    "rows update, unmatched rows insert, one statement") {
    wh
    rows.createOrReplaceTempView("zm_src")
    spark.sql("CREATE TABLE zmt.db.m (rid BIGINT, a BIGINT, b BIGINT)")
    spark.sql("INSERT INTO zmt.db.m SELECT * FROM zm_src WHERE rid % 3 = 0")
    // source must be key-unique (the generator's rid is not — MERGE's
    // cardinality validator rejects a dup-keyed source, correctly):
    // dedupe per rid; half overlaps (updates), half is new (inserts)
    spark.sql(
      """MERGE INTO zmt.db.m t
        |USING (SELECT rid, min(a) AS a, min(b) + 500 AS b FROM zm_src
        |       WHERE rid % 3 IN (0, 1) GROUP BY rid) s
        |ON t.rid = s.rid
        |WHEN MATCHED THEN UPDATE SET t.b = s.b
        |WHEN NOT MATCHED THEN INSERT (rid, a, b) VALUES (s.rid, s.a, s.b)
        |""".stripMargin)
    val src = rows.filter(pmod(col("rid"), lit(3)).isin(0, 1))
      .groupBy(col("rid"))
      .agg(min(col("a")).as("sa"), (min(col("b")) + 500).as("sb"))
    // matched target rows (dupes included) take s.b and keep t.a;
    // unmatched source rows insert once each
    val expect = rows.filter(pmod(col("rid"), lit(3)) === 0)
      .select(col("rid"), col("a"))
      .join(src.select(col("rid"), col("sb").as("b")), "rid")
      .select(col("rid"), col("a"), col("b"))
      .unionAll(src.filter(pmod(col("rid"), lit(3)) === 1)
        .select(col("rid"), col("sa").as("a"), col("sb").as("b")))
    val got = spark.sql("SELECT * FROM zmt.db.m")
    assert(got.exceptAll(expect).count() == 0 &&
      expect.exceptAll(got).count() == 0)
    spark.sql("DROP TABLE zmt.db.m")
  }

  test("row-level crash windows heal: a pending marker with a visible " +
    "batch completes the staged dv publish; one whose batch never " +
    "landed aborts whole") {
    import org.apache.hadoop.fs.Path
    wh
    rows.createOrReplaceTempView("zh_src")
    spark.sql("CREATE TABLE zmt.db.h (rid BIGINT, a BIGINT, b BIGINT)")
    spark.sql("INSERT INTO zmt.db.h SELECT * FROM zh_src")
    val dir = s"$wh/db/h"
    val fs = new Path(dir).getFileSystem(
      spark.sessionState.newHadoopConf())
    import spark.implicits._
    // COMPLETE case: stage a fold that tombstones file ordinal 0 of
    // the (visible) batch=0 part, marker pointing at the visible batch
    val part = graft.sources.ZoneMapSource
      .partFiles(dir, "batch=0").head._1
    val rel = graft.sources.ZoneMapSource.relPath(part)
    val fresh = Seq((rel, 0L, 1L)).toDF("file", "bucket", "word")
    val folded = graft.streaming.Streaming.dvFold(spark, dir, fresh)
    folded.coalesce(1).write.parquet(s"$dir/.rlo_pending_t1/dv")
    val out = fs.create(new Path(s"$dir/.rlo_pending_t1/batch"), true)
    out.write("0".getBytes("UTF-8")); out.close()
    graft.sources.ZoneMapSource.healRowLevelPending(spark, dir)
    assert(!fs.exists(new Path(s"$dir/.rlo_pending_t1")))
    assert(graft.streaming.Streaming.dvDeletedCount(spark, dir) == 1L)
    // ABORT case, through the SQL surface this time: a marker whose
    // planned batch never became visible drops without touching the
    // dv table — CALL heal_rlo reports the pending count going to 0
    Seq((rel, 1L, 1L)).toDF("file", "bucket", "word")
      .write.parquet(s"$dir/.rlo_pending_t2/dv")
    val out2 = fs.create(new Path(s"$dir/.rlo_pending_t2/batch"), true)
    out2.write("99".getBytes("UTF-8")); out2.close()
    val healed = spark.sql("CALL zmt.system.heal_rlo('db.h')")
      .collect()(0)
    assert(healed.getLong(0) == 1L && healed.getLong(1) == 0L,
      healed.toString)
    assert(!fs.exists(new Path(s"$dir/.rlo_pending_t2")))
    assert(graft.streaming.Streaming.dvDeletedCount(spark, dir) == 1L)
    spark.sql("DROP TABLE zmt.db.h")
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

  test("CALL vacuum truncates the retraction journal: a fresh-watermark " +
    "feed still works, an aged one gets the loud recompute error, and " +
    "orphan logs are swept") {
    wh
    rows.createOrReplaceTempView("zc_src_vac")
    spark.sql("CREATE TABLE zmt.db.v (rid BIGINT, a BIGINT, b BIGINT)")
    spark.sql("INSERT INTO zmt.db.v SELECT * FROM zc_src_vac")
    val dir = s"$wh/db/v"
    // three deletion generations → three journal entries
    spark.sql("DELETE FROM zmt.db.v WHERE rid % 13 = 1")
    spark.sql("DELETE FROM zmt.db.v WHERE rid % 13 = 2")
    spark.sql("DELETE FROM zmt.db.v WHERE rid % 13 = 3")
    // a consumer at gen 1 can still catch up before the vacuum
    val preFeed = graft.streaming.Streaming
      .zoneChangesFeed(spark, dir, 0L, 1L)
    assert(preFeed.filter(col("op") === -1).count() ==
      rows.filter(pmod(col("rid"), lit(13)) === 3).count(),
      "pre-vacuum feed must retract exactly gen 2's deletions")
    // plant an orphan journal (a dvPublish crash window) — swept too
    val fsp = new org.apache.hadoop.fs.Path(s"$dir/dv_log/gen=99")
    val fs2 = fsp.getFileSystem(spark.sessionState.newHadoopConf())
    assert(fs2.mkdirs(fsp))
    // the live row set BEFORE the vacuum — must be byte-identical after
    val preRows = spark.sql(
      "SELECT rid, a, b FROM zmt.db.v ORDER BY rid")
      .collect().toSeq
    val vac = spark.sql("CALL zmt.system.vacuum('db.v', 1)").collect()(0)
    assert(vac.getLong(0) == 3 && vac.getLong(1) == 1,
      s"expected 3 removed (gens 0,1 + orphan 99), 1 kept: $vac")
    // fresh watermark (gen 2) still serves
    assert(graft.streaming.Streaming.zoneChangesFeed(spark, dir, 2L, 2L)
      .count() == 0)
    // aged watermark: loud recompute, never silent missing retractions
    val e = intercept[IllegalArgumentException] {
      graft.streaming.Streaming.zoneChangesFeed(spark, dir, 0L, 0L)
        .count()
    }
    assert(e.getMessage.contains("recompute"), e.getMessage)
    // superseded CUMULATIVE dv generations aged out with the journal:
    // only the visible gen 2 remains (readers never consult older
    // ones), and the live row set is byte-identical post-vacuum —
    // deletes stay retroactive through the surviving generation
    val dvGens = fs2.listStatus(
        new org.apache.hadoop.fs.Path(s"$dir/dv")).toSeq
      .map(_.getPath.getName).filter(_.startsWith("gen=")).sorted
    assert(dvGens == Seq("gen=2"),
      s"expected only the visible dv generation to survive: $dvGens")
    assert(spark.sql("SELECT rid, a, b FROM zmt.db.v ORDER BY rid")
      .collect().toSeq == preRows,
      "vacuum changed the visible row set")
    // snapshot reads stay dv-correct below any batch horizon: time
    // travel applies the SURVIVING generation retroactively, so a
    // vacuumed table never resurrects a tombstoned row at any asof
    val snap0 = spark.read.format("graft.sources.ZoneMapSource")
      .option("asof", 0L).load(dir)
    assert(snap0.filter(
      pmod(col("rid"), lit(13)).isin(1, 2, 3)).count() == 0,
      "asof snapshot resurrected rows deleted by a vacuumed generation")
    spark.sql("DROP TABLE zmt.db.v")
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
