package graft.sources

import graft.QueryDef
import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Source/sink coverage beyond JSON↔Parquet (SURVEY.md §2B scans/sinks):
  * CSV round-trip and hive-style partitioned parquet layout.
  *
  * Partitioned layout is the load-bearing piece at 100 TB: a filter on
  * the partition column becomes directory pruning (`PartitionFilters` in
  * the scan, asserted in PlanSpec) — the difference between reading 2
  * directories and reading all of them.
  */
object Sources {

  val defs: Seq[QueryDef] = Seq(

    // ------------------------------------------------------------------
    // CSV sink → CSV source with explicit schema. Doubles survive the
    // text round-trip (shortest-repr write, exact parse).
    QueryDef(
      "q_csv_roundtrip",
      """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders""".stripMargin) { (s, dir) =>
      // keyed by input dir — concurrent sessions must not collide
      val tmp = s"/tmp/graft_roundtrip_csv_${dir.hashCode.toHexString}"
      val schema = StructType(Seq(
        StructField("o_orderkey", LongType),
        StructField("o_orderstatus", StringType),
        StructField("o_totalprice", DoubleType)))
      graft.Tables(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        .write.mode(SaveMode.Overwrite).option("header", true).csv(tmp)
      s.read.schema(schema).option("header", true).csv(tmp)
    },

    // ------------------------------------------------------------------
    // ORC round-trip: the third columnar format next to parquet and
    // CSV/JSON — same vectorized-read / predicate-pushdown machinery on
    // the Spark side, self-describing schema (no StructType on re-read).
    // The oracle is the identity projection over the original table, so
    // hash equality proves the format preserves every value and type.
    QueryDef(
      "q_orc_roundtrip",
      """SELECT doc_id, text, lang, source, n_chars FROM documents""".stripMargin) { (s, dir) =>
      val tmp = s"/tmp/graft_roundtrip_orc_${dir.hashCode.toHexString}"
      graft.Tables(s, dir, "documents")
        .write.mode(SaveMode.Overwrite).option("compression", "zlib").orc(tmp)
      s.read.orc(tmp)
        .select(col("doc_id"), col("text"), col("lang"), col("source"),
          col("n_chars"))
    },

    // ------------------------------------------------------------------
    // AVRO container round-trip WITHOUT the spark-avro connector: the
    // write side streams one deflate-compressed multi-block container
    // per partition, the read side distributes whole files via
    // binaryFile and parses them with the Avro core DataFileReader on
    // the executors (header, codec, sync markers, writer schema) — see
    // [[AvroIO]]. The identity oracle proves the format preserves
    // every value including nullable unions.
    QueryDef(
      "q_avro_roundtrip",
      """SELECT doc_id, text, lang, source, n_chars FROM documents""") {
      (s, dir) =>
        val tmp = s"/tmp/graft_roundtrip_avro_${dir.hashCode.toHexString}"
        AvroIO.writeDocs(graft.Tables(s, dir, "documents"), tmp)
        AvroIO.readDocs(s, tmp)
          .select(col("doc_id"), col("text"), col("lang"), col("source"),
            col("n_chars"))
    },

    // ------------------------------------------------------------------
    // XML FILE round-trip (Spark 4 ships the XML data source in core):
    // rows nest under a configurable rowTag, schema declared on re-read
    // like CSV. Text values round-trip escaped (&amp; etc.) — the
    // identity oracle proves the escaping is lossless. Row-level XML
    // functions (to_xml/from_xml) are covered by q_xml_funcs; this is
    // the file-level source/sink.
    QueryDef(
      "q_xml_roundtrip",
      """SELECT p_partkey, p_name, p_retailprice FROM part""".stripMargin) { (s, dir) =>
      val tmp = s"/tmp/graft_roundtrip_xml_${dir.hashCode.toHexString}"
      val schema = StructType(Seq(
        StructField("p_partkey", LongType),
        StructField("p_name", StringType),
        StructField("p_retailprice", DoubleType)))
      graft.Tables(s, dir, "part")
        .select(col("p_partkey"), col("p_name"), col("p_retailprice"))
        .write.mode(SaveMode.Overwrite).option("rowTag", "part")
        .format("xml").save(tmp)
      s.read.schema(schema).option("rowTag", "part").format("xml").load(tmp)
    },

    // ------------------------------------------------------------------
    // Partitioned parquet: write documents partitioned by lang, read back
    // with a partition filter — the scan prunes to the two lang
    // directories before touching data.
    QueryDef(
      "q_parquet_partitioned",
      s"""SELECT lang, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS chars
        |FROM documents WHERE lang IN ('en', 'de')
        |GROUP BY lang""".stripMargin) { (s, dir) =>
      val tmp = s"/tmp/graft_partitioned_docs_${dir.hashCode.toHexString}"
      Layout.writePartitioned(graft.Tables(s, dir, "documents"), tmp, "lang")
      s.read.parquet(tmp)
        .filter(col("lang").isin("en", "de"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("chars"))
    }
  )
}
