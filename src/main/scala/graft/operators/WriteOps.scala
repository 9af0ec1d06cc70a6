package graft.operators

import graft.QueryGroup
import org.apache.spark.sql.functions._

/** The write path — the reference's TableWriter / TableFinish / Delete
  * surface (operator/TableWriterOperator.java:64, DeleteOperator.java:40,
  * MetadataDeleteOperator.java) re-expressed as Spark's committer-backed
  * writes. A training-data pipeline *produces* tables; every query here
  * writes, commits, reads its own output back, and emits aggregates the
  * DuckDB oracle reproduces from the source tables.
  *
  * Scale notes: `df.write` is the distributed, committer-protocol path
  * (task-local files + atomic job commit ≙ TableFinishOperator's metadata
  * transaction); partitioned layout (`partitionBy`) is what makes
  * downstream partition pruning possible at 100 TB.
  */
object WriteOps extends QueryGroup {

  private def tmp(name: String): String =
    s"${sys.props("java.io.tmpdir")}/graft-write/$name"

  private def dropManaged(s: org.apache.spark.sql.SparkSession, table: String): Unit = {
    s.sql(s"DROP TABLE IF EXISTS $table")
    val loc = new java.io.File(
      s"${s.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")}/$table")
    if (loc.exists()) {
      loc.listFiles().foreach(_.delete())
      loc.delete()
    }
  }

  /** Create bucketed orders/lineitem catalog tables (8 buckets on the
    * join key). Buckets ≙ the reference's fixed-hash partitioning; a join
    * on the bucket key needs no exchange on either side.
    */
  def bucketedTables(s: org.apache.spark.sql.SparkSession): Unit = {
    if (!s.catalog.tableExists("graft_orders_bkt") ||
        !s.catalog.tableExists("graft_lineitem_bkt")) {
      dropManaged(s, "graft_orders_bkt")
      dropManaged(s, "graft_lineitem_bkt")
      s.table("orders").write.mode("overwrite")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("graft_orders_bkt")
      s.table("lineitem").write.mode("overwrite")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("graft_lineitem_bkt")
    }
  }

  def defs = Seq(
    // CTAS + INSERT INTO + read-back through the session catalog
    q("wr_ctas_insert",
      """WITH s AS (
        |  SELECT min(doc_id) AS keeper, md5(text) AS content_hash, count(*) AS n_copies
        |  FROM documents GROUP BY md5(text))
        |SELECT count(*) + 1 AS n_rows,
        |  CAST(sum(n_copies) + 0 AS BIGINT) AS total_copies,
        |  CAST(min(keeper) AS BIGINT) - 1 AS min_keeper
        |FROM s""".stripMargin) { (s, _) =>
      s.sql("DROP TABLE IF EXISTS graft_dedup_survivors")
      // the in-memory catalog dies with the JVM but the warehouse dir does
      // not — clear any stale managed location before re-creating
      val loc = new java.io.File(
        s"${s.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")}/graft_dedup_survivors")
      if (loc.exists()) {
        loc.listFiles().foreach(_.delete())
        loc.delete()
      }
      // md5 returns a VARBINARY digest under the Presto registration
      // (round 12) — render to hex so content_hash stays a string
      // column the sentinel INSERT below can populate
      s.sql("""CREATE TABLE graft_dedup_survivors USING parquet AS
              |SELECT min(doc_id) AS keeper, lower(to_hex(md5(to_utf8(text)))) AS content_hash,
              |       count(*) AS n_copies
              |FROM documents GROUP BY md5(to_utf8(text))""".stripMargin)
      s.sql("""INSERT INTO graft_dedup_survivors
              |SELECT CAST(min(doc_id) AS BIGINT) - 1, 'sentinel', CAST(0 AS BIGINT)
              |FROM documents""".stripMargin)
      s.sql("""SELECT count(*) AS n_rows,
              |  sum(n_copies) AS total_copies,
              |  min(keeper) AS min_keeper
              |FROM graft_dedup_survivors""".stripMargin)
    },

    // partitioned write + partition-pruned read-back (Hive-style layout;
    // reference HivePartitionManager.java:183 pruning analog)
    q("wr_partitioned_prune",
      """SELECT source, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS chars
        |FROM documents WHERE source = 'src7'
        |GROUP BY source ORDER BY source""".stripMargin) { (s, _) =>
      val out = tmp("docs_by_source")
      s.table("documents")
        .write.mode("overwrite").partitionBy("source").parquet(out)
      // read back: the source=web predicate prunes to one partition dir
      s.read.parquet(out)
        .filter(col("source") === "src7")
        .groupBy("source")
        .agg(count(lit(1)).as("n"), sum("n_chars").as("chars"))
        .orderBy("source")
    },

    // views + DESCRIBE (reference DDL surface, SqlBase.g4:35-124 subset)
    q("meta_views_describe",
      """SELECT * FROM (VALUES
        |  ('n_name', 'string'), ('n_nationkey', 'int'), ('r_name', 'string')
        |) t(col_name, data_type) ORDER BY col_name""".stripMargin) { (s, _) =>
      s.sql("""CREATE OR REPLACE TEMPORARY VIEW nation_region_v AS
              |SELECT n_nationkey, n_name, r_name
              |FROM nation JOIN region ON n_regionkey = r_regionkey""".stripMargin)
      s.sql("SELECT count(*) FROM nation_region_v").collect() // view is queryable
      s.sql("DESCRIBE nation_region_v")
        .select(col("col_name"), col("data_type")).orderBy("col_name")
    },

    // the rest of the reference's SHOW surface (ShowQueriesRewrite.java:
    // visitShowTables/Schemas/Catalogs/Columns/Create/Functions — the
    // grants/roles visitors are SURVEY §2.9 non-goals): every statement
    // maps to a Spark native with the same spelling, so the engine
    // contract is that each PARSES and returns sane rows. One summary
    // row; values engine-specific (catalog contents) → rows-only gate +
    // the pinned assertions inline.
    qNoOracle("meta_show_surface") { (s, _) =>
      import s.implicits._
      s.sql("CREATE OR REPLACE TEMPORARY VIEW show_probe_v AS SELECT * FROM nation")
      val tables = s.sql("SHOW TABLES LIKE '*show_probe_v*'").count()
      val schemas = s.sql("SHOW SCHEMAS").count()
      val catalogs = s.sql("SHOW CATALOGS").count()
      val columns = s.sql("SHOW COLUMNS FROM show_probe_v").count()
      val functions = s.sql("SHOW FUNCTIONS LIKE 'checksum'").count()
      require(tables >= 1 && schemas >= 1 && catalogs >= 1 &&
        columns == s.table("nation").schema.size && functions == 1,
        s"SHOW surface: t=$tables s=$schemas c=$catalogs col=$columns fn=$functions")
      Seq((tables, schemas, catalogs, columns, functions))
        .toDF("tables", "schemas", "catalogs", "columns", "functions")
    },

    // EXPLAIN surface (reference ExplainAnalyzeOperator.java:34 /
    // EXPLAIN) — plan text production is the contract; PlanSpec asserts
    // plan *content*
    qNoOracle("meta_explain") { (s, _) =>
      s.sql("""EXPLAIN FORMATTED
              |SELECT o_orderpriority, count(*) FROM orders
              |JOIN lineitem ON o_orderkey = l_orderkey GROUP BY 1""".stripMargin)
    },

    // EXPLAIN ANALYZE (ExplainAnalyzeOperator.java:34): executes, then
    // reports per-operator runtime row counts — content pinned in
    // ParserSpec; engine-specific text → rows-only gate
    qNoOracle("meta_explain_analyze") { (s, _) =>
      s.sql("""EXPLAIN ANALYZE
              |SELECT o_orderpriority, count(*) FROM orders
              |JOIN lineitem ON o_orderkey = l_orderkey GROUP BY 1""".stripMargin)
    },

    // PREPARE / EXECUTE … USING / DEALLOCATE (grammar SqlBase.g4:96-104)
    // — the CLI session workflow: parameters bind positionally into `?`
    // placeholders; the oracle runs the bound statement directly
    q("meta_prepare_execute",
      """SELECT l_returnflag, count(*) AS n, round(sum(l_extendedprice), 2) AS rev
        |FROM lineitem
        |WHERE l_shipdate >= DATE '1996-01-01' AND l_discount > 0.05
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, _) =>
      s.sql("""PREPARE graft_stmt FROM
              |SELECT l_returnflag, count(*) AS n, round(sum(l_extendedprice), 2) AS rev
              |FROM lineitem
              |WHERE l_shipdate >= ? AND l_discount > ?
              |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
      val out = s.sql("EXECUTE graft_stmt USING DATE '1996-01-01', 0.05")
      out.collect() // bind + run before deallocating
      s.sql("DEALLOCATE PREPARE graft_stmt")
      out
    },

    // DESCRIBE OUTPUT / DESCRIBE INPUT (DescribeOutputRewrite.java,
    // DescribeInputRewrite.java) — the JDBC prepared-statement metadata
    // surface. Output is fully deterministic for a fixed statement, so
    // the oracle is the literal reference shape.
    q("meta_describe_io",
      """SELECT * FROM (VALUES
        |  ('output', 'o_orderkey', 'bigint', CAST(8 AS BIGINT), false),
        |  ('output', 'price', 'double', CAST(8 AS BIGINT), true),
        |  ('output', 'p', 'unknown', CAST(0 AS BIGINT), true),
        |  ('input', '0', 'unknown', CAST(NULL AS BIGINT), CAST(NULL AS BOOLEAN))
        |) AS t(surface, name, type, size, aliased)
        |ORDER BY surface, name""".stripMargin) { (s, _) =>
      s.sql("PREPARE graft_desc FROM SELECT o_orderkey, o_totalprice AS price, ? AS p FROM orders")
      val out = s.sql("DESCRIBE OUTPUT graft_desc").selectExpr(
        "'output' AS surface", "`Column Name` AS name", "Type AS type",
        "`Type Size` AS size", "Aliased AS aliased")
      val in = s.sql("DESCRIBE INPUT graft_desc").selectExpr(
        "'input' AS surface", "CAST(Position AS STRING) AS name", "Type AS type",
        "CAST(NULL AS BIGINT) AS size", "CAST(NULL AS BOOLEAN) AS aliased")
      val res = out.unionByName(in).orderBy("surface", "name")
      res.collect() // materialize before deallocating
      s.sql("DEALLOCATE PREPARE graft_desc")
      res
    },

    // SHOW STATS FOR t (ShowStatsRewrite.java): one single-pass aggregate
    // unpivoted to the reference's row shape. The oracle runs the SAME
    // generated text (shared showStatsSelect, lineitem's fixed fixture
    // schema) — one source, zero drift; the Spark side goes through the
    // dialect parser's schema-driven rewrite.
    q("meta_show_stats",
      graft.functions.GraftSqlParser.showStatsSelect(
        Seq("l_orderkey" -> true, "l_partkey" -> true, "l_suppkey" -> true,
          "l_linenumber" -> true, "l_quantity" -> true,
          "l_extendedprice" -> true, "l_discount" -> true, "l_tax" -> true,
          "l_returnflag" -> false, "l_linestatus" -> false,
          "l_shipdate" -> false),
        "lineitem")) { (s, _) =>
      s.sql("SHOW STATS FOR lineitem")
    },

    // SET SESSION k = v (SystemSessionProperties.java) → the mapped Spark
    // conf; unknown properties error by name (ParserSpec). Engine-side
    // SET output has no DuckDB twin → rows-only gate + spec.
    qNoOracle("meta_set_session") { (s, _) =>
      val out = s.sql("SET SESSION hash_partition_count = 32")
      s.sql("RESET SESSION hash_partition_count").collect()
      out
    },

    // CREATE FUNCTION (SqlBase.g4:62-66, SqlInvokedFunction.java): the
    // reference's SQL-bodied UDFs ≙ Spark's native SQL scalar functions —
    // declared once, then used like a builtin; oracle inlines the body
    q("meta_create_function",
      """SELECT l_returnflag,
        |  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS charged
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, _) =>
      s.sql("""CREATE OR REPLACE TEMPORARY FUNCTION graft_charge(
              |  price DOUBLE, disc DOUBLE, tax DOUBLE)
              |RETURNS DOUBLE LANGUAGE SQL DETERMINISTIC
              |RETURN price * (1 - disc) * (1 + tax)""".stripMargin)
      s.sql("""SELECT l_returnflag,
              |  round(sum(graft_charge(l_extendedprice, l_discount, l_tax)), 2) AS charged
              |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
    },

    // ANALYZE TABLE + catalog statistics read-back (the reference's
    // StatisticsWriterOperator.java:35 / ANALYZE surface). The stats this
    // writes are what CBO join-reordering consumes on real catalog tables
    // — row count, per-column NDV/min/max.
    q("wr_analyze_stats",
      """SELECT count(*) AS n_rows,
        |  true AS ndv_ok,
        |  min(doc_id) AS min_id, max(doc_id) AS max_id
        |FROM documents""".stripMargin) { (s, _) =>
      s.sql("DROP TABLE IF EXISTS graft_docs_stats")
      val loc = new java.io.File(
        s"${s.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")}/graft_docs_stats")
      if (loc.exists()) {
        loc.listFiles().foreach(_.delete())
        loc.delete()
      }
      s.sql("CREATE TABLE graft_docs_stats USING parquet AS SELECT * FROM documents")
      s.sql("ANALYZE TABLE graft_docs_stats COMPUTE STATISTICS FOR COLUMNS doc_id, source")
      val meta = s.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier("graft_docs_stats"))
      val st = meta.stats.getOrElse(sys.error("ANALYZE produced no stats"))
      val cols = st.colStats
      // NDV is an HLL estimate (like the reference's stats) — check it
      // against the exact count within the sketch error, not for equality
      val exactNdv = s.table("documents")
        .select(org.apache.spark.sql.functions.countDistinct("source"))
        .collect()(0).getLong(0)
      val ndv = cols("source").distinctCount.get.toLong
      val row = (
        st.rowCount.get.toLong,
        math.abs(ndv - exactNdv).toDouble / exactNdv <= 0.1,
        cols("doc_id").min.get.toLong,
        cols("doc_id").max.get.toLong)
      s.createDataFrame(Seq(row)).toDF("n_rows", "ndv_ok", "min_id", "max_id")
    },

    // ORC source/sink (reference presto-orc native reader/writer — here
    // Spark's built-in ORC path): write, read back, aggregate
    q("wr_orc_roundtrip",
      """SELECT o_orderstatus, count(*) AS n,
        |  CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin) { (s, _) =>
      val out = tmp("orders_orc")
      s.table("orders").write.mode("overwrite").orc(out)
      s.read.orc(out)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"),
          sum(floor(col("o_totalprice") * 100 + 0.5).cast("bigint")).cast("bigint").as("cents"))
        .orderBy("o_orderstatus")
    },

    // CSV + JSON text formats (schema round-trips through header/fields)
    q("wr_csv_json_roundtrip",
      """WITH src AS (SELECT n_nationkey, n_name, n_regionkey FROM nation)
        |SELECT count(*) AS n, CAST(sum(n_nationkey) AS BIGINT) AS key_sum,
        |  count(DISTINCT n_regionkey) AS n_regions
        |FROM src""".stripMargin) { (s, _) =>
      val csvOut = tmp("nation_csv")
      val jsonOut = tmp("nation_json")
      val src = s.table("nation").select("n_nationkey", "n_name", "n_regionkey")
      src.write.mode("overwrite").option("header", "true").csv(csvOut)
      s.read.option("header", "true").option("inferSchema", "true").csv(csvOut)
        .write.mode("overwrite").json(jsonOut)
      s.read.json(jsonOut).agg(
        count(lit(1)).as("n"),
        sum("n_nationkey").cast("bigint").as("key_sum"),
        countDistinct(col("n_regionkey")).as("n_regions"))
    },

    // bucketed co-located join: both sides pre-bucketed on the join key →
    // the join runs with NO shuffle exchange (the 100 TB pattern for
    // repeated fact-fact joins; PlanSpec asserts the exchange-free plan).
    // Analog of the reference's fixed-hash-bucket PARTITIONED distribution
    // (SystemPartitioningHandle.java).
    q("wr_bucketed_join",
      """SELECT o_orderpriority, count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, _) =>
      bucketedTables(s)
      s.sql("""SELECT o_orderpriority, count(*) AS n,
              |  sum(CAST(l_quantity AS BIGINT)) AS qty
              |FROM graft_orders_bkt JOIN graft_lineitem_bkt ON o_orderkey = l_orderkey
              |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
    },
    // JDBC connector (reference presto-base-jdbc): Spark's built-in JDBC
    // source/sink against the in-process Derby engine that ships with
    // Spark — the same wiring a cluster points at a real RDBMS. The
    // read-back is a PARTITIONED JDBC scan (partitionColumn + bounds →
    // numPartitions parallel range queries), the property that matters
    // when the relational side is large.
    q("wr_jdbc_roundtrip",
      """SELECT n_regionkey, count(*) AS n,
        |  CAST(sum(n_nationkey) AS BIGINT) AS keysum
        |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin) { (s, _) =>
      val url = s"jdbc:derby:${tmp("derby-db")};create=true"
      s.table("nation").write.mode("overwrite")
        .format("jdbc").option("url", url)
        .option("dbtable", "nation_jdbc").save()
      val back = s.read.format("jdbc").option("url", url)
        .option("dbtable", "nation_jdbc")
        .option("partitionColumn", "n_nationkey")
        .option("lowerBound", "0").option("upperBound", "25")
        .option("numPartitions", "4").load()
      back.groupBy("n_regionkey")
        .agg(count(lit(1)).as("n"),
          sum("n_nationkey").cast("bigint").as("keysum"))
        .orderBy("n_regionkey")
    },

    // reference's MetadataDeleteOperator / filtered-rewrite equivalent)
    q("wr_delete_rewrite",
      """WITH kept AS (SELECT * FROM orders WHERE o_orderstatus <> 'F')
        |SELECT count(*) AS n_kept,
        |  CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open
        |FROM kept""".stripMargin) { (s, _) =>
      val staged = tmp("orders_delete")
      s.table("orders").write.mode("overwrite").parquet(staged)
      // "DELETE FROM staged WHERE o_orderstatus = 'F'" → rewrite survivors
      val survivors = s.read.parquet(staged).filter(col("o_orderstatus") =!= "F")
      val rewritten = tmp("orders_delete_v2")
      survivors.write.mode("overwrite").parquet(rewritten)
      s.read.parquet(rewritten).agg(
        count(lit(1)).as("n_kept"),
        sum(when(col("o_orderstatus") === "O", 1).otherwise(0)).cast("bigint").as("n_open"))
    },
  )
}
