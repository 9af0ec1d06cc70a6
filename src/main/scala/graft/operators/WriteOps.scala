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
      s.sql("""CREATE TABLE graft_dedup_survivors USING parquet AS
              |SELECT min(doc_id) AS keeper, md5(text) AS content_hash,
              |       count(*) AS n_copies
              |FROM documents GROUP BY md5(text)""".stripMargin)
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
        |FROM documents WHERE source = 'web'
        |GROUP BY source ORDER BY source""".stripMargin) { (s, _) =>
      val out = tmp("docs_by_source")
      s.table("documents")
        .write.mode("overwrite").partitionBy("source").parquet(out)
      // read back: the source=web predicate prunes to one partition dir
      s.read.parquet(out)
        .filter(col("source") === "web")
        .groupBy("source")
        .agg(count(lit(1)).as("n"), sum("n_chars").as("chars"))
        .orderBy("source")
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

    // DELETE on an immutable columnar table = filter + overwrite (the
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
