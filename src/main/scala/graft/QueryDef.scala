package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared capability of the engine: a named query (Spark-side
  * implementation) plus, when SQL-expressible, the equivalent ANSI SQL the
  * driver runs on DuckDB over the same parquet tables (the oracle —
  * mirrors the reference's engine-vs-H2 discipline,
  * presto-tests/.../QueryAssertions.java:51).
  *
  * Contract notes (see the driver spec):
  *  - column names must match between `run`'s result and `oracle`;
  *  - results must be deterministic (explicit total order under LIMIT,
  *    floats rounded to absorb summation-order noise).
  */
final case class QueryDef(
    name: String,
    oracle: Option[String],
    run: (SparkSession, String) => DataFrame)

trait QueryGroup {
  def defs: Seq[QueryDef]

  /** Convenience: register tables then build from views. */
  protected def q(name: String, oracle: String)(
      f: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, Some(oracle), (s, dir) => { Tables.register(s, dir); f(s, dir) })

  /** Non-SQL-expressible op: driver does a weaker rows-only check. */
  protected def qNoOracle(name: String)(
      f: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, None, (s, dir) => { Tables.register(s, dir); f(s, dir) })
}
