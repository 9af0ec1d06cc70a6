package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Aggregates every declared capability (QueryGroup) into the `queries` /
  * `oracleSql` maps the driver's verify/bench harness consumes.
  */
object SparkEntry {

  private val groups: Seq[QueryGroup] = Seq(
    operators.TpchQueries,
    operators.AggOps,
    operators.JoinOps,
    operators.WindowOps,
    operators.SetRelOps,
    functions.ScalarFuncOps,
    functions.PrestoFnOps,
    operators.TextOps,
    operators.CurationOps,
    operators.SimilarityOps,
    operators.WriteOps,
    operators.MultimodalOps,
    operators.DialectOps,
    operators.FuzzParityOps,
    operators.BpeOps,
    operators.TpcdsQueries,
    operators.SpatialOps,
    streaming.EventOps,
  )

  val all: Seq[QueryDef] = {
    val ds = groups.flatMap(_.defs)
    val dupes = ds.groupBy(_.name).filter(_._2.size > 1).keys
    require(dupes.isEmpty, s"duplicate query names: ${dupes.mkString(", ")}")
    ds
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    all.find(_.name == "q05_local_supplier").get.run(spark, dir)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(d => d.name -> d.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.flatMap(d => d.oracle.map(d.name -> _)).toMap
}
