package graft

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._

import org.scalatest.funsuite.AnyFunSuite

/** Library-consumer concurrency contract: a SparkSession is shared by
  * many threads in real deployments (the reference serves concurrent
  * queries per coordinator by construction), so the engine's lazy
  * registration and cache paths — Tables.register's per-(session, dir)
  * compute lock, the TPC-H/TPC-DS view ensurers, BpeOps' trained-merge
  * cache — must neither cross-talk nor deadlock under contention, and
  * results must match serial execution exactly.
  *
  * The query set is read-only by design: session-mutating surfaces
  * (SET SESSION dialect toggles, write-path queries, streaming) are
  * documented as not-concurrent-with-themselves, same as the
  * reference's session properties.
  */
class ConcurrencySpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  private val names = Seq(
    "q01_pricing_summary", "join_inner", "agg_rollup", "fn_string",
    "fn_math", "win_ranking", "set_union_all", "unnest_posexplode",
    "fuzz_math_parity", "pipe_bpe_tokenize", "dd_exact",
    "subq_scalar_uncorrelated", "spatial_point_fns", "fn_json",
    "agg_percentiles", "tx_langid")

  private def snapshot(name: String): Seq[String] =
    SparkEntry.queries(name)(spark, TestSession.sf)
      .collect().map(_.toString).sorted.toSeq

  test("16-way concurrent execution matches serial results, twice over") {
    implicit val ec: ExecutionContext = ExecutionContext.global
    val serial = names.map(n => n -> snapshot(n)).toMap
    (1 to 2).foreach { round =>
      val futs = names.map(n => Future(n -> snapshot(n)))
      val res = Await.result(Future.sequence(futs), 10.minutes)
      res.foreach { case (n, rows) =>
        assert(rows == serial(n), s"$n diverged under concurrency (round $round)")
      }
    }
  }
}
