package graft

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.{GeoFunctions, TextFunctions, VectorFunctions}
import graft.operators._
import graft.sources.Tables

/**
 * Driver contract (see SURVEY.md §7 + builder prompt): every implemented
 * operator from SURVEY.md §2 surfaces as a named query over the driver's
 * parquet fixtures, each with an equivalent DuckDB oracle SQL where the
 * semantics are ANSI-SQL-expressible.
 *
 * Numeric parity convention (shared with [[operators.AggCore]]): double
 * measures are summed as DECIMAL(18,4) (exact for the 2-decimal inputs) and
 * cast back to DOUBLE, making results independent of partition/add order —
 * the only way a distributed sum can hash-match a single-threaded oracle.
 * Every query ends in a deterministic ORDER BY (ties broken by id columns).
 */
object SparkEntry {
  import Fixtures.{Jan05, Jan12}

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. Q-H1: hourly avg
    * over all key prefixes, one week. */
  def entry(spark: SparkSession): DataFrame = {
    val view = AggCore.hourlyView(Tables.readings(spark, "/root/testdata/sf0.001"))
    QueryBuilders.history(view, "avg",
      Seq("click", "error", "purchase", "signup", "view"), Jan05, Jan12)
  }

  /** One named query per implemented operator: the core surface
    * ([[Queries]]) plus the approximate-operator gates ([[Gates]]). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.all ++ Gates.queries

  /** DuckDB oracle SQL per query (same keys; rows-only demos omitted). */
  def oracleSql: Map[String, String] =
    Oracles.all ++ Gates.oracles
}
