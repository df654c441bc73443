package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The operator surface is assembled from per-domain registries; each
  * [[graft.ops.NamedQuery]] pairs a Spark query with its DuckDB oracle SQL
  * (same column names on both sides — the driver's compare keys on them).
  */
object SparkEntry {

  private lazy val registry: Seq[NamedQuery] =
    CoreQueries.all ++ TimeWindowOps.all ++ ParseOps.all ++ DedupOps.all ++
      SimilarityOps.all ++ TextOps.all ++ MultimodalOps.all ++ ScaleOps.all ++
      CurationOps.all ++ GovernanceOps.all ++ TemporalOps.all ++
      AnalyticsOps.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q16_star_join")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted entries get a rows-only check. */
  lazy val oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}
