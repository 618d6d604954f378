package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Registry of operator queries (SURVEY.md §2 coverage) with DuckDB oracle
  * SQL. Filled in operator-by-operator; `SparkEntry` re-exports it.
  */
object Queries {
  // name -> (spark, sfDir) => DataFrame
  private val reg = scala.collection.mutable.LinkedHashMap.empty[String, (SparkSession, String) => DataFrame]
  private val sql = scala.collection.mutable.LinkedHashMap.empty[String, String]

  private val bench = scala.collection.mutable.LinkedHashMap.empty[String, (SparkSession, String) => DataFrame]

  private[graft] def register(name: String, oracleSql: Option[String])
                             (fn: (SparkSession, String) => DataFrame): Unit = {
    reg(name) = fn
    oracleSql.foreach(sql(name) = _)
  }

  /** Register a LEAN variant for the benchmark: same operator, the
    * in-query verification legs (bounded quadratic crosschecks,
    * brute-force recall baselines) stripped — correctness queries keep
    * them so CORRECTNESS rows are unchanged, but the bench must measure
    * the OPERATOR, not its oracle apparatus.
    */
  private[graft] def registerBench(name: String)
                                  (fn: (SparkSession, String) => DataFrame): Unit =
    bench(name) = fn

  def all: Map[String, (SparkSession, String) => DataFrame] = { init(); reg.toMap }
  def oracle: Map[String, String] = { init(); sql.toMap }

  /** The bench view of the registry: lean variants where registered,
    * the verification-rich query otherwise.
    */
  def allForBench: Map[String, (SparkSession, String) => DataFrame] =
    { init(); (reg ++ bench).toMap }

  @volatile private var initialized = false
  private def init(): Unit = synchronized {
    if (!initialized) {
      RelationalQueries.registerAll()
      DataPipelineQueries.registerAll()
      initialized = true
    }
  }
}
