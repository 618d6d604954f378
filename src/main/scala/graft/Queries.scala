package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Registry of operator queries (SURVEY.md §2 coverage) with DuckDB oracle
  * SQL. Filled in operator-by-operator; `SparkEntry` re-exports it.
  */
object Queries {
  // name -> (spark, sfDir) => DataFrame
  private val reg = scala.collection.mutable.LinkedHashMap.empty[String, (SparkSession, String) => DataFrame]
  private val sql = scala.collection.mutable.LinkedHashMap.empty[String, String]

  private[graft] def register(name: String, oracleSql: Option[String])
                             (fn: (SparkSession, String) => DataFrame): Unit = {
    reg(name) = fn
    oracleSql.foreach(sql(name) = _)
  }

  def all: Map[String, (SparkSession, String) => DataFrame] = { init(); reg.toMap }
  def oracle: Map[String, String] = { init(); sql.toMap }

  @volatile private var initialized = false
  private def init(): Unit = synchronized {
    if (!initialized) {
      RelationalQueries.registerAll()
      DataPipelineQueries.registerAll()
      initialized = true
    }
  }
}
