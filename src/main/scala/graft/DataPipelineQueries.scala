package graft

/** Training-data pipeline operators (dedup / similarity / text analysis)
  * over the documents + embeddings tables — filled per operator.
  */
object DataPipelineQueries {
  def registerAll(): Unit = ()
}
