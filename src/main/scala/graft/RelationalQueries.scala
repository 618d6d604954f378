package graft

/** Relational operator coverage (SURVEY.md §2.2-2.9) — filled per operator. */
object RelationalQueries {
  def registerAll(): Unit = ()
}
