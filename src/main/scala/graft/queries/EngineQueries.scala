package graft.queries

/** Engine A–D pipelines mapped onto the testdata star schema (populated as
  * the engines land — SURVEY §2.3/2.8/2.9).
  */
object EngineQueries {
  def defs: Seq[QueryDef] = Seq()
}
