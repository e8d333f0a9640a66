package graft.queries

/** Training-data pipeline operators over documents/embeddings (dedup,
  * similarity search, text analysis) — populated as those land.
  */
object TdpQueries {
  def defs: Seq[QueryDef] = Seq()
}
