package graft

/** The driver contract surface: entry() must return rows (the driver
  * smoke-checks rows > 0), every query must have a registry function, and
  * every oracle key must reference a registered query.
  */
class EntrySpec extends SparkSpec {

  test("entry returns a non-empty flagship result") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query; names are well-formed") {
    val qs = SparkEntry.queries.keySet
    val orphan = SparkEntry.oracleSql.keySet.diff(qs)
    assert(orphan.isEmpty, s"oracle entries without queries: $orphan")
    assert(qs.forall(_.matches("[a-z0-9_]+")), "query names must be snake_case")
  }
}
