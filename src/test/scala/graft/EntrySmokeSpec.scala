package graft

/** The driver's own smoke contract: entry() on sf0.001 returns rows, and
  * every registered query name has matching column sets between its
  * DataFrame and what Verify will dump (oracle names are driver-side). */
class EntrySmokeSpec extends SparkSpec {

  test("entry returns rows on the smoke slice") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("registry is consistent: unique names, oracles only for registered queries") {
    val names = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(names))
    assert(SparkEntry.headlines.toSet.subsetOf(names))
    assert(names.size === SparkEntry.registry.size)
  }

  test("every registered query builds a plan against the smoke slice") {
    for ((name, fn) <- SparkEntry.queries) {
      val df = fn(spark, sfDir)
      assert(df.schema.fields.nonEmpty, s"$name produced an empty schema")
    }
  }
}
