package graft

/** Smoke for the driver contract itself. */
class EntrySpec extends SparkSpec {

  test("entry() returns a non-empty awards result on sf0.001") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
    assert(df.columns.contains("cipcode") && df.columns.contains("cipname"))
  }

  test("every oracle key has a matching query; names are unique") {
    val qNames = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qNames))
    assert(qNames.size >= 60)
    // .toMap would silently last-win a duplicate Reg name, shadowing an
    // earlier query AND its oracle — compare against the raw registry.
    val regNames = SparkEntry.registry.map(_.name)
    val dups = regNames.groupBy(identity).filter(_._2.size > 1).keys
    assert(regNames.size == qNames.size, s"duplicate query names: ${dups.mkString(",")}")
    assert(SparkEntry.registry.count(_.oracle.isDefined) == SparkEntry.oracleSql.size)
  }

  test("every registered query runs and returns rows at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try { if (fn(spark, dir).count() >= 0) None else Some(name -> "negative count") }
      catch { case e: Throwable => Some(name -> e.getMessage) }
    }
    assert(failures.isEmpty, failures.mkString("; "))
  }
}
