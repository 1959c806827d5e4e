package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.io.Tables
import graft.ops.Relational.dsum

class StreamingSpec extends SparkSpec {

  test("streaming windowed agg equals the batch aggregation (sf0.001)") {
    val dir = "/root/testdata/sf0.001"
    val streamed = Streaming.runToTable(spark,
      Streaming.windowedAgg(Streaming.readEvents(spark, dir)),
      "stream_spec_check")
    val batch = Tables(spark, dir).events
      .groupBy(
        date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
    val s = streamed.orderBy("day", "event_type").collect()
    val b = batch.orderBy("day", "event_type").collect()
    assert(s.length == b.length && s.length > 0)
    assert(s.sameElements(b))
  }
}
