package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zorder2 interleaves bits (a -> even, b -> odd positions)") {
    // a=3 (011), b=5 (101): z bits = a0<<0 | b0<<1 | a1<<2 | b1<<3 | a2<<4 | b2<<5
    //                              = 1    | 2    | 4    | 0    | 0    | 32   = 39
    val r = Seq((3, 5)).toDF("a", "b")
      .select(Layout.zorder2(col("a"), col("b"), bits = 3).as("z")).head()
    assert(r.getLong(0) == 39L)
    // identity checks: z(0,0)=0; z(2^k-1, 0) spreads over even bits
    val r2 = Seq((7, 0), (0, 7), (0, 0)).toDF("a", "b")
      .select(Layout.zorder2(col("a"), col("b"), bits = 3).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(r2 == Seq(21L, 42L, 0L)) // 010101, 101010, 0
  }

  test("zorder2 locality: nearby (a,b) rectangles land in a bounded z range") {
    // all points of the 4x4 square starting at (8,8) share high bits, so
    // their z values are contiguous within [z(8,8), z(11,11)]
    val pts = for { a <- 8 to 11; b <- 8 to 11 } yield (a, b)
    val zs = pts.toDF("a", "b")
      .select(Layout.zorder2(col("a"), col("b"), bits = 8).as("z"))
      .collect().map(_.getLong(0))
    assert(zs.min == zs.filter(_ == zs.min).head) // sanity
    // the square spans exactly the 16 z-values of its own quad tree cell
    assert(zs.toSet.size == 16 && zs.max - zs.min == 15)
  }

  test("writeZOrdered round-trips all rows and clusters files by z range") {
    val dir = java.nio.file.Files.createTempDirectory("graft_zorder_test").toString
    val df = spark.range(0, 1024).select(
      (col("id") % 32).as("a"), (col("id") / 32).cast("long").as("b"),
      col("id").as("payload"))
    Layout.writeZOrdered(df, dir, "a", "b", numFiles = 4, bits = 8)
    val back = spark.read.parquet(dir)
    assert(back.count() == 1024)
    assert(back.agg(sum("payload")).head().getLong(0) == (0L until 1024L).sum)
    // range-clustered: each file's z-interval is disjoint, so per-file
    // (a,b) bounding boxes cover far less than the full square
    val withFile = back.select(Layout.zorder2(col("a"), col("b"), 8).as("z"),
      input_file_name().as("f"))
    val spans = withFile.groupBy("f")
      .agg(min("z").as("lo"), max("z").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    spans.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 <= lo2, spans.mkString(","))
      case _ => ()
    }
  }
}
