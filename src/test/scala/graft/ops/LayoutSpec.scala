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

  /** Per-row-group (a, b) min/max boxes straight from the parquet footers —
    * the same statistics a reader's predicate pushdown consults, so
    * counting boxes that overlap a query rectangle IS the row groups a
    * 2-D range scan must read. */
  private def rowGroupBoxes(dir: String, ca: String, cb: String)
      : Seq[((Long, Long), (Long, Long))] = {
    import scala.jdk.CollectionConverters._
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val files = new java.io.File(dir).listFiles.toSeq
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))
    files.flatMap { f =>
      val in = HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(f.getAbsolutePath),
        new org.apache.hadoop.conf.Configuration())
      val rdr = ParquetFileReader.open(in)
      try rdr.getFooter.getBlocks.asScala.toSeq.map { blk =>
        def mm(name: String): (Long, Long) = {
          val st = blk.getColumns.asScala
            .find(_.getPath.toDotString == name).get.getStatistics
          (st.genericGetMin.asInstanceOf[Number].longValue,
            st.genericGetMax.asInstanceOf[Number].longValue)
        }
        (mm(ca), mm(cb))
      } finally rdr.close()
    }
  }

  test("Z-order layout SKIPS: 2-D box predicate prunes >=75% of row groups; unsorted prunes none") {
    // 64x64 grid, 4096 rows; query box = the 16x16 corner (1/16 of space)
    val df = spark.range(0, 4096).select(
      (col("id") % 64).as("a"), (col("id") / 64).cast("long").as("b"))
    val (aLo, aHi, bLo, bHi) = (0L, 15L, 0L, 15L)
    def overlapping(boxes: Seq[((Long, Long), (Long, Long))]): Int =
      boxes.count { case ((amin, amax), (bmin, bmax)) =>
        amax >= aLo && amin <= aHi && bmax >= bLo && bmin <= bHi }

    val dirZ = java.nio.file.Files.createTempDirectory("graft_zskip_z").toString
    val dirU = java.nio.file.Files.createTempDirectory("graft_zskip_u").toString
    Layout.writeZOrdered(df, dirZ, "a", "b", numFiles = 8, bits = 8)
    // round-robin layout: every file spans the full (a, b) range
    df.repartition(8).write.mode("overwrite").parquet(dirU)

    val zBoxes = rowGroupBoxes(dirZ, "a", "b")
    val uBoxes = rowGroupBoxes(dirU, "a", "b")
    assert(zBoxes.size >= 8 && uBoxes.size >= 8)
    // unsorted: no row group can be skipped — the layout's min/max are vacuous
    assert(overlapping(uBoxes) == uBoxes.size)
    // Z-ordered: the box predicate's z-range is contiguous, so at most a
    // quarter of the row groups overlap it (measured: 1 of 8 here). This
    // is the pruning benefit zorder_scan's answer-invariance check cannot
    // see — pinned against regression the way PlanSpec pins Exchange-free
    // bucketed joins.
    val zOverlap = overlapping(zBoxes)
    assert(zOverlap * 4 <= zBoxes.size,
      s"z-order skipped too little: $zOverlap of ${zBoxes.size} row groups overlap")
    // layout must not change answers: both scans return the same row count
    val n = 16L * 16L
    assert(spark.read.parquet(dirZ)
      .where(col("a").between(aLo, aHi) && col("b").between(bLo, bHi))
      .count() == n)
    assert(spark.read.parquet(dirU)
      .where(col("a").between(aLo, aHi) && col("b").between(bLo, bHi))
      .count() == n)
  }
}
