package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Layout

class LayoutSpec extends AnyFunSuite with SparkSuite {

  /** Reference interleave, independent of the SQL expression. */
  private def zRef(x: Long, y: Long): Long =
    (0 until 8).map { i =>
      (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }.sum

  test("z-value expression matches the reference interleave on known points") {
    import spark.implicits._
    val pts = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (255L, 255L),
      (128L, 1L), (170L, 85L))
    val got = pts.toDF("zx", "zy")
      .withColumn("zval", expr(Layout.zExpr("zx", "zy", "div")))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    pts.foreach { case (x, y) =>
      assert(got((x, y)) === zRef(x, y), s"z($x,$y)")
    }
    // the full 16-bit space is hit exactly once by the 256x256 grid
    assert(zRef(255, 255) === 65535L && zRef(0, 0) === 0L)
  }

  test("zorder on testdata: buckets bound both dimensions (the pruning property)") {
    val rows = Layout.zorder(spark, SF).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (zx, zy, zval, b) =>
      assert(zx >= 0 && zx < 256 && zy >= 0 && zy < 256)
      assert(zRef(zx, zy) === zval)
      assert(b === zval / Layout.zBucketWidth && b >= 0 && b < Layout.zFileBuckets)
    }
    // Z-locality: within one file bucket (a 2048-z-value range), both
    // dims are confined to a sub-rectangle of the 256x256 space —
    // each bucket spans 2^11 z-values = a 64x32 (x,y) tile, so file
    // min/max stats prune on EITHER dim. A per-dim range sort would
    // bound one dim at 8 rows/bucket and leave the other at full width.
    rows.groupBy(_._4).foreach { case (b, rs) =>
      val xSpan = rs.map(_._1).max - rs.map(_._1).min
      val ySpan = rs.map(_._2).max - rs.map(_._2).min
      assert(xSpan < 64, s"bucket $b x-span $xSpan")
      assert(ySpan < 32, s"bucket $b y-span $ySpan")
    }
  }
}
