package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Z-order layout: pinned Morton bit placement, quantizer endpoints,
  * the pruning claim itself (a box predicate touches strictly fewer
  * z-order buckets than single-column-sort buckets — the reason the
  * operator exists), and the write path's range invariants. */
class LayoutSpec extends SparkSuite {

  private def evalLong(c: org.apache.spark.sql.Column): Long =
    spark.range(1).select(c.as("v")).head.getLong(0)

  test("mortonCode: pinned bit placement, identity at d=1, full range") {
    // x=0b101, y=0b011 → bits (x0 y0 x1 y1 x2 y2) = 1 1 0 1 1 0 → 27
    assert(evalLong(Layout.mortonCode(Seq(lit(5L), lit(3L)), 3)) === 27L)
    // d=1 is the identity permutation
    assert(evalLong(Layout.mortonCode(Seq(lit(173L)), 8)) === 173L)
    // all-ones in, all-ones out (2 dims × 8 bits = 16 bits)
    assert(evalLong(Layout.mortonCode(Seq(lit(255L), lit(255L)), 8)) === 65535L)
    // 3 dims × 1 bit: each dim owns one output bit
    assert(evalLong(Layout.mortonCode(Seq(lit(1L), lit(0L), lit(1L)), 1)) === 5L)
  }

  test("quantize: endpoints land on 0 and 2^bits-1, interior is monotone") {
    def q(x: Long) = evalLong(Layout.quantize(lit(x), lit(100L), lit(1100L), 8))
    assert(q(100L) === 0L)
    assert(q(1100L) === 255L)
    val qs = (100L to 1100L by 50L).map(q)
    assert(qs === qs.sorted, "quantizer must be monotone")
    // degenerate dimension quantizes to 0 instead of dividing by zero
    assert(evalLong(Layout.quantize(lit(7L), lit(7L), lit(7L), 8)) === 0L)
  }

  /** The operative claim: on a uniform 2-D corpus, a small box
    * predicate overlaps the zone maps of ~1 z-order bucket but ~1/8
    * of single-column-sort buckets (whose second dimension spans the
    * full range, so its zone map never prunes). */
  test("zone-map pruning: z-order buckets beat a single-column sort on a box predicate") {
    // Coprime moduli (997/1009): with a shared modulus the two linear
    // generators are a bijection of each other and x-buckets inherit
    // structured (often box-missing) y sets; CRT-independent residues
    // restore the uniform-corpus shape the claim is about.
    val df = spark.range(4096).select(
      pmod(col("id") * 7919L, lit(997L)).as("x"),
      pmod(col("id") * 104729L, lit(1009L)).as("y"))
    val zZone = Layout.zorderZoneMap(df, Seq("x", "y"), bits = 8, bucketBits = 6)
    assert(zZone.count() === 64L)
    assert(zZone.agg(sum("n")).head.getLong(0) === 4096L)
    // box = [0,124] × [0,124]; a bucket overlaps iff both mins are <= 124
    val zHit = zZone.filter(col("x_min") <= 124 && col("y_min") <= 124).count()

    // single-column layout: bucket by the top 6 bits of x's quantization
    val st = df.agg(min("x").as("mn"), max("x").as("mx"))
    val linBucket = shiftright(
      Layout.quantize(col("x"), col("mn"), col("mx"), 8), 2)
    val linZone = df.crossJoin(broadcast(st))
      .groupBy(linBucket.as("bucket"))
      .agg(min("x").as("x_min"), min("y").as("y_min"))
    val linHit = linZone.filter(col("x_min") <= 124 && col("y_min") <= 124).count()

    assert(zHit < linHit,
      s"z-order should prune harder: z-order hit $zHit buckets, linear hit $linHit")
    assert(zHit <= 2L, s"box should land in ~1 grid cell, hit $zHit")
    assert(linHit >= 6L, s"x-sorted layout cannot prune on y, hit only $linHit")
  }

  test("clusterByZorder: count preserved, partitions cover disjoint sorted z-ranges") {
    val df = spark.range(4096).select(
      pmod(col("id") * 7919L, lit(997L)).as("x"),
      pmod(col("id") * 104729L, lit(1009L)).as("y"))
    val out = Layout.clusterByZorder(df, Seq("x", "y"), bits = 8, files = 4)
    assert(out.columns.toSeq === Seq("x", "y", "zval"))
    assert(out.count() === 4096L)
    // per-partition sortedness + disjoint ranges across partitions
    val ranges = out.select("zval").rdd.mapPartitionsWithIndex { (pid, it) =>
      val zs = it.map(_.getLong(0)).toArray
      if (zs.isEmpty) Iterator.empty
      else {
        assert(zs.sameElements(zs.sorted), s"partition $pid not sorted")
        Iterator((pid, zs.head, zs.last))
      }
    }.collect().sortBy(_._2)
    ranges.sliding(2).foreach {
      case Array((_, _, hi), (_, lo, _)) =>
        assert(hi <= lo, "partition z-ranges must not interleave")
      case _ =>
    }
  }
}
