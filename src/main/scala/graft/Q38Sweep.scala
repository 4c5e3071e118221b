package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev measurement harness for q38_ordered_concat (the registry's
  * only real-denominator row above 2x DuckDB in r14): times the
  * current plan against candidate shapes to find which stage owns
  * the gap. Variants:
  *   cur       — shipped plan (hash agg: collect_list(struct) →
  *               array_sort → transform → array_join, then orderBy)
  *   noorder   — shipped agg without the final orderBy (isolates the
  *               second exchange + sort's share)
  *   sortagg   — repartitionByRange(orderkey) + sortWithinPartitions
  *               (orderkey, seq) + mapPartitions streaming assembly
  *               (one exchange, no per-group arrays, output globally
  *               ordered by construction)
  *   packlong  — single-column agg: pack (seq << 40 | dense string
  *               id)… not expressible without the string; instead
  *               sort the STRING array of "0000seq|fname" keys and
  *               strip — tests whether struct comparators are the
  *               cost vs plain string sort.
  */
object Q38Sweep {
  def time3(f: => DataFrame): Seq[Double] = (1 to 5).map { _ =>
    val t0 = System.nanoTime()
    f.write.format("noop").mode("overwrite").save()
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession("graft-q38sweep", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    import spark.implicits._
    spark.range(1000000L).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()

    def base(s: SparkSession, d: String): DataFrame = {
      val fname = concat(lit("part_"), col("l_linenumber"), lit(".mp3"))
      Tables.lineitem(s, d).select(col("l_orderkey"), fname.as("fname"))
    }
    val seqExpr = coalesce(
      substring_index(substring_index(col("fname"), ".", 1), "_", -1)
        .cast("int"), lit(0))

    def cur(s: SparkSession, d: String): DataFrame =
      SparkEntry.queries("q38_ordered_concat")(s, d)

    def noorder(s: SparkSession, d: String): DataFrame =
      base(s, d).withColumn("seq", seqExpr)
        .groupBy("l_orderkey")
        .agg(count(lit(1)).as("n_parts"),
          array_join(transform(
            array_sort(collect_list(struct(col("seq"), col("fname")))),
            x => x.getField("fname")), ",").as("assembled"))

    def stragg(s: SparkSession, d: String): DataFrame =
      base(s, d).withColumn("seq", seqExpr)
        .groupBy("l_orderkey")
        .agg(count(lit(1)).as("n_parts"),
          array_join(transform(
            array_sort(collect_list(
              concat(lpad(col("seq").cast("string"), 10, "0"), col("fname")))),
            x => substring(x, 11, 1000000)), ",").as("assembled"))
        .orderBy("l_orderkey")

    def sortagg(s: SparkSession, d: String): DataFrame = {
      val rows = base(s, d).withColumn("seq", seqExpr)
        .repartitionByRange(col("l_orderkey"))
        .sortWithinPartitions(col("l_orderkey"), col("seq"), col("fname"))
        .select(col("l_orderkey"), col("fname"))
      rows.mapPartitions { it =>
        new Iterator[(Long, Long, String)] {
          private var cur: Option[(Long, Long, java.lang.StringBuilder)] = None
          private var pending: Option[(Long, Long, String)] = None
          private def roll(): Unit = {
            while (pending.isEmpty && it.hasNext) {
              val r = it.next()
              val k = r.getLong(0); val f = r.getString(1)
              cur match {
                case Some((ck, n, sb)) if ck == k =>
                  cur = Some((ck, n + 1, sb.append(',').append(f)))
                case Some((ck, n, sb)) =>
                  pending = Some((ck, n, sb.toString))
                  cur = Some((k, 1L, new java.lang.StringBuilder(f)))
                case None =>
                  cur = Some((k, 1L, new java.lang.StringBuilder(f)))
              }
            }
            if (pending.isEmpty && !it.hasNext && cur.isDefined) {
              val (ck, n, sb) = cur.get
              pending = Some((ck, n, sb.toString)); cur = None
            }
          }
          def hasNext: Boolean = { roll(); pending.isDefined }
          def next(): (Long, Long, String) = {
            roll(); val p = pending.get; pending = None; p
          }
        }
      }.toDF("l_orderkey", "n_parts", "assembled")
    }

    // Declarative alternative: RangePartitioning(l_orderkey) satisfies
    // the aggregate's ClusteredDistribution, so groupBy adds no second
    // exchange, and a partition-local sort of the ~orders-sized output
    // restores global order without another shuffle.
    def rangeagg(s: SparkSession, d: String): DataFrame =
      base(s, d).withColumn("seq", seqExpr)
        .repartitionByRange(col("l_orderkey"))
        .groupBy("l_orderkey")
        .agg(count(lit(1)).as("n_parts"),
          array_join(transform(
            array_sort(collect_list(struct(col("seq"), col("fname")))),
            x => x.getField("fname")), ",").as("assembled"))
        .sortWithinPartitions("l_orderkey")

    val variants: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
      "cur" -> cur, "noorder" -> noorder, "stragg" -> stragg,
      "sortagg" -> sortagg, "rangeagg" -> rangeagg)
    for ((n, f) <- variants) {
      val ts = time3(f(spark, sfDir))
      println(f"Q38SWEEP $n%-10s min=${ts.min}%6.3f med=${ts.sorted.apply(2)}%6.3f runs=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    // Row parity: sortagg must equal cur exactly (same rows, order
    // checked by the zip compare below).
    val a = cur(spark, sfDir).collect()
    val b = sortagg(spark, sfDir).collect()
    println(s"Q38SWEEP parity rows ${a.length}/${b.length} equal=${
      a.length == b.length && a.zip(b).forall { case (x, y) =>
        x.getLong(0) == y.getLong(0) && x.getLong(1) == y.getLong(1) &&
          x.getString(2) == y.getString(2) }}")
    spark.stop()
  }
}
