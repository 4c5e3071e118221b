package graft.functions

import org.apache.spark.sql.functions._
import graft.{SparkSuite, Tables}

/** The hyperplane-bucket kernel must agree with the column-level
  * derivation it replaced (same md5-derived sign matrix, same
  * left-to-right accumulation). */
class VectorFunctionsSpec extends SparkSuite {
  import spark.implicits._

  test("kernel buckets equal column-composed buckets") {
    val v = Tables.embeddings(spark, sfDir).filter(col("vec_id") < 30)
      .select(col("vec_id"), VectorFunctions.asDouble(col("embedding")).as("vec"))
    val nPlanes = 4
    val nTables = 3
    val viaKernel = v.select(col("vec_id"),
      VectorFunctions.hyperplaneBuckets(col("vec"), 64, nPlanes, nTables).as("keys"))
      .as[(Long, Seq[Long])].collect().toMap
    val viaColumns = v.select(col("vec_id"),
      array((0 until nTables).map(t =>
        (lit(t.toLong) * lit(4294967296L)) +
          VectorFunctions.hyperplaneBucket(col("vec"), 64, nPlanes, t).cast("long")): _*).as("keys"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(viaKernel == viaColumns)
  }

  test("dot kernel equals HOF aggregate form") {
    val v = Tables.embeddings(spark, sfDir).filter(col("vec_id") < 30)
      .select(VectorFunctions.asDouble(col("embedding")).as("a"))
      .withColumn("b", reverse(col("a")))
    val viaKernel = v.select(VectorFunctions.dot(col("a"), col("b"))).as[Double].collect()
    val viaHof = v.select(
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y), lit(0.0d), (acc, x) => acc + x))
      .as[Double].collect()
    assert(viaKernel.toSeq == viaHof.toSeq)
  }
}
