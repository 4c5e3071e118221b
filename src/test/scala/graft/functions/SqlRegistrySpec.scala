package graft.functions

import graft.SparkSuite

/** The SQL registration path: every custom expression must be
  * callable from `spark.sql`, returning the same values as the
  * Column API (same codegen'd expressions underneath). */
class SqlRegistrySpec extends SparkSuite {
  import spark.implicits._

  override def beforeAll(): Unit = {
    super.beforeAll()
    GraftFunctions.registerAll(spark)
  }

  test("scalar expressions are SQL-callable") {
    val r = spark.sql("""
      SELECT deaccent_slug('Đà Nẵng!') AS slug,
             duration_seconds('01:02:03') AS dur,
             pyliteral_to_json("['a', 'b']") AS js,
             vi_process_text('“Giá” 21 đồng') AS vi
    """).as[(String, Double, String, String)].head()
    assert(r == (("đa-nang", 3723.0, """["a","b"]""", "Giá hai mươi mốt đồng")))
  }

  test("parameterized hash expressions are SQL-callable") {
    val r = spark.sql("""
      SELECT size(minhash_sig(array('a','b','c'), 8)) AS k,
             min_shingle_hash(array('a','b','c','d'), 3) IS NOT NULL AS msh,
             sorted_intersect_count(array('a','b','c'), array('b','c','d')) AS ov,
             dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS dp,
             size(hyperplane_buckets(array(1.0d, -1.0d), 2, 4, 3)) AS nt
    """).as[(Int, Boolean, Int, Double, Int)].head()
    assert(r == ((8, true, 2, 11.0, 3)))
  }

  test("round-6 kernels are SQL-callable") {
    val r = spark.sql("""
      SELECT top_shingle_run(array('a','b','a','b','c'), 2) AS runs,
             canonical_url('HTTPS://H.Example:443/p/?b=2&a=1#f') AS url
    """).as[(Long, String)].head()
    // bigrams: ab, ba, ab, bc -> 'a b' twice
    assert(r == ((2L, "https://h.example/p?a=1&b=2")))
  }

  test("round-12 kernels are SQL-callable and match their column twins") {
    val r = spark.sql("""
      SELECT h60('token42') AS h,
             h28('token42') AS h2,
             size(cms_buckets('token42', 4, 512)) AS nb,
             cms_buckets('token42', 4, 512)[0] AS b0
    """).as[(Long, Long, Int, Long)].head()
    import org.apache.spark.sql.functions._
    val twin = spark.range(1).select(
        HashFunctions.h60(lit("token42")), HashFunctions.h28(lit("token42")),
        GraftFunctions.cms_buckets(lit("token42"), 4, 512)(0))
      .as[(Long, Long, Long)].head()
    assert((r._1, r._2, r._4) == twin && r._3 == 4)
    val pairs = spark.sql(
      "SELECT a, b FROM (SELECT explode(array(array(3L,1L,2L))) xs) LATERAL VIEW all_pairs_long(xs) t AS a, b")
      .as[(Long, Long)].collect().toSeq
    assert(pairs == Seq((1L, 2L), (1L, 3L), (2L, 3L)))
  }
}
