package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSuite
import graft.Tables

/** Pins the codegen'd LangId kernel against the pure-column
  * formulation (the semantic reference) and against hand-computed
  * edge cases: ties, duplicates, und, multi-profile words. */
class LangIdSpec extends SparkSuite {

  test("kernel prediction equals column-form prediction on the corpus") {
    val docs = Tables.documents(spark, sfDir)
    val diff = docs
      .select(
        col("doc_id"),
        LangId.predict(col("text")).as("kernel"),
        LangId.predictColumnForm(col("text")).as("column"))
      .filter(col("kernel") =!= col("column"))
      .count()
    assert(diff === 0)
  }

  test("edge cases: und, duplicates, ties, shared profile words") {
    import spark.implicits._
    val rows = Seq(
      // no profile hits anywhere -> und
      1L -> "zzz qqq xyzzy",
      // duplicates must not double count: one distinct en hit ("the"
      // twice) loses to two distinct de hits
      2L -> "the the der die",
      // exact tie (1 de hit, 1 en hit) -> earliest profile (de) wins
      3L -> "der the",
      // "de la en" sit in BOTH es and fr profiles -> 3-3 tie -> es
      4L -> "de la en",
      // clear vi
      5L -> "và của là xyz").toDF("doc_id", "text")
    val got = rows
      .select(col("doc_id"), LangId.predict(col("text")).as("lang"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "und", 2L -> "de", 3L -> "de", 4L -> "es", 5L -> "vi"))
    // and the column form agrees on every edge case
    val col2 = rows
      .select(col("doc_id"), LangId.predictColumnForm(col("text")).as("lang"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(col2 === got)
  }
}
