package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for operator specs — same configuration
  * as Verify/Bench ([[GraftSession]]) so tests see identical
  * semantics (UTC, nanosAsLong, shuffle partitions). */
trait SparkSuite extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = GraftSession("graft-test", "4")

  /** Smallest driver-generated scale factor — fixture input. */
  val sfDir = "/root/testdata/sf0.001"

  override def afterAll(): Unit = {
    // Session is shared across suites via getOrCreate; do not stop it
    // here or a later suite inherits a dead context.
    super.afterAll()
  }
}
