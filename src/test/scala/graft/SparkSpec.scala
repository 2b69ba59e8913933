package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared suite base: one SparkSession per suite (reference pattern:
  * tests/conftest.py:9-42 session-scoped fixture — "only one SparkContext
  * can be active per JVM", tests/test_common.py:47-49). */
abstract class SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = Sessions.local("graft-test", cores = 4)
  val sf: String = "/root/testdata/sf0.001"

  override def afterAll(): Unit = {
    // Session is shared process-wide across suites; do not stop it here or
    // parallel suites in the same JVM lose their context.
    super.afterAll()
  }
}
