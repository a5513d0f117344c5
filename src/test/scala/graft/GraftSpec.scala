package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all specs (one JVM-wide session keeps the
  * suite fast; specs must not mutate session state). */
trait GraftSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = GraftSession.builder("4").getOrCreate()
  val sf = "/root/testdata/sf0.001"
  override def afterAll(): Unit = {} // session shared across suites; JVM exit cleans up
}
