package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Shared local SparkSession fixture for all specs. */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session

  override def afterAll(): Unit = () // session shared across suites
}

object SparkSpec {
  // the production config factory, so plan shapes asserted in specs match
  // what Verify/Bench (and a real deployment) run with
  lazy val session: SparkSession =
    graft.api.GraftSession.builder("local[4]", 4).getOrCreate()
}
