package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session per suite (one JVM-wide session; suites run sequentially
  * under sbt's default test execution within the forked JVM). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session
  /** Test-data root shared by every suite (override via GRAFT_TEST_SF_DIR). */
  val sfDir: String =
    sys.env.getOrElse("GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
  def sf(name: String) = s"$sfDir/$name.parquet"
}

object SparkSpec {
  lazy val session: SparkSession =
    graft.io.EngineSession.local(4, "ERROR")
}
