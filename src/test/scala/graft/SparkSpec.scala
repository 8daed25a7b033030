package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites (one per suite, lazy). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName(getClass.getSimpleName)
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Testdata root — the driver-generated tables in the dev container;
    * CI points this at `tools/gen_testdata.py` output. Golden-value
    * tests that pin numbers from the DRIVER dataset must gate on
    * [[isDriverTestdata]] (generated data is schema-compatible but not
    * byte-identical).
    */
  val TestdataRoot: String =
    sys.env.getOrElse("GRAFT_TESTDATA_DIR", "/root/testdata")
  val Sf0001 = s"$TestdataRoot/sf0.001"
  val Sf001 = s"$TestdataRoot/sf0.01"
  def isDriverTestdata: Boolean =
    TestdataRoot == "/root/testdata" &&
      java.nio.file.Files.exists(java.nio.file.Paths.get(Sf001))
}
