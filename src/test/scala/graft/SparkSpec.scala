package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session: one lazy SparkSession per suite, local[4], UTC,
  * AQE on — the same config shape as Verify/Bench. */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = Sessions.tune(SparkSession.builder()
      .master("local[4]")
      .appName(getClass.getSimpleName)
      .config("spark.sql.shuffle.partitions", "4"))
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def fixture(name: String): String =
    getClass.getClassLoader.getResource(s"fixtures/$name").getPath

  val sfDir = "/root/testdata/sf0.001"
}
