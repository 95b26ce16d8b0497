package graft

import java.nio.file.{Files, Paths}

/** Dump `.explain("formatted")` for declared queries (optimization-round
  * evidence: plans/rNN/<query>_{before,after}.txt).
  *
  * Usage: runMain graft.PlanDump <outDir> <suffix> [substringFilter,...]
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (same contract as Bench).
  *
  * Note: for the index-fixture queries the DataFrame CONSTRUCTION runs
  * the store builds eagerly — the dumped plan is the serving read, which
  * is the part with a stable plan shape (builds are commits, not one
  * query plan).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val filter = args.drop(2).flatMap(_.split(',')).map(_.trim).filter(_.nonEmpty)
    def selected(name: String): Boolean =
      filter.isEmpty || filter.exists(name.contains)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = Sessions.local(cpus, "graft-plandump")
    Files.createDirectories(Paths.get(outDir))
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => selected(name) }
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          val txt = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          Files.writeString(Paths.get(outDir, s"${name}_$suffix.txt"), txt)
          println(s"PLAN q=$name chars=${txt.length}")
        } catch { case e: Throwable =>
          System.err.println(s"PLAN ERROR $name: ${e.getMessage}")
        }
      }
    spark.stop()
  }
}
