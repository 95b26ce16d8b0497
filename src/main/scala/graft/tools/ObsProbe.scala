package graft.tools

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._

/** Scratch probe (optimization round): does Observation fire on a parquet
  * write action, and on a limit(0) empty plan? Delete after use. */
object ObsProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local(8, "obs-probe")
    import spark.implicits._
    val df = (1 to 100000).toDF("x")
      .select(col("x"), (col("x") % 7).as("g"))

    def probe(name: String, base: org.apache.spark.sql.DataFrame): Unit = {
      val obs = Observation()
      val observed = base.observe(obs, count(lit(1)).as("n"),
        coalesce(sum(col("x").cast("long")), lit(0L)).as("s"))
      val out = observed.groupBy(col("g")).agg(count(lit(1)).as("c"))
      val dest = java.nio.file.Files.createTempDirectory("obsprobe").toString
      val t0 = System.nanoTime()
      out.write.mode("overwrite").parquet(dest)
      val tW = (System.nanoTime() - t0) / 1e6
      val t1 = System.nanoTime()
      val row = try {
        Some(scala.concurrent.Await.result(obs.future,
          scala.concurrent.duration.Duration(2000, "ms")))
      } catch { case _: java.util.concurrent.TimeoutException => None }
      val tO = (System.nanoTime() - t1) / 1e6
      println(s"OBSPROBE $name write_ms=$tW obs_wait_ms=$tO row=$row")
    }
    probe("normal", df)
    probe("empty_limit0", df.limit(0))
    probe("empty_filter", df.filter(col("x") < 0))

    // range-partitioned write WITHOUT cache: does the sampling pass
    // double-count the CollectMetrics accumulator?
    def probeRange(name: String, base: org.apache.spark.sql.DataFrame,
                   cache: Boolean): Unit = {
      val obs = Observation()
      val observed0 = base.observe(obs, count(lit(1)).as("n"),
        coalesce(sum(col("x").cast("long")), lit(0L)).as("s"))
      val observed = if (cache) observed0.persist() else observed0
      val out = observed.repartitionByRange(col("g"), col("x"))
        .groupBy(col("g"), col("x")).agg(count(lit(1)).as("c"))
      val dest = java.nio.file.Files.createTempDirectory("obsprobe").toString
      out.write.mode("overwrite").parquet(dest)
      val row = try {
        Some(scala.concurrent.Await.result(obs.future,
          scala.concurrent.duration.Duration(2000, "ms")))
      } catch { case _: java.util.concurrent.TimeoutException => None }
      println(s"OBSPROBE $name row=$row (true n=100000)")
      if (cache) observed.unpersist(blocking = false)
    }
    probeRange("range_nocache", df, cache = false)
    probeRange("range_cache", df, cache = true)

    // does the observation fire on an EAGER localCheckpoint action?
    def probeCheckpoint(name: String, base: org.apache.spark.sql.DataFrame): Unit = {
      val obs = Observation()
      val observed = base.observe(obs, count(lit(1)).as("n"),
        coalesce(sum(col("x").cast("long")), lit(0L)).as("s"))
      val t0 = System.nanoTime()
      val cp = observed.localCheckpoint() // eager
      val tC = (System.nanoTime() - t0) / 1e6
      val row = try {
        Some(scala.concurrent.Await.result(obs.future,
          scala.concurrent.duration.Duration(2000, "ms")))
      } catch { case _: java.util.concurrent.TimeoutException => None }
      println(s"OBSPROBE $name checkpoint_ms=$tC row=$row (true n=100000)")
      cp.unpersist(blocking = false)
    }
    probeCheckpoint("localCheckpoint", df)
    probeCheckpoint("localCheckpoint_joined",
      df.join(df.select(col("x"), (col("x") + 1).as("y")), Seq("x"), "left"))
    spark.stop()
  }
}
