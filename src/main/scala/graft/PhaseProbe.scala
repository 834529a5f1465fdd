package graft

import org.apache.spark.sql.SparkSession

/** Per-query FIXED-COST attribution (round 16): where does the ~0.8 s/query
  * floor exposed by the 8-core ≈ 32-core bench result go? For each named
  * query this reports, per rep, the Catalyst phase times from the
  * QueryPlanningTracker (parsing/analysis/optimization/planning — all
  * driver-side, core-count-independent) against the total wall of the noop
  * write, so the floor decomposes into plan-construction vs execution.
  * Builder-side only; the driver never runs it.
  *
  * Usage: runMain graft.PhaseProbe <sfDir> <query1,query2,...> [reps=2]
  */
object PhaseProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes", (8L * 1024 * 1024).toString)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1048576")
      .config("spark.memory.storageFraction", "0.2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (name <- names) {
      val fn = SparkEntry.queries(name)
      (0 until reps).foreach { rep =>
        System.gc()
        val t0 = System.nanoTime()
        val df = graft.ext.Memo.withConsumer(name) { fn(spark, sfDir) }
        val tBuild = System.nanoTime()
        val qe = df.queryExecution
        qe.executedPlan // force analysis+optimization+planning
        val tPlan = System.nanoTime()
        graft.ext.Memo.withConsumer(name) {
          df.write.format("noop").mode("overwrite").save()
        }
        val tEnd = System.nanoTime()
        val phases = qe.tracker.phases.map { case (p, t) =>
          f"$p=${(t.endTimeMs - t.startTimeMs) / 1e3}%.3fs"
        }.mkString(" ")
        println(f"PHASE $name rep=$rep build=${(tBuild - t0) / 1e9}%.3fs " +
          f"plan=${(tPlan - tBuild) / 1e9}%.3fs exec=${(tEnd - tPlan) / 1e9}%.3fs " +
          f"total=${(tEnd - t0) / 1e9}%.3fs  [$phases]")
      }
    }
    graft.ext.Dedup.Intermediate.dropBucketedTables(spark, sweepStragglers = true)
    spark.stop()
  }
}
