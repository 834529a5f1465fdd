package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Stage-level wall/shuffle/spill attribution for one declared query —
  * the diagnostic that finds WHICH exchange in a multi-join plan carries
  * the bytes (Bench totals per query; this names the stage). Builder-side
  * only; the driver never runs it.
  *
  * Usage: runMain graft.StageProbe <sfDir> <queryName>
  */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, name) = args.take(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes", (8L * 1024 * 1024).toString)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1048576")
      .config("spark.memory.storageFraction", "0.2") // match Bench (see its note)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        println(f"[stage ${si.stageId}%4d] tasks=${si.numTasks}%4d " +
          f"wall=${(si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)) / 1e3}%7.1fs " +
          f"shufW=${m.shuffleWriteMetrics.bytesWritten / 1e6}%9.1fMB " +
          f"shufR=${(m.shuffleReadMetrics.remoteBytesRead + m.shuffleReadMetrics.localBytesRead) / 1e6}%9.1fMB " +
          f"spill=${m.diskBytesSpilled / 1e6}%9.1fMB  ${si.name.take(80)}")
      }
    })
    val t0 = System.nanoTime
    val n = SparkEntry.queries(name)(spark, sfDir).count()
    println(f"RESULT $name rows=$n wall=${(System.nanoTime - t0) / 1e9}%.1fs")
    graft.ext.Dedup.Intermediate.dropBucketedTables(spark, sweepStragglers = true)
    spark.stop()
  }
}
