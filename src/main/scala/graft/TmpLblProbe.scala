package graft
import org.apache.spark.sql.SparkSession
// TEMP diagnostic — delete before commit.
object TmpLblProbe {
  def main(args: Array[String]): Unit = {
    val cpus = Runtime.getRuntime.availableProcessors.toString
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](l: String)(f: => A): A = { val t0=System.nanoTime(); val r=f; println(f"PROBE $l ${(System.nanoTime()-t0)/1e9}%.2f s"); r }
    val df = SparkEntry.queries("q_label_missing")(spark, "/tmp/sfx10")
    t("run1")(df.collect().length)
    t("run2")(SparkEntry.queries("q_label_missing")(spark, "/tmp/sfx10").collect().length)
    println("events partitions: " + Tables.events(spark, "/tmp/sfx10").rdd.getNumPartitions)
    spark.stop()
  }
}
