package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Central loader for the driver-generated parquet tables under
  * /root/testdata/sf0.001|sf0.01|sf0.1 (see repo TESTDATA.md / FIXTURES.md).
  *
  * `events.ts` is parquet TIMESTAMP(NANOS) which Spark rejects outright
  * ([PARQUET_TYPE_ILLEGAL]); reading with
  * `spark.sql.legacy.parquet.nanosAsLong=true` yields raw nanos as LongType,
  * converted here to a microsecond TIMESTAMP (`ts div 1000`, truncation —
  * bucket-boundary-safe for the engine's second-granularity windows).
  * Micro-precision tables (lineitem/orders) are unaffected by the flag.
  */
object Tables {

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    df.schema.fields.find(f => f.name == "ts" && f.dataType.typeName == "long") match {
      case Some(_) => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case None    => df
    }
  }

  def events(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "events")
  def lineitem(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "region")
  def documents(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "embeddings")
}
