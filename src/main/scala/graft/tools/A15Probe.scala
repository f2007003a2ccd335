package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
object A15Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.local.dir", sys.env.getOrElse("SPARK_LOCAL_DIRS", "/dev/shm/graft-spark"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    def time(label: String)(f: => Unit): Unit = {
      (1 to 2).foreach(_ => f)
      val t0 = System.nanoTime(); f
      println(f"[a15] $label%-28s ${(System.nanoTime()-t0)/1e9}%6.3f s")
    }
    val li = graft.io.Sources.table(spark, d, "lineitem").select(col("l_extendedprice").as("v"))
    val vc = li.groupBy(col("v")).agg(count(lit(1)).as("c"))
    time("groupBy(v) only")(vc.write.format("noop").mode("overwrite").save())
    val vcw = vc.withColumn("cum", sum(col("c")).over(
        Window.orderBy("v").rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    time("groupBy + window")(vcw.write.format("noop").mode("overwrite").save())
    time("full a15")(graft.SparkEntry.queries("a15_equidepth")(spark, d)
      .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
