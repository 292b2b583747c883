package graft.tools
import org.apache.spark.sql.SparkSession
object EntryProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder.master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println("[entry-probe] rows=" + graft.SparkEntry.entry(spark).count())
  }
}
