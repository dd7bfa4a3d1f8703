package graft
import org.apache.spark.sql.SparkSession
object QuickCheck {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("quickcheck").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val d = args.head
    args.tail.foreach { k =>
      val df = SparkEntry.queries(k)(s, d)
      println(s"=== $k ===")
      df.show(10, truncate = false)
    }
    s.stop()
  }
}
