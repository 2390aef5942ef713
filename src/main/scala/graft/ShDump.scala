package graft
object ShDump {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = Seq((1L, 2L, 3L, 4L), (0L, -1L, Long.MaxValue, Long.MinValue))
      .toDF("a","b","c","d")
      .select(xxhash64($"a",$"b",$"c",$"d").as("h"), xxhash64($"a").as("h1"))
    df.collect().foreach(r => println(s"XX:${r.getLong(0)}:${r.getLong(1)}"))
    spark.stop()
  }
}
