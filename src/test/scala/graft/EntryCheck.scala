package graft
object EntryCheck {
  def main(args: Array[String]): Unit = {
    val spark = pipeline.Pipeline.session("local[8]", 8, "entry-check")
    spark.sparkContext.setLogLevel("WARN")
    try {
      val n = SparkEntry.entry(spark).count()
      println(s"ENTRY_ROWS=$n")
      require(n > 0)
    } finally spark.stop()
  }
}
