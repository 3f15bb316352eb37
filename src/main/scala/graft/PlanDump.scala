package graft

/** Prints the formatted physical plan of one or more declared queries —
  * the feedback loop for PLANS.md and PlanAuditSpec calibration.
  * Usage: runMain graft.PlanDump <sfDir> <queryName>...
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.all.map(_.name)
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      println(s"==== $n ====")
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    } finally spark.stop()
  }
}
