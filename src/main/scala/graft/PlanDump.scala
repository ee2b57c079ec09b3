package graft
import org.apache.spark.sql.SparkSession
/** Dev utility (not part of the driver contract): dump the executed plan
  * and hash-exchange count of registered queries — the `.explain` audit
  * loop SURVEY §4 prescribes. Usage: runMain graft.PlanDump q1,q2,... */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.headOption.getOrElse("q37_scd2_intervals").split(",").foreach { q =>
      val plan = SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
        .queryExecution.executedPlan.toString
      println(s"=== $q exchanges=" + "Exchange hashpartitioning".r.findAllIn(plan).length)
      println(plan.take(sys.env.getOrElse("PLAN_DUMP_CHARS", "4000").toInt))
    }
    spark.stop()
  }
}
