package graft

import org.apache.spark.sql.SparkSession

/** Session factory used by tests and local mains.
  *
  * Tuned for local[N] iteration but with settings that translate to a real
  * cluster: AQE on (skew-join + partition coalescing replace the
  * reference's manual salting, see SURVEY §4), shuffle partitions sized to
  * cores instead of the 200 default.
  */
object Sessions {
  def local(cores: Int = 4): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // older events.parquet generations carry TIMESTAMP(NANOS); keep the
      // legacy read conf so those files load as longs (current micros
      // files normalize via Events.tsToNanos either way).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
