package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    ev.printSchema()
    ev.select(col("ts"), expr("timestamp_micros(ts div 1000)").as("tus")).show(3, false)
    // base64 of a long string: chunked or not?
    val longStr = "x" * 100
    Seq(longStr).toDF("s")
      .select(base64(col("s").cast("binary")).as("b64"))
      .show(1, false)
    // json validity checks on scalars/objects/invalid
    Seq("5", "\"x\"", "{\"k\": 69}", "plain text", "").toDF("m")
      .select(col("m"),
        get_json_object(col("m"), "$").as("gjo"),
        expr("isnotnull(try_parse_json(m))").as("tpj"))
      .show(10, false)
    // to_json formatting + null dropping
    Seq(("a b \" c", Option(1), Option.empty[Int])).toDF("t", "a", "b")
      .select(to_json(struct(col("t").as("text"))).as("j1"),
              to_json(struct(col("a"), col("b"))).as("j2"))
      .show(1, false)
    // parse_url
    Seq("https://api.example.com/v1/pets?limit=5&x=2").toDF("u")
      .select(parse_url(col("u"), lit("PATH")).as("path"),
              parse_url(col("u"), lit("QUERY")).as("q"),
              parse_url(col("u"), lit("HOST")).as("h"))
      .show(1, false)
    // to_timestamp with tz pattern
    Seq("27/Oct/2021:19:35:18 +0000").toDF("d")
      .select(to_timestamp(col("d"), "dd/MMM/yyyy:HH:mm:ss Z").as("t")).show(1, false)
    // date_format for access log synth
    ev.select(date_format(expr("timestamp_micros(ts div 1000)"), "dd/MMM/yyyy:HH:mm:ss Z").as("httpdate")).show(2, false)
    // md5
    Seq("abc").toDF("s").select(md5(col("s").cast("binary"))).show(1, false)
    // double formatting checks: dot product determinism vs duckdb comes later
    spark.stop()
  }
}
