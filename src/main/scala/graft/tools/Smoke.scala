package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev smoke-driver: exercises the library through its public surface
  * (a real SparkSession + registered SQL functions) against testdata.
  * Run: `sbt "runMain graft.tools.Smoke"`.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GeoFunctions.register(spark)
    import spark.implicits._

    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").limit(5)
    val feats = li.select(concat(
      lit("""{"type":"Feature","geometry":{"type":"Point","coordinates":["""),
      $"l_extendedprice", lit(","), $"l_discount", lit(","), $"l_quantity",
      lit("""]},"properties":{"_id":""""), $"l_orderkey", lit("\"}}")
    ).as("feature"))
    feats.createOrReplaceTempView("feats")
    spark.sql("SELECT process_geometry(feature, 'nodes') AS out FROM feats")
      .show(5, false)
    spark.sql(
      """SELECT process_geometry(NULL, 'nodes') AS null_in,
        |       process_geometry('not json', 'nodes') AS garbage,
        |       process_geometry('{"type":"Feature","geometry":{"type":"Point","coordinates":[1.0,2.0,0]}}', 'nodes') AS zero_z,
        |       strip_z('[[[1.0,2.0,3.0]]]') AS deep,
        |       first_elevation('[[1.0,2.0],[3.0,4.0,9.5]]') AS fe
        |""".stripMargin).show(false)
    spark.stop()
  }
}
