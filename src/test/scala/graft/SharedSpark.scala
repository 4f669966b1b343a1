package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.Suite

/** One local session shared per suite; mirrors the driver's Verify config. */
trait SharedSpark extends BeforeAndAfterAll { self: Suite =>

  val SfDir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SharedSpark.session

  override def afterAll(): Unit = super.afterAll()
}

object SharedSpark {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
