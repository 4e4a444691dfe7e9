package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** CSV source with an explicit schema — the reference's S1 entry point
  * (Dataset.py:77, `header=True, inferSchema=True`) done right:
  * `inferSchema` scans the data twice and yields nondeterministic types at
  * scale; an explicit StructType is one pass and stable (SURVEY.md §1).
  */
object Csv {
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(path)

  /** The reference's Chicago Crimes shape (SURVEY.md §1, public schema) as
    * the explicit StructType its CSV read should have used.
    */
  val crimeLikeSchema: StructType = StructType(Seq(
    StructField("ID", IntegerType),
    StructField("Case Number", StringType),
    StructField("Date", StringType), // parsed via to_timestamp MM/dd/yyyy hh:mm:ss a
    StructField("Block", StringType),
    StructField("IUCR", StringType),
    StructField("Primary Type", StringType),
    StructField("Description", StringType),
    StructField("Location Description", StringType),
    StructField("Arrest", BooleanType),
    StructField("Domestic", BooleanType),
    StructField("Beat", IntegerType),
    StructField("District", IntegerType),
    StructField("Ward", IntegerType),
    StructField("Community Area", IntegerType),
    StructField("FBI Code", StringType),
    StructField("X Coordinate", IntegerType),
    StructField("Y Coordinate", IntegerType),
    StructField("Year", IntegerType),
    StructField("Updated On", StringType),
    StructField("Latitude", DoubleType),
    StructField("Longitude", DoubleType),
    StructField("Location", StringType)))
}
