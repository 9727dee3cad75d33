package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** CSV source/sink — the reference's only real I/O surface
  * (splitting_data.py:13 read with header+inferSchema;
  * splitting_data.py:48-50 / customer_segmentation_1.py:39 write with
  * header, coalesce(1), overwrite).
  *
  * Deliberate differences for 100-TB operation:
  *  - schemas are EXPLICIT, never inferred — inference costs a full
  *    extra pass over the data and can flip types between runs;
  *  - no `coalesce(1)`: a single output file serializes the final stage
  *    to one task; callers that truly need one file can coalesce at the
  *    call site on provably small data.
  */
object Csv {

  /** The MovieLens ratings schema the reference reads
    * (FIXTURES.md §A; types as its inferSchema resolves them). */
  val ratingsSchema: StructType = StructType(Seq(
    StructField("userId", IntegerType),
    StructField("movieId", IntegerType),
    StructField("rating", DoubleType),
    StructField("timestamp", LongType)))

  /** The twin-pairs schema written by the segmentation pipeline
    * (customer_segmentation_1.py:33-39). */
  val pairsSchema: StructType = StructType(Seq(
    StructField("userA", IntegerType),
    StructField("userB", IntegerType),
    StructField("similarity", DoubleType)))

  /** Header'd CSV read with an explicit schema. FAILFAST so a malformed
    * row surfaces immediately instead of becoming silent nulls. */
  def read(spark: SparkSession, path: String, schema: StructType,
           mode: String = "FAILFAST"): DataFrame =
    spark.read
      .option("header", "true")
      .option("mode", mode)
      .schema(schema)
      .csv(path)

  def readRatings(spark: SparkSession, path: String): DataFrame =
    read(spark, path, ratingsSchema, mode = "PERMISSIVE")

  /** Header'd overwrite CSV write, parallelism preserved. */
  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)
}
