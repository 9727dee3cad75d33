package graft.pipelines

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Adapter: a MovieLens-shaped `ratings(userId, movieId, rating)` frame
  * derived from the driver testdata, so the reference pipelines (which the
  * rebuild exposes as library functions over any ratings-shaped frame) can
  * be exercised and benchmarked on the harness tables.
  *
  * Mapping: customers play users, parts play movies, per-(customer, part)
  * average line quantity plays the rating. lineitem ⋈ orders is a fact-to-
  * fact equi-join on the order key, then a two-phase hash agg.
  */
object Ratings {

  def fromTestdata(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"))
    val o = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"))
    li.join(o, li("l_orderkey") === o("o_orderkey"), "inner")
      .groupBy(col("o_custkey").as("userId"), col("l_partkey").as("movieId"))
      .agg(avg(col("l_quantity")).as("rating"))
      .select(col("userId"), col("movieId"), col("rating"))
  }
}
