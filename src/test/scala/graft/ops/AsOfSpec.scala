package graft.ops

import graft.{Tables, TestSpark}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AsOfSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("asOfJoin picks the latest at-or-before row; strict excludes ties") {
    val left = Seq((1L, 10L, "l1"), (1L, 20L, "l2"), (2L, 5L, "l3"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, 10L, 100.0), (1L, 15L, 150.0), (2L, 9L, 900.0))
      .toDF("k", "t", "v")

    val loose = AsOf.asOfJoin(left, right, Seq("k"), "t", "t", Seq("v"))
      .select(col("tag"), col("asof_t"), col("asof_v")).collect()
      .map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some((r.getLong(1), r.getDouble(2)))))
      .toMap
    assert(loose("l1") == Some((10L, 100.0)), "equal ts matches when loose")
    assert(loose("l2") == Some((15L, 150.0)), "latest preceding wins")
    assert(loose("l3") == None, "no preceding right row → nulls")

    val strict = AsOf.asOfJoin(left, right, Seq("k"), "t", "t", Seq("v"),
        strict = true)
      .select(col("tag"), col("asof_t")).collect()
      .map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(strict("l1") == None, "equal ts must NOT match when strict")
    assert(strict("l2") == Some(15L))
  }

  test("rangeSelfJoin matches the naive theta join, boundaries exact") {
    // horizon 10: (t, t+10] — row at t+10 matches, row at t does not,
    // row at t+11 does not; bucket-edge pairs (9,19) cross buckets
    val df = Seq((1L, 0L, "a"), (1L, 9L, "b"), (1L, 10L, "c"),
                 (1L, 19L, "d"), (1L, 21L, "e"), (2L, 9L, "z"))
      .toDF("k", "t", "id")
    val got = AsOf.rangeSelfJoin(df, Seq("k"), "t", 10L, Seq("id"))
      .select(col("id_l"), col("id_r")).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    val want = Set(("a", "b"), ("a", "c"), ("b", "c"), ("b", "d"),
                   ("c", "d"), ("d", "e"))
    assert(got == want, s"got $got")

    val ev = Tables.events(spark, TestSpark.sf0001)
      .select(col("event_id"), col("user_id"), col("ts"))
    val bucketized = AsOf.rangeSelfJoin(ev, Seq("user_id"), "ts",
        300L * 1000000000L, Seq("event_id"))
      .select(col("event_id_l"), col("event_id_r"))
    val naive = ev.as("l")
      .join(ev.as("r"),
        col("l.user_id") === col("r.user_id") &&
          col("r.ts") > col("l.ts") &&
          col("r.ts") <= col("l.ts") + 300L * 1000000000L)
      .select(col("l.event_id"), col("r.event_id"))
    assert(bucketized.count() == naive.count())
    assert(bucketized.exceptAll(naive).count() == 0)
  }

  test("asOfJoin equals the naive range-join + argmax on testdata") {
    val ev = Tables.events(spark, TestSpark.sf0001)
      .withColumn("ts_us", expr("ts div 1000"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts_us"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts_us")).agg(max(col("value")).as("v"))

    val mine = Corpus.asofJoin(spark, TestSpark.sf0001)

    val w = Window.partitionBy(col("event_id"))
      .orderBy(col("r_ts").desc_nulls_last)
    val naive = clicks
      .join(purchases
          .select(col("user_id"), col("ts_us").as("r_ts"), col("v")),
        Seq("user_id"), "left")
      .filter(col("r_ts").isNull || col("r_ts") <= col("ts_us"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)

    // the naive filter drops non-null-but-later rows entirely, which can
    // eliminate a left row that SHOULD appear with nulls — re-add those
    val naiveFixed = clicks
      .join(naive.select(col("event_id"),
              col("r_ts").as("asof_ts_us"), col("v").as("asof_v")),
        Seq("event_id"), "left")
      .select(col("event_id"), col("user_id"), col("ts_us"),
              col("asof_ts_us"), col("asof_v"))
    assert(mine.count() == clicks.count())
    assert(mine.exceptAll(naiveFixed).count() == 0)
    assert(naiveFixed.exceptAll(mine).count() == 0)
  }
}
