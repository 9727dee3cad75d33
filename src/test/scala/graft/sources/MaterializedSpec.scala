package graft.sources

import java.nio.file.Files

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Incrementally-maintained aggregates: the folded state must always
  * equal a from-scratch aggregate of the base table's current
  * snapshot, no matter what mix of appends / upserts / deletes /
  * maintenance the window held — and a crash-replayed window must
  * fold exactly once. */
class MaterializedSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graft-mv").toString

  private def rows(from: Int, until: Int) =
    (from until until).map { i =>
      (i.toLong, s"k${i % 5}", (i % 7).toLong)
    }.toDF("id", "k", "v")

  /** From-scratch recompute of what the view must hold. */
  private def recompute(table: String) =
    Snapshot.read(spark, table)
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_rows"),
        coalesce(sum(col("v")), lit(0L)).as("sum_v"),
        count(col("v")).as("cnt_v"))

  private def collected(df: org.apache.spark.sql.DataFrame) =
    df.select(col("k"), col("n_rows"), col("sum_v"), col("cnt_v"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getLong(2), r.getLong(3))).sortBy(_._1).toSeq

  test("incremental refresh equals a from-scratch aggregate across " +
    "appends, an upsert, and a MoR delete — and is O(delta)-shaped " +
    "(state history is upserts, never rewrites)") {
    val root = freshRoot()
    val t = s"$root/t"
    val mv = s"$root/mv"
    Snapshot.append(rows(0, 200), t)                      // v1
    Materialized.create(spark, t, mv, Seq("k"), Seq("v"))
    assert(collected(Materialized.read(spark, mv)) ==
      collected(recompute(t)))
    Snapshot.append(rows(200, 300), t)                    // v2
    Snapshot.mergeMor(rows(50, 60)
      .withColumn("v", col("v") + 100L), t, "id")         // v3 upsert
    Snapshot.deleteRangeMor(spark, t, "id", 120L, 180L)   // v4
    assert(Materialized.refresh(spark, t, mv) == Some((1L, 4L)))
    assert(collected(Materialized.read(spark, mv)) ==
      collected(recompute(t)))
    // the folds are merge-on-read upserts of touched keys — the
    // state table is never rewritten wholesale
    val actions = Snapshot.versions(spark, s"$mv/state").map(_._2)
    assert(actions == Seq("append", "merge-mor"), actions.toString)
    // up to date: nothing to fold
    assert(Materialized.refresh(spark, t, mv).isEmpty)
  }

  test("a key whose every row is deleted tombstones out of the view") {
    val root = freshRoot()
    val t = s"$root/t"
    val mv = s"$root/mv"
    // k-partitioned ids: k0 = ids 0..9, k1 = 10..19
    val d = (0 until 20).map(i =>
      (i.toLong, s"g${i / 10}", 1L)).toDF("id", "k", "v")
    Snapshot.append(d, t)
    Materialized.create(spark, t, mv, Seq("k"), Seq("v"))
    Snapshot.deleteRangeMor(spark, t, "id", 0L, 9L) // all of g0
    assert(Materialized.refresh(spark, t, mv).nonEmpty)
    val ks = Materialized.read(spark, mv).select(col("k"))
      .collect().map(_.getString(0)).toSeq
    assert(ks == Seq("g1"), s"tombstoned key still visible: $ks")
    // the tombstone row exists in state (n_rows = 0), filtered at read
    val raw = Snapshot.read(spark, s"$mv/state")
      .filter(col("k") === "g0").select(col("n_rows"))
      .collect().map(_.getLong(0)).toSeq
    assert(raw == Seq(0L))
    // vacuum reclaims it from storage (read was already clean)
    Materialized.vacuum(spark, mv)
    assert(Snapshot.read(spark, s"$mv/state")
      .filter(col("k") === "g0").count() == 0L)
    // …and the key re-enters through the normal new-key fold
    Snapshot.append(Seq((100L, "g0", 5L)).toDF("id", "k", "v"), t)
    Materialized.refresh(spark, t, mv)
    assert(collected(Materialized.read(spark, mv)) ==
      collected(recompute(t)))
  }

  test("crash replay folds exactly once: a window whose fold already " +
    "committed only advances the baseline, even if the table moved on") {
    val root = freshRoot()
    val t = s"$root/t"
    val mv = s"$root/mv"
    Snapshot.append(rows(0, 100), t)                      // v1
    Materialized.create(spark, t, mv, Seq("k"), Seq("v"))
    Snapshot.append(rows(100, 150), t)                    // v2
    assert(Materialized.refresh(spark, t, mv) == Some((1L, 2L)))
    val snap = collected(Materialized.read(spark, mv))
    // simulate the crash window: fold committed, baseline write lost
    SidecarIo.writeStringAtomic(spark, s"$mv/baseline.json",
      """{"version":1}""")
    // …and the base table already advanced past the crashed window
    Snapshot.append(rows(150, 170), t)                    // v3
    // replay resumes the PINNED (1, 2] window: no recompute (the
    // state is unchanged), baseline lands at 2
    assert(Materialized.refresh(spark, t, mv) == Some((1L, 2L)))
    assert(collected(Materialized.read(spark, mv)) == snap)
    // the NEXT refresh folds (2, 3] and catches up exactly
    assert(Materialized.refresh(spark, t, mv) == Some((2L, 3L)))
    assert(collected(Materialized.read(spark, mv)) ==
      collected(recompute(t)))
  }

  test("state that diverged from the change feed refuses loudly " +
    "instead of folding garbage") {
    val root = freshRoot()
    val t = s"$root/t"
    val mv = s"$root/mv"
    Snapshot.append(rows(0, 50), t)
    Materialized.create(spark, t, mv, Seq("k"), Seq("v"))
    Snapshot.deleteRangeMor(spark, t, "id", 0L, 49L) // delete ALL rows
    // sabotage: an external edit understates every stored count, so
    // the delete's fold must push keys below zero
    val state = s"$mv/state"
    Snapshot.overwrite(Snapshot.read(spark, state)
      .withColumn("n_rows", lit(1L)), state)
    val e = intercept[IllegalArgumentException] {
      Materialized.refresh(spark, t, mv)
    }
    assert(e.getMessage.contains("negative"), e.getMessage)
  }

  test("a FILTERED view restricts seed and delta identically: rows " +
    "outside the predicate never touch a key, in either direction") {
    val root = freshRoot()
    val t = s"$root/t"
    val mv = s"$root/mv"
    Snapshot.append(rows(0, 200), t)
    Materialized.create(spark, t, mv, Seq("k"), Seq("v"),
      filterSql = "v >= 3")
    val recomputeF = () => Snapshot.read(spark, t).filter(col("v") >= 3)
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_rows"),
        coalesce(sum(col("v")), lit(0L)).as("sum_v"),
        count(col("v")).as("cnt_v"))
    assert(collected(Materialized.read(spark, mv)) ==
      collected(recomputeF()))
    // the delta window holds in-view and out-of-view inserts AND
    // deletes; only the in-view rows may fold
    Snapshot.append(rows(200, 300), t)
    Snapshot.deleteRangeMor(spark, t, "id", 50L, 120L)
    assert(Materialized.refresh(spark, t, mv).nonEmpty)
    assert(collected(Materialized.read(spark, mv)) ==
      collected(recomputeF()))
  }

  test("maintain: vacuum + bin-pack + expire leave the view's " +
    "contents unchanged and reclaim files; a crashed window's " +
    "bookkeeping is finished before tags can expire") {
    val root = freshRoot()
    val t = s"$root/t"
    val mv = s"$root/mv"
    // id-blocked keys so a range delete can kill exactly one key
    val d = (0 until 200).map(i =>
      (i.toLong, s"g${i / 50}", (i % 9).toLong))
    Snapshot.append(d.take(150).toDF("id", "k", "v"), t)   // g0..g2
    Materialized.create(spark, t, mv, Seq("k"), Seq("v"))
    // refresh cycles accrete small state files + one tombstone
    Snapshot.append(d.drop(150).toDF("id", "k", "v"), t)   // g3
    Materialized.refresh(spark, t, mv)
    Snapshot.deleteRangeMor(spark, t, "id", 0L, 49L)       // all of g0
    Materialized.refresh(spark, t, mv)
    val pre = collected(Materialized.read(spark, mv))
    val preFiles = Snapshot.versions(spark, s"$mv/state").last._3
    // simulate the crash window right before maintenance: baseline
    // rewound while the fold's tag is the only proof it landed
    SidecarIo.writeStringAtomic(spark, s"$mv/baseline.json",
      """{"version":2}""")
    SidecarIo.writeStringAtomic(spark, s"$mv/intent.json",
      """{"since":2,"until":3}""")
    Materialized.maintain(spark, mv, graceMicros = 0L)
    // maintain finished the bookkeeping (no replay will refold)…
    assert(Materialized.refresh(spark, t, mv).isEmpty)
    // …contents are unchanged, files reclaimed, tombstones gone
    assert(collected(Materialized.read(spark, mv)) == pre)
    val post = Snapshot.versions(spark, s"$mv/state").last
    assert(post._3 <= preFiles)
    assert(Snapshot.read(spark, s"$mv/state")
      .filter(col("n_rows") === 0L).count() == 0L)
  }

  test("extended aggregates: min/max and approx-distinct fold " +
    "incrementally on insert-only keys, rescan exactly the delete-" +
    "touched groups, and revived keys never see stale extrema") {
    val root = freshRoot()
    val t = s"$root/t"
    val mv = s"$root/mv"
    def mk(ids: Range, k: String) =
      ids.map(i => (i.toLong, k, i.toLong)).toDF("id", "k", "v")
    def recomputeExt() = Snapshot.read(spark, t)
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_rows"),
        coalesce(sum(col("v")), lit(0L)).as("sum_v"),
        count(col("v")).as("cnt_v"),
        min(col("v")).as("min_v"), max(col("v")).as("max_v"),
        count_distinct(col("v")).as("ndv_v"))
    def canonExt(df: org.apache.spark.sql.DataFrame) =
      df.select(col("k"), col("n_rows"), col("sum_v"), col("cnt_v"),
        col("min_v"), col("max_v"), col("ndv_v"))
        .collect().map(_.toString).sorted.toSeq
    Snapshot.append(mk(0 until 50, "g0")
      .unionByName(mk(50 until 100, "g1")), t)             // v1
    Materialized.create(spark, t, mv, Seq("k"), Seq("v"),
      minMaxCols = Seq("v"), distinctCols = Seq("v"))
    assert(canonExt(Materialized.read(spark, mv))
      == canonExt(recomputeExt()))
    // INSERT-ONLY window: existing g0 grows, g2 is brand new — both
    // fold incrementally (monotone least/greatest + sketch union)
    Snapshot.append(mk(100 until 110, "g0")
      .unionByName(mk(110 until 130, "g2")), t)            // v2
    assert(Materialized.refresh(spark, t, mv).nonEmpty)
    assert(canonExt(Materialized.read(spark, mv))
      == canonExt(recomputeExt()))
    // DELETE touches g0's minimum rows: g0 must re-derive via the
    // targeted rescan (min jumps 0 -> 10); g1/g2 are untouched
    Snapshot.deleteRangeMor(spark, t, "id", 0L, 9L)        // v3
    assert(Materialized.refresh(spark, t, mv).nonEmpty)
    assert(canonExt(Materialized.read(spark, mv))
      == canonExt(recomputeExt()))
    assert(Materialized.read(spark, mv).filter(col("k") === "g0")
      .select(col("min_v")).head().getLong(0) == 10L)
    // kill ALL of g2 (tombstone via rescan), then revive it with one
    // far-away value: the revived extrema must be the fresh value,
    // never the stale pre-delete ones
    Snapshot.deleteRangeMor(spark, t, "id", 110L, 129L)    // v4
    assert(Materialized.refresh(spark, t, mv).nonEmpty)
    assert(Materialized.read(spark, mv).filter(col("k") === "g2")
      .count() == 0L)
    Snapshot.append(mk(500 until 501, "g2"), t)            // v5
    assert(Materialized.refresh(spark, t, mv).nonEmpty)
    val g2 = Materialized.read(spark, mv).filter(col("k") === "g2")
      .select(col("min_v"), col("max_v"), col("ndv_v")).head()
    assert((g2.getLong(0), g2.getLong(1), g2.getLong(2))
      == (500L, 500L, 1L), g2.toString)
    assert(canonExt(Materialized.read(spark, mv))
      == canonExt(recomputeExt()))
  }

  test("derived-key rollup: a computed bucket groups the view, the " +
    "delta derives it identically, and describe surfaces the " +
    "definition and freshness") {
    val root = freshRoot()
    val t = s"$root/t"
    val mv = s"$root/mv"
    def recomputeD() = Snapshot.read(spark, t)
      .withColumn("bucket", col("id") % 3)
      .filter(col("v") >= 1)
      .groupBy(col("k"), col("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        coalesce(sum(col("v")), lit(0L)).as("sum_v"),
        count(col("v")).as("cnt_v"))
    def canonD(df: org.apache.spark.sql.DataFrame) =
      df.select(col("k"), col("bucket"), col("n_rows"), col("sum_v"),
        col("cnt_v")).collect().map(_.toString).sorted.toSeq
    Snapshot.append(rows(0, 150), t)
    // derive THEN filter: the predicate may reference the derive
    Materialized.create(spark, t, mv, Seq("k", "bucket"), Seq("v"),
      filterSql = "v >= 1",
      deriveCols = Seq("bucket" -> "id % 3"))
    assert(canonD(Materialized.read(spark, mv)) == canonD(recomputeD()))
    Snapshot.append(rows(150, 220), t)
    Snapshot.deleteRangeMor(spark, t, "id", 40L, 90L)
    assert(Materialized.refresh(spark, t, mv).nonEmpty)
    assert(canonD(Materialized.read(spark, mv)) == canonD(recomputeD()))
    val props = Materialized.describe(spark, mv)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props("keys") == "k, bucket")
    assert(props("derives") == "bucket <- id % 3")
    assert(props("filter") == "v >= 1")
    assert(props("baseline_version") == "3")
  }

  test("the view rides a ROLLBACK: the rolled-away rows fold back " +
    "out (the CDC endpoint diff covers actions the chain-walk " +
    "doesn't model)") {
    val root = freshRoot()
    val t = s"$root/t"
    val mv = s"$root/mv"
    Snapshot.append(rows(0, 100), t)                   // v1
    Materialized.create(spark, t, mv, Seq("k"), Seq("v"))
    Snapshot.append(rows(100, 160), t)                 // v2
    assert(Materialized.refresh(spark, t, mv) == Some((1L, 2L)))
    Snapshot.rollback(spark, t, 1L)                    // v3 = v1 again
    assert(Materialized.refresh(spark, t, mv) == Some((2L, 3L)))
    assert(collected(Materialized.read(spark, mv)) ==
      collected(recompute(t)))
  }

  test("the view is MATERIALIZED: base-table commits do not show " +
    "until a refresh folds them") {
    val root = freshRoot()
    val t = s"$root/t"
    val mv = s"$root/mv"
    Snapshot.append(rows(0, 100), t)
    Materialized.create(spark, t, mv, Seq("k"), Seq("v"))
    val before = collected(Materialized.read(spark, mv))
    Snapshot.append(rows(100, 200), t)
    assert(collected(Materialized.read(spark, mv)) == before,
      "read rescanned the base table — that is a view, not a " +
        "materialization")
    Materialized.refresh(spark, t, mv)
    assert(collected(Materialized.read(spark, mv)) ==
      collected(recompute(t)))
  }
}
