package graft.ops

import graft.Tables
import graft.functions.Exact
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Relational operator inventory (SURVEY.md §2.1–2.3, §2.6) re-expressed as
  * deterministic declared queries over the driver testdata.
  *
  * Determinism contract (SURVEY §7.7): every query ends in a total ORDER BY
  * and rounds computed doubles; raw passthrough doubles stay unrounded
  * (identical bits in both engines).
  *
  * Scale notes: all queries are declarative DataFrame plans — Catalyst does
  * column pruning + parquet predicate pushdown; aggregations are two-phase
  * (partial map-side); semi-joins use `left_semi` (never materialize the
  * right columns); the aggregated/"dim" sides of joins are small relative to
  * the fact table, so AQE/broadcast handles them without a full shuffle of
  * the big side where possible.
  */
object Relational {

  /** S1+P1+P2+O1 — scan, project, cast, alias, total order, limit.
    * Reference: customer_segmentation_1.py:16 (cast), splitting_data.py:20.
    * TakeOrderedAndProject: per-partition top-k, no global sort. */
  def scanProjectCast(spark: SparkSession, dir: String): DataFrame = {
    // (l_orderkey, l_linenumber) is NOT unique in the testdata (118K dup
    // groups at sf0.1) — the sort carries every projected column so the
    // limit boundary is tie-free (SURVEY §7.7 rule 2; remaining dups are
    // full-row-identical, which value-wise compare can't distinguish).
    Tables.lineitem(spark, dir)
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
               col("l_extendedprice"))
      .limit(100)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        col("l_partkey").cast("string").as("part_str"),
        col("l_extendedprice").as("price"))
  }

  /** F1+F3 — null-drop + threshold predicate (splitting_data.py:16,20).
    * Both predicates push down to the parquet scan. */
  def filterNotNullThreshold(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir)
      .na.drop(Seq("o_orderkey", "o_custkey", "o_totalprice"))
      .filter(col("o_totalprice") >= lit(50000.0))
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_orderkey"))
  }

  /** A1 — count per group (splitting_data.py:19 rating_count analog). */
  def groupByCount(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir)
      .groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("l_partkey"))
  }

  /** A2+A3 — avg+count in one agg (popularity_model.py:28-31). Output is
    * the bit-exact average via the integer-cents grid (Exact scaladoc). */
  def groupByAvgCount(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir)
      .groupBy(col("l_partkey"))
      .agg(Exact.sumCents(col("l_extendedprice")).as("sum_cents"),
           count(lit(1)).as("cnt"))
      .select(
        col("l_partkey"),
        Exact.avgFromCents(col("sum_cents"), col("cnt")).as("avg_price"),
        col("cnt"))
      .orderBy(col("l_partkey"))
  }

  /** J1/J2+D1+F3 — semi-join against an aggregated key list
    * (splitting_data.py:19-21: "popular movies" filter). Rebuilt as
    * `left_semi` — right columns are unused, so never shuffle them. */
  def semiJoinPopular(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val popular = li.groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= lit(30))
      .select(col("l_partkey"))
    li.join(popular, Seq("l_partkey"), "left_semi")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"))
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_partkey"))
  }

  /** J3 — left outer join against per-group scores (popularity_model.py:42).
    * The aggregated side is |custkeys| rows — broadcastable at any SF where
    * customers ≪ orders; Catalyst/AQE picks BroadcastHashJoin. */
  def leftJoinScores(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val scores = o.groupBy(col("o_custkey"))
      .agg(Exact.sumCents(col("o_totalprice")).as("sum_cents"),
           count(lit(1)).as("cnt"))
      .select(col("o_custkey"),
              Exact.avgFromCents(col("sum_cents"), col("cnt")).as("cust_avg"))
    o.select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .join(scores, Seq("o_custkey"), "left")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
              col("cust_avg"))
      .orderBy(col("o_orderkey"))
  }

  /** U1 — union of two disjoint filters (splitting_data.py:35). */
  def unionSplits(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_totalprice"))
    val lo = o.filter(col("o_totalprice") < lit(50000.0))
    val hi = o.filter(col("o_totalprice") >= lit(200000.0))
    lo.union(hi).orderBy(col("o_orderkey"))
  }

  /** D1 — distinct keys (splitting_data.py:27-28). */
  def distinctKeys(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir)
      .select(col("l_partkey")).distinct()
      .orderBy(col("l_partkey"))
  }

  /** O1+O2 — global top-k by value desc with unique tiebreak
    * (customer_segmentation_1.py:36-37). Fuses to TakeOrderedAndProject. */
  def orderByLimitTopK(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
  }

  /** A6 — per-group sorted list as joined string
    * (customer_segmentation_1.py:18). Raw collect_list order is
    * nondeterministic post-shuffle — always sort inside the array. */
  def collectListSorted(spark: SparkSession, dir: String): DataFrame = {
    Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(array_join(sort_array(collect_list(col("event_type"))), ",")
             .as("types"))
      .orderBy(col("user_id"))
  }

  /** J4+J5+F4+F5 — self-join user pairs sharing a key, theta-deduped
    * (customer_segmentation_2.py:23-33). Compact-first plan: fold each
    * user to ONE row carrying its distinct-key set (a single high-
    * cardinality shuffle), pair via [[Pairs.compactSelfPairs]] (broadcast
    * nested-loop, no shuffle), and count overlaps with a codegen'd
    * `array_intersect` — the key-equi-join form shuffles |pairs|·|keys|
    * intermediate rows through a 5-value (skew-salted) key instead. */
  def selfJoinPairs(spark: SparkSession, dir: String): DataFrame = {
    val sets = Tables.events(spark, dir)
      .groupBy(col("user_id").as("id"))
      .agg(collect_set(col("event_type")).as("ks"))
    Pairs.compactSelfPairs(sets, "id")
      .select(col("id_a").as("user_a"), col("id_b").as("user_b"),
              size(array_intersect(col("ks_a"), col("ks_b"))).as("n_common"))
      .filter(col("n_common") >= lit(2))
      .orderBy(col("user_a"), col("user_b"))
  }

  /** PR1 as a declared query: skew-proof all-pairs on the
    * 5-value event_type key via [[Pairs.saltedSelfPairs]] — identical
    * output to a plain self-equi-join (the oracle) but with
    * |keys|·numSalts join reducers instead of |keys|. Users sampled
    * deterministically (1 in 8) so the declared pair listing stays
    * bounded at every SF; the unsampled scale path is the same
    * operator (its naive-equivalence is PairsSpec-pinned). */
  def saltedPairsSampled(spark: SparkSession, dir: String): DataFrame = {
    val ue = Tables.events(spark, dir)
      .filter(col("user_id") % 8 === 0)
      .select(col("user_id"), col("event_type")).distinct()
    Pairs.saltedSelfPairs(ue, "event_type", "user_id")
      .select(col("key").as("event_type"),
              col("id_a"), col("id_b"))
      .orderBy(col("event_type"), col("id_a"), col("id_b"))
  }

  /** SP5 as a declared query: exact-k stratified sample — exactly
    * min(50, |stratum|) events per event_type, selected by the
    * seedless md5(event_id) permutation
    * ([[graft.pipelines.Splitting.stratifiedExactK]]); deterministic
    * on any engine, so unlike the Bernoulli sampler this one is
    * hash-oracled. */
  def stratifiedExactKEvents(spark: SparkSession, dir: String)
      : DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("event_type"), col("user_id"))
    graft.pipelines.Splitting.stratifiedExactK(
        ev, stratumCol = "event_type", k = 50, idCol = "event_id")
      .orderBy(col("event_type"), col("event_id"))
  }

  /** A7 — global aggregate, single row (customer_segmentation_2.py:41). */
  def globalAvg(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir)
      .agg(Exact.sumCents(col("l_extendedprice")).as("sum_cents"),
           count(lit(1)).as("cnt"))
      .select(
        Exact.avgFromCents(col("sum_cents"), col("cnt")).as("avg_price"),
        col("cnt"))
  }

  /** Snowflake dim chain: customer ⋈ nation ⋈ region, both dims
    * BROADCAST (regions/nations are tiny at any SF — the canonical
    * star-schema shape: the fact side never shuffles for the joins,
    * only the final rollup aggregates). Exact integer-cents balance
    * total (`Exact` — float sums diverge across engines). */
  def dimRollup(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    val r = Tables.region(spark, dir)
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_customers"),
           Exact.sumCents(col("c_acctbal")).as("acctbal_cents"))
      .orderBy(col("r_name"), col("n_name"))
  }

  /** Fact ⋈ two dims ⋈ dim-of-dim: lineitem ⋈ part ⋈ supplier ⋈
    * nation — per (brand, supplier nation) line counts, quantity and
    * exact revenue cents. All three dims broadcast; one fact shuffle
    * for the rollup. Quantities are integral (≤ 50), so a double sum
    * is exact until ~2⁵³/50 rows — cast to long for the portable
    * compare. */
  def partSupplierVolume(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_suppkey"), col("l_quantity"),
              col("l_extendedprice"))
    val p = Tables.part(spark, dir).select(col("p_partkey"), col("p_brand"))
    val s = Tables.supplier(spark, dir)
      .select(col("s_suppkey"), col("s_nationkey"))
    val n = Tables.nation(spark, dir)
      .select(col("n_nationkey"), col("n_name"))
    li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
      .join(broadcast(s), li("l_suppkey") === s("s_suppkey"))
      .join(broadcast(n), s("s_nationkey") === n("n_nationkey"))
      .groupBy(col("p_brand"), col("n_name"))
      .agg(count(lit(1)).as("n_lines"),
           sum(col("l_quantity")).cast("long").as("total_qty"),
           Exact.sumCents(col("l_extendedprice")).as("revenue_cents"))
      .orderBy(col("p_brand"), col("n_name"))
  }
}
