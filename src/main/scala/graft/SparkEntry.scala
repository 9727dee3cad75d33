package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops.{Relational, Stats, Windows}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every key in `queries` is a deterministic DataFrame query over the
  * testdata dir; `oracleSql` carries the equivalent DuckDB SQL. Column
  * names are aliased identically on both sides (the driver sorts columns
  * by name before hashing). Computed doubles are rounded on both sides;
  * raw passthrough doubles are left untouched (bit-identical in both
  * engines).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Stats.dampedPopularity(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_scan_project_cast"       -> Relational.scanProjectCast _,
    "q_filter_notnull_threshold"-> Relational.filterNotNullThreshold _,
    "q_groupby_count"           -> Relational.groupByCount _,
    "q_groupby_avg_count"       -> Relational.groupByAvgCount _,
    "q_damped_popularity"       -> ((s, d) => Stats.dampedPopularity(s, d)),
    "q_semi_join_popular"       -> Relational.semiJoinPopular _,
    "q_left_join_scores"        -> Relational.leftJoinScores _,
    "q_window_row_number"       -> Windows.rowNumberPerGroup _,
    "q_window_rank_topk"        -> ((s, d) => Windows.rankTopKPerGroup(s, d)),
    "q_self_join_pairs"         -> Relational.selfJoinPairs _,
    "q_corr_per_pair"           -> Stats.corrPerPair _,
    "q_variance_filter"         -> Stats.varianceFilter _,
    "q_union_splits"            -> Relational.unionSplits _,
    "q_distinct_keys"           -> Relational.distinctKeys _,
    "q_orderby_limit_topk"      -> Relational.orderByLimitTopK _,
    "q_collect_list_sorted"     -> Relational.collectListSorted _,
    "q_above_mean_ground_truth" -> Stats.aboveMeanGroundTruth _,
    "q_global_avg"              -> Relational.globalAvg _,
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q_scan_project_cast" ->
      """SELECT l_orderkey, l_linenumber,
         CAST(l_partkey AS VARCHAR) AS part_str,
         l_extendedprice AS price
         FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 100""",
    "q_filter_notnull_threshold" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
         FROM orders
         WHERE o_orderkey IS NOT NULL AND o_custkey IS NOT NULL
           AND o_totalprice IS NOT NULL AND o_totalprice >= 50000.0
         ORDER BY o_orderkey""",
    "q_groupby_count" ->
      """SELECT l_partkey, count(*) AS cnt
         FROM lineitem GROUP BY l_partkey ORDER BY l_partkey""",
    "q_groupby_avg_count" ->
      """WITH g AS (SELECT l_partkey,
           sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS sum_cents,
           count(*) AS cnt FROM lineitem GROUP BY l_partkey)
         SELECT l_partkey,
           CAST(sum_cents AS DOUBLE) / (CAST(cnt AS DOUBLE) * 100.0)
             AS avg_price,
           cnt
         FROM g ORDER BY l_partkey""",
    "q_damped_popularity" ->
      """WITH g AS (SELECT l_partkey,
           sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS sum_cents,
           count(*) AS cnt FROM lineitem GROUP BY l_partkey)
         SELECT l_partkey,
           CAST(sum_cents AS DOUBLE) / (CAST(cnt AS DOUBLE) * 100.0)
             AS avg_price,
           cnt,
           (CAST(sum_cents AS DOUBLE) / 100.0) /
             (CAST(cnt AS DOUBLE) + 1000.0) AS damped_score
         FROM g ORDER BY l_partkey""",
    "q_semi_join_popular" ->
      """SELECT l_orderkey, l_linenumber, l_partkey
         FROM lineitem
         WHERE l_partkey IN (SELECT l_partkey FROM lineitem
                             GROUP BY l_partkey HAVING count(*) >= 30)
         ORDER BY l_orderkey, l_linenumber""",
    "q_left_join_scores" ->
      """WITH s AS (SELECT o_custkey,
           sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS sum_cents,
           count(*) AS cnt FROM orders GROUP BY o_custkey)
         SELECT o.o_orderkey, o.o_custkey, o.o_totalprice,
           CAST(s.sum_cents AS DOUBLE) / (CAST(s.cnt AS DOUBLE) * 100.0)
             AS cust_avg
         FROM orders o LEFT JOIN s USING (o_custkey)
         ORDER BY o.o_orderkey""",
    "q_window_row_number" ->
      """SELECT o_orderkey, o_custkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
         FROM orders ORDER BY o_custkey, rn""",
    "q_window_rank_topk" ->
      """SELECT * FROM (
           SELECT o_orderkey, o_custkey, o_totalprice,
           rank() OVER (PARTITION BY o_custkey
                        ORDER BY o_totalprice DESC) AS rnk
           FROM orders) t
         WHERE rnk <= 5 ORDER BY o_custkey, rnk, o_orderkey""",
    "q_self_join_pairs" ->
      """WITH ue AS (SELECT DISTINCT user_id, event_type FROM events)
         SELECT a.user_id AS user_a, b.user_id AS user_b,
                count(*) AS n_common
         FROM ue a JOIN ue b
           ON a.event_type = b.event_type AND a.user_id < b.user_id
         GROUP BY 1, 2 HAVING count(*) >= 2
         ORDER BY user_a, user_b""",
    "q_corr_per_pair" ->
      """WITH uv AS (SELECT user_id, event_type, avg(value) AS v
                     FROM events GROUP BY 1, 2)
         SELECT a.user_id AS user_a, b.user_id AS user_b,
                round(corr(a.v, b.v) + 0.000000001, 4) AS corr_v
         FROM uv a JOIN uv b
           ON a.event_type = b.event_type AND a.user_id < b.user_id
         GROUP BY 1, 2 HAVING corr(a.v, b.v) IS NOT NULL
         ORDER BY user_a, user_b""",
    "q_variance_filter" ->
      """WITH g AS (SELECT user_id, var_samp(value) AS var_raw,
                    count(*) AS cnt
                    FROM events WHERE value > 0.0 GROUP BY user_id)
         SELECT user_id,
           CAST(CAST(round(var_raw * cnt * (cnt - 1) * 10000) AS BIGINT)
                AS DOUBLE) /
           (CAST(cnt * (cnt - 1) AS DOUBLE) * 10000.0) AS var_value
         FROM g WHERE var_raw IS NOT NULL ORDER BY user_id""",
    "q_union_splits" ->
      """SELECT o_orderkey, o_totalprice FROM orders
         WHERE o_totalprice < 50000.0
         UNION ALL
         SELECT o_orderkey, o_totalprice FROM orders
         WHERE o_totalprice >= 200000.0
         ORDER BY o_orderkey""",
    "q_distinct_keys" ->
      """SELECT DISTINCT l_partkey FROM lineitem ORDER BY l_partkey""",
    "q_orderby_limit_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""",
    "q_collect_list_sorted" ->
      """SELECT user_id,
         string_agg(event_type, ',' ORDER BY event_type) AS types
         FROM events GROUP BY user_id ORDER BY user_id""",
    "q_above_mean_ground_truth" ->
      """WITH m AS (SELECT user_id,
           sum(CAST(round(value * 100) AS BIGINT)) AS sum_cents,
           count(*) AS cnt FROM events GROUP BY user_id)
         SELECT e.event_id, e.user_id, e.value
         FROM events e JOIN m USING (user_id)
         WHERE CAST(round(e.value * 100) AS BIGINT) * m.cnt > m.sum_cents
         ORDER BY e.event_id""",
    "q_global_avg" ->
      """WITH g AS (SELECT
           sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS sum_cents,
           count(*) AS cnt FROM lineitem)
         SELECT CAST(sum_cents AS DOUBLE) / (CAST(cnt AS DOUBLE) * 100.0)
           AS avg_price, cnt FROM g""",
  )
}
