package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, DataType, DoubleType, IntegerType, LongType, ShortType}

/** INCREMENTALLY-MAINTAINED AGGREGATES over a [[Snapshot]] table —
  * the materialized-view maintenance loop every reporting pipeline
  * writes by hand, done once and made crash-safe. A view is a
  * `GROUP BY keyCols` with `count(*)` plus `sum`/`count` per value
  * column (avg = sum/cnt at read); [[create]] computes it ONCE from
  * the table's pinned current version, and every [[refresh]] after
  * that consumes ONLY the table's net row changes since the last
  * refresh ([[Snapshot.readChangesBetween]] — the chain-walk CDC, so
  * appends cost their fresh files, MoR deletes cost their pruned
  * candidates, and an interleaved compaction costs NOTHING) and folds
  * the per-key delta into the stored state. At 100 TB this is the
  * difference between re-aggregating the table per refresh and paying
  * O(changed rows) + O(touched keys): a day's appends against a
  * year's table refresh in append-sized time.
  *
  * count/sum are fully SELF-MAINTAINABLE: invertible under the CDC's
  * insert/delete row algebra (+row / -row), so deletes fold without
  * ever rescanning the base table. min/max (`minMaxCols`) and
  * approx-distinct (`distinctCols`, a Datasketches HLL sketch per
  * key) are HALF-maintainable — monotone under inserts (least/
  * greatest folds; sketch union) but not invertible under deletes (a
  * deleted extremum or distinct member needs its group re-derived) —
  * so the refresh splits touched keys by the delta itself: keys whose
  * window was INSERT-ONLY fold incrementally like count/sum, and keys
  * any delete touched get a TARGETED GROUP RESCAN — the base table
  * read at the window's pinned end, semi-joined to exactly those
  * keys, re-aggregated. Cost stays bounded by the REscanned groups'
  * rows, never the table; with nothing extended configured the rescan
  * machinery never engages and every key folds incrementally.
  *
  * ==Layout under `mv`==
  *  - `state/` — a [[Snapshot]] table of the aggregate rows keyed by
  *    `__mv_key` (the null-safe concatenation of the key columns,
  *    stats+Bloom tracked, so the refresh's fold reads the state
  *    through point-pruned file scans);
  *  - `config.json` — keys + value columns + optional row filter,
  *    pinned at create;
  *  - `baseline.json` — the last table version folded into state.
  *
  * ==Crash safety (at-least-once, exactly-once effect)==
  * A refresh is one WRITE-AHEAD-pinned window folded by ONE tagged
  * state commit. The window `(since, until]` lands in `intent.json`
  * BEFORE any compute; a replay whose baseline still equals the
  * intent's `since` resumes that exact window even if the base table
  * advanced meanwhile (recomputing against a newer head would
  * double-apply the already-folded prefix). The fold commits as a
  * single merge-on-read upsert tagged `mv-<since>-<until>`, checked
  * FIRST on every refresh: if the tag already landed (crash after
  * the commit, before the baseline write), the replay only advances
  * the baseline — it must NOT recompute the fold, because the delta
  * re-derived against already-folded state would be wrong (that is
  * why vanished keys become `n_rows = 0` TOMBSTONE rows inside the
  * same commit, filtered at [[read]], rather than a second delete
  * commit: one commit ⇒ no partially-applied window exists).
  * Tombstones are reclaimed by [[vacuum]] (safe at any point: a
  * reclaimed key that later re-enters does so through the normal
  * new-key path, and a replayed window never recomputes a fold, so
  * it cannot miss a vacuumed-away old value).
  */
object Materialized {

  private val Sep = "\u001f"

  private final case class Config(keys: Seq[String], vals: Seq[String],
                                  filterSql: String = "",
                                  minmax: Seq[String] = Nil,
                                  distinct: Seq[String] = Nil,
                                  derives: Seq[(String, String)] = Nil) {
    def extended: Seq[String] = (minmax ++ distinct).distinct
  }

  /** The synthetic merge key: null-safe, collision-free across
    * null/empty ("v:" prefix vs the bare null sentinel). Key values
    * containing the 0x1F unit separator are the caller's documented
    * exclusion (as with any composite-key encoding). */
  private def mvKey(keys: Seq[String]) =
    concat_ws(Sep, keys.map(k =>
      coalesce(concat(lit("v:"), col(k).cast("string")),
        lit("null"))): _*)

  /** The view's row preparation, applied identically wherever table
    * rows enter the fold (create seed, CDC delta, targeted rescan):
    * DERIVED COLUMNS first (row-local SQL expressions, in declared
    * order so a derive may reference an earlier one — the time-bucket
    * rollup shape: `day <- date_trunc('day', ts)` as a GROUP key the
    * table never stored), then the row predicate (which may reference
    * the derived columns). Both must be row-local: an expression over
    * other rows cannot fold from a row delta. */
  private def prep(df: DataFrame, c: Config): DataFrame = {
    val derived = c.derives.foldLeft(df) { case (d, (n, sql)) =>
      d.withColumn(n, expr(sql)) }
    if (c.filterSql.isEmpty) derived
    else derived.filter(expr(c.filterSql))
  }

  /** The stored type of `sum_<v>`: integral columns sum EXACTLY as
    * long (a double mantissa silently drops low bits once a group's
    * sum passes 2^53 — certain at 100 TB), everything else (float/
    * double/decimal) as double. Derived consistently from the source
    * column's type wherever rows enter the fold, so seed, delta, and
    * rescan always agree on the state schema. */
  private def sumTypeOf(dt: DataType): DataType = dt match {
    case ByteType | ShortType | IntegerType | LongType => LongType
    case _ => DoubleType
  }

  private def sumZero(t: DataType): Column = lit(0).cast(t)

  /** Env-gated phase timer (`GRAFT_MV_TRACE=1`): diagnostic only. */
  private def dbg[A](name: String)(f: => A): A =
    if (!sys.env.contains("GRAFT_MV_TRACE")) f
    else {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(
        f"[mv] $name%-24s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }

  /** The state row's aggregate expressions over raw table rows —
    * shared by the create seed and the targeted group rescan so both
    * produce byte-identical shapes. `rowType` resolves a value
    * column's type on the INPUT frame (post-derive). */
  private def aggExprs(c: Config, rowType: String => DataType) =
    (count(lit(1)).as("n_rows") +:
      c.vals.flatMap { v =>
        val t = sumTypeOf(rowType(v))
        Seq(
          coalesce(sum(col(v).cast(t)), sumZero(t)).as(s"sum_$v"),
          count(col(v)).as(s"cnt_$v"))
      }) ++
      c.minmax.flatMap(m => Seq(
        min(col(m)).as(s"min_$m"), max(col(m)).as(s"max_$m"))) ++
      c.distinct.map(d => hll_sketch_agg(col(d)).as(s"hll_$d"))

  private def stateAgg(df: DataFrame, c: Config): DataFrame = {
    val p = prep(df, c)
    val exprs = aggExprs(c, v => p.schema(v).dataType)
    p.groupBy(c.keys.map(col): _*)
      .agg(exprs.head, exprs.tail: _*)
  }

  private def configOf(spark: SparkSession, mv: String): Config = {
    val s = SidecarIo.readString(spark, s"$mv/config.json").getOrElse(
      throw new NoSuchElementException(
        s"no materialized view at $mv (create first)"))
    val root = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(s)
    def arr(n: String): Seq[String] = {
      val b = Seq.newBuilder[String]
      root.path(n).elements()
        .forEachRemaining(e => b += e.asText())
      b.result()
    }
    val db = Seq.newBuilder[(String, String)]
    root.path("derives").elements().forEachRemaining(e =>
      db += e.path("name").asText() -> e.path("sql").asText())
    Config(arr("keys"), arr("vals"), root.path("filter").asText(""),
      arr("minmax"), arr("distinct"), db.result())
  }

  private def baselineOf(spark: SparkSession, mv: String): Long =
    SidecarIo.readString(spark, s"$mv/baseline.json")
      .map(s => new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(s).path("version").asLong(0L))
      .getOrElse(throw new NoSuchElementException(
        s"no baseline at $mv — create first"))

  /** Create the view at `mv`: one full aggregate of `table`'s
    * CURRENT version (pinned before the scan — a commit racing the
    * create lands in the first refresh window, never half in the
    * initial state). `sumCols` must be numeric columns of the
    * table. `filterSql` (optional, ANSI SQL over the table's columns,
    * pinned in the config) makes it a FILTERED view: the predicate
    * restricts the seed aggregate and every refresh delta
    * identically; it must be row-local (a predicate over other rows
    * cannot fold from a row delta) and must not reference columns a
    * later schema change renames (re-create the view after
    * non-additive evolution, as with key/value columns). `deriveCols`
    * are named row-local SQL expressions computed before the filter
    * and usable as keys/values — the time-bucket rollup shape
    * (`("day", "date_trunc('day', ts)")` as a GROUP key the table
    * never stored); declared order matters (a derive may reference an
    * earlier one).
    *
    * RE-RUNNABLE like refresh (the [[graft.streaming
    * .MaterializedIngest]] lazy-create path replays it on a crashed
    * micro-batch): the pinned version is write-ahead recorded
    * (`createpin.json`) so a replay re-aggregates the SAME snapshot,
    * the seed commit is tagged (`mv-create` — a replay's append
    * dedupes instead of double-seeding), and config/baseline writes
    * are idempotent rewrites of the same content. `config.json` is
    * written LAST of the two markers refresh reads, so a half-created
    * view is invisible to [[refresh]]/[[read]] until the seed state
    * actually exists. */
  def create(spark: SparkSession, table: String, mv: String,
             keyCols: Seq[String], sumCols: Seq[String],
             filterSql: String = "",
             minMaxCols: Seq[String] = Nil,
             distinctCols: Seq[String] = Nil,
             deriveCols: Seq[(String, String)] = Nil): Unit = {
    require(keyCols.nonEmpty, "at least one group-by key")
    require(keyCols.intersect(
      sumCols ++ minMaxCols ++ distinctCols).isEmpty,
      "a column cannot be both key and value")
    require(SidecarIo.readString(spark, s"$mv/config.json").isEmpty,
      s"materialized view already exists at $mv")
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val cur = SidecarIo.readString(spark, s"$mv/createpin.json")
      .map(om.readTree(_).path("version").asLong(-1L))
      .filter(_ >= 0L)
      .getOrElse {
        val v = Snapshot.latestVersion(spark, table).getOrElse(
          throw new IllegalStateException(
            s"no committed snapshot in $table"))
        SidecarIo.writeStringAtomic(spark, s"$mv/createpin.json",
          s"""{"version":$v}""")
        v
      }
    require(deriveCols.map(_._1).distinct.size == deriveCols.size,
      "duplicate derived-column names")
    val c = Config(keyCols, sumCols, filterSql, minMaxCols,
      distinctCols, deriveCols)
    val st = stateAgg(Snapshot.read(spark, table, Some(cur)), c)
      .withColumn("__mv_key", mvKey(keyCols))
    Snapshot.append(st, s"$mv/state", tag = Some("mv-create"),
      statsCols = Seq("__mv_key"), bloomCols = Seq("__mv_key"))
    val root = om.createObjectNode()
    val ka = root.putArray("keys"); keyCols.foreach(ka.add)
    val va = root.putArray("vals"); sumCols.foreach(va.add)
    if (filterSql.nonEmpty) root.put("filter", filterSql)
    if (minMaxCols.nonEmpty) {
      val ma = root.putArray("minmax"); minMaxCols.foreach(ma.add)
    }
    if (distinctCols.nonEmpty) {
      val da = root.putArray("distinct"); distinctCols.foreach(da.add)
    }
    if (deriveCols.nonEmpty) {
      val xa = root.putArray("derives")
      deriveCols.foreach { case (n, sql) =>
        val o = xa.addObject(); o.put("name", n); o.put("sql", sql) }
    }
    SidecarIo.writeStringAtomic(spark, s"$mv/baseline.json",
      s"""{"version":$cur}""")
    SidecarIo.writeStringAtomic(spark, s"$mv/config.json",
      om.writeValueAsString(root))
  }

  /** Fold the table's net changes since the last refresh into the
    * stored state. O(changed rows) to compute the per-key delta,
    * O(touched keys) to fold: only state rows whose key actually
    * changed are read (semi-join; the state table's `__mv_key`
    * stats/Blooms prune at file level) and only those keys rewrite
    * (merge-on-read upsert). Returns the folded `(since, until]`
    * window, or None when already up to date. */
  def refresh(spark: SparkSession, table: String,
              mv: String): Option[(Long, Long)] = {
    val c = configOf(spark, mv)
    val since = baselineOf(spark, mv)
    val state = s"$mv/state"
    // the WRITE-AHEAD window pin: a crashed refresh resumes ITS
    // window, not whatever the table head is by replay time — the
    // crashed run's fold may already be committed for the old window
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val pinned = SidecarIo.readString(spark, s"$mv/intent.json")
      .map(om.readTree)
      .filter(_.path("since").asLong(-1L) == since)
      .map(_.path("until").asLong(-1L))
    val until = pinned.getOrElse {
      val u = Snapshot.latestVersion(spark, table).getOrElse(
        throw new IllegalStateException(
          s"no committed snapshot in $table"))
      if (u > since)
        SidecarIo.writeStringAtomic(spark, s"$mv/intent.json",
          s"""{"since":$since,"until":$u}""")
      u
    }
    if (until <= since) return None
    val tag = s"mv-$since-$until"
    if (Snapshot.tagVersion(spark, state, tag).nonEmpty) {
      // the crashed run's fold is already committed — recomputing it
      // against the folded state would be wrong; just finish the
      // bookkeeping it never reached
      SidecarIo.writeStringAtomic(spark, s"$mv/baseline.json",
        s"""{"version":$until}""")
      return Some((since, until))
    }
    // derives + predicate prepare the DELTA exactly as they prepared
    // the seed: a changed row outside the view never touches a key,
    // and derived group keys exist on the delta rows too
    val ch = dbg("cdc-plan")(prep(
      Snapshot.readChangesBetween(spark, table, since, until), c))
    val sign = when(col("_change") === "insert", lit(1L))
      .otherwise(lit(-1L))
    val ins = col("_change") === "insert"
    val extendedDeltaCols =
      if (c.extended.isEmpty) Nil
      else
        // which keys a DELETE touched (they need the group rescan for
        // the half-maintainable aggregates), plus the insert-side
        // folds for keys that stay incremental
        coalesce(max(when(ins, lit(0)).otherwise(lit(1))), lit(0))
          .as("__has_del") +:
          (c.minmax.flatMap(m => Seq(
            min(when(ins, col(m))).as(s"__imin_$m"),
            max(when(ins, col(m))).as(s"__imax_$m"))) ++
            c.distinct.map(d =>
              hll_sketch_agg(when(ins, col(d))).as(s"__ihll_$d")))
    val sumT: Map[String, DataType] =
      c.vals.map(v => v -> sumTypeOf(ch.schema(v).dataType)).toMap
    val delta = dbg("delta-exec")(ch.groupBy(c.keys.map(col): _*)
      .agg(sum(sign).as("__dn"),
        c.vals.flatMap { v =>
          val t = sumT(v)
          Seq(
            coalesce(sum(sign * col(v).cast(t)).cast(t), sumZero(t))
              .as(s"__dsum_$v"),
            coalesce(sum(when(col(v).isNotNull, sign)
              .otherwise(lit(0L))), lit(0L)).as(s"__dcnt_$v"))
        } ++
          extendedDeltaCols: _*)
      .withColumn("__mv_key", mvKey(c.keys))
      // MATERIALIZED once (guide §3.3 — truncate enormous plans): the
      // fold below references the delta several times (touched-key
      // semi-join, the outer fold, and the rescan split), and without
      // the cut each reference embeds its own copy of the whole
      // chain-walk CDC subtree — Catalyst re-optimizes it per copy
      // and the driver pays seconds of planning for an O(touched
      // keys) frame. The checkpoint is delta-sized, never table-sized.
      .localCheckpoint())
    // old values of ONLY the touched keys: the broadcast semi-join
    // side is delta-sized; at scale the state read itself is file-
    // pruned by the __mv_key Blooms gathered at every state commit.
    // (already distinct: one delta row per group key)
    val touched = delta.select(col("__mv_key"))
    val old = Snapshot.read(spark, state)
      .join(touched, Seq("__mv_key"), "left_semi")
    val oldK = old.columns.filterNot(_ == "__mv_key")
      .foldLeft(old)((d, n) => d.withColumnRenamed(n, s"__old_$n"))
    val folded0 = delta.join(oldK, Seq("__mv_key"), "left_outer")
    val keyExprs = c.keys.map(k =>
      coalesce(col(s"__old_$k"), col(k)).as(k))
    // the incremental fold: count/sum always; min/max via least/
    // greatest and sketches via union — sound for these rows because
    // their window held only inserts (monotone folds)
    def incSelect(df: DataFrame) = df.select(
      keyExprs ++
        (Seq((coalesce(col("__old_n_rows"), lit(0L)) + col("__dn"))
          .as("n_rows")) ++
          c.vals.flatMap(v => Seq(
            (coalesce(col(s"__old_sum_$v"), sumZero(sumT(v))) +
              col(s"__dsum_$v")).cast(sumT(v)).as(s"sum_$v"),
            (coalesce(col(s"__old_cnt_$v"), lit(0L)) +
              col(s"__dcnt_$v")).as(s"cnt_$v"))) ++
          c.minmax.flatMap(m => Seq(
            least(col(s"__old_min_$m"), col(s"__imin_$m"))
              .as(s"min_$m"),
            greatest(col(s"__old_max_$m"), col(s"__imax_$m"))
              .as(s"max_$m"))) ++
          c.distinct.map { d =>
            val o = col(s"__old_hll_$d"); val i = col(s"__ihll_$d")
            when(o.isNull, i).when(i.isNull, o)
              .otherwise(hll_union(o, i)).as(s"hll_$d")
          }) :+
        col("__mv_key"): _*)
    val badObs = new org.apache.spark.sql.Observation()
    val folded =
      (if (c.extended.isEmpty) incSelect(folded0)
       else {
         val inc = incSelect(folded0.filter(col("__has_del") === 0))
         // TARGETED GROUP RESCAN for delete-touched keys: the base
         // table AT THE WINDOW'S PINNED END (deterministic under
         // replay), restricted to exactly those keys — cost bounded
         // by those groups' rows, never the table
         val rescanKeys = folded0.filter(col("__has_del") === 1)
           .select(col("__mv_key") +: keyExprs: _*)
         val rescanned = stateAgg(
           prep(Snapshot.read(spark, table, Some(until)), c)
             .withColumn("__mv_key", mvKey(c.keys))
             .join(rescanKeys.select(col("__mv_key")), Seq("__mv_key"),
               "left_semi"),
           // derives/filter already ran; the derived columns are real
           // columns on this frame now
           c.copy(filterSql = "", derives = Nil))
           .withColumn("__mv_key", mvKey(c.keys))
         // keys the rescan found nothing for are fully deleted —
         // they tombstone (n_rows = 0) exactly like the incremental
         // path's vanished keys
         val rescanCols = rescanned.columns.filterNot(_ == "__mv_key")
         val resK = rescanCols.foldLeft(rescanned)((d, n) =>
           d.withColumnRenamed(n, s"__re_$n"))
         val resFolded = rescanKeys
           .join(resK, Seq("__mv_key"), "left_outer")
           .select(
             c.keys.map(k => coalesce(col(s"__re_$k"), col(k)).as(k)) ++
               (Seq(coalesce(col("__re_n_rows"), lit(0L))
                 .as("n_rows")) ++
                 c.vals.flatMap(v => Seq(
                   coalesce(col(s"__re_sum_$v"), sumZero(sumT(v)))
                     .as(s"sum_$v"),
                   coalesce(col(s"__re_cnt_$v"), lit(0L))
                     .as(s"cnt_$v"))) ++
                 c.minmax.flatMap(m => Seq(
                   col(s"__re_min_$m").as(s"min_$m"),
                   col(s"__re_max_$m").as(s"max_$m"))) ++
                 c.distinct.map(d =>
                   col(s"__re_hll_$d").as(s"hll_$d"))) :+
               col("__mv_key"): _*)
         inc.unionByName(resFolded)
       })
      // the divergence check OBSERVES the checkpoint job itself (a
      // CollectMetrics side-channel) instead of running its own count
      .observe(badObs,
        count(when(col("n_rows") < 0L, lit(1))).as("bad"))
      .localCheckpoint() // one materialization: the fold feeds a
                         // delete AND an upsert, and both must see
                         // the same rows
    val bad = badObs.get("bad").asInstanceOf[Long]
    require(bad == 0L,
      s"$bad keys folded to negative counts — the state at $mv has " +
        s"diverged from $table's change feed (skipped window or " +
        "external edit); drop and re-create the view")
    // ONE tagged commit: fully-deleted keys ride along as n_rows = 0
    // tombstones (filtered at read) so there is no second commit a
    // crash could separate from this one
    dbg("state-upsert")(
      Snapshot.mergeMor(folded, state, "__mv_key", tag = Some(tag)))
    SidecarIo.writeStringAtomic(spark, s"$mv/baseline.json",
      s"""{"version":$until}""")
    Some((since, until))
  }

  /** The view's current contents: key columns, `n_rows`,
    * `sum_<v>`/`cnt_<v>` per value column (avg = sum/cnt),
    * `min_<m>`/`max_<m>` per min-max column, and `ndv_<d>` (the HLL
    * estimate, 0 for all-null groups) per distinct column — the raw
    * sketch bytes stay internal. Reads the state table only — never
    * the base table. Tombstoned keys (every row deleted since the
    * last fold) are filtered out. */
  def read(spark: SparkSession, mv: String): DataFrame = {
    val c = configOf(spark, mv)
    val base = Snapshot.read(spark, s"$mv/state")
      .filter(col("n_rows") > 0L)
    c.distinct.foldLeft(base)((d, dc) =>
      d.withColumn(s"ndv_$dc",
        coalesce(hll_sketch_estimate(col(s"hll_$dc")), lit(0L))))
      .drop(c.distinct.map(d => s"hll_$d"): _*)
      .drop("__mv_key")
  }

  /** The view's definition and freshness as a small key/value frame
    * (driver-built — the config, pin, and manifest are already tiny
    * reads; no state data file is opened): keys/values/filter/
    * derives/extended columns, the folded baseline version, and the
    * state table's current version and stored row count (live keys +
    * tombstones). The operational questions this answers ("what IS
    * this view", "how far behind is it", "how much tombstone debt")
    * otherwise need ad-hoc sidecar parsing. */
  def describe(spark: SparkSession, mv: String): DataFrame = {
    import spark.implicits._
    val c = configOf(spark, mv)
    val baseline = baselineOf(spark, mv)
    val stateV = Snapshot.versions(spark, s"$mv/state").lastOption
    Seq(
      "keys" -> c.keys.mkString(", "),
      "sum_cols" -> c.vals.mkString(", "),
      "filter" -> c.filterSql,
      "minmax_cols" -> c.minmax.mkString(", "),
      "distinct_cols" -> c.distinct.mkString(", "),
      "derives" -> c.derives.map { case (n, q) => s"$n <- $q" }
        .mkString("; "),
      "baseline_version" -> baseline.toString,
      "state_version" -> stateV.map(_._1.toString).getOrElse(""),
      "state_rows" -> stateV.map(_._4.toString).getOrElse("")
    ).toDF("property", "value")
  }

  /** Reclaim tombstones (state rows a fold drove to `n_rows = 0`,
    * invisible to [[read]] but still stored): one merge-on-read
    * key delete against the state table. Tombstone mass is bounded
    * by keys that ever fully vanished, so this is occasional
    * maintenance, not part of the refresh path — and it is safe at
    * ANY point relative to crashes: a replayed window short-circuits
    * on its commit tag (never recomputing a fold that could miss the
    * vacuumed row), and a reclaimed key that re-enters later takes
    * the normal new-key path. Returns the state version. */
  def vacuum(spark: SparkSession, mv: String): Long = {
    val state = s"$mv/state"
    Snapshot.deleteKeysMor(
      Snapshot.read(spark, state).filter(col("n_rows") === 0L)
        .select(col("__mv_key")), state)
  }

  /** The state table's whole maintenance pass in one call, on the
    * cadence a deployment schedules anyway: [[vacuum]] tombstones,
    * fold the accumulated per-refresh micro-files ([[Snapshot
    * .compactSmall]] — each fold lands one small upsert commit, so a
    * long-lived view accretes exactly the small-file pattern
    * compactSmall exists for, and the fold also folds the vacuum's
    * MoR delete), then [[Snapshot.expire]] old state versions and
    * orphans. Run it BETWEEN refreshes (the single-maintainer
    * contract: maintenance and refresh race the same state head;
    * interleaved REFRESH appends would carry forward, but the
    * maintainer is one loop anyway). Read results are unchanged by
    * construction (spec-pinned). */
  def maintain(spark: SparkSession, mv: String,
               smallBytes: Long = 32L << 20,
               keepLast: Int = 2,
               graceMicros: Long = 600_000_000L): Unit = {
    val state = s"$mv/state"
    // FIRST finish any crashed window's bookkeeping: the expire below
    // may drop the manifest whose tag is the only proof that window's
    // fold landed — a later replay that cannot find the tag would
    // recompute the fold against folded state. Same short-circuit as
    // refresh, doable here because intent.json carries the window.
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val since = baselineOf(spark, mv)
    SidecarIo.readString(spark, s"$mv/intent.json")
      .map(om.readTree)
      .filter(_.path("since").asLong(-1L) == since)
      .map(_.path("until").asLong(-1L))
      .filter(u => u > since &&
        Snapshot.tagVersion(spark, state, s"mv-$since-$u").nonEmpty)
      .foreach(u => SidecarIo.writeStringAtomic(spark,
        s"$mv/baseline.json", s"""{"version":$u}"""))
    vacuum(spark, mv)
    Snapshot.compactSmall(spark, state, smallBytes = smallBytes)
    Snapshot.expire(spark, state, keepLast = keepLast,
      graceMicros = graceMicros): Unit
  }
}
