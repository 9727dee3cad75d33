package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Triangle counting over an undirected graph — the local-density
  * primitive behind clustering coefficients, community seeding, and
  * link-spam detection (a link farm's graph is triangle-dense in a
  * way organic linking is not — the curation signal that pairs with
  * [[PageRank]]'s global authority).
  *
  * ==Scale shape: the degree-ordered "forward" algorithm==
  * The naive 3-way self-join explodes on skew (a hub of degree d
  * contributes d² candidate wedges). Orienting every edge from its
  * lower-(degree, id) endpoint to its higher one first —
  * Schank–Wagner / Suri–Vassilvitskii's MapReduce spelling — bounds
  * every vertex's OUT-adjacency at O(√m), so the wedge join
  * `oriented ⋈ oriented` on the middle vertex is skew-proof by
  * construction and the close step is one more equi-join against the
  * oriented edge set. Three shuffles total (degree agg, wedge join,
  * close join), each on plain 16-byte edge keys; no driver state.
  * Each triangle {a<b<c by (deg,id) order} materializes exactly once.
  */
object Triangles {

  /** Normalize to distinct undirected edges `(a, b)` with `a < b`;
    * self-loops dropped. */
  def undirect(edges: DataFrame, srcCol: String = "src",
               dstCol: String = "dst"): DataFrame =
    edges.select(
        least(col(srcCol), col(dstCol)).cast("long").as("a"),
        greatest(col(srcCol), col(dstCol)).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()

  /** Degree-oriented edge list `(u, v)`: each undirected edge points
    * from its lower-(degree, id) endpoint to the higher — the
    * orientation that bounds out-degrees at O(√m). */
  private[graph] def orient(und: DataFrame): DataFrame = {
    val deg = und.select(col("a").as("x"))
      .unionAll(und.select(col("b").as("x")))
      .groupBy(col("x")).agg(count(lit(1)).as("d"))
    und
      .join(deg.withColumnRenamed("x", "a").withColumnRenamed("d", "da"),
            Seq("a"))
      .join(deg.withColumnRenamed("x", "b").withColumnRenamed("d", "db"),
            Seq("b"))
      .select(
        when(col("da") < col("db") ||
             (col("da") === col("db") && col("a") < col("b")),
             struct(col("a").as("u"), col("b").as("v")))
          .otherwise(struct(col("b").as("u"), col("a").as("v")))
          .as("e"))
      .select(col("e.u"), col("e.v"))
  }

  /** Every triangle exactly once as `(u, v, w)`: `u` the triangle's
    * lowest-(degree, id) vertex (both wedge edges leave it), `v < w`
    * by plain id. One wedge self-join + ONE close membership
    * semi-join against the both-directions probe set (each
    * undirected edge lives in `o` in exactly one direction, so the
    * union can't double-match — no dedup needed).
    *
    * The oriented set is localCheckpoint-MATERIALIZED before the
    * joins: it is referenced three times (both wedge sides + the
    * close probe) and Spark replans each reference from the scan —
    * the plan audit that motivated this showed 90 parquet scans /
    * 127 shuffle stages for one triangle pass before the cut, 4
    * scans after. Swap for reliable checkpointing on a cluster. */
  def triangleList(edges: DataFrame, srcCol: String = "src",
                   dstCol: String = "dst"): DataFrame = {
    val o = orient(undirect(edges, srcCol, dstCol)).localCheckpoint()
    val wedges = o.as("e1")
      .join(o.as("e2"),
            col("e1.u") === col("e2.u") && col("e1.v") < col("e2.v"))
      .select(col("e1.u").as("u"), col("e1.v").as("v"),
              col("e2.v").as("w"))
    val probe = o.select(col("u").as("v"), col("v").as("w"))
      .unionAll(o.select(col("v").as("v"), col("u").as("w")))
    wedges.join(probe, Seq("v", "w"), "left_semi")
  }

  /** Per-vertex triangle participation `(id, n_triangles)` — every
    * vertex of every triangle credited once; vertices in no triangle
    * absent (join against nodes for a dense frame). One pass over
    * the triangle list: the three corners explode from each row
    * instead of a 3-way self-union that would recompute the wedge
    * join three times. */
  def vertexTriangles(edges: DataFrame, srcCol: String = "src",
                      dstCol: String = "dst"): DataFrame =
    triangleList(edges, srcCol, dstCol)
      .select(explode(array(col("u"), col("v"), col("w"))).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("n_triangles"))

  /** Global triangle count — one long. */
  def triangleCount(edges: DataFrame, srcCol: String = "src",
                    dstCol: String = "dst"): Long =
    triangleList(edges, srcCol, dstCol).count()
}
