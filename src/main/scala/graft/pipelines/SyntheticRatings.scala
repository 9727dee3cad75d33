package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Seeded MovieLens-SHAPED synthetic ratings for reproducing the
  * reference's published end-to-end numbers (BASELINE.md: split sizes,
  * popularity-vs-ALS NDCG ordering, twin-vs-random correlation
  * separation) without the MovieLens data itself (not shipped in this
  * environment).
  *
  * The generative model mirrors the STRUCTURE those numbers depend on,
  * with every draw a pure hash of (user, movie, tag) — deterministic,
  * partitioning-independent, no RNG state:
  *
  *  - C taste clusters: user u belongs to cluster u % C; movie m's
  *    "home" cluster is m % C. A rank-C latent structure that ALS can
  *    learn and a popularity ranker cannot — the source of the
  *    reference's ALS ≫ popularity NDCG gap (PDF pp.4-5).
  *  - Zipf-ish popularity: movie sampling is quadratic-skewed toward
  *    low ids, and low ids carry a positive rating bias — so the
  *    damped-mean popularity ranker has real (but bounded) signal,
  *    like MovieLens's blockbuster head.
  *  - Casual users (~10%) rate exactly the 8 flagship movies of their
  *    cluster — identical item sets, so MinHash twins with Jaccard 1.0
  *    exist organically, exactly the shape of the reference's top-100
  *    twin pairs (PDF p.3: all Jaccard 1.0). Their shared cluster
  *    affinity (vs independent per-user bias + noise) is what makes
  *    twin rating correlation beat random pairs.
  *
  * Scale: one `spark.range(nUsers)` explode — map-shaped, no shuffle
  * until the final distinct; generating 100× more rows changes
  * nothing structurally. */
object SyntheticRatings {

  /** Uniform [0,1) from a keyed hash — the library's standard seeded
    * draw (no RNG state, stable under repartitioning). */
  private def unif(cols: org.apache.spark.sql.Column*) =
    pmod(xxhash64(cols: _*), lit(1000000L)).cast("double") / 1000000.0

  /** @param nUsers   users (ids 0..n-1); ~10% casual
    * @param nMovies  movies (ids 0..m-1); low ids popular
    * @param clusters taste clusters (rank of the latent structure)
    * @param minHeavy/maxHeavy  ratings per non-casual user (hash-spread)
    */
  def generate(spark: SparkSession, nUsers: Int, nMovies: Int,
               clusters: Int = 8, minHeavy: Int = 50,
               maxHeavy: Int = 300, seed: Long = 42L): DataFrame = {
    require(nMovies % clusters == 0, "nMovies must divide into clusters")
    val users = spark.range(nUsers.toLong).toDF("userId")
      .withColumn("c", col("userId") % clusters)
      .withColumn("casual",
        pmod(xxhash64(col("userId"), lit(seed), lit(3)), lit(10)) === 0)
      .withColumn("n_u",
        when(col("casual"), lit(8))
          .otherwise((pmod(xxhash64(col("userId"), lit(seed), lit(5)),
                           lit((maxHeavy - minHeavy).toLong))
                      + minHeavy).cast("int")))
    val perMovie = nMovies / clusters
    val exploded = users
      .select(col("userId"), col("c"), col("casual"),
              explode(sequence(lit(0), col("n_u") - 1)).as("i"))
    // movie choice: casual users take their cluster's 8 flagships;
    // heavy users draw zipf-ish (quadratic) — 70% from the home
    // cluster, 30% global
    val r1 = unif(col("userId"), col("i"), lit(seed), lit(13))
    val r2 = unif(col("userId"), col("i"), lit(seed), lit(17))
    val homePick = col("c") + lit(clusters) *
      floor(lit(perMovie) * r2 * r2).cast("long")
    val globalPick = {
      val m = floor(lit(nMovies) * r2 * r2).cast("long")
      // align to ANY cluster uniformly (keep zipf rank, rotate home)
      m - (m % clusters) +
        pmod(xxhash64(col("userId"), col("i"), lit(seed), lit(19)),
             lit(clusters.toLong))
    }
    val withMovie = exploded.withColumn("movieId",
      when(col("casual"), col("c") + lit(clusters) * col("i"))
        .otherwise(when(r1 < 0.7, homePick).otherwise(globalPick)))
    // rating: base + a SMALL global movie bias + a per-(CLUSTER,
    // movie) preference + user bias + per-(u,m) noise, clamped to the
    // MovieLens 0.5..5.0 half-star grid. The variance budget is what
    // reproduces the reference's correlation structure (PDF p.3,
    // twins 0.1041 vs random 0.0409 — both LOW but ordered): the only
    // rating component two users SHARE over common movies is the
    // movie bias (small → random-pair corr near 0) plus, for
    // same-cluster pairs like twins, the cluster preference (moderate
    // → twin corr positive); per-(u,m) noise dominates both. ALS can
    // learn the rank-C preference table; a popularity ranker cannot —
    // the NDCG gap. Noise keys on (userId, movieId) ONLY, so a
    // duplicate draw of the same pair carries an identical rating and
    // distinct() is exact dedup, not a choice.
    val bM = lit(0.15) - lit(0.3) * col("movieId").cast("double") / nMovies
    val pref = (unif(col("movieId"), col("c"), lit(seed), lit(23)) - 0.5) * 1.4
    val uBias = (unif(col("userId"), lit(seed), lit(7)) - 0.5) * 0.6
    val noise = (unif(col("userId"), col("movieId"), lit(seed), lit(11))
                 - 0.5) * 1.0
    // base keeps the whole raw range inside (0.5, 5.0) — saturation
    // would hand casual users constant 5.0 rows (zero rating
    // variance, degenerate twin correlations)
    val raw = lit(3.2) + bM + pref + uBias + noise
    withMovie
      .withColumn("rating",
        least(lit(5.0), greatest(lit(0.5),
          round(raw * 2.0, 0) / 2.0)))
      .select(col("userId"), col("movieId"), col("rating"))
      .distinct()
  }
}
