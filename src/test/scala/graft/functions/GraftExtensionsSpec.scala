package graft.functions

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("SQL callers can use simhash64 and shingles after registration") {
    import spark.implicits._
    GraftExtensions.register(spark)
    Seq((1L, Seq("a", "b", "c", "d"))).toDF("id", "toks")
      .createOrReplaceTempView("graft_ext_t")
    val row = spark.sql(
      "SELECT simhash64(toks) AS sig, shingles(toks, 2) AS sh FROM graft_ext_t")
      .head()
    val direct = Seq((1L, Seq("a", "b", "c", "d"))).toDF("id", "toks")
      .select(SimHash64.simhash64($"toks"), Shingles.shingles($"toks", 2))
      .head()
    assert(row.getLong(0) == direct.getLong(0))
    assert(row.getSeq[String](1) == direct.getSeq[String](1))
    assert(row.getSeq[String](1) == Seq("a b", "b c", "c d"))
  }

  test("SQL callers can use lang_id, script_hits, gopher_stats") {
    import spark.implicits._
    GraftExtensions.register(spark)
    Seq(("и вот он сказал что это не так как мы думали",
         "и вот он сказал что это не так как мы думали"))
      .toDF("text", "raw").createOrReplaceTempView("graft_ext_lang")
    val row = spark.sql(
      """SELECT lang_id(tokenize(text), text) AS lang,
                script_hits(text).n_cyrillic AS n_cyr,
                gopher_stats(text).n_words AS n_words
         FROM graft_ext_lang""").head()
    assert(row.getString(0) == "ru")
    assert(row.getLong(1) > 0L)
    assert(row.getLong(2) == 11L)
  }

  test("SQL callers can use repetition_stats after registration") {
    import spark.implicits._
    GraftExtensions.register(spark)
    Seq(("a b\na b\nc", Seq("a", "b", "a", "b", "c")))
      .toDF("text", "toks").createOrReplaceTempView("graft_ext_rep")
    val row = spark.sql(
      """SELECT repetition_stats(
           filter(transform(split(text, '\n'), l -> trim(l)), l -> l != ''),
           toks) AS r
         FROM graft_ext_rep""").head().getStruct(0)
    assert(row.getInt(0) == 3)                        // n_lines
    assert(math.abs(row.getDouble(1) - 1.0 / 3) < 1e-12) // dup_line_frac
  }

  test("SQL callers can use dot_product and pearson_maps") {
    GraftExtensions.register(spark)
    val row = spark.sql(
      """SELECT dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
                pearson_maps(map('a', 1.0D, 'b', 2.0D, 'c', 3.0D),
                             map('a', 2.0D, 'b', 4.0D, 'c', 6.0D)) AS r""")
      .head()
    assert(row.getDouble(0) == 11.0)
    assert(math.abs(row.getDouble(1) - 1.0) < 1e-12,
      "perfectly linear profiles must correlate at 1")
  }

  test("optimizer rule rewrites the HOF dot-product pattern to the kernel") {
    import org.apache.spark.sql.functions._
    GraftExtensions.register(spark)
    // table-backed input — a literal Seq would collapse to a
    // LocalRelation before any rewrite is observable
    val emb = graft.Tables.embeddings(spark, graft.TestSpark.sf0001)
    val df = emb.select(graft.similarity.Similarity
      .dotHof(col("embedding"), col("embedding")).as("d"))
    val optimized = df.queryExecution.optimizedPlan
    assert(optimized.expressions.exists(_.exists(_.isInstanceOf[DotProduct])),
      s"HOF pattern not rewritten:\n$optimized")
    // rewritten result == native kernel result, row for row
    val direct = emb.select(graft.similarity.Similarity
      .dot(col("embedding"), col("embedding")).as("d"))
    assert(df.exceptAll(direct).count() == 0)
    // a non-matching fold (different zero) must be left untouched
    val other = emb.select(aggregate(
      zip_with(col("embedding"), col("embedding"),
        (x, y) => x.cast("double") * y.cast("double")),
      lit(1.0), (acc, v) => acc + v).as("d"))
    assert(!other.queryExecution.optimizedPlan.expressions
      .exists(_.exists(_.isInstanceOf[DotProduct])))
  }

  test("uncast float-array HOF is NOT substituted (multiplies in float)") {
    import org.apache.spark.sql.functions._
    GraftExtensions.register(spark)
    // embeddings.embedding is array<float>; without explicit casts the
    // lambda multiplies in FLOAT and widens afterwards — numerically
    // different from the kernel's widen-then-multiply, so the rule must
    // leave it alone (ADVICE r3 / round-4 guard at
    // KernelSubstitution.scala:59)
    val emb = graft.Tables.embeddings(spark, graft.TestSpark.sf0001)
    val uncast = emb.select(aggregate(
      zip_with(col("embedding"), col("embedding"), (x, y) => x * y),
      lit(0.0), (acc, v) => acc + v).as("d"))
    assert(!uncast.queryExecution.optimizedPlan.expressions
      .exists(_.exists(_.isInstanceOf[DotProduct])),
      "float-form HOF must not be rewritten to the double kernel")
    // and it still evaluates (the guard only narrows the rewrite)
    assert(uncast.limit(5).collect().length == 5)
  }

  test("shingles rejects a non-literal k") {
    GraftExtensions.register(spark)
    import spark.implicits._
    Seq((1, Seq("a"))).toDF("k", "toks").createOrReplaceTempView("graft_ext_bad")
    val e = intercept[Exception] {
      spark.sql("SELECT shingles(toks, k) FROM graft_ext_bad").collect()
    }
    assert(e.getMessage.toLowerCase.contains("literal") ||
           e.getMessage.toLowerCase.contains("shingles"))
  }
}
