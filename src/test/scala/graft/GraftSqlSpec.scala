package graft

import graft.api.GraftSql
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** SQL-text surface: custom expressions callable from spark.sql match the
  * Column API exactly. */
class GraftSqlSpec extends SparkSpec {
  import spark.implicits._

  test("graft_hyperplane_bucket from SQL matches the Column API") {
    GraftSql.registerFunctions(spark)
    val emb = (0 until 50).map { i =>
      (i.toLong, Array.tabulate(32)(j => math.cos(i * 7 + j).toFloat))
    }.toDF("vec_id", "embedding")
    emb.createOrReplaceTempView("gsql_emb")
    val viaSql = spark.sql(
      "SELECT vec_id, graft_hyperplane_bucket(embedding, 8, 1) AS b " +
        "FROM gsql_emb")
    val viaApi = emb.select(col("vec_id"),
      Dedup.hyperplaneBucket(col("embedding"), 8, 1).as("b"))
    assert(viaSql.exceptAll(viaApi).isEmpty && viaApi.exceptAll(viaSql).isEmpty)
  }

  test("graft_sparse_diff + graft_apply_delta round-trip from SQL") {
    GraftSql.registerFunctions(spark)
    Seq((1L, Array(1.0f, 2.0f, 3.0f), Array(1.0f, 2.5f, 2.0f)))
      .toDF("id", "cur", "prev").createOrReplaceTempView("gsql_sd")
    val r = spark.sql(
      """SELECT s.n_changed AS n,
        |  graft_apply_delta(prev, map_from_arrays(s.idx,
        |    transform(s.val, x -> CAST(x AS DOUBLE)))) AS rebuilt
        |FROM (SELECT *, graft_sparse_diff(cur, prev, 0.01) AS s
        |      FROM gsql_sd)""".stripMargin)
      .as[(Int, Seq[Float])].collect().head
    assert(r._1 == 2) // dims 1 and 2 changed beyond threshold
    assert(r._2 == Seq(1.0f, 2.0f, 3.0f)) // delta applied to prev == cur
  }

  test("graft_hyperplane_bucket rejects non-constant size args") {
    GraftSql.registerFunctions(spark)
    Seq((1L, Array(1.0f))).toDF("vec_id", "embedding")
      .createOrReplaceTempView("gsql_emb2")
    val e = intercept[Exception] {
      spark.sql("SELECT graft_hyperplane_bucket(embedding, vec_id + 1, 0) " +
        "FROM gsql_emb2").collect()
    }
    assert(e.getMessage.contains("compile-time constant")
      || e.getCause != null)
  }

  test("graft_hyperplane_bucket accepts foldable constant size args") {
    GraftSql.registerFunctions(spark)
    val emb = (0 until 20).map { i =>
      (i.toLong, Array.tabulate(32)(j => math.cos(i * 7 + j).toFloat))
    }.toDF("vec_id", "embedding")
    emb.createOrReplaceTempView("gsql_emb3")
    // CAST(6 AS BIGINT) and 3+3 are constants after folding — both must
    // resolve to the same generated code as the plain literal 6
    val viaFold = spark.sql(
      "SELECT vec_id, graft_hyperplane_bucket(embedding, CAST(6 AS BIGINT), " +
        "1+1) AS b FROM gsql_emb3")
    val viaApi = emb.select(col("vec_id"),
      Dedup.hyperplaneBucket(col("embedding"), 6, 2).as("b"))
    assert(viaFold.exceptAll(viaApi).isEmpty
      && viaApi.exceptAll(viaFold).isEmpty)
  }

  test("GraftExtensions injects every function at session build") {
    import org.apache.spark.sql.SparkSession
    // the extensions deployment path: clear the session slots so
    // getOrCreate builds a FRESH session (over the same shared
    // SparkContext) and applies GraftExtensions at session build.
    // (`spark.sql.extensions` is a STATIC conf — read from the
    // SparkContext's conf, so on a pre-existing context the builder
    // route is `withExtensions`, the same hook the reflection path
    // calls.) Never stop() the result: that would stop the shared
    // context under every other suite.
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = try SparkSession.builder()
      .master("local[4]")
      .withExtensions(new graft.api.GraftExtensions())
      .getOrCreate()
    finally {
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
    assert(s2 ne spark); // a genuinely new session, built with the conf
    {
      val d = s2.sql(
        "SELECT graft_dot(array(CAST(1 AS FLOAT), CAST(2 AS FLOAT)), " +
          "array(CAST(3 AS FLOAT), CAST(4 AS FLOAT))) AS d")
        .collect().head.getDouble(0)
      assert(d == 11.0)
      val sh = s2.sql("SELECT graft_simhash(' a b a ') AS s")
        .collect().head.getLong(0)
      val shApi = spark.range(1).select(
          Dedup.simhashNative(lit(" a b a ")).as("s"))
        .collect().head.getLong(0)
      assert(sh == shApi)
      // every registered function resolvable, text kernels included
      for (fn <- Seq("graft_dot", "graft_hyperplane_bucket", "graft_minhash",
          "graft_simhash", "graft_l2_scale", "graft_apply_delta",
          "graft_sparse_diff", "graft_bpe_merge_count",
          "graft_bpe_merge_tokens", "graft_lang_scores",
          "graft_delete_variants")) {
        assert(s2.catalog.functionExists(fn), s"$fn not injected")
      }
    }
  }

  test("text kernels from SQL match the Column API (default artifacts)") {
    import graft.operators.TextAnalysis
    GraftSql.registerFunctions(spark)
    val t = "the spark data ation"
    val row = spark.sql(
      s"""SELECT graft_bpe_merge_count('$t') AS n,
        |  graft_bpe_merge_tokens('$t') AS seq,
        |  graft_lang_scores('${t.toUpperCase}') AS ls,
        |  graft_delete_variants('abc') AS v1,
        |  graft_delete_variants('abc', 2) AS v2""".stripMargin)
      .collect().head
    assert(row.getLong(0) == 6L)
    assert(row.getString(1) == "the spark data at i on")
    val api = TextAnalysis.langIdNgram(Seq((1L, t)).toDF("doc_id", "text"))
      .select("en_s", "de_s", "fr_s", "es_s")
      .as[(Long, Long, Long, Long)].collect().head
    assert(row.getSeq[Long](2) == Seq(api._1, api._2, api._3, api._4))
    assert(row.getSeq[String](3).toSet ==
      Set("abc", "bc", "ac", "ab"))
    assert(row.getSeq[String](4).toSet ==
      Set("abc", "bc", "ac", "ab", "c", "b", "a"))
  }
}
