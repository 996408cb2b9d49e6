package graft.queries

import graft.operators.Layout
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Data-layout oracle queries (round 9): Morton/Z-order keys over the
  * orders table. The oracle replays the integer normalization (`//`) and
  * the full shift/mask interleave term by term, so hash equality checks
  * the exact bit layout a file-clustering pass would sort by. */
object LayoutQueries {

  private val Bits = 16

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Q97: z-value of every order over (o_custkey, order date as epoch
    // days) — the two columns an orders lake would cluster by (customer
    // lookups AND date-range scans). Bounds derived from the corpus in
    // one aggregation; map-only interleave after that.
    "q97_zorder_key" -> ((s, d) => {
      val o = Tables.orders(s, d).select(col("o_orderkey"),
        col("o_custkey"),
        datediff(to_date(col("o_orderdate")), lit("1970-01-01"))
          .cast("long").as("o_day"))
      Layout.zValue(o, Seq("o_custkey", "o_day"), Bits)
        .select(col("o_orderkey"), col("zval"))
        .orderBy("o_orderkey")
    })
  )

  /** The interleave replay: bit i of normalized column j lands at
    * position i*2 + j, summed over i < Bits. */
  private def zorderSql(bits: Int): String = {
    def term(cExpr: String, i: Int, j: Int): String =
      s"((($cExpr >> $i) & 1) << ${i * 2 + j})"
    val xs = (0 until bits).map(i => term("xn", i, 0))
    val ys = (0 until bits).map(i => term("yn", i, 1))
    val sum = (xs ++ ys).mkString(" + ")
    s"""WITH o AS (SELECT o_orderkey, CAST(o_custkey AS BIGINT) AS x,
       |    CAST(date_diff('day', DATE '1970-01-01',
       |      CAST(o_orderdate AS DATE)) AS BIGINT) AS y
       |  FROM orders),
       |mm AS (SELECT min(x) AS xmn, max(x) AS xmx,
       |    min(y) AS ymn, max(y) AS ymx FROM o),
       |n AS (SELECT o_orderkey,
       |    (x - xmn) // (((xmx - xmn) // ${1L << bits}) + 1) AS xn,
       |    (y - ymn) // (((ymx - ymn) // ${1L << bits}) + 1) AS yn
       |  FROM o, mm)
       |SELECT o_orderkey, CAST($sum AS BIGINT) AS zval
       |FROM n ORDER BY o_orderkey""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "q97_zorder_key" -> zorderSql(Bits)
  )
}
