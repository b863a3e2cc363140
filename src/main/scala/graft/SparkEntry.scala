package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.AutoFeatLight
import graft.time.{PointInTime, TranscriptGen}

/** Driver contract — one `queries` entry (+ DuckDB oracle where ANSI-SQL
  * expressible) per implemented operator from SURVEY.md §2.
  *
  * Column names are aliased identically on both sides (the driver sorts
  * columns by name before hashing). Doubles that pass through aggregate or
  * libm paths are rounded to 6 decimals on BOTH sides to absorb ulp-level
  * engine differences; pure pass-through/arithmetic values are left exact.
  */
object SparkEntry {

  /** Flagship: transcript table -> point-in-time base features ->
    * AutoFeatLight widening (ratios+products). Driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame = {
    val turns = TranscriptGen.generate(spark, nConvs = 200, meanTurns = 20, seed = 42)
    val base = PointInTime.baseFeatures(turns.toDF())
    val feats = Seq("text_len", "secs_since_prev", "turns_so_far", "cum_text_len")
    AutoFeatLight.withAdditional(
      base.select(feats.map(c => col(c).cast("double")): _*), feats,
      ratio = true, product = true)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- point-in-time layer: lag / cumulative / sessionization (§2.10)
    "q_pit_events" -> ((s, dir) => {
      val e = s.read.parquet(s"$dir/events.parquet")
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val tsSecs = unix_timestamp(col("ts"))
      val gap = tsSecs - lag(tsSecs, 1).over(w)
      e.select(
        col("user_id"), col("event_id"),
        tsSecs.as("ts_secs"),
        row_number().over(w).cast("long").as("rn"),
        coalesce(lag(col("value"), 1).over(w), lit(0.0)).as("prev_value"),
        round(sum(col("value")).over(cum), 6).as("cum_value"),
        sum(when(gap > 3600, 1L).otherwise(0L)).over(cum).as("session_id"),
        first(col("event_type")).over(cum).as("first_event_type")
      )
    }),

    // ---- AutoFeatLight pairwise ratios/products (§2.9)
    "q_light_pairs" -> ((s, dir) => {
      val li = s.read.parquet(s"$dir/lineitem.parquet")
      val base = li.select(col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
        col("l_quantity"), col("l_discount"))
      val widened = AutoFeatLight.withAdditional(
        base, Seq("l_quantity", "l_discount"), ratio = true, product = true,
        keep = Seq("l_orderkey", "l_linenumber"))
      widened.select(col("l_orderkey"), col("l_linenumber"),
        col("`l_discount / l_quantity`").as("ratio_dq"),
        col("`l_quantity / l_discount`").as("ratio_qd"),
        col("`l_quantity * l_discount`").as("prod_qd"))
    }),

    // ---- nan-aware standard scaling (§2.2)
    "q_scale" -> ((s, dir) => {
      val li = s.read.parquet(s"$dir/lineitem.parquet")
      val st = graft.stats.Scaling.stats(li, Seq("l_quantity", "l_extendedprice"))
      li.select(
        col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
        round((col("l_quantity") - lit(st.mean(0))) / lit(st.stdPop(0)), 6).as("q_scaled"),
        round((col("l_extendedprice") - lit(st.mean(1))) / lit(st.stdPop(1)), 6).as("p_scaled"))
    }),

    // ---- unary transform math (§2.3: log/sqrt/1//^2 guarded by data)
    "q_transforms" -> ((s, dir) => {
      val li = s.read.parquet(s"$dir/lineitem.parquet")
      li.select(
        col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
        round(log(col("l_quantity")), 6).as("log_q"),
        round(sqrt(col("l_quantity")), 6).as("sqrt_q"),
        round(lit(1.0) / col("l_extendedprice"), 9).as("recip_p"),
        (col("l_quantity") * col("l_quantity")).as("sq_q"))
    })
  )

  def oracleSql: Map[String, String] = Map(

    "q_pit_events" ->
      """SELECT user_id, event_id, ts_secs, rn, prev_value, cum_value,
        |  CAST(SUM(gap_flag) OVER wc AS BIGINT) AS session_id, first_event_type
        |FROM (
        |  SELECT user_id, event_id, ts,
        |    CAST(FLOOR(epoch(ts)) AS BIGINT) AS ts_secs,
        |    CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn,
        |    COALESCE(LAG(value, 1) OVER w, 0.0) AS prev_value,
        |    ROUND(SUM(value) OVER wc0, 6) AS cum_value,
        |    CASE WHEN FLOOR(epoch(ts)) - LAG(FLOOR(epoch(ts))) OVER w > 3600 THEN 1 ELSE 0 END AS gap_flag,
        |    FIRST_VALUE(event_type) OVER wc0 AS first_event_type
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id),
        |    wc0 AS (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |)
        |WINDOW wc AS (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin,

    "q_light_pairs" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
        |  CASE WHEN l_quantity = 0 THEN 0.0 ELSE (1.0 / l_quantity) * l_discount END AS ratio_dq,
        |  CASE WHEN l_discount = 0 THEN 0.0 ELSE (1.0 / l_discount) * l_quantity END AS ratio_qd,
        |  l_quantity * l_discount AS prod_qd
        |FROM lineitem""".stripMargin,

    "q_scale" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
        |  ROUND((l_quantity - m.mq) / m.sq, 6) AS q_scaled,
        |  ROUND((l_extendedprice - m.mp) / m.sp, 6) AS p_scaled
        |FROM lineitem, (SELECT AVG(l_quantity) AS mq, STDDEV_POP(l_quantity) AS sq,
        |                       AVG(l_extendedprice) AS mp, STDDEV_POP(l_extendedprice) AS sp
        |                FROM lineitem) m""".stripMargin,

    "q_transforms" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
        |  ROUND(LN(l_quantity), 6) AS log_q,
        |  ROUND(SQRT(l_quantity), 6) AS sqrt_q,
        |  ROUND(1.0 / l_extendedprice, 9) AS recip_p,
        |  l_quantity * l_quantity AS sq_q
        |FROM lineitem""".stripMargin
  )
}
