package graft.time

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Sort-merge as-of join (SURVEY.md §2.10): for each left row (key, ts),
  * attach the payload of the latest right row with r.ts <= l.ts and the same
  * key. Spark has no built-in as-of join; composing join+window explodes
  * (every left row matches all earlier right rows before ranking), so this
  * is the custom typed operator: union-tag both sides, ONE hash exchange on
  * (key, salt), ONE sort within partitions, then a linear mapPartitions
  * merge carrying the last-seen right payload.
  *
  * Skew: keys whose LEFT row count exceeds `skewThreshold` are salted into
  * `salts` sub-partitions; the right side is replicated to every salt of a
  * skewed key (correct because each salted partition then sees the full
  * right timeline for the key). Right-side-heavy skew would need ts-range
  * salting with boundary carry-in — not needed for the summary-table shape.
  */
object AsOfJoin {

  def asof(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
           rightPayload: Seq[String], prefix: String = "asof_",
           skewThreshold: Long = 2000000L, salts: Int = 8,
           numPartitions: Int = 0): DataFrame = {
    val spark = left.sparkSession
    val parts = if (numPartitions > 0) numPartitions
    else spark.sessionState.conf.numShufflePartitions

    // top skewed keys on the left (bounded collect)
    val skewedKeys: Seq[String] =
      left.groupBy(col(keyCol).cast("string").as("__k")).count()
        .filter(col("count") > skewThreshold)
        .orderBy(desc("count")).limit(1000)
        .collect().map(_.getString(0)).toSeq
    val isSkewed = if (skewedKeys.isEmpty) lit(false)
    else col(keyCol).cast("string").isin(skewedKeys: _*)

    val lCols = left.columns.toSeq
    val payloadFields = rightPayload.map(c => right.schema(c).copy(
      name = prefix + c, nullable = true))
    val outSchema = StructType(left.schema.fields ++ payloadFields)

    def q(c: String) = col(s"`${c.replace("`", "``")}`")

    // aligned union: [__k, __ts, __salt, __tag, leftCols..., payload...]
    val lFrame = left.select(
      Seq(col(keyCol).cast("string").as("__k"), col(tsCol).as("__ts"),
        when(isSkewed, pmod(xxhash64(col(tsCol)), lit(salts)).cast("int"))
          .otherwise(lit(0)).as("__salt"),
        lit(1).as("__tag")) ++
        lCols.map(q) ++
        rightPayload.map(c => lit(null).cast(right.schema(c).dataType).as(prefix + c)): _*)
    val saltArr = array((0 until salts).map(lit): _*)
    val rFrame = right.select(
      Seq(col(keyCol).cast("string").as("__k"), col(tsCol).as("__ts"),
        explode(when(isSkewed, saltArr).otherwise(array(lit(0)))).as("__salt"),
        lit(0).as("__tag")) ++
        lCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        rightPayload.map(c => q(c).as(prefix + c)): _*)

    val merged = lFrame.unionByName(rFrame)
      .repartition(parts, col("__k"), col("__salt"))
      .sortWithinPartitions(col("__k"), col("__salt"), col("__ts"), col("__tag"))

    val nMeta = 4
    val nLeft = lCols.size
    val nPay = rightPayload.size
    val rdd = merged.rdd.mapPartitions { rows =>
      var curKey: String = null
      var curSalt: Int = -1
      var lastPay: Array[Any] = null
      rows.flatMap { r =>
        val k = r.getString(0)
        val s = r.getInt(2)
        if (k != curKey || s != curSalt) { curKey = k; curSalt = s; lastPay = null }
        if (r.getInt(3) == 0) { // right row: remember payload
          val p = new Array[Any](nPay)
          var i = 0
          while (i < nPay) { p(i) = r.get(nMeta + nLeft + i); i += 1 }
          lastPay = p
          None
        } else {
          val vals = new Array[Any](nLeft + nPay)
          var i = 0
          while (i < nLeft) { vals(i) = r.get(nMeta + i); i += 1 }
          if (lastPay != null) {
            i = 0
            while (i < nPay) { vals(nLeft + i) = lastPay(i); i += 1 }
          }
          Some(Row.fromSeq(vals.toSeq))
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }
}
