package graft.model

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Ports the reference end-to-end gates (tests/test_autofeat.py). */
class AutoFeatSpec extends SparkSpec {

  private def fixture = getClass.getResource("/fixtures/f2_input.parquet").getPath
  lazy val df = spark.read.parquet(fixture).drop("row_id").cache()

  test("no-op config returns original columns (test_autofeat.py:19-25)") {
    val (out, model) = AutoFeat.fitTransform(df, "target",
      AutoFeatConfig(feategSteps = 0, featselRuns = 0))
    assert(out.columns.toSet == Set("x1", "x2", "x3", "target"))
    assert(model.newFeatCols.isEmpty)
  }

  test("R² >= 0.999 at feateng_steps=3 (test_autofeat.py:28-34)") {
    // nJobs=5 overlaps the selection runs (identical results — FeatSelSpec)
    val (_, model) = AutoFeat.fitTransform(df, "target",
      AutoFeatConfig(feategSteps = 3, nJobs = 5))
    val r2 = model.score(df, "target")
    info(s"selected=${model.goodCols.mkString(", ")}")
    info(s"r2=$r2")
    assert(r2 >= 0.999, s"R² = $r2")
  }

  test("NaN policy: fit rejects; transform propagates per-row (test_autofeat.py:65-87)") {
    val withNan = df.withColumn("x1",
      when(monotonically_increasing_id() === 0, lit(Double.NaN)).otherwise(col("x1")))
    intercept[IllegalArgumentException] {
      AutoFeat.fitTransform(withNan, "target", AutoFeatConfig(feategSteps = 1, featselRuns = 1))
    }
    val (_, model) = AutoFeat.fitTransform(df, "target", AutoFeatConfig(feategSteps = 2, featselRuns = 2))
    if (model.newFeatCols.nonEmpty) {
      val out = model.transform(withNan.drop("target")).df
      val usesX1 = model.newFeatCols.filter(n => model.formulas(n).vars.contains("x1"))
      if (usesX1.nonEmpty) {
        val q = usesX1.map(n => sum(when(isnan(col(s"`$n`")), 1L).otherwise(0L)).as(n))
        val r = out.agg(q.head, q.tail: _*).collect()(0)
        usesX1.indices.foreach(i => assert(r.getLong(i) == 1L, s"${usesX1(i)} should have exactly 1 NaN"))
      }
    }
  }

  test("classifier accuracy >= 0.95 (test_autofeat.py:152-160)") {
    val stats = df.agg(avg("target")).collect()(0).getDouble(0)
    val binDf = df.withColumn("label", (col("target") > stats).cast("int")).drop("target")
    val (_, model) = AutoFeat.fitTransform(binDf, "label",
      AutoFeatConfig(problemType = "classification", feategSteps = 3, nJobs = 5))
    val acc = model.score(binDf, "label")
    info(s"accuracy=$acc selected=${model.goodCols.mkString(", ")}")
    assert(acc >= 0.95, s"accuracy $acc")
    // predict_proba is a valid probability
    val p = model.predictProba(binDf.drop("label")).agg(min("probability"), max("probability")).collect()(0)
    assert(p.getDouble(0) >= 0.0 && p.getDouble(1) <= 1.0)
  }

  test("categorical one-hot expansion (test_autofeat.py:105-136)") {
    val withCat = df.withColumn("x4",
      when(monotonically_increasing_id() % 5 < 1, lit("hello"))
        .when(monotonically_increasing_id() % 5 < 3, lit("2")).otherwise(lit("4")))
    val (out, model) = AutoFeat.fitTransform(withCat, "target",
      AutoFeatConfig(categoricalCols = Seq("x4"), feategSteps = 0, featselRuns = 0))
    assert(!out.columns.contains("x4"))
    assert(Seq("cat_x4_2", "cat_x4_4", "cat_x4_hello").forall(out.columns.contains))
    val s = out.agg(sum(col("cat_x4_2") + col("cat_x4_4") + col("cat_x4_hello"))).collect()(0).getDouble(0)
    assert(s == out.count().toDouble) // exactly one hot per row
    assert(model.originalColumns.contains("x4"))
  }

  test("units + pi theorem: R² >= 0.999 with dimensional veto (test_autofeat.py:139-149)") {
    // same x1..x3 draws as the f2 fixture (seed 15); the units-test target
    // (reference tests/test_autofeat.py:140-144) is recomputed here — every
    // needed term is dimensionally legal under {x2: m/sec, x3: min/mm}
    val dfU = df.withColumn("target",
      lit(2.0) + lit(15.0) * col("x1") +
        lit(3.0) / (col("x2") - lit(1.0) / col("x3")) +
        lit(5.0) * pow(col("x2") * log(col("x1")), 3.0)).cache()
    val (out, model) = AutoFeat.fitTransform(dfU, "target",
      AutoFeatConfig(feategSteps = 3, nJobs = 5,
        units = Map("x2" -> "m/sec", "x3" -> "min/mm")))
    // PT1 = x2*x3 (the only dimensionless group), named like pint.formatter
    assert(out.columns.contains("PT1_x2*x3"), out.columns.take(8).mkString(", "))
    assert(model.piGroups.map(_._1) == Seq("PT1_x2*x3"))
    // dimensionally-illegal formulas must not exist in the model pool
    val names = model.formulas.keySet
    assert(!names.contains("exp(x2)") && !names.contains("x2**2 + x2") &&
      !names.exists(n => n.startsWith("x1 + x2") || n == "x2 + x3"))
    val r2 = model.score(dfU, "target")
    info(s"r2=$r2 selected=${model.goodCols.mkString(", ")}")
    assert(r2 >= 0.999, s"R² = $r2")
  }

  test("weird column names survive fit/score; mismatch errors (test_autofeat.py:49-62)") {
    val weird = df.withColumnRenamed("x1", "x 1.1")
      .withColumnRenamed("x2", "2").withColumnRenamed("x3", "x/3")
    val (out, model) = AutoFeat.fitTransform(weird, "target",
      AutoFeatConfig(feategSteps = 3, nJobs = 5))
    assert(out.columns.take(3).toSeq == Seq("x 1.1", "2", "x/3"), "wrong column names")
    val r2 = model.score(weird, "target")
    info(s"weird-name r2=$r2 selected=${model.goodCols.mkString(", ")}")
    assert(r2 >= 0.999, s"R² = $r2")
    // transformed output scores identically (exact all_columns_ equality path)
    assert(model.score(out, "target") >= 0.999)
    // error when the column names aren't the same as before
    intercept[IllegalArgumentException] {
      model.score(weird.withColumnRenamed("x 1.1", "x 11"), "target")
    }
  }

  test("feateng_cols scoping: missing col errors; names never mention excluded cols (test_autofeat.py:90-102)") {
    intercept[IllegalArgumentException] {
      AutoFeat.fitTransform(df, "target",
        AutoFeatConfig(feategCols = Seq("x1", "x3", "x4"), feategSteps = 1, featselRuns = 1))
    }
    val (out, model) = AutoFeat.fitTransform(df, "target",
      AutoFeatConfig(feategCols = Seq("x1", "x3"), feategSteps = 3, nJobs = 5))
    val engineered = out.columns.drop(4) // x1, x2, x3, target, then engineered
    assert(engineered.nonEmpty)
    engineered.foreach(c => assert(!c.contains("x2"), s"engineered name '$c' mentions excluded x2"))
    model.formulas.keys.foreach(c => assert(!c.contains("x2"), s"formula '$c' mentions excluded x2"))
  }

  test("_X2df: a raw frame with a stale engineered-name column is re-derived, not trusted") {
    val (_, model) = AutoFeat.fitTransform(df, "target", AutoFeatConfig(feategSteps = 2, featselRuns = 2))
    if (model.newFeatCols.nonEmpty) {
      val stale = model.newFeatCols.head
      // raw frame that HAPPENS to carry a column named like a selected
      // feature, holding garbage — subset containment would use it as-is
      val poisoned = df.drop("target").withColumn(stale, lit(-999.0))
      val clean = model.predict(df.drop("target")).select("prediction")
        .collect().map(_.getDouble(0))
      val got = model.predict(poisoned).select("prediction")
        .collect().map(_.getDouble(0))
      assert(got.toSeq == clean.toSeq, "stale column was trusted instead of re-derived")
    }
  }

  test("model-state sink roundtrip: fromJson(toJson) serves identical predictions") {
    val (_, model) = AutoFeat.fitTransform(df, "target", AutoFeatConfig(feategSteps = 2, featselRuns = 2))
    val loaded = ModelJson.fromJson(model.toJson)
    assert(loaded.goodCols == model.goodCols && loaded.allColumns == model.allColumns)
    assert(loaded.formulas == model.formulas)
    val x = df.drop("target")
    val orig = model.predict(x).select("prediction").collect().map(_.getDouble(0))
    val back = loaded.predict(x).select("prediction").collect().map(_.getDouble(0))
    assert(orig.toSeq == back.toSeq, "loaded model predicts differently")
    assert(math.abs(loaded.score(df, "target") - model.score(df, "target")) < 1e-12)
    // classification roundtrip: classifier rebuilt from problemType + coef
    val bin = df.withColumn("label",
      (col("target") > df.agg(avg("target")).collect()(0).getDouble(0)).cast("int")).drop("target")
    val (_, cm) = AutoFeat.fitTransform(bin, "label",
      AutoFeatConfig(problemType = "classification", feategSteps = 1, featselRuns = 1))
    val cl = ModelJson.fromJson(cm.toJson)
    assert(cl.classifier.isDefined)
    val p1 = cm.predictProba(bin.drop("label")).select("probability").collect().map(_.getDouble(0))
    val p2 = cl.predictProba(bin.drop("label")).select("probability").collect().map(_.getDouble(0))
    assert(p1.toSeq == p2.toSeq)
  }

  test("multi-class classifier: 3-class accuracy, softmax proba, JSON roundtrip") {
    // terciles of the continuous target -> 3 ordered classes
    val qs = df.stat.approxQuantile("target", Array(1.0 / 3, 2.0 / 3), 0.0)
    val labDf = df.withColumn("label",
      when(col("target") <= qs(0), 0.0).when(col("target") <= qs(1), 1.0).otherwise(2.0))
      .drop("target")
    val (_, model) = AutoFeat.fitTransform(labDf, "label",
      AutoFeatConfig(problemType = "classification", feategSteps = 2, nJobs = 5))
    assert(model.multiClassifier.isDefined && model.classifier.isEmpty)
    assert(model.multiClassifier.get.classes == Seq(0.0, 1.0, 2.0))
    val acc = model.score(labDf, "label")
    info(s"3-class accuracy=$acc selected=${model.goodCols.mkString(", ")}")
    assert(acc >= 0.95, s"accuracy $acc")
    // proba rows: 3 entries in [0,1] summing to 1
    val x = labDf.drop("label")
    val perRow = model.predictProba(x).select(
      aggregate(col("probability"), lit(0.0), (a, v) => a + v).as("s"),
      array_min(col("probability")).as("mn"), array_max(col("probability")).as("mx"),
      size(col("probability")).as("k"))
    val r = perRow.agg(min("s"), max("s"), min("mn"), max("mx"), min("k"), max("k")).collect()(0)
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-9 && math.abs(r.getDouble(1) - 1.0) < 1e-9,
      s"proba rows must sum to 1: [${r.getDouble(0)}, ${r.getDouble(1)}]")
    assert(r.getDouble(2) >= 0.0 && r.getDouble(3) <= 1.0)
    assert(r.getInt(4) == 3 && r.getInt(5) == 3)
    // predictions are valid class labels
    val distinctPred = model.predict(x).select("prediction").distinct()
      .collect().map(_.getDouble(0)).toSet
    assert(distinctPred.subsetOf(Set(0.0, 1.0, 2.0)))
    // JSON roundtrip: bit-identical predictions and probabilities
    val loaded = ModelJson.fromJson(model.toJson)
    assert(loaded.multiClassifier.isDefined)
    val p1 = model.predict(x).select("prediction").collect().map(_.getDouble(0))
    val p2 = loaded.predict(x).select("prediction").collect().map(_.getDouble(0))
    assert(p1.toSeq == p2.toSeq)
    val a1 = model.predictProba(x).select("probability").collect().map(_.getSeq[Double](0))
    val a2 = loaded.predictProba(x).select("probability").collect().map(_.getSeq[Double](0))
    assert(a1.toSeq == a2.toSeq)
  }

  test("binary labels other than {0,1} route to the softmax fit and classify correctly") {
    val stats = df.agg(avg("target")).collect()(0).getDouble(0)
    // labels {1, 2}: the sigmoid path's balanced weights assume 0/1, so
    // this must go through the multinomial fit
    val binDf = df.withColumn("label",
      when(col("target") > stats, 2.0).otherwise(1.0)).drop("target")
    val (_, model) = AutoFeat.fitTransform(binDf, "label",
      AutoFeatConfig(problemType = "classification", feategSteps = 1, featselRuns = 2))
    assert(model.multiClassifier.isDefined && model.classifier.isEmpty)
    assert(model.multiClassifier.get.classes == Seq(1.0, 2.0))
    val acc = model.score(binDf, "label")
    info(s"labels{1,2} accuracy=$acc")
    assert(acc >= 0.9, s"accuracy $acc")
    val preds = model.predict(binDf.drop("label")).select("prediction").distinct()
      .collect().map(_.getDouble(0)).toSet
    assert(preds.subsetOf(Set(1.0, 2.0)), preds.toString)
  }

  test("one-hot cardinality guard rejects pseudo-categorical ID columns") {
    val big = spark.range(300000).select(
      col("id").cast("string").as("uid"),
      (col("id") % 7).cast("double").as("x"))
    val e = intercept[IllegalArgumentException] {
      AutoFeat.transformCategoricalCols(big, Seq("uid"))
    }
    assert(e.getMessage.contains("distinct values"), e.getMessage)
  }

  test("model JSON roundtrips formulas") {
    import graft.expr.{ExprJson, F, Var}
    val e = F.mul(F.sqrt(F.add(Var("x1"), Var("x2"))), F.recip(F.log(Var("x3"))))
    val back = ExprJson.fromJson(ExprJson.toJson(e))
    assert(back == e && back.name == e.name)
  }
}
