package graft.ml

import graft.{Q, QueryModule}
import graft.sources.Tables
import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.classification.{LogisticRegression, RandomForestClassifier}
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.evaluation.{BinaryClassificationEvaluator, RegressionEvaluator}
import org.apache.spark.ml.feature.{MinMaxScaler, StandardScaler, StringIndexer, VectorAssembler}
import org.apache.spark.ml.linalg.Matrix
import org.apache.spark.ml.regression.GBTRegressor
import org.apache.spark.ml.stat.Correlation
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's four ML pipelines + Pearson correlation (SURVEY.md
  * §2.10, Dataset.py:563-885), transposed to the fixtures per FIXTURES.md's
  * mapping (Arrest → l_returnflag='R'; district counts → per-nation order
  * counts). Reference hyperparameters and seeds are kept verbatim.
  *
  * Reference bugs fixed, not copied (SURVEY.md §7 risk 4): pipelines are
  * always `fit(train).transform(test)` (Dataset.py:608/727/835 transform an
  * unfit pipeline), and the label encodes its own column (Dataset.py:114
  * encodes Domestic from Arrest).
  *
  * No oracle entries — ML fits aren't SQL-expressible; metric-band
  * assertions live in the scalatest suite. All metric outputs follow the
  * reference's 1-row-DataFrame convention (Dataset.py:656, 740, 856).
  */
object Pipelines extends QueryModule {

  /** lineitem with binary label + the arrest-shaped feature prep:
    * exclude-list feature selection, categorical indexing, assembly.
    */
  private def labeled(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d).select(
      (col("l_returnflag") === "R").cast("double").as("label"),
      col("l_quantity"), col("l_extendedprice"), col("l_discount"),
      col("l_tax"), month(col("l_shipdate")).cast("double").as("ship_month"),
      col("l_linestatus"))

  /** StringIndexer → VectorAssembler → StandardScaler(withMean=false), the
    * reference's shared preamble (Dataset.py:582-608) with its parameters
    * (frequencyDesc, handleInvalid=keep, std-only scaling).
    */
  private def featurePipeline: Array[org.apache.spark.ml.PipelineStage] = Array(
    new StringIndexer()
      .setInputCols(Array("l_linestatus"))
      .setOutputCols(Array("l_linestatus_idx"))
      .setStringOrderType("frequencyDesc")
      .setHandleInvalid("keep"),
    new VectorAssembler()
      .setInputCols(Array("l_quantity", "l_extendedprice", "l_discount",
        "l_tax", "ship_month", "l_linestatus_idx"))
      .setOutputCol("features_raw"),
    new StandardScaler()
      .setInputCol("features_raw").setOutputCol("features")
      .setWithMean(false).setWithStd(true))

  private def metricDf(s: SparkSession, name: String, v: Double): DataFrame = {
    import s.implicits._
    Seq((name, v)).toDF("metric", "value")
  }

  /** q40 — logistic regression (Dataset.py:563-682): maxIter=100,
    * regParam=0.1, 80/20 split seed 42, areaUnderROC.
    */
  val lrAuc: Q = (s, d) => {
    val Array(train, test) = labeled(s, d).randomSplit(Array(0.8, 0.2), seed = 42)
    val pipe = new Pipeline().setStages(featurePipeline :+
      new LogisticRegression().setMaxIter(100).setRegParam(0.1)
        .setLabelCol("label").setFeaturesCol("features"))
    val pred = pipe.fit(train).transform(test)
    val auc = new BinaryClassificationEvaluator()
      .setMetricName("areaUnderROC").evaluate(pred)
    metricDf(s, "lr_roc_auc", auc)
  }

  /** q41 — random forest (Dataset.py:685-789): numTrees=20, maxDepth=10,
    * seed=42, areaUnderROC.
    */
  val rfAuc: Q = (s, d) => {
    val Array(train, test) = labeled(s, d).randomSplit(Array(0.8, 0.2), seed = 42)
    val pipe = new Pipeline().setStages(featurePipeline :+
      new RandomForestClassifier().setNumTrees(20).setMaxDepth(10).setSeed(42)
        .setLabelCol("label").setFeaturesCol("features"))
    val pred = pipe.fit(train).transform(test)
    val auc = new BinaryClassificationEvaluator()
      .setMetricName("areaUnderROC").evaluate(pred)
    metricDf(s, "rf_roc_auc", auc)
  }

  /** q42 — GBT count regression (Dataset.py:792-863): pre-aggregate to
    * per-(nation, year, month) order counts (the reference's per-district
    * daily counts, Dataset.py:800), MinMaxScaler, maxIter=100, maxDepth=5,
    * stepSize=0.05, seed=42, 70/30 split, RMSE.
    */
  val gbtRmse: Q = (s, d) => {
    val counts = Tables.orders(s, d)
      .join(broadcast(Tables.customer(s, d)),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey"),
        year(col("o_orderdate")).as("y"), month(col("o_orderdate")).as("m"))
      .agg(count(lit(1)).cast("double").as("label"))
      .select(col("c_nationkey").cast("double").as("nationkey"),
        col("y").cast("double"), col("m").cast("double"), col("label"))
    val Array(train, test) = counts.randomSplit(Array(0.7, 0.3), seed = 42)
    val pipe = new Pipeline().setStages(Array(
      new VectorAssembler().setInputCols(Array("nationkey", "y", "m"))
        .setOutputCol("features_raw"),
      new MinMaxScaler().setInputCol("features_raw").setOutputCol("features"),
      new GBTRegressor().setMaxIter(100).setMaxDepth(5).setStepSize(0.05)
        .setSeed(42).setLabelCol("label").setFeaturesCol("features")))
    val pred = pipe.fit(train).transform(test)
    val rmse = new RegressionEvaluator().setMetricName("rmse").evaluate(pred)
    metricDf(s, "gbt_rmse", rmse)
  }

  /** q43 — KMeans k=3 seed=0 over per-nation order stats (the reference's
    * per-district avg-coords clustering, Dataset.py:272-291) → cluster
    * sizes.
    */
  val kmeansClusters: Q = (s, d) => {
    val perNation = Tables.orders(s, d)
      .join(broadcast(Tables.customer(s, d)),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_nationkey")
      .agg(count(lit(1)).cast("double").as("n_orders"),
        avg("o_totalprice").as("avg_price"))
    val assembled = new VectorAssembler()
      .setInputCols(Array("n_orders", "avg_price")).setOutputCol("features")
      .transform(perNation)
    val model = new KMeans().setK(3).setSeed(0).fit(assembled)
    model.transform(assembled)
      .groupBy(col("prediction"))
      .agg(count(lit(1)).as("n_nations"))
      .orderBy("prediction")
  }

  /** q44 — Pearson correlation matrix over lineitem numerics
    * (Dataset.py:883-885), flattened to (col_i, col_j, corr) rows. The
    * matrix itself is computed distributed; only the k×k result is
    * collected (k=4). The reference's empty-StringIndexer quirk
    * (Dataset.py:868) is resolved by simply not adding a no-op stage.
    */
  val corrMatrix: Q = (s, d) => {
    val cols = Array("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val assembled = new VectorAssembler()
      .setInputCols(cols).setOutputCol("features")
      .transform(Tables.lineitem(s, d))
      .select("features")
    val Row(m: Matrix) = Correlation.corr(assembled, "features", "pearson").head
    import s.implicits._
    val rows = for {
      i <- cols.indices
      j <- cols.indices
    } yield (cols(i), cols(j), math.rint(m(i, j) * 1e4) / 1e4)
    rows.toDF("col_i", "col_j", "corr").orderBy("col_i", "col_j")
  }

  def queries: Map[String, Q] = Map(
    "q40_ml_lr_auc" -> lrAuc,
    "q41_ml_rf_auc" -> rfAuc,
    "q42_ml_gbt_rmse" -> gbtRmse,
    "q43_ml_kmeans" -> kmeansClusters,
    "q44_ml_corr_matrix" -> corrMatrix)

  def oracles: Map[String, String] = Map.empty // ML: metric-band tests instead
}
