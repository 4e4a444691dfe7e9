package graft

class MlSpec extends SparkSpec {

  test("LR AUC is a valid probability-ranking metric (seeded, banded)") {
    val v = q("q40_ml_lr_auc").head().getAs[Double]("value")
    assert(v >= 0.3 && v <= 0.7, s"auc $v outside the chance band for a noise label")
  }

  test("RF AUC banded") {
    val v = q("q41_ml_rf_auc").head().getAs[Double]("value")
    assert(v >= 0.3 && v <= 0.7, s"auc $v")
  }

  test("GBT RMSE is positive and below the label scale") {
    val v = q("q42_ml_gbt_rmse").head().getAs[Double]("value")
    assert(v > 0 && v < 100, s"rmse $v")
  }

  test("KMeans produces <= 3 clusters covering all 25 nations") {
    val rows = q("q43_ml_kmeans").collect()
    assert(rows.length <= 3)
    assert(rows.map(_.getAs[Long]("n_nations")).sum === 25L)
  }

  test("M14: CrossValidator + ParamGridBuilder smoke (2-point grid, 2 folds, seeded)") {
    val m = graft.ml.Pipelines.crossValidatedLr(spark, sf).collect()
      .map(r => r.getAs[String]("metric") -> r.getAs[Double]("value")).toMap
    assert(Set(0.01, 0.1).contains(m("cv_lr_best_reg")),
      s"best regParam ${m("cv_lr_best_reg")} not from the grid")
    assert(m("cv_lr_auc") >= 0.0 && m("cv_lr_auc") <= 1.0)
  }

  test("correlation matrix: unit diagonal, symmetric") {
    val m = q("q44_ml_corr_matrix").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    m.keys.foreach { case (i, j) =>
      if (i == j) assert(m((i, j)) === 1.0)
      assert(m((i, j)) === m((j, i)))
    }
  }
}
