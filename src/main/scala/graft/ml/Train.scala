package graft.ml

import org.apache.spark.ml.Estimator
import org.apache.spark.ml.PredictionModel
import org.apache.spark.ml.classification.{GBTClassifier, RandomForestClassifier}
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.ml.regression.GBTRegressor
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's `model_factory` extension point, Spark-first.
  *
  * `dask_lightgbm.train(client, data, label, params, model_factory,
  * **kwargs)` (core.py:94,128-136) is the low-level entry that accepts ANY
  * sklearn-API estimator class and instantiates it per worker
  * (`model_factory(**params)` in `_train_part`, core.py:51); the public
  * `LGBMClassifier.fit` is just `train(..., model_factory=LGBMClassifier)`
  * (core.py:205). This object is the same two-level surface for Spark: a
  * caller ports `train(data, label, params, MyEstimator)` as
  * `Train.train(df, params, myFactory)` where `myFactory` builds any
  * `Estimator[M]` from the shared params — the whole MLlib estimator
  * catalogue (and any third-party Estimator implementation) plugs in
  * without touching graft.
  *
  * The factory receives the validated [[LGBMParams]] plus the optional
  * weight column (the reference forwards `sample_weight` parts the same
  * way, core.py:98-102) and returns a configured, UNFIT estimator; `train`
  * owns the data normalization ([[Featurize]] — the reference's four
  * `data_output` shapes) and the single distributed `.fit`. Scale: identical
  * to `LGBMClassifier.fit` — no collect, model driver-held.
  */
object Train {

  /** Fit `modelFactory`'s estimator on `df`. Mirrors core.py:94 `train`. */
  def train[M <: PredictionModel[Vector, M]](
      df: DataFrame,
      params: LGBMParams,
      modelFactory: (LGBMParams, Option[String]) => Estimator[M],
      featuresCol: Seq[String] = Seq("features"),
      labelCol: String = "label",
      weightCol: Option[String] = None): M = {
    Params.validatedTreeLearner(params.treeLearner) // core.py:122-125
    val data = Featurize(df, featuresCol)
      .withColumn("label", col(labelCol).cast("double"))
    modelFactory(params, weightCol).fit(data)
  }

  /** The default classifier factory `LGBMClassifier.fit` uses for the
    * binary path — exposed so callers can see the param mapping a custom
    * factory should honor. */
  val gbtClassifierFactory:
      (LGBMParams, Option[String]) => GBTClassifier =
    (p, w) => {
      val est = new GBTClassifier()
        .setMaxIter(p.nEstimators).setMaxDepth(p.maxDepth)
        .setStepSize(p.learningRate).setSeed(p.seed)
        .setFeatureSubsetStrategy(Params.subsetStrategy(p.featureFraction))
      w.foreach(est.setWeightCol)
      est
    }

  /** The default multiclass factory (`multiclass = "rf"`). */
  val rfClassifierFactory:
      (LGBMParams, Option[String]) => RandomForestClassifier =
    (p, w) => {
      val est = new RandomForestClassifier()
        .setNumTrees(p.nEstimators).setMaxDepth(p.maxDepth)
        .setFeatureSubsetStrategy(Params.subsetStrategy(p.featureFraction))
        .setSeed(p.seed)
      w.foreach(est.setWeightCol)
      est
    }

  /** The default regressor factory (`LGBMRegressor.fit`'s backend). */
  val gbtRegressorFactory:
      (LGBMParams, Option[String]) => GBTRegressor =
    (p, w) => {
      val est = new GBTRegressor()
        .setMaxIter(p.nEstimators).setMaxDepth(p.maxDepth)
        .setStepSize(p.learningRate).setSeed(p.seed)
        .setFeatureSubsetStrategy(Params.subsetStrategy(p.featureFraction))
      w.foreach(est.setWeightCol)
      est
    }
}
