"""Next-value prediction — the reference's two-stage linear model on MLlib.

Reference (analyze_news_stock_patterns.py:76-238): SQL window features →
pandas feature engineering → sklearn StandardScaler + LinearRegression,
then a *second* LinearRegression fitted on the residuals, final prediction
= primary + correction; models persisted with joblib; inference on the
latest day stamped trade_date + 1.

Engine mapping (SURVEY.md §2.9 U2-U8):
- U2 features: window expressions (lag/lead/pct-change/volatility) — no
  pandas round-trip; the feature matrix never leaves the JVM until MLlib's
  own Breeze solve.
- U3 scaling: ml.feature.StandardScaler (withMean+withStd, sklearn parity).
- U4/U5: ml.regression.LinearRegression (solver='normal' → exact
  least-squares like sklearn's lstsq) + residual-stage model.
- U6 eval: RegressionEvaluator (mae/rmse).
- U7 persistence: PipelineModel.save/load.
- U8 inference: transform latest-day slice, stamp date + 1.

At scale: training data is (keys x history) rows with a handful of feature
columns — LinearRegression with the normal solver aggregates X'X / X'y in
one distributed pass (no iterative shuffles); inference is a map-only
transform.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window as W, functions as F

FEATURE_COLS = ["prev_close", "pct_change", "volatility"]


def build_features(
    daily: DataFrame, key: str = "user_id", time: str = "d",
    close: str = "close", high: str = "high", low: str = "low",
) -> DataFrame:
    """U2 — window feature engineering (analyze_news_stock_patterns.py:95-111):
    prev close (lag), pct change, intraday volatility, next-day label (lead).
    NaN/Inf guards mirror the reference's fillna/replace chain (:100-104)."""
    w = W.partitionBy(key).orderBy(time)
    c, h, lo = F.col(close), F.col(high), F.col(low)
    prev = F.lag(c, 1).over(w)
    out = (
        daily.withColumn("prev_close", prev)
        .withColumn(
            "pct_change",
            F.coalesce((c - prev) / F.when(prev != 0, prev) * 100.0, F.lit(0.0)),
        )
        .withColumn(
            "volatility",
            F.coalesce((h - lo) / F.when(lo != 0, lo) * 100.0, F.lit(0.0)),
        )
        .withColumn("label", F.lead(c, 1).over(w))
    )
    return out.na.drop(subset=["prev_close"])


@dataclass
class TrainedModel:
    pipeline_model: object  # fitted PipelineModel (assembler+scaler+lr)
    residual_model: object  # fitted LinearRegression on residuals
    mae: float
    rmse: float


def train_next_value_model(features: DataFrame) -> TrainedModel:
    """U3-U6 — scaler + primary LR + residual-correction LR + eval."""
    from pyspark.ml import Pipeline
    from pyspark.ml.evaluation import RegressionEvaluator
    from pyspark.ml.feature import StandardScaler, VectorAssembler
    from pyspark.ml.regression import LinearRegression

    train = features.na.drop(subset=["label"])
    assembler = VectorAssembler(inputCols=FEATURE_COLS, outputCol="raw_features")
    scaler = StandardScaler(
        inputCol="raw_features", outputCol="features", withMean=True, withStd=True
    )
    lr = LinearRegression(
        featuresCol="features", labelCol="label", predictionCol="prediction",
        solver="normal", regParam=0.0,
    )
    pipeline_model = Pipeline(stages=[assembler, scaler, lr]).fit(train)

    fitted = pipeline_model.transform(train)
    with_resid = fitted.withColumn("residual", F.col("label") - F.col("prediction"))
    resid_lr = LinearRegression(
        featuresCol="features", labelCol="residual", predictionCol="residual_pred",
        solver="normal", regParam=0.0,
    ).fit(with_resid)

    corrected = resid_lr.transform(with_resid).withColumn(
        "final_prediction", F.col("prediction") + F.col("residual_pred")
    )
    evaluator = RegressionEvaluator(labelCol="label", predictionCol="final_prediction")
    mae = evaluator.setMetricName("mae").evaluate(corrected)
    rmse = evaluator.setMetricName("rmse").evaluate(corrected)
    return TrainedModel(pipeline_model, resid_lr, mae, rmse)


def predict_next_value(
    model: TrainedModel, features: DataFrame, key: str = "user_id", time: str = "d"
) -> DataFrame:
    """U8 — latest-day slice → primary + residual correction → stamp the
    prediction onto the *next* day (analyze_news_stock_patterns.py:197-217)."""
    from ..operators.relational import latest_per_key

    latest = latest_per_key(features, [key], time)
    primary = model.pipeline_model.transform(latest)
    corrected = model.residual_model.transform(primary)
    return corrected.select(
        F.col(key),
        F.date_add(F.col(time), 1).alias("prediction_date"),
        F.col("close").alias("latest_close"),
        (F.col("prediction") + F.col("residual_pred")).alias("predicted_close"),
    )
