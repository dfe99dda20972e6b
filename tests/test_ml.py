"""ML tier tests — MLlib two-stage linear model vs closed-form least
squares (the sklearn-parity check, SURVEY.md §5 item 5)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from trading_dashboard_spark.io.readers import load_table
from trading_dashboard_spark.ml.predictor import (
    FEATURE_COLS,
    build_features,
    predict_next_value,
    train_next_value_model,
)


@pytest.fixture(scope="module")
def daily(spark):
    ev = load_table(spark, "events", "/root/testdata/sf0.001")
    return ev.groupBy("user_id", F.to_date("ts").alias("d")).agg(
        F.max_by("value", "ts").alias("close"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
    )


def test_features_shape_and_guards(spark, daily):
    feats = build_features(daily)
    pdf = feats.toPandas()
    assert set(FEATURE_COLS + ["label"]) <= set(pdf.columns)
    # first row per key dropped (no prev_close); no NaN/Inf in features
    for c in FEATURE_COLS:
        assert np.isfinite(pdf[c].to_numpy()).all()


def test_model_matches_closed_form_least_squares(spark, daily):
    feats = build_features(daily)
    model = train_next_value_model(feats)

    train = feats.dropna(subset=["label"]).toPandas()
    X = train[FEATURE_COLS].to_numpy(dtype=np.float64)
    y = train["label"].to_numpy(dtype=np.float64)
    Xs = (X - X.mean(axis=0)) / X.std(axis=0, ddof=1)  # StandardScaler parity
    A = np.column_stack([Xs, np.ones(len(Xs))])
    w, *_ = np.linalg.lstsq(A, y, rcond=None)
    expected = A @ w

    fitted = model.pipeline_model.transform(feats.dropna(subset=["label"])).toPandas()
    fitted = fitted.sort_values(["user_id", "d"]).reset_index(drop=True)
    train = train.sort_values(["user_id", "d"]).reset_index(drop=True)
    got = fitted["prediction"].to_numpy()
    # align row order between the two frames
    assert np.allclose(np.sort(got), np.sort(expected), atol=1e-6)

    # OLS residuals are orthogonal to the features -> residual stage ~ 0,
    # final == primary (the reference's two-stage construction degenerates
    # exactly when the primary fit is unregularized)
    assert model.mae < np.abs(y - y.mean()).mean()


def test_predict_next_value_stamps_next_day(spark, daily):
    feats = build_features(daily)
    model = train_next_value_model(feats)
    preds = predict_next_value(model, feats)
    pdf = preds.toPandas()
    assert len(pdf) == feats.select("user_id").distinct().count()
    latest = feats.groupBy("user_id").agg(F.max("d").alias("d")).toPandas()
    import pandas as pd

    merged = pdf.merge(latest, on="user_id")
    got = pd.to_datetime(merged["prediction_date"]).to_numpy()
    exp = (pd.to_datetime(merged["d"]) + np.timedelta64(1, "D")).to_numpy()
    assert (got == exp).all()
