from .predictor import build_features, train_next_value_model, predict_next_value  # noqa: F401
