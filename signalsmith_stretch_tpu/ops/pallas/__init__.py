from .prediction import main_prediction_sweep  # noqa: F401
