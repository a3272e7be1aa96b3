from .engine import PredictEngine, save_prediction_outputs
