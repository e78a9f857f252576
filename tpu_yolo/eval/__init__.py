from tpu_yolo.eval.metrics import match_predictions, average_precision, smooth
