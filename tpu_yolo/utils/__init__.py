from tpu_yolo.utils.profiler import count_params, profile_model

__all__ = ["count_params", "profile_model"]
