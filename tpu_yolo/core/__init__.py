from tpu_yolo.core.config import (
    ModelConfig,
    MODEL_CONFIGS,
    get_model_config,
    load_hyperparams,
    COCO_NAMES,
)
