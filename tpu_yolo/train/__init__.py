from tpu_yolo.train.loss import task_aligned_assigner, detection_loss, build_padded_targets
