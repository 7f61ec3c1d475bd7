from mvlt_tpu.eval.metrics import (
    mlm_accuracy, argmax_accuracy_count, psnr, f1_scores, cls_metrics,
)

__all__ = [
    "mlm_accuracy", "argmax_accuracy_count", "psnr", "f1_scores", "cls_metrics",
]
