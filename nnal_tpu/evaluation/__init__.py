from nnal_tpu.evaluation.metrics import (
    accuracy,
    preds_stats,
    f_measure,
    binary_f1,
    multi_f1,
    precision_recall,
    partitioned_f1,
)
