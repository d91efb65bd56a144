from .epe import epe, epe_stats, outlier_rate
from .datasets import SintelDataset, KittiFlowDataset, synthetic_eval_pairs

__all__ = [
    "epe",
    "epe_stats",
    "outlier_rate",
    "SintelDataset",
    "KittiFlowDataset",
    "synthetic_eval_pairs",
]
