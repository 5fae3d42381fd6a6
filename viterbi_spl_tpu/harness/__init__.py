from .config import HarnessConfig, TrainOrInference
from .train import TrainState, Trainer
from .evaluate import decode_and_score_track, evaluate_posteriorgrams
from .reporting import Reporter, metrics_markdown_table

__all__ = [
    "HarnessConfig",
    "TrainOrInference",
    "TrainState",
    "Trainer",
    "decode_and_score_track",
    "evaluate_posteriorgrams",
    "Reporter",
    "metrics_markdown_table",
]
