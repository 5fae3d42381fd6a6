from .splits import (
    adc04_track_ids,
    medleydb_splits,
    mir1k_track_ids,
    mirex05_track_ids,
    rwc_track_ids,
)
from .registry import Track, TrackDataset, dataset_roots
from .snippets import (
    chunk_fixed,
    gen_split_list,
    inference_snippets,
    training_snippets,
)

__all__ = [
    "medleydb_splits",
    "adc04_track_ids",
    "mirex05_track_ids",
    "mir1k_track_ids",
    "rwc_track_ids",
    "Track",
    "TrackDataset",
    "dataset_roots",
    "gen_split_list",
    "training_snippets",
    "inference_snippets",
    "chunk_fixed",
]
