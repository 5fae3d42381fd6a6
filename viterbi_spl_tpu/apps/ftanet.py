"""FTANet app (reference ftanet/yu.py): 16 x 128-frame CFP chunks,
smoothed 321-class softmax CE."""

from __future__ import annotations

from ..families import family_spec
from ..models import FTANet, softmax_smoothed_loss
from .common import AppConfig, app_main


def config() -> AppConfig:
    return AppConfig(
        family=family_spec("ftanet"),
        make_model=lambda **kw: FTANet(**kw),
        loss_fn=softmax_smoothed_loss,
        logits_adapter=lambda out: out[..., 1:] - out[..., :1],
        snippet_len=128,
        batch_size=16,
        learning_rate=1e-4,
        feature_shape=(320, 3),
        fixed_chunks=True,
        eval_batch_stats=True,
    )


def build_real_datasets(debug: bool = False):
    from ..data import TrackDataset, medleydb_splits
    from ..data.labels import medleydb_label, resample_notes_to_10ms
    from ..data.vocals import is_vocals_from_sections
    from ..frontend import CFP, FTANET_CFP
    from ..io.wav import load_wav
    import os

    cfp = CFP(FTANET_CFP)

    def spec_fn(tid):
        wav = os.path.join(os.environ["medleydb"], tid, tid + "_MIX.wav")
        samples, _ = load_wav(wav, sr=8000)
        return cfp.features(samples)

    def label_fn(tid):
        lb = medleydb_label(tid, is_vocals_from_sections(tid))
        lb["notes"] = resample_notes_to_10ms(lb["notes"])
        return lb

    splits = medleydb_splits()
    if debug:
        splits = {k: v[:2] for k, v in splits.items()}
    return {
        name: TrackDataset(tids, spec_fn, label_fn, max_length_diff=2)
        for name, tids in splits.items()
    }


def build_external_datasets(debug: bool = False):
    """adc04/mirex05/mir1k/rwc on the ftanet CFP front-end with 10 ms
    labels (ftanet/viterbi_performance.py dataset classes)."""
    from ..frontend import CFP, FTANET_CFP
    from .common import build_external_eval_datasets

    cfp = CFP(FTANET_CFP)
    return build_external_eval_datasets(
        lambda samples: cfp.features(samples), sr=8000,
        labels_on_10ms=True, debug=debug,
    )


def main(argv=None):
    return app_main(config(), build_real_datasets, argv,
                    build_external_datasets=build_external_datasets)


if __name__ == "__main__":
    main()
