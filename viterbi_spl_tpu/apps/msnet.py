"""MSNet app (reference msnet/hsieh_m2m3.py): whole-snippet batch-1
training on CFP features, smoothed 321-class softmax CE."""

from __future__ import annotations

from ..families import family_spec
from ..models import MSNet, softmax_smoothed_loss
from .common import AppConfig, app_main


def config() -> AppConfig:
    return AppConfig(
        family=family_spec("msnet"),
        make_model=lambda **kw: MSNet(**kw),
        loss_fn=softmax_smoothed_loss,
        logits_adapter=lambda out: out[..., 1:] - out[..., :1],
        snippet_len=1200,
        batch_size=1,
        learning_rate=1e-4,
        feature_shape=(320, 3),
        supports_valid_frames=True,
    )


def build_real_datasets(debug: bool = False):
    """Real MedleyDB splits: CFP features + MELODY2/vocal labels (requires
    the medleydb/melody2_dir/section_dir roots)."""
    from ..data import TrackDataset, medleydb_splits
    from ..data.labels import medleydb_label
    from ..data.vocals import is_vocals_from_sections
    from ..frontend import CFP, MSNET_CFP
    from ..io.wav import load_wav
    import os

    cfp = CFP(MSNET_CFP)

    def spec_fn(tid):
        wav = os.path.join(os.environ["medleydb"], tid, tid + "_MIX.wav")
        samples, _ = load_wav(wav, sr=44100)
        return cfp.features(samples)

    def label_fn(tid):
        return medleydb_label(tid, is_vocals_from_sections(tid))

    splits = medleydb_splits()
    if debug:
        splits = {k: v[:2] for k, v in splits.items()}
    return {
        name: TrackDataset(tids, spec_fn, label_fn)
        for name, tids in splits.items()
    }


def build_external_datasets(debug: bool = False):
    """adc04/mirex05/mir1k/rwc evaluation sets on the msnet CFP front-end
    (the reference's TFDatasetForAdc04..ForRWC, msnet/hsieh_m2m3.py)."""
    from ..frontend import CFP, MSNET_CFP
    from .common import build_external_eval_datasets

    cfp = CFP(MSNET_CFP)
    return build_external_eval_datasets(
        lambda samples: cfp.features(samples), sr=44100, debug=debug
    )


def main(argv=None):
    return app_main(config(), build_real_datasets, argv,
                    build_external_datasets=build_external_datasets)


if __name__ == "__main__":
    main()
