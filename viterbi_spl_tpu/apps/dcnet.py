"""DCNet app (reference dcnet/main.py / softmax_viterbi.py): whole-snippet
batch-1 training on NSGT features, per-bin BCE; manual weight decay on the
global conv kernel is available via harness.train.add_weight_decay_grad."""

from __future__ import annotations

from ..families import family_spec
from ..models import DCNet, dcnet_loss
from .common import AppConfig, app_main


def config() -> AppConfig:
    return AppConfig(
        family=family_spec("dcnet"),
        make_model=lambda **kw: DCNet(**kw),
        loss_fn=dcnet_loss,
        logits_adapter=lambda out: out,
        snippet_len=1200,
        batch_size=1,
        learning_rate=1e-4,
        feature_shape=(500,),
        supports_valid_frames=True,
        # manual wd=2e-4 on the global conv kernel only, applied to the
        # gradient every step (dcnet/softmax_viterbi.py:311 + :3426)
        weight_decay=(DCNet.global_conv_kernel_path(), 2e-4),
    )


def build_real_datasets(debug: bool = False):
    from ..data import TrackDataset, medleydb_splits
    from ..data.labels import medleydb_label
    from ..data.vocals import is_vocals_from_sections
    from ..frontend.nsgt import dcnet_feature, nsgt_for_length
    from ..io.wav import load_wav
    import os

    def spec_fn(tid):
        wav = os.path.join(os.environ["medleydb"], tid, tid + "_MIX.wav")
        samples, _ = load_wav(wav, sr=44100)
        nsgt = nsgt_for_length(len(samples))
        return dcnet_feature(nsgt.transform_track(samples))

    def label_fn(tid):
        lb = medleydb_label(tid, is_vocals_from_sections(tid))
        # dcnet labels live on the 256-hop grid but the NSGT feature is
        # decimated x4 from hop 64 -> same 256-hop grid; lengths reconcile
        return lb

    splits = medleydb_splits()
    if debug:
        splits = {k: v[:2] for k, v in splits.items()}
    return {
        name: TrackDataset(tids, spec_fn, label_fn)
        for name, tids in splits.items()
    }


def build_external_datasets(debug: bool = False):
    """adc04/mirex05/mir1k/rwc on the NSGT front-end (dcnet/main.py
    TFDatasetForAdc04..ForRWC)."""
    from ..frontend.nsgt import dcnet_feature, nsgt_for_length
    from .common import build_external_eval_datasets

    def spec_fn(samples):
        nsgt = nsgt_for_length(len(samples))
        return dcnet_feature(nsgt.transform_track(samples))

    return build_external_eval_datasets(spec_fn, sr=44100, debug=debug)


def main(argv=None):
    return app_main(config(), build_real_datasets, argv,
                    build_external_datasets=build_external_datasets)


if __name__ == "__main__":
    main()
