"""TONet app (reference tonet/main_shaun.py): 128-frame tonet-CFP chunks,
dual-backbone TONet with mean-of-3-CE pitch/chroma/octave loss."""

from __future__ import annotations

import jax.numpy as jnp

from ..families import family_spec
from ..models import TONet, tonet_loss
from .common import AppConfig, app_main


def tonet_lr_schedule(base_lr: float, steps_per_epoch: int):
    """The reference's scheduler (tonet/main_shaun.py configure_optimizers):
    0.5x warm-up for 5 epochs, then 0.5 * 0.98^(epoch-5) decay."""
    def schedule(step):
        import jax.numpy as jnp

        epoch = jnp.asarray(step) // steps_per_epoch
        decay = 0.98 ** jnp.maximum(epoch - 5, 0).astype(jnp.float32)
        scale = jnp.where(epoch < 5, 0.5, 0.5 * decay)
        return base_lr * scale

    return schedule


def _input_adapter(spec):
    # snippet layout [B, T, 3, 360] -> model layout [B, 3, 360, T]
    return jnp.transpose(spec, (0, 2, 3, 1))


def _logits_adapter(out):
    pitch = jnp.transpose(out["pitch"], (0, 2, 1))  # [B, T, 361]
    return pitch[..., 1:] - pitch[..., :1]


def config() -> AppConfig:
    return AppConfig(
        family=family_spec("tonet"),
        make_model=lambda **kw: TONet(**kw),
        loss_fn=tonet_loss,
        logits_adapter=_logits_adapter,
        snippet_len=128,
        batch_size=4,
        learning_rate=1e-4,
        feature_shape=(3, 360),
        fixed_chunks=True,
        # like ftanet, the attention/transformer branches only function
        # under per-batch self-correcting normalization: first
        # convergence-grade run had train OA 0.86+ with eval-mode val OA
        # stuck at 0.18 despite ~settled EMA stats (see
        # AppConfig.eval_batch_stats / DESIGN ftanet note)
        eval_batch_stats=True,
        input_adapter=_input_adapter,
        # the original module's warm-up/decay schedule feeds the optimizer
        # (tonet/model/tonet.py:474-490 configure_optimizers)
        lr_schedule=tonet_lr_schedule,
    )


def build_real_datasets(debug: bool = False, labels: str = "m2m3"):
    """labels: 'm2m3' derives labels from MedleyDB MELODY2 + vocal
    sections; 'yu' consumes Yu's precomputed 10 ms f0 references from
    $fatnet_spec/f0ref (tonet/main_shaun.py:386-406 gen_label_yu_fn)."""
    from ..data import TrackDataset, medleydb_splits
    from ..data.labels import (
        medleydb_label,
        resample_notes_to_10ms,
        tonet_f0ref_label,
    )
    from ..data.vocals import is_vocals_from_sections
    from ..frontend import CFP, TONET_CFP
    from ..io.wav import load_wav
    import os
    import numpy as np

    cfp = CFP(TONET_CFP)

    def spec_fn(tid):
        wav = os.path.join(os.environ["medleydb"], tid, tid + "_MIX.wav")
        samples, _ = load_wav(wav, sr=8000)
        feat = cfp.features(samples)  # [T, 360, 3]
        return np.ascontiguousarray(feat.transpose(0, 2, 1))  # [T, 3, 360]

    if labels == "yu":
        label_fn = tonet_f0ref_label
    else:
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
    """adc04/mirex05/mir1k/rwc on the tonet CFP front-end ([T, 3, 360]
    layout) with 10 ms labels (tonet/main_shaun.py dataset classes)."""
    import numpy as np

    from ..frontend import CFP, TONET_CFP
    from .common import build_external_eval_datasets

    cfp = CFP(TONET_CFP)

    def spec_fn(samples):
        feat = cfp.features(samples)  # [T, 360, 3]
        return np.ascontiguousarray(feat.transpose(0, 2, 1))

    return build_external_eval_datasets(
        spec_fn, sr=8000, labels_on_10ms=True, debug=debug
    )


def main(argv=None):
    """TONet app with the reference's ablation axes: --backbone and --mode
    (tonet/model/tonet.py:24-265) are consumed here and baked into the
    model factory; everything else flows to the shared app template."""
    import argparse
    import dataclasses
    import sys

    from ..models.tonet import TONET_BACKBONES, TONET_MODES

    pre = argparse.ArgumentParser(add_help=False)
    pre.add_argument("--backbone", default="ftanet", choices=TONET_BACKBONES,
                     help="acoustic backbone for both branches")
    pre.add_argument("--mode", default="all", choices=TONET_MODES,
                     help="TONet ablation mode: all (dual+transformer), "
                          "spat (single+transformer), spl (single+linear), "
                          "tcfp (dual, direct fusion), single (bare "
                          "backbone)")
    pre.add_argument("--labels", default="m2m3", choices=("m2m3", "yu"),
                     help="label source: m2m3 (MedleyDB MELODY2 + vocal "
                          "sections) or yu (precomputed $fatnet_spec/f0ref "
                          "references, tonet/main_shaun.py:386-406)")
    known, rest = pre.parse_known_args(
        argv if argv is not None else sys.argv[1:]
    )
    cfg = config()
    if known.backbone != "ftanet" or known.mode != "all":
        cfg = dataclasses.replace(
            cfg,
            make_model=lambda **kw: TONet(
                mode=known.mode, backbone=known.backbone, **kw
            ),
        )

    def build_datasets(debug=False):
        return build_real_datasets(debug=debug, labels=known.labels)

    return app_main(cfg, build_datasets, rest,
                    build_external_datasets=build_external_datasets)


if __name__ == "__main__":
    main()
