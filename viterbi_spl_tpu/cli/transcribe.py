"""End-to-end transcription: wav files in, melody lines out.

The top of the serving stack. `cli/decode.py` starts from saved
posteriorgram files (the framework's interchange format); this entry point
owns the whole chain for one or more wav files:

    wav -> family front-end (NSGT / CFP / STFT)
        -> acoustic model restored from an orbax checkpoint
        -> observation model + batched TPU Viterbi decode
        -> MIREX melody lines (or .npz decode vectors)

For the `imm` family the chain is checkpoint-free: sinebell STFT -> IMM
NMF fit (device-side patience loop) -> log-energy pitch logits, matching
the reference's per-recording pipeline (imm/main_imm.py:1139-1180).

The reference has no single-file entry point — each experiment script
embeds this chain for its own dataset (e.g. dcnet/softmax_viterbi.py:
2419-2432, tonet/main_shaun.py inference path); the per-family front-end
chains below mirror the apps' real-data builders exactly.

    python -m viterbi_spl_tpu.cli.transcribe song.wav \
        --family ftanet --ckpt ckpts/ftanet --artifacts hmm_dir \
        --out melodies/

The voicing threshold defaults to the checkpoint's validated value
(TrainState.voicing_threshold, the 99-point grid winner) — pass
--threshold to override.
"""

from __future__ import annotations

import argparse
import dataclasses
import sys
from pathlib import Path

import numpy as np

from ..harness.evaluate import ALLOWED_VITERBI_METHODS
from .decode import build_setup as decode_build_setup
from .decode import decode_named_logits

# wav sample rate each family's front-end expects (the apps' builders)
FAMILY_SR = {
    "dcnet": 44100,  # NSGT on 44.1 kHz (dcnet/nsgt.py)
    "msnet": 44100,  # CFP msnet config (msnet/hsieh_m2m3.py)
    "ftanet": 8000,
    "jdc": 8000,
    "tonet": 8000,
}


def features_from_samples(family: str, samples: np.ndarray) -> np.ndarray:
    """samples (float32, at FAMILY_SR[family]) -> the family's model input.

    One-to-one with the apps' real-data spec_fns (apps/{family}.py
    build_real_datasets) so a transcribed wav sees exactly the training
    feature chain.
    """
    if family == "dcnet":
        from ..frontend.nsgt import dcnet_feature, nsgt_for_length

        nsgt = nsgt_for_length(len(samples))
        return dcnet_feature(nsgt.transform_track(samples))
    if family in ("msnet", "ftanet", "tonet"):
        from ..frontend import CFP, FTANET_CFP, MSNET_CFP, TONET_CFP

        cfp_cfg = {
            "msnet": MSNET_CFP, "ftanet": FTANET_CFP, "tonet": TONET_CFP
        }[family]
        feat = CFP(cfp_cfg).features(samples)
        if family == "tonet":
            # tonet models take [T, 3, 360] (tonet/main_shaun.py layout)
            feat = np.ascontiguousarray(feat.transpose(0, 2, 1))
        return feat
    if family == "jdc":
        from ..frontend import jdc_spectrogram

        return jdc_spectrogram(samples)
    raise ValueError(f"unknown family {family!r}")


class _WavDataset:
    """Minimal TrackDataset-shaped view over in-memory features (no labels:
    transcription has none), enough for model_logits_for_dataset."""

    def __init__(self, names, specs):
        from ..data.registry import Track

        empty = np.zeros(0, np.float32)
        self.track_ids = tuple(names)
        self.tracks = [
            Track(
                track_id=n,
                spectrogram=np.asarray(s, np.float32),
                notes=np.zeros(len(s), np.float32),
                original_times=empty,
                original_freqs=empty,
            )
            for n, s in zip(names, specs)
        ]

    def __len__(self):
        return len(self.tracks)

    def __getitem__(self, idx):
        return self.tracks[idx]


def nn_logits_from_wavs(family: str, paths, ckpt: str, bf16: bool = False):
    """wav paths -> (per-track [T, n_bins] logits, restored TrainState)."""
    import importlib

    import jax.numpy as jnp
    import optax

    from ..apps.common import init_model, model_logits_for_dataset
    from ..harness.train import Trainer, TrainState
    from ..io.wav import load_wav

    cfg = importlib.import_module(
        f"viterbi_spl_tpu.apps.{family}"
    ).config()
    if bf16:
        cfg = dataclasses.replace(cfg, compute_dtype=jnp.bfloat16)
    sr = FAMILY_SR[family]
    specs = [
        features_from_samples(family, load_wav(p, sr=sr)[0]) for p in paths
    ]
    dataset = _WavDataset([p.stem for p in paths], specs)

    # model init mirrors app_main's sample-shape logic, then the orbax
    # restore path the apps' infer mode uses
    sample = specs[0][: cfg.snippet_len][None]
    if cfg.fixed_chunks and sample.shape[1] < cfg.snippet_len:
        pad = cfg.snippet_len - sample.shape[1]
        sample = np.pad(
            sample, [(0, 0), (0, pad)] + [(0, 0)] * (sample.ndim - 2)
        )
    if cfg.input_adapter is not None:
        sample = np.asarray(cfg.input_adapter(jnp.asarray(sample)))
    model, params, batch_stats = init_model(cfg, sample)
    tx = optax.adam(cfg.learning_rate)
    state = TrainState(
        params=params, batch_stats=batch_stats, opt_state=tx.init(params)
    )
    state = Trainer(None, None, ckpt_path=ckpt).restore(state)
    return model_logits_for_dataset(cfg, model, state, dataset), state


def imm_logits_from_wavs(paths, debug: bool = False):
    """wav paths -> (per-track log-energy logits, DecoderSetup builder arg).

    Checkpoint-free: the NMF is fitted per recording at inference, as in
    the reference (imm/main_imm.py:1139-1180)."""
    from ..apps.imm import build_setup as imm_build_setup
    from ..apps.imm import debug_imm_config
    from ..io.wav import load_wav
    from ..models.adapters import imm_pitch_logits
    from ..models.imm import IMM, IMMConfig

    imm = IMM(debug_imm_config() if debug else IMMConfig())
    logits = []
    for p in paths:
        samples, _ = load_wav(p, sr=imm.config.fs)
        logits.append(imm_pitch_logits(imm.logits(samples)))
    return logits, imm, imm_build_setup


def run_imm_separation(paths, names, args):
    """imm --separate: per input, the stereo separation pass writes
    <out>/<name>_melody.wav + <name>_accompaniment.wav (stereo, at the imm
    sample rate) and the decoded melody line (imm/tf_imm.py:354-618)."""
    from ..apps.imm import build_setup as imm_build_setup
    from ..apps.imm import debug_imm_config, separate_stereo_samples
    from ..io.wav import load_wav, save_wav
    from ..models.imm import IMM, IMMConfig

    imm = IMM(debug_imm_config() if args.debug else IMMConfig())
    setup = imm_build_setup(imm, method=args.method)
    if args.threshold is not None:
        setup = dataclasses.replace(setup, voicing_threshold=args.threshold)

    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    results = []
    for path, name in zip(paths, names):
        samples, _ = load_wav(path, sr=imm.config.fs, mono=False)
        if samples.ndim == 1:
            print(f"{name}: mono input — separating with identical channels")
            left = right = samples
        else:
            left, right = samples[:, 0], samples[:, 1]
        r = separate_stereo_samples(imm, left, right, setup)
        save_wav(out_dir / f"{name}_melody.wav", r["melody"], imm.config.fs)
        save_wav(
            out_dir / f"{name}_accompaniment.wav", r["accompaniment"],
            imm.config.fs,
        )
        # the melody line alongside (times + Hz, unvoiced = 0)
        T = len(r["states"])
        times = np.arange(T) * imm.config.h / imm.config.fs
        f0s = imm.melody_f0s(r["states"], r["voiced"])
        np.savetxt(
            out_dir / f"{name}_melody.txt",
            np.stack([times, f0s], axis=1),
            fmt="%.6f",
        )
        print(f"{name}: separated -> {out_dir}")
        results.append(r)
    return results


def main(argv=None):
    ap = argparse.ArgumentParser(
        description="End-to-end melody transcription (wav -> melody lines)"
    )
    ap.add_argument("inputs", nargs="+", help="wav files")
    ap.add_argument("--family", required=True, choices=sorted(FAMILY_SR) + ["imm"])
    ap.add_argument("--ckpt", default=None,
                    help="orbax checkpoint dir (required for the NN "
                         "families; imm fits its NMF per recording)")
    ap.add_argument("--artifacts", default=None,
                    help="dir with viterbi_transition_matrix.dat + "
                         "viterbi_init_probs.dat (NN families; imm builds "
                         "its analytic transition)")
    ap.add_argument("--out", required=True)
    ap.add_argument("--method", default="shaun",
                    choices=list(ALLOWED_VITERBI_METHODS))
    ap.add_argument("--threshold", type=float, default=None,
                    help="voicing threshold; defaults to the checkpoint's "
                         "validated value (or the family default for imm)")
    ap.add_argument("--batch", type=int, default=16,
                    help="tracks decoded together per kernel launch")
    ap.add_argument("--format", default="txt", choices=["txt", "npz"])
    ap.add_argument("--fused-obs", action="store_true",
                    help="fused Pallas observation kernel serving path")
    ap.add_argument("--mesh", default=None,
                    help="shard the decode batch over a device mesh, "
                         "e.g. data=8")
    ap.add_argument("--bf16", action="store_true",
                    help="run the model's convs/denses/LSTMs in bfloat16")
    ap.add_argument("--debug", action="store_true",
                    help="imm only: tiny NMF configuration (fast smoke)")
    ap.add_argument("--separate", action="store_true",
                    help="imm only: stereo source separation — the second "
                         "melody-constrained NMF pass with per-channel "
                         "gains + Wiener-mask resynthesis writes "
                         "<name>_melody.wav and <name>_accompaniment.wav "
                         "next to the melody lines (imm/tf_imm.py:354-618)")
    args = ap.parse_args(argv)

    paths = [Path(p) for p in args.inputs]
    missing = [p for p in paths if not p.exists()]
    if missing:
        sys.exit(f"missing input files: {missing}")
    names = [p.stem for p in paths]

    if args.separate and args.family != "imm":
        sys.exit("--separate is the imm stereo separation pass")

    if args.separate:
        return run_imm_separation(paths, names, args)

    if args.family == "imm":
        logits_list, imm, imm_build_setup = imm_logits_from_wavs(
            paths, debug=args.debug
        )
        setup = imm_build_setup(imm, method=args.method)
        overrides = {}
        if args.threshold is not None:
            overrides["voicing_threshold"] = args.threshold
        if args.fused_obs:
            overrides["fused_obs"] = True
        if args.mesh:
            from .decode import parse_mesh

            overrides["mesh"] = parse_mesh(args.mesh)
        if overrides:
            setup = dataclasses.replace(setup, **overrides)
    else:
        if args.ckpt is None:
            sys.exit(f"--ckpt is required for family {args.family}")
        if args.artifacts is None:
            sys.exit(f"--artifacts is required for family {args.family}")
        logits_list, state = nn_logits_from_wavs(
            args.family, paths, args.ckpt, bf16=args.bf16
        )
        threshold = (
            args.threshold if args.threshold is not None
            else float(state.voicing_threshold)
        )
        setup = decode_build_setup(
            argparse.Namespace(
                family=args.family, artifacts=args.artifacts,
                threshold=threshold, method=args.method, mesh=args.mesh,
                fused_obs=args.fused_obs,
            )
        )

    results = decode_named_logits(setup, names, logits_list, args)
    voiced_frames = sum(int(r["voiced"].sum()) for r in results)
    total = sum(len(r["voiced"]) for r in results)
    print(
        f"transcribed {len(results)} tracks, {total} frames "
        f"({voiced_frames} voiced) -> {args.out}"
    )
    return results


if __name__ == "__main__":
    main()
