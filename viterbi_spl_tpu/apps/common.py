"""Shared application template.

Reproduces the reference's per-script shape (Config -> AcousticModel ->
TFDataset(s) -> Metrics -> Model -> main() with training_fn/inference_fn,
e.g. dcnet/softmax_viterbi.py:3377-3602) on top of the harness:

- a synthetic-data factory standing in for the dataset roots (the
  reference's DEBUG mode truncates real splits; without mounted corpora we
  synthesize tiny melodic tracks instead),
- a generic jitted train step (BatchNorm/dropout aware, optional manual
  weight decay and l2 regularization),
- a validation pass producing the 99-point threshold grid and mean OA,
- the Trainer loop (early stopping + orbax checkpoints + resume),
- an inference pass running the dual raw/Viterbi evaluation with HMM
  parameters built on the fly from the validation labels.
"""

from __future__ import annotations

import argparse
import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data import TrackDataset, training_snippets
from ..data.snippets import inference_snippets
from ..families import FamilySpec
from ..harness import Trainer, TrainState
from ..harness.evaluate import DecoderSetup, evaluate_posteriorgrams
from ..hmm import params as hmm_params
from ..metrics.melody import MelodyMetrics, est_notes_interp, frame_counts
from ..metrics.mel_eval import midi_to_hz


@dataclasses.dataclass
class AppConfig:
    family: FamilySpec
    make_model: Callable[..., object]  # accepts dtype=... (compute dtype)
    loss_fn: Callable  # (notes, model_output) -> scalar
    logits_adapter: Callable  # model_output -> [B, T, n_bins] pitch logits
    snippet_len: int
    batch_size: int
    learning_rate: float
    feature_shape: tuple  # per-frame feature shape, e.g. (320, 3)
    # fixed-input models (ftanet/jdc/tonet) require exactly snippet_len
    # frames: inference zero-pads chunks (chunk_fixed) instead of serving a
    # ragged final snippet
    fixed_chunks: bool = False
    # optional transform from [B, T, ...] snippet layout to the model's
    # input layout (e.g. tonet wants [B, 3, 360, T])
    input_adapter: Callable | None = None
    # mixed precision: compute dtype for the model's convs/denses/LSTMs
    # (params, BatchNorm statistics, losses, and logits stay float32)
    compute_dtype: object = jnp.float32
    # the model accepts valid_frames= and masks padded frames exactly
    # (dcnet/msnet): ragged final snippets are bucket-padded to O(log T)
    # compiled shapes; logits match the per-length forward to XLA
    # vectorization ulp (models/dcnet.py docstring, tests/test_bucketing.py)
    supports_valid_frames: bool = False


def synthetic_dataset(
    cfg: AppConfig, n_tracks: int, frames: int, seed: int
) -> TrackDataset:
    """Tiny synthetic tracks: wandering melody notes + noisy features that
    carry the label (a learnable mapping for smoke training)."""
    rng = np.random.default_rng(seed)
    spec_store: dict[str, np.ndarray] = {}
    label_store: dict[str, dict] = {}
    note_range = cfg.family.note_range
    n_bins = cfg.family.n_bins

    for i in range(n_tracks):
        tid = f"syn{i}"
        path = np.clip(
            n_bins // 2 + np.cumsum(rng.integers(-2, 3, frames)), 0, n_bins - 1
        )
        voiced = np.repeat(rng.random(frames // 20 + 1) > 0.25, 20)[:frames]
        notes = np.where(voiced, note_range[path], 0.0).astype(np.float32)
        feat = rng.normal(0, 0.3, (frames, *cfg.feature_shape)).astype(np.float32)
        # embed the label as a bump in the first feature channel
        bins = np.minimum(
            (path * cfg.feature_shape[0]) // n_bins, cfg.feature_shape[0] - 1
        )
        sel = (np.arange(frames), bins) + (0,) * (len(cfg.feature_shape) - 1)
        feat[sel] += np.where(voiced, 2.0, 0.0)
        freqs = np.where(notes > 0, midi_to_hz(notes), 0.0)
        spec_store[tid] = feat
        label_store[tid] = dict(
            notes=notes,
            original=dict(times=np.arange(frames) * cfg.family.hop_seconds,
                          freqs=freqs),
        )

    return TrackDataset(
        list(spec_store), lambda t: spec_store[t], lambda t: label_store[t]
    )


def init_model(cfg: AppConfig, sample_batch: np.ndarray):
    model = cfg.make_model(dtype=cfg.compute_dtype)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(sample_batch), train=False
    )
    return model, variables["params"], variables.get("batch_stats", {})


def make_train_step(cfg: AppConfig, model, tx):
    @jax.jit
    def train_step(params, batch_stats, opt_state, batch, step):
        spec, notes = batch
        if cfg.input_adapter is not None:
            spec = cfg.input_adapter(spec)
        # fresh dropout masks every step (the reference trains with
        # stochastic dropout, dcnet/softmax_viterbi.py:3399-3434)
        dropout_rng = jax.random.fold_in(jax.random.PRNGKey(1), step)

        def loss(p):
            out, upd = model.apply(
                {"params": p, "batch_stats": batch_stats},
                spec,
                train=True,
                rngs={"dropout": dropout_rng},
                mutable=["batch_stats"],
            )
            return cfg.loss_fn(notes, out), upd["batch_stats"]

        (l, bs), grads = jax.value_and_grad(loss, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, bs, opt_state, l

    return train_step


def model_logits_for_dataset(cfg: AppConfig, model, state: TrainState, dataset):
    """Ordered inference over a dataset -> per-track pitch logits [T, n_bins]."""
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    @jax.jit
    def forward(spec):
        if cfg.input_adapter is not None:
            spec = cfg.input_adapter(spec)
        return model.apply(variables, spec, train=False)

    if cfg.fixed_chunks:
        from ..data import chunk_fixed

        out_list = []
        for track in dataset.tracks:
            chunks, _, T = chunk_fixed(
                track.spectrogram, track.notes, cfg.snippet_len
            )
            logits = np.concatenate(
                [np.asarray(cfg.logits_adapter(forward(jnp.asarray(c)[None])))[0]
                 for c in chunks],
                axis=0,
            )
            out_list.append(logits[:T])
        return out_list

    @jax.jit
    def forward_masked(spec, valid):
        if cfg.input_adapter is not None:
            spec = cfg.input_adapter(spec)
        return model.apply(variables, spec, train=False, valid_frames=valid)

    per_track: dict[int, list[np.ndarray]] = {}
    for item in inference_snippets(dataset, cfg.snippet_len):
        spec = item["spectrogram"]
        T_snip = spec.shape[0]
        if cfg.supports_valid_frames and T_snip < cfg.snippet_len:
            # ragged final snippet: bucket-pad and mask (the model zeroes
            # padded frames before every time-mixing conv; op-level
            # bit-exact, ~1e-7 under jit — tests/test_bucketing.py)
            from ..utils import shape_bucket

            T_b = min(shape_bucket(T_snip, quantum=32), cfg.snippet_len)
            padded = np.zeros((T_b, *spec.shape[1:]), spec.dtype)
            padded[:T_snip] = spec
            out = forward_masked(jnp.asarray(padded)[None], jnp.int32(T_snip))
            logits = np.asarray(cfg.logits_adapter(out))[0, :T_snip]
        else:
            out = forward(jnp.asarray(spec)[None])
            logits = np.asarray(cfg.logits_adapter(out))[0]
        per_track.setdefault(item["rec_idx"], []).append(logits)
    return [
        np.concatenate(per_track[i], axis=0)[: dataset[i].num_frames]
        for i in range(len(dataset))
    ]


def make_validate(cfg: AppConfig, model, dataset):
    def validate(state: TrainState) -> dict:
        logits_list = model_logits_for_dataset(cfg, model, state, dataset)
        mm = MelodyMetrics.validation_grid(len(dataset))
        for rec_idx, logits in enumerate(logits_list):
            probs = jax.nn.sigmoid(jnp.asarray(logits))
            peak_idx = jnp.argmax(probs, axis=1).astype(jnp.int32)
            peak_probs = jnp.take_along_axis(probs, peak_idx[:, None], axis=1)[:, 0]
            est = est_notes_interp(
                peak_idx, probs, cfg.family.note_min,
                cfg.family.bins_per_semitone, cfg.family.n_bins,
            )
            counts = frame_counts(
                jnp.asarray(dataset[rec_idx].notes), est, peak_probs,
                jnp.asarray(mm.thresholds),
            )
            mm.update(rec_idx, {k: np.asarray(v) for k, v in counts.items()})
        idx, th = mm.best_voicing_threshold()
        return dict(oa=float(mm.results(idx)["oa"].mean()), voicing_threshold=th)

    return validate


def build_decoder_setup(cfg: AppConfig, val_dataset, voicing_threshold: float,
                        method: str = "shaun") -> DecoderSetup:
    """HMM parameters from the validation labels (the reference's offline
    pipeline, SURVEY.md §3.5), then a DecoderSetup for this family."""
    spec = cfg.family
    note_max = float(spec.note_range[-1])
    q = [
        hmm_params.quantize_ref_notes(
            t.notes, spec.note_min, note_max, spec.bins_per_semitone, spec.n_bins
        )
        for t in val_dataset.tracks
    ]
    stats = hmm_params.count_statistics(q, spec.n_bins)
    A = hmm_params.shape_transition_matrix(
        stats.transition_counts, stats.switch, spec.n_bins,
        spec.d_max or 12, spec.floor or 2,
    )
    pi = hmm_params.shape_init_probs(stats.p_steady)
    return DecoderSetup(
        transition_matrix=A, init_probs=pi, n_bins=spec.n_bins,
        note_min=spec.note_min, bins_per_semitone=spec.bins_per_semitone,
        spw=spec.spw, voicing_threshold=voicing_threshold,
        hop_seconds=spec.hop_seconds, method=method,
    )


def run_inference(cfg: AppConfig, model, state, dataset, setup) -> dict:
    logits_list = model_logits_for_dataset(cfg, model, state, dataset)
    tracks = [
        dict(
            logits=lg,
            notes=track.notes,
            original=dict(times=track.original_times, freqs=track.original_freqs),
        )
        for lg, track in zip(logits_list, dataset.tracks)
    ]
    return evaluate_posteriorgrams(setup, tracks)


def app_main(cfg: AppConfig, build_real_datasets: Callable | None, argv=None):
    ap = argparse.ArgumentParser(description=f"{cfg.family.name} app")
    ap.add_argument(
        "mode",
        choices=["train", "infer", "sweep-threshold", "hard-vs-auto", "sweep-obs"],
        help="train/infer, or the calibration experiments: sweep-threshold "
        "(ftanet/threshold.py, */determine_threshold*.py), hard-vs-auto "
        "(tonet/hard_thresholding_vs_automatic_thresholding.py), sweep-obs "
        "(tonet/hyper_parameter_selection.py)",
    )
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--debug", action="store_true")
    ap.add_argument("--ckpt", default=f"ckpts/{cfg.family.name}")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--epochs", type=int, default=10_000)
    ap.add_argument("--steps-per-epoch", type=int, default=None)
    ap.add_argument("--patience", type=int, default=20)
    ap.add_argument("--viterbi-method", default="shaun")
    ap.add_argument("--hard-threshold", type=float, default=0.5,
                    help="fixed threshold for hard-vs-auto mode")
    ap.add_argument("--log-dir", default=None)
    ap.add_argument("--tensorboard", action="store_true",
                    help="mirror --log-dir scalars/tables into TensorBoard "
                         "event files (the reference's TBSummary surface)")
    ap.add_argument("--dump-tracks", default=None,
                    help="directory for per-track piano-roll figures + npz "
                         "dumps (the dcnet/lontano.py analysis outputs)")
    ap.add_argument("--native-prefetch", action="store_true",
                    help="assemble training batches on the C++ prefetch "
                         "ring (native/prefetch.py) instead of the Python "
                         "generator — the reference's tf.data prefetch role")
    ap.add_argument("--bf16", action="store_true",
                    help="mixed precision: run the model's convs/denses/"
                         "LSTMs in bfloat16 (MXU-native); params, BatchNorm "
                         "statistics, losses, and logits stay float32")
    ap.add_argument("--mesh", default=None, metavar="data=N",
                    help="data-parallel training over an N-device mesh: "
                         "the batch shards over the 'data' axis, state is "
                         "replicated, and GSPMD inserts the gradient "
                         "all-reduce. Requires batch-size divisible by N "
                         "(raised to N if smaller). Same loss curve as "
                         "single-device at the same global batch (tested).")
    args = ap.parse_args(argv)
    if args.bf16:
        cfg = dataclasses.replace(cfg, compute_dtype=jnp.bfloat16)

    mesh = None
    if args.mesh:
        from ..dist import make_mesh

        try:
            kv = dict(part.split("=", 1) for part in args.mesh.split(","))
            n_data = int(kv.pop("data", 1))
        except ValueError:
            raise SystemExit(
                f"--mesh: expected comma-separated axis=N (e.g. data=8), "
                f"got {args.mesh!r}"
            )
        if kv:
            raise SystemExit(f"--mesh: only data=N is supported, got {kv}")
        if len(jax.devices()) < n_data:
            raise SystemExit(
                f"--mesh data={n_data}: only {len(jax.devices())} devices"
            )
        mesh = make_mesh(data=n_data, seq=1)
        if cfg.batch_size % n_data:
            new_bs = -(-cfg.batch_size // n_data) * n_data
            print(f"--mesh data={n_data}: raising batch size "
                  f"{cfg.batch_size} -> {new_bs} (must divide evenly)")
            cfg = dataclasses.replace(cfg, batch_size=new_bs)

    if args.synthetic:
        n, frames = (2, 400) if args.debug else (6, 2000)
        datasets = dict(
            training=synthetic_dataset(cfg, n, frames, 0),
            validation=synthetic_dataset(cfg, max(n // 2, 1), frames, 1),
            test=synthetic_dataset(cfg, max(n // 2, 1), frames, 2),
        )
    else:
        if build_real_datasets is None:
            raise SystemExit("real datasets not wired for this family yet")
        datasets = build_real_datasets(debug=args.debug)

    sample = datasets["training"][0].spectrogram[: cfg.snippet_len][None]
    if cfg.fixed_chunks and sample.shape[1] < cfg.snippet_len:
        pad = cfg.snippet_len - sample.shape[1]
        sample = np.pad(sample, [(0, 0), (0, pad)] + [(0, 0)] * (sample.ndim - 2))
    if cfg.input_adapter is not None:
        sample = np.asarray(cfg.input_adapter(jnp.asarray(sample)))

    model, params, batch_stats = init_model(cfg, sample)
    tx = optax.adam(cfg.learning_rate)
    state = TrainState(params=params, batch_stats=batch_stats,
                       opt_state=tx.init(params))
    validate = make_validate(cfg, model, datasets["validation"])
    trainer = Trainer(
        make_train_step(cfg, model, tx), validate, ckpt_path=args.ckpt,
        patience_epochs=args.patience, max_epochs=args.epochs,
    )

    if args.mode == "train":
        rng = np.random.default_rng(0)

        prefetcher = None
        if args.native_prefetch:
            from ..native.prefetch import SnippetPrefetcher

            try:
                prefetcher = SnippetPrefetcher(
                    datasets["training"], cfg.snippet_len, cfg.batch_size, rng
                )
            except ValueError as e:
                print(f"native prefetch unavailable ({e}); "
                      "using the Python pipeline")

        if prefetcher is not None:

            def batches():
                for spec, notes in prefetcher:
                    # the prefetcher yields owned copies (ring slots are
                    # released before yield), so the async H2D transfer
                    # can complete at its own pace
                    yield jnp.asarray(spec), jnp.asarray(notes)
        else:
            snippets = training_snippets(
                datasets["training"], cfg.snippet_len, rng
            )

            def batches():
                while True:
                    raw = [next(snippets) for _ in range(cfg.batch_size)]
                    items = [
                        i for i in raw if len(i["notes"]) == cfg.snippet_len
                    ]
                    if mesh is not None:
                        # sharded batches need the full fixed size: keep
                        # drawing full-length snippets
                        while len(items) < cfg.batch_size:
                            it = next(snippets)
                            if len(it["notes"]) == cfg.snippet_len:
                                items.append(it)
                    else:
                        items = items or raw[:1]
                    spec = jnp.asarray(np.stack([i["spectrogram"] for i in items]))
                    notes = jnp.asarray(np.stack([i["notes"] for i in items]))
                    yield spec, notes

        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            from ..data.snippets import snippet_index

            # sharded batches carry only full-length snippets; make sure
            # the corpus has some (otherwise the redraw loop cannot fill a
            # fixed-size batch — e.g. --debug tracks shorter than the
            # snippet length)
            n_full = sum(
                1 for _, s, e in snippet_index(datasets["training"],
                                               cfg.snippet_len)
                if e - s == cfg.snippet_len
            )
            if n_full == 0:
                raise SystemExit(
                    f"--mesh: no track has {cfg.snippet_len} frames; "
                    "sharded batches need full-length snippets"
                )
            batch_sharding = NamedSharding(mesh, P("data"))
            replicated = NamedSharding(mesh, P())
            state = TrainState(
                params=jax.device_put(state.params, replicated),
                batch_stats=jax.device_put(state.batch_stats, replicated),
                opt_state=jax.device_put(state.opt_state, replicated),
            )
            inner_batches = batches

            def batches():
                for spec, notes in inner_batches():
                    yield (jax.device_put(spec, batch_sharding),
                           jax.device_put(notes, batch_sharding))

        steps = args.steps_per_epoch or max(
            len(datasets["training"]) * 4, 8
        )
        reporter = None
        if args.log_dir:
            from .. harness.reporting import Reporter

            reporter = Reporter(args.log_dir, tensorboard=args.tensorboard)

        def on_epoch_end(st, info):
            if reporter is not None:
                reporter.scalar("train_loss", info["train_loss"], st.epoch)
                reporter.scalar("val_oa", info["val"]["oa"], st.epoch)
                reporter.scalar(
                    "voicing_threshold", st.voicing_threshold, st.epoch
                )

        state = trainer.fit(
            state, batches(), steps, resume=args.resume,
            on_epoch_end=on_epoch_end,
        )
        if reporter is not None:
            reporter.close()
        print(f"best val OA {state.best_oa:.4f} @ epoch {state.best_epoch}, "
              f"threshold {state.voicing_threshold:.2f}")
        return state

    state = trainer.restore(state)
    setup = build_decoder_setup(
        cfg, datasets["validation"], state.voicing_threshold, args.viterbi_method
    )

    if args.mode in ("sweep-threshold", "hard-vs-auto", "sweep-obs"):
        from .reports import run_calibration_mode

        return run_calibration_mode(
            args.mode, cfg, model, state, datasets, setup,
            hard_threshold=args.hard_threshold,
        )
    reporter = None
    if args.log_dir:
        from ..harness.reporting import Reporter

        reporter = Reporter(args.log_dir, tensorboard=args.tensorboard)
    for split in ("validation", "test"):
        out = run_inference(cfg, model, state, datasets[split], setup)
        print(
            f"{split}: raw OA {out['raw_mean_oa']:.4f}, "
            f"viterbi OA {out['viterbi_mean_oa']:.4f}"
        )
        if reporter is not None:
            names = list(datasets[split].track_ids)
            reporter.table(f"{split}/raw", out["raw"], names)
            reporter.table(f"{split}/viterbi", out["viterbi"], names)
        if args.dump_tracks and split == "test":
            dump_analysis_tracks(cfg, model, state, datasets[split], setup,
                                 args.dump_tracks)
    if reporter is not None:
        reporter.close()
    return state


def dump_analysis_tracks(cfg, model, state, dataset, setup, out_dir):
    """Per-track reference/viterbi/raw piano-roll figures + npz dumps — the
    analysis layer (dcnet/lontano.py effect_of_viterbi_fn, nn_problem.py)."""
    from pathlib import Path

    from ..harness.evaluate import decode_and_score_track
    from ..harness.reporting import dump_track_npz, piano_roll_figure

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    logits_list = model_logits_for_dataset(cfg, model, state, dataset)
    for track, logits in zip(dataset.tracks, logits_list):
        r = decode_and_score_track(setup, logits, track.notes)
        piano_roll_figure(
            out / f"{track.track_id}.png",
            track.notes,
            r["est_notes_viterbi"], r["viterbi_voiced"],
            r["est_notes_raw"], r["raw_voiced"],
            title=track.track_id,
        )
        dump_track_npz(
            out / f"{cfg.family.name}_{track.track_id}.npz",
            ref_notes=track.notes,
            viterbi_notes=r["est_notes_viterbi"],
            viterbi_voicing=r["viterbi_voiced"],
            raw_notes=r["est_notes_raw"],
            raw_voicing=r["raw_voiced"],
            viterbi_bins=r["viterbi_bins"],
        )


def build_external_eval_datasets(
    spec_fn: Callable[[np.ndarray], np.ndarray],
    sr: int,
    labels_on_10ms: bool = False,
    debug: bool = False,
) -> dict[str, TrackDataset]:
    """Evaluation datasets beyond MedleyDB (the reference evaluates every
    family on adc04/mirex05/mir1k/rwc as well; dcnet/softmax_viterbi.py
    §TFDatasetForAdc04.. ForRWC). `spec_fn` maps raw samples (at `sr`) to
    features; labels are resampled to 10 ms when the family uses that hop.
    Only corpora whose env-var roots are set are returned."""
    import os

    from ..data import adc04_track_ids, mir1k_track_ids, mirex05_track_ids
    from ..data.labels import (
        adc04_label,
        mir1k_label,
        mirex05_label,
        resample_notes_to_10ms,
        rwc_label,
        rwc_rec_files,
    )
    from ..io.wav import load_aiff, load_wav

    def maybe_10ms(lb):
        if labels_on_10ms:
            lb["notes"] = resample_notes_to_10ms(lb["notes"])
        return lb

    out: dict[str, TrackDataset] = {}

    if os.environ.get("adc04"):
        tids = adc04_track_ids()[: 2 if debug else None]
        root = os.environ["adc04"]
        out["adc04"] = TrackDataset(
            tids,
            lambda t: spec_fn(load_wav(os.path.join(root, t + ".wav"), sr=sr)[0]),
            lambda t: maybe_10ms(adc04_label(t)),
            max_length_diff=2,
        )

    if os.environ.get("mirex05"):
        tids = mirex05_track_ids()[: 2 if debug else None]
        root = os.environ["mirex05"]
        out["mirex05"] = TrackDataset(
            tids,
            lambda t: spec_fn(load_wav(os.path.join(root, t + ".wav"), sr=sr)[0]),
            lambda t: maybe_10ms(mirex05_label(t)),
            max_length_diff=2,
        )

    if os.environ.get("mir1k"):
        root = os.environ["mir1k"]
        tids = mir1k_track_ids()[: 2 if debug else None]

        def mir1k_lb(t):
            import wave

            with wave.open(
                os.path.join(root, "Wavfile", t + ".wav"), "rb"
            ) as fh:
                n = fh.getnframes()
            return maybe_10ms(mir1k_label(t, n))

        out["mir1k"] = TrackDataset(
            tids,
            lambda t: spec_fn(
                load_wav(os.path.join(root, "Wavfile", t + ".wav"), sr=sr)[0]
            ),
            mir1k_lb,
            max_length_diff=2,
        )

    if os.environ.get("rwc"):
        rec_files = rwc_rec_files()
        n = 2 if debug else len(rec_files)

        def rwc_spec(t):
            samples, file_sr = load_aiff(rec_files[int(t)])
            if file_sr != sr:
                from ..io.wav import resample_poly
                from math import gcd

                g = gcd(sr, file_sr)
                samples = resample_poly(samples, sr // g, file_sr // g).astype(
                    np.float32
                )
            return spec_fn(samples)

        def rwc_lb(t):
            samples, file_sr = load_aiff(rec_files[int(t)])
            frames_10ms = (len(samples) + file_sr // 100 - 1) // (file_sr // 100)
            return maybe_10ms(rwc_label(int(t), frames_10ms))

        out["rwc"] = TrackDataset(
            [str(i) for i in range(n)], rwc_spec, rwc_lb, max_length_diff=2
        )

    return out
