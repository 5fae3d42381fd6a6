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
    # inference normalizes with the track's own chunk-batch statistics
    # (train=True forward, updates discarded) instead of the BN running
    # averages. ftanet needs this: its 7 stacked attention modules only
    # function under per-batch self-correcting normalization — with EMA
    # stats (even freshly recalibrated at converged params) the eval-mode
    # output collapses to a constant bin while train-mode RPA on the SAME
    # validation data is 0.995 (round-5 diagnosis, DESIGN §6.3).
    # Deterministic: no dropout at inference, stats from the track itself.
    eval_batch_stats: bool = False
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
    # manual weight decay on a single kernel: (param path, wd). The dcnet
    # rule — grad += wd * w on the global conv kernel only, applied every
    # step (dcnet/softmax_viterbi.py:293-364 + :3426)
    weight_decay: tuple | None = None
    # l2 regularization added to the training loss: (param paths, scale).
    # The jdc kernels carry l2(1e-5) (jdc/acoustic_module.py:35,39,64)
    l2_reg: tuple | None = None
    # learning-rate schedule factory (base_lr, steps_per_epoch) -> step fn;
    # feeds optax.adam (tonet's warm-up/decay, tonet/model/tonet.py:474-490)
    lr_schedule: Callable | None = None
    # model output -> [B, T] voicing logits (jdc's combined voicing head,
    # jdc/acoustic_module.py:74-81). When set, the raw path's voicing
    # decision and the validation threshold grid score this head instead of
    # the peak pitch probability
    voicing_adapter: Callable | None = None


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
    """Jitted train step. Returns (params, batch_stats, opt_state, loss,
    counts) where `counts` is the full training-split metric count dict
    computed ON DEVICE from this batch's logits (the reference accumulates
    VRR..OA over training batches every epoch,
    dcnet/softmax_viterbi.py:1599-1850) — a dozen int64 scalars, no
    posteriorgram readback."""
    spec_family = cfg.family

    def train_counts(notes, out, threshold):
        logits = cfg.logits_adapter(out)  # [B, T, n_bins]
        n_bins = logits.shape[-1]
        probs = jax.nn.sigmoid(logits.reshape(-1, n_bins))
        ref = notes.reshape(-1)
        peak_idx = jnp.argmax(probs, axis=1).astype(jnp.int32)
        if cfg.voicing_adapter is not None:
            voicing_probs = jax.nn.sigmoid(
                cfg.voicing_adapter(out).reshape(-1)
            )
        else:
            voicing_probs = jnp.take_along_axis(
                probs, peak_idx[:, None], axis=1
            )[:, 0]
        if spec_family is not None and not spec_family.interp_est_notes:
            grid = spec_family.note_min + jnp.arange(n_bins) / \
                spec_family.bins_per_semitone
            est = grid[peak_idx]
        else:
            nm = spec_family.note_min if spec_family is not None else 0.0
            bps = (spec_family.bins_per_semitone
                   if spec_family is not None else 1.0)
            est = est_notes_interp(peak_idx, probs, nm, bps, n_bins)
        return frame_counts(
            ref, est, voicing_probs,
            jnp.asarray(threshold, jnp.float32)[None],
        )

    @jax.jit
    def train_step(params, batch_stats, opt_state, batch, step, threshold):
        spec, notes = batch
        if cfg.input_adapter is not None:
            spec = cfg.input_adapter(spec)
        # fresh dropout masks every step (the reference trains with
        # stochastic dropout, dcnet/softmax_viterbi.py:3399-3434)
        dropout_rng = jax.random.fold_in(jax.random.PRNGKey(1), step)

        def loss_with_out(p):
            out, upd = model.apply(
                {"params": p, "batch_stats": batch_stats},
                spec,
                train=True,
                rngs={"dropout": dropout_rng},
                mutable=["batch_stats"],
            )
            l = cfg.loss_fn(notes, out)
            if cfg.l2_reg is not None:
                from ..harness.train import l2_regularization

                paths, scale = cfg.l2_reg
                l = l + l2_regularization(p, paths, scale)
            return l, (upd["batch_stats"], out)

        (l, (bs, out)), grads = jax.value_and_grad(
            loss_with_out, has_aux=True
        )(params)
        if cfg.weight_decay is not None:
            from ..harness.train import add_weight_decay_grad

            path, wd = cfg.weight_decay
            grads = add_weight_decay_grad(grads, params, path, wd)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        counts = (
            train_counts(notes, out, threshold)
            if cfg.logits_adapter is not None else None
        )
        return params, bs, opt_state, l, counts

    return train_step


def make_optimizer(cfg: AppConfig, steps_per_epoch: int):
    """Adam, optionally under the family's own LR schedule keyed by the
    optimizer step count (tonet's warm-up/decay,
    tonet/model/tonet.py:474-490 configure_optimizers)."""
    if cfg.lr_schedule is not None:
        return optax.adam(
            learning_rate=cfg.lr_schedule(cfg.learning_rate, steps_per_epoch)
        )
    return optax.adam(cfg.learning_rate)


# jitted inference callables cached per (cfg, model): defining them inside
# model_logits_for_dataset re-traced AND re-compiled on every call, and
# closing over `variables` inlined all params as compile-time CONSTANTS —
# through the axon remote-compile tunnel that cost ~105 s PER VALIDATION
# EPOCH on TPU (params shipped with the HLO each time; CLAUDE.md's
# "never jit a closure over a big device array"). Params are arguments
# here, so one compile per shape serves the whole run. Strong refs keep
# id()s stable for the cache key.
_INFERENCE_FORWARD_CACHE: dict = {}


def _inference_forwards(cfg: AppConfig, model):
    key = (id(cfg), id(model))
    hit = _INFERENCE_FORWARD_CACHE.get(key)
    if hit is not None and hit[0] is cfg and hit[1] is model:
        return hit[2], hit[3]

    @jax.jit
    def fwd(variables, spec):
        if cfg.input_adapter is not None:
            spec = cfg.input_adapter(spec)
        return model.apply(variables, spec, train=False)

    @jax.jit
    def fwd_masked(variables, spec, valid):
        if cfg.input_adapter is not None:
            spec = cfg.input_adapter(spec)
        return model.apply(variables, spec, train=False, valid_frames=valid)

    _INFERENCE_FORWARD_CACHE[key] = (cfg, model, fwd, fwd_masked)
    return fwd, fwd_masked


_BATCHSTATS_FORWARD_CACHE: dict = {}


def _batchstats_forward(cfg: AppConfig, model):
    """Jitted chunk-batch-statistics inference forward (AppConfig.
    eval_batch_stats): train=True normalization, mutated stats discarded,
    fixed dropout rng (the families using this have no dropout)."""
    key = (id(cfg), id(model))
    hit = _BATCHSTATS_FORWARD_CACHE.get(key)
    if hit is not None and hit[0] is cfg and hit[1] is model:
        return hit[2]

    @jax.jit
    def fwd(variables, spec):
        if cfg.input_adapter is not None:
            spec = cfg.input_adapter(spec)
        out, _ = model.apply(
            variables, spec, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(0)},
        )
        return out

    _BATCHSTATS_FORWARD_CACHE[key] = (cfg, model, fwd)
    return fwd


def model_logits_for_dataset(cfg: AppConfig, model, state: TrainState, dataset,
                             with_voicing: bool = False):
    """Ordered inference over a dataset -> per-track pitch logits [T, n_bins].

    with_voicing=True (and cfg.voicing_adapter set) additionally returns
    per-track [T] voicing logits from the model's voicing head — the jdc
    combined voicing output (jdc/acoustic_module.py:74-81). Returns
    (logits_list, voicing_list) in that case; voicing_list is None when the
    family has no voicing head."""
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    want_voicing = with_voicing and cfg.voicing_adapter is not None
    fwd, fwd_masked = _inference_forwards(cfg, model)

    def forward(spec):
        return fwd(variables, spec)

    def split_out(out):
        lg = np.asarray(cfg.logits_adapter(out))[0]
        if want_voicing:
            return lg, np.asarray(cfg.voicing_adapter(out))[0]
        return lg, None

    def pack(logits_list, voicing_list):
        if not with_voicing:
            return logits_list
        return logits_list, (voicing_list if want_voicing else None)

    if cfg.fixed_chunks:
        from ..data import chunk_fixed

        out_list, v_list = [], []
        for track in dataset.tracks:
            chunks, _, T = chunk_fixed(
                track.spectrogram, track.notes, cfg.snippet_len
            )
            if cfg.eval_batch_stats:
                # one batch per track, normalized by its own statistics
                # (see AppConfig.eval_batch_stats)
                out = _batchstats_forward(cfg, model)(
                    variables, jnp.asarray(np.stack(chunks))
                )
                lg = np.asarray(cfg.logits_adapter(out))
                lg = lg.reshape(-1, lg.shape[-1])[:T]
                out_list.append(lg)
                if want_voicing:
                    v = np.asarray(cfg.voicing_adapter(out))
                    v_list.append(v.reshape(-1)[:T])
                continue
            parts = [split_out(forward(jnp.asarray(c)[None])) for c in chunks]
            out_list.append(np.concatenate([p[0] for p in parts], axis=0)[:T])
            if want_voicing:
                v_list.append(
                    np.concatenate([p[1] for p in parts], axis=0)[:T]
                )
        return pack(out_list, v_list)

    def forward_masked(spec, valid):
        return fwd_masked(variables, spec, valid)

    per_track: dict[int, list] = {}
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
            lg, v = split_out(out)
            lg = lg[:T_snip]
            v = v[:T_snip] if v is not None else None
        else:
            out = forward(jnp.asarray(spec)[None])
            lg, v = split_out(out)
        per_track.setdefault(item["rec_idx"], []).append((lg, v))
    logits_list = [
        np.concatenate([p[0] for p in per_track[i]], axis=0)[
            : dataset[i].num_frames
        ]
        for i in range(len(dataset))
    ]
    v_list = []
    if want_voicing:
        v_list = [
            np.concatenate([p[1] for p in per_track[i]], axis=0)[
                : dataset[i].num_frames
            ]
            for i in range(len(dataset))
        ]
    return pack(logits_list, v_list)


def make_validate(cfg: AppConfig, model, dataset):
    spec = cfg.family

    def validate(state: TrainState) -> dict:
        out = model_logits_for_dataset(cfg, model, state, dataset,
                                       with_voicing=True)
        logits_list, voicing_list = out
        mm = MelodyMetrics.validation_grid(len(dataset))
        for rec_idx, logits in enumerate(logits_list):
            probs = jax.nn.sigmoid(jnp.asarray(logits))
            peak_idx = jnp.argmax(probs, axis=1).astype(jnp.int32)
            if voicing_list is not None:
                # the voicing head's probability feeds the threshold grid
                # (jdc's combined voicing, jdc/acoustic_module.py:74-81)
                voicing_probs = jax.nn.sigmoid(
                    jnp.asarray(voicing_list[rec_idx])
                )
            else:
                voicing_probs = jnp.take_along_axis(
                    probs, peak_idx[:, None], axis=1
                )[:, 0]
            if spec.interp_est_notes:
                est = est_notes_interp(
                    peak_idx, probs, spec.note_min,
                    spec.bins_per_semitone, spec.n_bins,
                )
            else:
                # jdc maps bins to notes directly (viterbi_softmax.py:2471)
                grid = spec.note_min + jnp.arange(spec.n_bins) / \
                    spec.bins_per_semitone
                est = grid[peak_idx]
            counts = frame_counts(
                jnp.asarray(dataset[rec_idx].notes), est, voicing_probs,
                jnp.asarray(mm.thresholds),
            )
            mm.update(rec_idx, {k: np.asarray(v) for k, v in counts.items()})
        idx, th = mm.best_voicing_threshold()
        results = mm.results(idx)
        return dict(
            oa=float(results["oa"].mean()),
            voicing_threshold=th,
            # full per-recording metric vectors at the selected threshold
            # (feeds the per-epoch validation table, the reference's
            # TBSummary tables, dcnet/softmax_viterbi.py:3232-3355)
            results=results,
            rec_names=list(dataset.track_ids),
        )

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
        threshold_is_logit=spec.threshold_is_logit,
        interp_est_notes=spec.interp_est_notes,
    )


def tracks_for_evaluation(cfg: AppConfig, model, state, dataset) -> list[dict]:
    """Per-track evaluation inputs: pitch logits, reference notes, original
    (times, freqs), and — when the family has a voicing head — the model's
    per-frame voicing logits for the raw path's voicing decision."""
    out = model_logits_for_dataset(cfg, model, state, dataset,
                                   with_voicing=True)
    logits_list, voicing_list = out
    tracks = []
    for i, (lg, track) in enumerate(zip(logits_list, dataset.tracks)):
        t = dict(
            logits=lg,
            notes=track.notes,
            original=dict(times=track.original_times,
                          freqs=track.original_freqs),
        )
        if voicing_list is not None:
            t["voicing_logits"] = voicing_list[i]
        tracks.append(t)
    return tracks


def run_inference(cfg: AppConfig, model, state, dataset, setup) -> dict:
    return evaluate_posteriorgrams(
        setup, tracks_for_evaluation(cfg, model, state, dataset)
    )


def app_main(cfg: AppConfig, build_real_datasets: Callable | None, argv=None,
             build_external_datasets: Callable | None = None):
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
    ap.add_argument("--external-eval", action="store_true",
                    help="infer mode: additionally evaluate every external "
                         "corpus whose env root is set (adc04/mirex05/"
                         "mir1k/rwc — the reference evaluates each family "
                         "on all of them, dcnet/softmax_viterbi.py:860-1503)")
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
    ap.add_argument("--mesh", default=None, metavar="data=N[,model=M]",
                    help="distributed training over an N*M-device mesh: "
                         "the batch shards over the 'data' axis and, with "
                         "model=M, parameter/optimizer channel dims shard "
                         "over the 'model' axis (tensor parallelism, "
                         "dist/tp.py); GSPMD inserts the collectives. "
                         "Requires batch-size divisible by N (raised to N "
                         "if smaller). Same loss curve as single-device at "
                         "the same global batch (tested).")
    args = ap.parse_args(argv)
    if args.bf16:
        cfg = dataclasses.replace(cfg, compute_dtype=jnp.bfloat16)

    mesh = None
    n_model = 1
    if args.mesh:
        from ..dist import make_mesh, make_tp_mesh

        try:
            kv = dict(part.split("=", 1) for part in args.mesh.split(","))
            n_data = int(kv.pop("data", 1))
            n_model = int(kv.pop("model", 1))
        except ValueError:
            raise SystemExit(
                f"--mesh: expected comma-separated axis=N (e.g. data=8), "
                f"got {args.mesh!r}"
            )
        if kv:
            raise SystemExit(
                f"--mesh: only data=N and model=M are supported, got {kv}"
            )
        if len(jax.devices()) < n_data * n_model:
            raise SystemExit(
                f"--mesh data={n_data},model={n_model}: only "
                f"{len(jax.devices())} devices"
            )
        mesh = (
            make_tp_mesh(n_data, n_model)
            if n_model > 1
            else make_mesh(data=n_data, seq=1)
        )
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

    steps_per_epoch = args.steps_per_epoch or max(
        len(datasets["training"]) * 4, 8
    )
    model, params, batch_stats = init_model(cfg, sample)
    tx = make_optimizer(cfg, steps_per_epoch)
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
            if n_model > 1:
                # tensor parallelism: channel dims of params / BN stats /
                # adam moments shard over the "model" axis (dist/tp.py)
                from ..dist import tp_shard_tree

                state = TrainState(
                    params=tp_shard_tree(state.params, mesh),
                    batch_stats=tp_shard_tree(state.batch_stats, mesh),
                    opt_state=tp_shard_tree(state.opt_state, mesh),
                )
            else:
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

        steps = steps_per_epoch
        reporter = None
        if args.log_dir:
            from .. harness.reporting import Reporter

            reporter = Reporter(args.log_dir, tensorboard=args.tensorboard)

        def on_epoch_end(st, info):
            if reporter is None:
                return
            reporter.scalar("train_loss", info["train_loss"], st.epoch)
            reporter.scalar("val_oa", info["val"]["oa"], st.epoch)
            reporter.scalar(
                "voicing_threshold", st.voicing_threshold, st.epoch
            )
            # per-epoch training-split metric set + markdown tables (the
            # reference computes VRR..OA on training batches every epoch
            # and writes TB tables, dcnet/softmax_viterbi.py:1599-1850 +
            # :3232-3355)
            tm = info.get("train_metrics")
            if tm is not None:
                for k in ("vrr", "vfa", "va", "rpa_strict", "rca_strict",
                          "oa"):
                    reporter.scalar(f"train_{k}", tm[k], st.epoch)
                reporter.table(
                    "train",
                    {k: np.asarray([v]) for k, v in tm.items()
                     if k != "loss"},
                    ["training"],
                    step=st.epoch,
                )
            val = info["val"]
            if "results" in val:
                reporter.table(
                    "validation", val["results"], val["rec_names"],
                    step=st.epoch,
                )

        state = trainer.fit(
            state, batches(), steps, resume=args.resume,
            on_epoch_end=on_epoch_end,
        )
        if reporter is not None:
            reporter.close()
        # report + return the CHECKPOINTED state, not the final-epoch one:
        # fit() keeps training past the best epoch until patience fires, so
        # state.voicing_threshold here is the LAST epoch's grid pick. The
        # reference checkpoints the threshold variable with the best-OA
        # checkpoint (dcnet/softmax_viterbi.py:2179-2207) and that is what
        # inference uses — restore it so train-mode output matches.
        state = trainer.restore(state)
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

    eval_sets = {s: datasets[s] for s in ("validation", "test")}
    if args.external_eval:
        if build_external_datasets is None:
            raise SystemExit("external eval not wired for this family yet")
        external = build_external_datasets(debug=args.debug)
        if not external:
            print("--external-eval: no external corpus roots set "
                  "(adc04/mirex05/mir1k/rwc)")
        eval_sets.update(external)

    outputs = dict(state=state)
    for split, dataset in eval_sets.items():
        out = run_inference(cfg, model, state, dataset, setup)
        outputs[split] = out
        print(
            f"{split}: raw OA {out['raw_mean_oa']:.4f}, "
            f"viterbi OA {out['viterbi_mean_oa']:.4f}"
        )
        if reporter is not None:
            names = list(dataset.track_ids)
            reporter.table(f"{split}/raw", out["raw"], names)
            reporter.table(f"{split}/viterbi", out["viterbi"], names)
        if args.dump_tracks and split == "test":
            dump_analysis_tracks(cfg, model, state, dataset, setup,
                                 args.dump_tracks)
    if reporter is not None:
        reporter.close()
    return outputs


def dump_analysis_tracks(cfg, model, state, dataset, setup, out_dir):
    """Per-track reference/viterbi/raw piano-roll figures + npz dumps — the
    analysis layer (dcnet/lontano.py effect_of_viterbi_fn, nn_problem.py)."""
    from pathlib import Path

    from ..harness.evaluate import decode_and_score_track
    from ..harness.reporting import dump_track_npz, piano_roll_figure

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    logits_list, voicing_list = model_logits_for_dataset(
        cfg, model, state, dataset, with_voicing=True
    )
    for i, (track, logits) in enumerate(zip(dataset.tracks, logits_list)):
        r = decode_and_score_track(
            setup, logits, track.notes,
            voicing_logits=None if voicing_list is None else voicing_list[i],
        )
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
    corpora: tuple[str, ...] | None = None,
) -> dict[str, TrackDataset]:
    """Evaluation datasets beyond MedleyDB (the reference evaluates every
    family on adc04/mirex05/mir1k/rwc as well; dcnet/softmax_viterbi.py
    §TFDatasetForAdc04.. ForRWC). `spec_fn` maps raw samples (at `sr`) to
    features; labels are resampled to 10 ms when the family uses that hop.
    Only corpora whose env-var roots are set are returned; `corpora`
    restricts the set (the imm harness evaluates adc04/mirex05/mir1k but
    not rwc, imm/main_imm.py)."""
    import os

    def wanted(name):
        return corpora is None or name in corpora

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

    if wanted("adc04") and os.environ.get("adc04"):
        tids = adc04_track_ids()[: 2 if debug else None]
        root = os.environ["adc04"]
        out["adc04"] = TrackDataset(
            tids,
            lambda t: spec_fn(load_wav(os.path.join(root, t + ".wav"), sr=sr)[0]),
            lambda t: maybe_10ms(adc04_label(t)),
            max_length_diff=2,
        )

    if wanted("mirex05") and os.environ.get("mirex05"):
        tids = mirex05_track_ids()[: 2 if debug else None]
        root = os.environ["mirex05"]
        out["mirex05"] = TrackDataset(
            tids,
            lambda t: spec_fn(load_wav(os.path.join(root, t + ".wav"), sr=sr)[0]),
            lambda t: maybe_10ms(mirex05_label(t)),
            max_length_diff=2,
            # the reference pads whichever side is short for mirex05
            # (dcnet/main.py:1055-1060)
            pad_short_notes=True,
        )

    if wanted("mir1k") and os.environ.get("mir1k"):
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
            # the .pv grid undershoots the audio; the reference zero-pads
            # short labels for mir1k (dcnet/softmax_viterbi.py:1262-1268)
            pad_short_notes=True,
        )

    if wanted("rwc") and os.environ.get("rwc"):
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
            [str(i) for i in range(n)], rwc_spec, rwc_lb, max_length_diff=2,
            # the reference zero-pads notes when they undershoot by one
            # frame (dcnet/main.py:1507-1512)
            pad_short_notes=True,
        )

    return out
