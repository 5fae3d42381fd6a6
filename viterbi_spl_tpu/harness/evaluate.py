"""Evaluation: posteriorgrams -> dual-path metrics (raw threshold + Viterbi)
with the mir_eval cross-check.

Re-design of MetricsInference (dcnet/softmax_viterbi.py:2677-3230): for
each track, accumulate
- the RAW path: per-frame peak + voicing threshold,
- the VITERBI path: observation model -> dense-HMM decode -> voicing from
  the decoded state,
and cross-check both accumulated OAs against the mir_eval-semantics
evaluation on signed frequencies (:3160-3198) — the reference prints these
diffs per track; we return them.

Decoding runs on TPU via the Pallas kernels when available, batched across
tracks, falling back to the lax.scan decoder elsewhere.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..hmm.obs import shaun_observation_probs, softmax_observation_probs
from ..hmm.viterbi import (
    log_obs_fn,
    prepare_log_params,
    viterbi_backtrace_jax,
    viterbi_forward_jax,
)
from ..metrics.mel_eval import (
    est_notes_with_voicing_to_hz,
    evaluate_melody,
)
from ..metrics.melody import (
    MelodyMetrics,
    est_notes_interp,
    frame_counts,
    frame_counts_fixed_voicing,
)

ALLOWED_VITERBI_METHODS = ("shaun", "softmax-scaled", "softmax-unscaled")


@dataclasses.dataclass
class DecoderSetup:
    """Per-family decoding configuration."""

    transition_matrix: np.ndarray  # [S, S]
    init_probs: np.ndarray  # [S]
    n_bins: int
    note_min: float
    bins_per_semitone: float
    spw: int
    voicing_threshold: float  # probability
    hop_seconds: float
    method: str = "shaun"
    obs_p: float = 0.8
    obs_scale: float = 2.0
    # imm: the threshold is already in the logit/log-energy domain
    # (imm/thresholding.py:80, THRESHOLD = 2.442347)
    threshold_is_logit: bool = False
    # jdc maps decoded bins to notes directly, without the +/-1-bin
    # probability interpolation (jdc/viterbi_softmax.py:2443-2470)
    interp_est_notes: bool = True
    # serving fast path: compute the observation model (any method) inside
    # a fused Pallas kernel (hmm/obs_pallas.py) feeding the decoder
    # directly. Equal to the default path up to softmax-denominator
    # reduction order and ulp-level transcendentals (see the kernel
    # docstring); opt-in.
    fused_obs: bool = False
    # optional jax Mesh with a "data" axis: decode batches shard tracks
    # across devices (paths identical to single-device; tested on the CPU
    # mesh). None = single device.
    mesh: object = None

    def __post_init__(self):
        if self.method not in ALLOWED_VITERBI_METHODS:
            raise ValueError(f"unknown viterbi method {self.method}")
        self._log_B, self._log_pi = prepare_log_params(
            self.transition_matrix, self.init_probs
        )

    @property
    def threshold_logit(self) -> float:
        if self.threshold_is_logit:
            return float(self.voicing_threshold)
        return float(np.log(self.voicing_threshold / (1 - self.voicing_threshold)))

    # -- observation model ------------------------------------------------
    def observation_probs(self, logits: np.ndarray) -> jnp.ndarray:
        """logits [T, n_bins] -> obs weights [T, n_bins + 1] (unvoiced last)."""
        th_logit = self.threshold_logit
        if self.method == "shaun":
            return shaun_observation_probs(
                jnp.asarray(logits), th_logit, self.spw, self.obs_p, self.obs_scale
            )
        scaled = self.method == "softmax-scaled"
        return softmax_observation_probs(
            jnp.asarray(logits),
            th_logit,
            jnp.asarray(self.init_probs),
            self.spw,
            scaled,
        )

    def decode(self, logits: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """logits [T, n_bins] -> (voiced [T] bool, bins [T] int) — the
        Viterbi __call__ contract (dcnet/softmax_viterbi.py:2419-2432)."""
        return self.decode_batch([logits])[0]

    def decode_batch(
        self, logits_list: Sequence[np.ndarray]
    ) -> list[tuple[np.ndarray, np.ndarray]]:
        """Decode many tracks together. On TPU this runs the batched Pallas
        kernels (banded fast path when the transition structure allows);
        elsewhere it falls back to the lax.scan decoder per track. Paths are
        bit-identical across backends (tested), except under the opt-in
        fused_obs serving path (documented tolerance)."""
        if self.fused_obs:
            return self._decode_batch_fused(logits_list)
        obs_list = [np.asarray(self.observation_probs(lg)) for lg in logits_list]

        # a data mesh routes through the batched kernels on any backend
        # (interpret mode off-TPU) so the sharded path is the same code
        if jax.default_backend() == "tpu" or self.mesh is not None:
            from ..hmm.viterbi_pallas import viterbi_decode_batch_pallas

            states_list = viterbi_decode_batch_pallas(
                transition_matrix=self.transition_matrix,
                prob_init=self.init_probs,
                probs_st_list=[o.T for o in obs_list],
                mesh=self.mesh,
            )
        else:
            states_list = []
            for obs in obs_list:
                t1_last, T2 = viterbi_forward_jax(
                    jnp.asarray(self._log_B),
                    jnp.asarray(self._log_pi),
                    log_obs_fn(jnp.asarray(obs)),
                )
                last = jnp.argmax(t1_last).astype(jnp.int32)
                states_list.append(np.asarray(viterbi_backtrace_jax(T2, last)))

        out = []
        for states in states_list:
            voiced = states < self.n_bins
            bins = np.minimum(states, self.n_bins - 1)
            out.append((voiced, bins))
        return out

    def _decode_batch_fused(
        self, logits_list: Sequence[np.ndarray]
    ) -> list[tuple[np.ndarray, np.ndarray]]:
        """Fused serving path: raw logits -> direct-log Pallas observation
        kernel -> batched decode, all on device. (The variant computing the
        obs model INSIDE the forward kernel exists —
        viterbi_decode_batch_pallas_fused_obs — and is bit-equal, but
        measured ~3-5% SLOWER e2e at the 361/722 serving shapes: the HBM
        round trip it saves was already hidden behind compute; see
        docs/DESIGN.md §3b.)"""
        from ..hmm.obs_pallas import (
            shaun_log_obs_pallas,
            softmax_log_obs_pallas,
        )
        from ..hmm.viterbi import NEG_PAD
        from ..hmm.viterbi_pallas import (
            LANE,
            _round_up,
            viterbi_decode_batch_pallas_logobs,
        )

        from ..utils import shape_bucket

        block = 64
        S = self.n_bins + 1
        P = _round_up(S, LANE)
        spw = self.spw
        lengths = [np.asarray(lg).shape[0] for lg in logits_list]
        N_real = len(logits_list)
        # geometric shape buckets: a mixed-length corpus compiles O(log T)
        # kernel shapes; padded frames are masked by the lengths vector
        n_quantum = 8 * (
            int(self.mesh.shape["data"]) if self.mesh is not None else 1
        )
        N = shape_bucket(max(N_real, 1), quantum=n_quantum, ratio=2.0)
        T_pad = shape_bucket(max(lengths), quantum=block)
        # the reflect-padded lane layout is built on the HOST during
        # staging: an XLA pad of the non-lane-multiple minor dim costs more
        # than the observation kernel itself (measured 46 ms vs 38 ms at
        # N=128, T=8192 on v5e)
        padded = np.full((N, T_pad, P), NEG_PAD, np.float32)
        for i, lg in enumerate(logits_list):
            x = np.asarray(lg, np.float32)
            L = lengths[i]
            padded[i, :L, spw : spw + self.n_bins] = x
            padded[i, :L, :spw] = x[:, spw:0:-1]
            padded[i, :L, spw + self.n_bins : spw + self.n_bins + spw] = (
                x[:, self.n_bins - 2 : self.n_bins - 2 - spw : -1]
            )
        len_vec = np.asarray(lengths + [1] * (N - N_real), np.int32)

        # obs kernel at 32-frame blocks (64 spills vregs past the scoped
        # VMEM limit at N=128); the decode keeps 64-frame blocks
        if self.method == "shaun":
            log_obs = shaun_log_obs_pallas(
                padded, self.n_bins, self.spw, self.threshold_logit,
                self.obs_p, self.obs_scale, block_frames=32,
            )
        else:
            log_obs = softmax_log_obs_pallas(
                padded, self.n_bins, self.spw, self.threshold_logit,
                self.init_probs, scaled=(self.method == "softmax-scaled"),
                block_frames=32,
            )
        states = np.asarray(
            viterbi_decode_batch_pallas_logobs(
                transition_matrix=self.transition_matrix,
                prob_init=self.init_probs,
                log_obs_batch=log_obs,
                lengths=len_vec,
                block_frames=block,
                mesh=self.mesh,
            )
        )
        out = []
        for i in range(N_real):
            st = states[i, : lengths[i]].astype(np.int64)
            out.append((st < self.n_bins, np.minimum(st, self.n_bins - 1)))
        return out


def decode_and_score_track(
    setup: DecoderSetup,
    logits: np.ndarray,
    ref_notes: np.ndarray,
    original: dict | None = None,
    logits_are_probs: bool = False,
    voicing_logits: np.ndarray | None = None,
) -> dict:
    """One track through both metric paths.

    logits: [T, n_bins] (sigmoid logits for the raw path).
    voicing_logits: optional separate per-frame voicing logits (jdc) — the
    raw path's voicing decision compares them to the threshold logit
    instead of the peak probability.
    Returns dict with raw/viterbi count dicts, est note vectors, and (when
    `original` ref times/freqs are given) the mir_eval OAs.
    """
    T, n_bins = logits.shape
    probs = logits if logits_are_probs else jax.nn.sigmoid(jnp.asarray(logits))
    probs = jnp.asarray(probs)

    def notes_from_bins(bins_arr):
        if setup.interp_est_notes:
            return est_notes_interp(
                jnp.asarray(bins_arr, jnp.int32), probs, setup.note_min,
                setup.bins_per_semitone, n_bins,
            )
        grid = setup.note_min + jnp.arange(n_bins) / setup.bins_per_semitone
        return grid[jnp.minimum(jnp.asarray(bins_arr), n_bins - 1)]

    # raw path
    peak_idx = jnp.argmax(probs, axis=1).astype(jnp.int32)
    peak_probs = jnp.take_along_axis(probs, peak_idx[:, None], axis=1)[:, 0]
    est_notes_raw = notes_from_bins(peak_idx)
    if voicing_logits is not None:
        voicing_score = jnp.asarray(voicing_logits)
        th = jnp.float32(setup.threshold_logit)
    elif setup.threshold_is_logit:
        voicing_score = jnp.max(jnp.asarray(logits), axis=1)
        th = jnp.float32(setup.voicing_threshold)
    else:
        voicing_score = peak_probs
        th = jnp.float32(setup.voicing_threshold)
    raw_counts = frame_counts(
        jnp.asarray(ref_notes),
        est_notes_raw,
        voicing_score,
        jnp.asarray([th], jnp.float32),
    )
    raw_voicing = np.asarray(voicing_score) > float(th)

    # viterbi path
    voiced, bins = setup.decode(np.asarray(logits))
    est_notes_vit = notes_from_bins(bins)
    vit_counts = frame_counts_fixed_voicing(
        jnp.asarray(ref_notes), est_notes_vit, jnp.asarray(voiced)
    )

    out = dict(
        raw_counts={k: np.asarray(v) for k, v in raw_counts.items()},
        viterbi_counts={k: np.asarray(v) for k, v in vit_counts.items()},
        est_notes_raw=np.asarray(est_notes_raw),
        est_notes_viterbi=np.asarray(est_notes_vit),
        viterbi_voiced=voiced,
        viterbi_bins=bins,
        raw_voiced=raw_voicing,
    )

    if original is not None:
        est_times = np.arange(T) * setup.hop_seconds
        for key, notes, voicing in (
            ("raw", out["est_notes_raw"], raw_voicing),
            ("viterbi", out["est_notes_viterbi"], voiced),
        ):
            signed = np.where(voicing, notes, -notes)
            freqs = est_notes_with_voicing_to_hz(signed, min_note=setup.note_min)
            m = evaluate_melody(
                original["times"], original["freqs"], est_times, freqs
            )
            out[f"mir_eval_oa_{key}"] = m["Overall Accuracy"]
    return out


def evaluate_posteriorgrams(
    setup: DecoderSetup,
    tracks: Sequence[dict],
) -> dict:
    """Full-split evaluation: tracks is a list of dicts with keys
    logits [T, n_bins], notes [T], and optionally original{times, freqs}.

    Returns dict(raw=<metrics>, viterbi=<metrics>, mir_eval_oas=...,
    cross_check_diffs=...) — the accumulated OA must match the mir_eval OA
    per track (the reference prints these diffs, :3504-3531).
    """
    n = len(tracks)
    raw = MelodyMetrics(n, np.array([setup.voicing_threshold], np.float32))
    vit = MelodyMetrics(n, np.array([0.5], np.float32))
    oas_raw, oas_vit = [], []
    for rec_idx, track in enumerate(tracks):
        r = decode_and_score_track(
            setup,
            track["logits"],
            track["notes"],
            original=track.get("original"),
            logits_are_probs=track.get("logits_are_probs", False),
            voicing_logits=track.get("voicing_logits"),
        )
        raw.update(rec_idx, r["raw_counts"])
        vit.update(rec_idx, r["viterbi_counts"])
        oas_raw.append(r.get("mir_eval_oa_raw"))
        oas_vit.append(r.get("mir_eval_oa_viterbi"))

    res_raw = raw.results(0)
    res_vit = vit.results(0)
    out = dict(
        raw=res_raw,
        viterbi=res_vit,
        raw_mean_oa=float(np.mean(res_raw["oa"])),
        viterbi_mean_oa=float(np.mean(res_vit["oa"])),
        mir_eval_oas_raw=oas_raw,
        mir_eval_oas_viterbi=oas_vit,
    )
    if oas_raw[0] is not None:
        out["cross_check_diff_raw"] = [
            float(a - b) for a, b in zip(res_raw["oa"], oas_raw)
        ]
        out["cross_check_diff_viterbi"] = [
            float(a - b) for a, b in zip(res_vit["oa"], oas_vit)
        ]
    return out
