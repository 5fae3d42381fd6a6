"""Shape-bucketing policy: mixed-length corpora must compile O(log T)
kernel shapes, with outputs unchanged.

The reference evaluates arbitrary per-track lengths freely (NumPy/TF eager,
imm/main_imm.py:1139-1180); on TPU every distinct jit shape is a fresh
30-300 s remote compile, so the batch decoders and the IMM NMF fit pad to
geometric shape buckets (utils.shape_bucket). These tests pin (a) the
bucket math, (b) the compile-count bound on a 20-track mixed-length corpus
with byte-identical decoded paths, and (c) bucket-invariance of the IMM
fit — the same track fitted in different buckets gives the same factors up
to reduction-order ulp (XLA's reduction trees regroup the real elements
when the padded dimension changes, so bitwise equality across buckets is
not achievable; padded columns still contribute exactly nothing).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from viterbi_spl_tpu.utils import shape_bucket


def test_shape_bucket_grid():
    assert shape_bucket(1, quantum=64) == 64
    assert shape_bucket(64, quantum=64) == 64
    assert shape_bucket(65, quantum=64) == 128
    assert shape_bucket(8, quantum=8, ratio=2.0) == 8
    assert shape_bucket(9, quantum=8, ratio=2.0) == 16
    # strictly increasing grid, multiples of the quantum, ~ratio spaced
    grid = []
    b = 64
    for n in range(1, 100_000, 997):
        bb = shape_bucket(n, quantum=64)
        assert bb >= n and bb % 64 == 0
        grid.append(bb)
    distinct = sorted(set(grid))
    # O(log n) shapes: the 1..100k range must fit in a handful of buckets
    assert len(distinct) <= 40
    with pytest.raises(ValueError):
        shape_bucket(0, quantum=64)
    # small quanta must terminate: int(b*ratio) can round back to b
    assert shape_bucket(2, quantum=1) == 2
    assert shape_bucket(7, quantum=2) >= 7
    assert shape_bucket(1000, quantum=3) >= 1000


def test_mixed_length_corpus_decode_bucket_count(rng):
    """20 tracks of mixed lengths: the batched decoder must compile at most
    a handful of distinct (N, T_pad) shapes and return paths identical to
    per-track exact decoding."""
    from viterbi_spl_tpu.hmm import params as hmm_params
    from viterbi_spl_tpu.hmm.oracle import viterbi_oracle
    from viterbi_spl_tpu.hmm import viterbi_banded
    from viterbi_spl_tpu.hmm.viterbi_pallas import viterbi_decode_batch_pallas

    n_bins = 40
    q = np.clip(20 + np.cumsum(rng.integers(-2, 3, 2000)), 0, n_bins - 1)
    stats = hmm_params.count_statistics([q], n_bins)
    A = hmm_params.shape_transition_matrix(
        stats.transition_counts, np.array([[0.98, 0.02], [0.02, 0.98]]),
        n_bins, 5, floor=2,
    )
    pi = hmm_params.shape_init_probs(stats.p_steady)
    S = n_bins + 1

    lengths = [int(x) for x in rng.integers(33, 900, 20)]
    tracks = []
    for T in lengths:
        obs = rng.random((S, T)).astype(np.float32) ** 4
        obs /= obs.sum(0, keepdims=True)
        tracks.append(obs)

    shapes = set()
    orig = viterbi_banded.viterbi_forward_pallas_banded_batch

    def spy(bs, log_pi, obs_batch, lens, **kw):
        shapes.add(tuple(obs_batch.shape))
        return orig(bs, log_pi, obs_batch, lens, **kw)

    # decode each track alone (the serving worst case: 20 separate calls)
    got = []
    try:
        viterbi_banded.viterbi_forward_pallas_banded_batch = spy
        for obs in tracks:
            got.extend(
                viterbi_decode_batch_pallas(
                    transition_matrix=A, prob_init=pi, probs_st_list=[obs]
                )
            )
    finally:
        viterbi_banded.viterbi_forward_pallas_banded_batch = orig

    # O(log T) distinct shapes, NOT one per distinct length
    assert len(set(lengths)) >= 15  # the corpus really is mixed-length
    assert len(shapes) <= 6, shapes

    for obs, path in zip(tracks, got):
        expected = viterbi_oracle(transition_matrix=A, prob_init=pi, probs_st=obs)
        np.testing.assert_array_equal(expected, path)


def test_imm_fit_bucket_invariant(rng):
    """The same track fitted in different frame buckets returns identical
    factors — padded columns contribute exactly nothing."""
    from viterbi_spl_tpu.models.imm import IMM, IMMConfig

    imm = IMM(IMMConfig(w=512, h=64, niters=6, R=6, P=8, K=4, bins_per_note=4))
    N = 50
    SX = (rng.random((N, imm.config.F)).astype(np.float32) + 1e-3)

    results = {}
    # keep the staticmethod wrapper: class-attribute access unwraps it, and
    # restoring the bare function would rebind `self` as N in later tests
    orig = IMM.__dict__["_frame_bucket"]
    try:
        for bucket in (128, 256):
            IMM._frame_bucket = staticmethod(lambda n, b=bucket: b)
            results[bucket] = imm.fit(SX, seed=0)
    finally:
        IMM._frame_bucket = orig

    a, b = results[128], results[256]
    assert np.isfinite(a["err"])
    assert a["err"] == pytest.approx(b["err"], rel=1e-4)
    for k in a:
        if k == "err":
            continue
        va, vb = np.asarray(a[k]), np.asarray(b[k])
        assert va.shape == vb.shape, k
        np.testing.assert_allclose(va, vb, rtol=2e-3, atol=1e-5, err_msg=k)
        assert not np.isnan(va).any(), k


def test_imm_stereo_fit_bucket_invariant(rng):
    from viterbi_spl_tpu.models.imm import IMM, IMMConfig

    imm = IMM(IMMConfig(w=512, h=64, niters=4, R=4, P=6, K=3, bins_per_note=4))
    N = 40
    SXL = (rng.random((N, imm.config.F)).astype(np.float32) + 1e-3)
    SXR = (rng.random((N, imm.config.F)).astype(np.float32) + 1e-3)
    sHF0 = rng.random((imm.config.U, N)).astype(np.float32)

    results = {}
    orig = IMM.__dict__["_frame_bucket"]
    try:
        for bucket in (128, 256):
            IMM._frame_bucket = staticmethod(lambda n, b=bucket: b)
            results[bucket] = imm.fit_stereo(SXL, SXR, sHF0, seed=0)
    finally:
        IMM._frame_bucket = orig

    a, b = results[128], results[256]
    assert np.isfinite(a["err"])
    assert a["err"] == pytest.approx(b["err"], rel=1e-4)
    for k in a:
        if k == "err":
            continue
        va, vb = np.asarray(a[k]), np.asarray(b[k])
        np.testing.assert_allclose(va, vb, rtol=2e-3, atol=1e-5, err_msg=k)
        assert not np.isnan(va).any(), k


def test_ragged_snippet_inference_bucketed_and_exact(rng):
    """Ragged final snippets (dcnet/msnet families) are bucket-padded with
    exact frame masking: the compiled forward shapes are bounded; masking
    is bit-exact at op level (second half of the test), and the jitted
    bucket forward matches the per-length forward to XLA vectorization ulp
    (~1e-7, shape-dependent fusion)."""
    import dataclasses

    from viterbi_spl_tpu.apps import msnet as msnet_app
    from viterbi_spl_tpu.apps.common import (
        model_logits_for_dataset, synthetic_dataset,
    )
    from viterbi_spl_tpu.harness.train import TrainState

    cfg = dataclasses.replace(msnet_app.config(), snippet_len=64)
    # mixed ragged track lengths: tails of 33, 47, 55 frames
    datasets = {}
    for i, frames in enumerate((97, 111, 119)):
        ds = synthetic_dataset(cfg, n_tracks=1, frames=frames, seed=i)
        datasets[i] = ds
    model = cfg.make_model(dtype=cfg.compute_dtype)
    sample = jnp.asarray(datasets[0][0].spectrogram[:8][None])
    variables = model.init(jax.random.PRNGKey(0), sample, train=False)
    state = TrainState(
        params=variables["params"], batch_stats=variables["batch_stats"],
        opt_state=None,
    )

    shapes = []
    orig_apply = type(model).apply

    def spy(self, variables, x, *a, **kw):
        shapes.append(tuple(x.shape))
        return orig_apply(self, variables, x, *a, **kw)

    exact_cfg = dataclasses.replace(cfg, supports_valid_frames=False)
    for i, ds in datasets.items():
        try:
            type(model).apply = spy
            bucketed = model_logits_for_dataset(cfg, model, state, ds)
        finally:
            type(model).apply = orig_apply
        exact = model_logits_for_dataset(exact_cfg, model, state, ds)
        for a, b in zip(bucketed, exact):
            np.testing.assert_allclose(a, b, atol=1e-6, rtol=0)

    # tail lengths 33/47/55 all served by the SAME bucket shape (64);
    # only full-snippet (64) and bucket (64) shapes were compiled
    tdims = {s[1] for s in shapes}
    assert tdims == {64}, shapes

    # op-level bitwise exactness of the masking itself (no jit, so the
    # same per-op kernels run on both sides)
    spec = datasets[0][0].spectrogram[:33]
    want = np.asarray(
        model.apply({"params": state.params, "batch_stats": state.batch_stats},
                    jnp.asarray(spec)[None], train=False)
    )
    padded = np.zeros((64, *spec.shape[1:]), spec.dtype)
    padded[:33] = spec
    got = np.asarray(
        model.apply({"params": state.params, "batch_stats": state.batch_stats},
                    jnp.asarray(padded)[None], train=False, valid_frames=33)
    )
    np.testing.assert_array_equal(want, got[:, :33])
