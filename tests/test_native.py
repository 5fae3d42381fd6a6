"""Native C++ Viterbi core vs the NumPy oracle — the reference's own
"C identical to python" assertion (dcnet/tf_viterbi_decoding.py:284)."""

import numpy as np
import pytest

from conftest import random_hmm

native = pytest.importorskip("viterbi_spl_tpu.native")


@pytest.fixture(scope="module", autouse=True)
def built():
    if not native.native_available():
        pytest.skip("native toolchain unavailable")


def test_native_matches_oracle(rng):
    from viterbi_spl_tpu.hmm.oracle import viterbi_oracle

    for S, T in ((17, 60), (321, 150), (722, 40)):
        A, pi, obs = random_hmm(rng, S, T)
        expected = viterbi_oracle(transition_matrix=A, prob_init=pi, probs_st=obs)
        got = native.viterbi_native_fn(
            transition_matrix=A, prob_init=pi, probs_st=obs
        )
        np.testing.assert_array_equal(expected, got)


def test_native_sparse_and_ties(rng):
    from viterbi_spl_tpu.hmm.oracle import viterbi_oracle

    S, T = 130, 90
    A, pi, obs = random_hmm(rng, S, T, sparse_obs=True)
    expected = viterbi_oracle(transition_matrix=A, prob_init=pi, probs_st=obs)
    got = native.viterbi_native_fn(transition_matrix=A, prob_init=pi, probs_st=obs)
    np.testing.assert_array_equal(expected, got)

    # exact ties -> lowest index
    A = np.full((4, 4), 0.25, np.float32)
    pi = np.full(4, 0.25)
    obs = np.full((4, 8), 0.25, np.float32)
    got = native.viterbi_native_fn(transition_matrix=A, prob_init=pi, probs_st=obs)
    assert np.all(got == 0)


def test_native_log_domain_matches(rng):
    from viterbi_spl_tpu.hmm.oracle import viterbi_oracle
    from viterbi_spl_tpu.hmm.viterbi import TINY, prepare_log_params

    S, T = 75, 100
    A, pi, obs = random_hmm(rng, S, T)
    expected = viterbi_oracle(transition_matrix=A, prob_init=pi, probs_st=obs)
    log_B, log_pi = prepare_log_params(A, pi)
    log_obs = np.log(obs.T + TINY)
    got = native.viterbi_native_log_fn(log_B, log_pi, log_obs)
    np.testing.assert_array_equal(expected, got)


def test_native_backtrace(rng):
    T, S = 200, 50
    T2 = rng.integers(0, S, (T, S)).astype(np.int32)
    last = 7
    got = native.backtrace_native(T2, last)
    s = last
    exp = np.empty(T, np.int64)
    exp[-1] = s
    for t in range(T - 2, -1, -1):
        s = T2[t + 1, s]
        exp[t] = s
    np.testing.assert_array_equal(exp, got)


def test_native_validation_errors():
    A = np.full((3, 3), 0.5, np.float32)  # rows sum to 1.5
    with pytest.raises(ValueError):
        native.viterbi_native_fn(
            transition_matrix=A,
            prob_init=np.full(3, 1 / 3),
            probs_st=np.full((3, 5), 1 / 3, np.float32),
        )


def test_prefetch_ring_matches_python_pipeline(rng):
    """The native prefetch ring yields the exact batches the Python snippet
    pipeline would produce for the same seed, across epoch boundaries and
    slot reuse."""
    from viterbi_spl_tpu.data.registry import TrackDataset
    from viterbi_spl_tpu.native.prefetch import SnippetPrefetcher

    frames = [70, 45, 101]
    specs = {
        f"t{i}": rng.normal(size=(f, 12, 2)).astype(np.float32)
        for i, f in enumerate(frames)
    }
    notes = {
        f"t{i}": rng.normal(size=f).astype(np.float32)
        for i, f in enumerate(frames)
    }
    ds = TrackDataset(list(specs), lambda t: specs[t], lambda t: dict(
        notes=notes[t],
        original=dict(times=np.arange(len(notes[t])) * 0.01,
                      freqs=np.abs(notes[t])),
    ))

    pf = SnippetPrefetcher(
        ds, snippet_len=20, batch_size=3,
        rng=np.random.default_rng(7), slots=3, threads=2,
    )
    ref = pf.python_reference_batches(np.random.default_rng(7))
    it = iter(pf)
    for _ in range(12):  # several epochs worth (index has 8 full snippets)
        spec, nts = next(it)
        rspec, rnotes = next(ref)
        np.testing.assert_array_equal(spec, rspec)
        np.testing.assert_array_equal(nts, rnotes)
    pf.close()
