"""IMM NMF tests: dictionaries, IS-divergence descent, Wiener energies
vectorization vs per-bin oracle, voicing detection, end-to-end chain."""

import numpy as np
import pytest

from viterbi_spl_tpu.models.imm import (
    IMM,
    IMMConfig,
    gen_WF0,
    gen_WGAMMA,
    klglott88_spectrum,
)

SMALL = IMMConfig(w=512, h=64, niters=12, R=6, P=8, K=4, bins_per_note=4)


@pytest.fixture(scope="module")
def imm_small():
    return IMM(SMALL)


def synth(rng, n, sr=44100, f0=220.0):
    t = np.arange(n) / sr
    y = sum((0.6 / k) * np.sin(2 * np.pi * f0 * k * t) for k in range(1, 6))
    return (y + 0.02 * rng.normal(size=n)).astype(np.float32)


def test_config_defaults():
    cfg = IMMConfig()
    assert cfg.F == 1025
    assert cfg.U == 721  # 100..800 Hz at 20 bins/semitone


def test_wgamma_structure():
    W = gen_WGAMMA(1025, 30, 0.75)
    assert W.shape == (1025, 30)
    assert np.all(W >= 0) and W.max() <= 1.0
    # overlapping bases: most frequencies covered by several bases
    coverage = (W > 0).sum(axis=1)
    assert np.median(coverage) >= 2


def test_wf0_dictionary():
    f0s, WF0 = gen_WF0(SMALL)
    assert WF0.shape == (SMALL.F, SMALL.U)
    np.testing.assert_allclose(WF0.max(axis=0), 1.0, rtol=1e-6)
    # harmonic comb: the spectrum for f0 has a peak near f0's bin
    spec = klglott88_spectrum(200.0, 44100, 2048, 0.25)
    bin_200 = int(round(200.0 / (44100 / 2048)))
    peak = int(np.argmax(spec[: 2 * bin_200]))
    assert abs(peak - bin_200) <= 2


def test_nmf_is_divergence_decreases(rng, imm_small):
    y = synth(rng, 44100 // 2)
    SX = np.abs(np.asarray(imm_small.stft.stft(y))) ** 2
    import jax.numpy as jnp

    SXd = jnp.asarray(SX, jnp.float32).T
    import jax

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 5)
    cfg = imm_small.config
    N = SXd.shape[1]
    state = [
        jnp.abs(jax.random.normal(ks[0], (cfg.P, cfg.K))),
        jnp.abs(jax.random.normal(ks[1], (cfg.K, N))),
        jnp.abs(jax.random.normal(ks[2], (cfg.U, N))),
        jnp.abs(jax.random.normal(ks[3], (cfg.F, cfg.R))),
        jnp.abs(jax.random.normal(ks[4], (cfg.R, N))),
    ]
    errs = []
    for _ in range(6):
        tup, aux, err = imm_small._iter_fn(SXd, *state)
        state = list(tup)
        errs.append(float(err))
    assert errs[-1] < errs[0]
    assert all(np.isfinite(errs))


def test_energies_match_per_bin_oracle(rng, imm_small):
    y = synth(rng, 44100 // 4)
    SX = np.abs(np.asarray(imm_small.stft.stft(y))) ** 2
    result = imm_small.fit(SX, seed=0)
    E = imm_small.energies_for_f0s(result, SX)
    U, N = E.shape
    assert U == imm_small.config.U

    # per-bin oracle (the reference's loop, imm/tf_imm.py:636-657)
    WF0 = imm_small.WF0
    HF0 = np.asarray(result["HF0"])
    SPHI = np.asarray(result["SPHI"])
    hatSX = np.asarray(result["hatSX"]) + imm_small.config.eps
    SXt = SX.T
    for u in (0, U // 2, U - 1):
        uSF0 = HF0[u, :][None, :] * WF0[:, u][:, None]
        SV = SPHI * uSF0
        expected = (((SV / hatSX) ** 2) * SXt).sum(axis=0)
        np.testing.assert_allclose(E[u], expected, rtol=2e-2, atol=1e-10)


def test_full_melody_chain(rng, imm_small):
    """samples -> NMF -> HF0 viterbi (analytic transition) -> voicing ->
    f0 output. A tiny NMF cannot resolve octave ambiguity on a synthetic
    comb, so the assertions target pipeline mechanics: a stable melody on
    the tone, voicing that separates tone from silence."""
    from viterbi_spl_tpu.hmm.viterbi import viterbi_forward_jax, viterbi_backtrace_jax
    import jax.numpy as jnp

    cfg = imm_small.config
    tone = synth(rng, 44100 // 2, f0=220.0)
    silence = 0.001 * rng.normal(size=44100 // 4).astype(np.float32)
    y = np.concatenate([tone, silence])
    SX = np.abs(np.asarray(imm_small.stft.stft(y))) ** 2
    result = imm_small.fit(SX, seed=0)

    log_obs = imm_small.process_HF0(np.asarray(result["HF0"]))  # [U+1, N]
    A = imm_small.transition_matrix
    log_B = np.log(A.T).astype(np.float32)
    log_pi = np.full(cfg.U + 1, -np.log(cfg.U + 1), np.float32)
    t1_last, T2 = viterbi_forward_jax(
        jnp.asarray(log_B), jnp.asarray(log_pi), jnp.asarray(log_obs.T)
    )
    states = np.asarray(
        viterbi_backtrace_jax(T2, jnp.argmax(t1_last).astype(jnp.int32))
    )
    voicing = imm_small.voicing_detection(SX, result, states.astype(np.int64))
    f0s = imm_small.melody_f0s(states, voicing)

    n_tone = len(tone) // cfg.h
    tone_voiced = voicing[: n_tone - 4].mean()
    tail_voiced = voicing[n_tone + 4 :].mean()
    assert tone_voiced > 0.7, f"voicing missed the tone ({tone_voiced:.2f})"
    assert tail_voiced < tone_voiced, "voicing did not suppress silence"

    voiced_f0s = f0s[: n_tone - 4]
    voiced_f0s = voiced_f0s[voiced_f0s > 0]
    assert len(voiced_f0s) > 0
    spread = np.percentile(voiced_f0s, 90) / np.percentile(voiced_f0s, 10)
    assert spread < 1.6, f"melody unstable on a steady tone (spread {spread:.2f})"


def test_stereo_fit_and_separation(rng, imm_small):
    """Stereo pass: IS divergence improves; Wiener separation reconstructs
    (melody + accompaniment ~ mix per channel)."""
    cfg = imm_small.config
    yL = synth(rng, 44100 // 4, f0=220.0)
    yR = 0.6 * yL + 0.01 * rng.normal(size=len(yL)).astype(np.float32)
    XL = np.asarray(imm_small.stft.stft(yL))
    XR = np.asarray(imm_small.stft.stft(yR))
    SXL = np.abs(XL) ** 2
    SXR = np.abs(XR) ** 2

    mono = imm_small.fit(SXL, seed=0)
    states = np.argmax(np.asarray(mono["HF0"]), axis=0)
    sHF0 = imm_small.constrained_HF0(np.asarray(mono["HF0"]), states)
    assert sHF0.shape == mono["HF0"].shape
    assert (sHF0 > 0).sum() < (np.asarray(mono["HF0"]) > 0).sum()

    res = imm_small.fit_stereo(SXL, SXR, sHF0, seed=0)
    assert np.isfinite(res["err"])
    aL, aR = float(res["alphaL"]), float(res["alphaR"])
    assert 0 < aL < 1 and abs(aL + aR - 1) < 1e-5
    beta_sum = np.asarray(res["betaL"]) + np.asarray(res["betaR"])
    np.testing.assert_allclose(beta_sum, 1.0, atol=1e-5)

    sep = imm_small.separate_stereo(XL, XR, res)
    mel_L, acc_L = sep["melody"][0], sep["accompaniment"][0]
    rec = (mel_L + acc_L)[: len(yL)]
    # Wiener masks sum to ~(SV+SM)/hatSX = 1 -> near-exact mix reconstruction
    err = np.mean((rec - yL) ** 2) / np.mean(yL**2)
    assert err < 0.05, f"separation does not reconstruct the mix (err {err:.3f})"


def test_device_fit_matches_host_patience_loop(rng, imm_small):
    """fit() runs its patience loop on device (lax.while_loop); it must
    select the same best-IS-divergence state as the reference's host loop
    (first iteration always accepted, strict-< improvement, stop after
    patient_iters non-improving sweeps or niters total)."""
    import jax
    import jax.numpy as jnp

    cfg = imm_small.config
    y = synth(rng, 44100 // 4)
    SX = np.abs(np.asarray(imm_small.stft.stft(y))) ** 2

    got = imm_small.fit(SX, seed=3)

    # host-loop oracle with identical init (fit's seeding scheme)
    SXd = jnp.asarray(SX, jnp.float32).T
    N = SXd.shape[1]
    ks = jax.random.split(jax.random.PRNGKey(3), 5)
    state = (
        jnp.abs(jax.random.normal(ks[0], (cfg.P, cfg.K))),
        jnp.abs(jax.random.normal(ks[1], (cfg.K, N))),
        jnp.abs(jax.random.normal(ks[2], (cfg.U, N))),
        jnp.abs(jax.random.normal(ks[3], (cfg.F, cfg.R))),
        jnp.abs(jax.random.normal(ks[4], (cfg.R, N))),
    )
    min_err, since, best = None, 0, None
    for _ in range(cfg.niters):
        state, aux, err = imm_small._iter_fn(SXd, *state)
        err = float(err)
        if min_err is None or err < min_err:
            min_err, since = err, 0
            best = dict(state=state, aux=aux, err=err)
        else:
            since += 1
        if since == cfg.patient_iters:
            break

    # tolerances: the while_loop body and the standalone _iter_fn jit may be
    # fused/reassociated differently by XLA, and ulp differences compound
    # through 12 multiplicative sweeps — these pin semantics, not bit-ness
    assert got["err"] == pytest.approx(best["err"], rel=1e-4)
    for k, v in zip(("HGAMMA", "HPHI", "HF0", "WM", "HM"), best["state"]):
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(v),
                                   rtol=1e-3, atol=1e-6, err_msg=k)
    for k, v in zip(("WPHI", "SPHI", "SF0", "SV", "SM", "hatSX"), best["aux"]):
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(v),
                                   rtol=3e-3, atol=1e-6, err_msg=k)


def test_aux_from_state_matches_iteration_tail(rng, imm_small):
    """The fit loops recompute the aux spectra from the winning factors via
    _aux_from_state/_stereo_aux_from_state; those helpers must track the
    expressions the iteration tails assemble (drift here would silently
    corrupt energies_for_f0s/voicing_detection/separate_stereo inputs)."""
    import jax
    import jax.numpy as jnp

    cfg = imm_small.config
    y = synth(rng, 44100 // 8)
    SX = jnp.asarray(np.abs(np.asarray(imm_small.stft.stft(y))) ** 2).T
    N = SX.shape[1]
    ks = jax.random.split(jax.random.PRNGKey(7), 5)
    state = (
        jnp.abs(jax.random.normal(ks[0], (cfg.P, cfg.K))),
        jnp.abs(jax.random.normal(ks[1], (cfg.K, N))),
        jnp.abs(jax.random.normal(ks[2], (cfg.U, N))),
        jnp.abs(jax.random.normal(ks[3], (cfg.F, cfg.R))),
        jnp.abs(jax.random.normal(ks[4], (cfg.R, N))),
    )
    new_state, aux, _ = imm_small._iteration(SX, *state)
    recomputed = imm_small._aux_from_state(*new_state)
    for got, want, name in zip(
        recomputed, aux, ("WPHI", "SPHI", "SF0", "SV", "SM", "hatSX")
    ):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-8, err_msg=name)

    stereo_state = state + (
        jnp.float32(0.6), jnp.float32(0.4),
        jnp.abs(jax.random.normal(ks[0], (cfg.R,))),
        jnp.abs(jax.random.normal(ks[1], (cfg.R,))),
    )
    new_state, aux, _ = imm_small._stereo_iteration(SX, SX * 0.8, *stereo_state)
    recomputed = imm_small._stereo_aux_from_state(*new_state)
    for got, want, name in zip(
        recomputed, aux, ("SVL", "SVR", "SML", "SMR", "hatSXL", "hatSXR")
    ):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-8, err_msg=name)


def test_viterbi_setup_shaped_transition_makes_unvoiced_reachable():
    """Round-5 regression (VERDICT #2): the imm 'viterbi' method must use
    the data-counted SHAPED transition (what the reference loads from
    viterbi_transition_matrix.dat, main_imm.py:254-270), not the analytic
    exp-decay matrix whose unvoiced state is unreachable by construction
    (P(voiced->unvoiced) ~ 1e-90, imm/transition_matrix.py:17-22). With
    the analytic matrix the decoded path is all-voiced regardless of the
    observations, which inverted viterbi-vs-thresholding in REPRO_r04."""
    from viterbi_spl_tpu.apps.imm import build_setup
    from viterbi_spl_tpu.models.imm import IMM, IMMConfig

    imm = IMM(IMMConfig(w=512, h=64, niters=5, R=6, P=8, K=4,
                        bins_per_note=4))
    U = imm.config.U
    rng = np.random.default_rng(0)

    # reference labels with a real unvoiced stretch in the middle
    T = 300
    notes = np.full(T, 57.0, np.float32)
    notes[100:200] = 0.0

    shaped = build_setup(imm, stats_notes=[notes])
    A = shaped.transition_matrix
    # unvoiced state persistent AND reachable
    assert A[U, U] > 0.5
    assert A[:U, U].mean() > 1e-6
    analytic = build_setup(imm)
    assert analytic.transition_matrix[U, U] < 1e-6  # the broken wiring

    # synthetic log-energy logits: strong ridge at bin 40 on voiced
    # frames, noise-floor frames in the unvoiced stretch
    logits = rng.normal(-8.0, 0.3, (T, U)).astype(np.float32)
    voiced = notes > 0
    logits[voiced, 40] = 6.0
    voiced_frac_ref = voiced.mean()

    v_shaped, b_shaped = shaped.decode(logits)
    v_analytic, _ = analytic.decode(logits)
    assert v_analytic.mean() > 0.99  # analytic: stuck all-voiced
    assert abs(v_shaped.mean() - voiced_frac_ref) < 0.05
    assert (b_shaped[v_shaped] == 40).mean() > 0.95
