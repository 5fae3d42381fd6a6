"""Acoustic model smoke + shape + loss tests (flax reimplementations)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from viterbi_spl_tpu.models import (
    DCNet,
    FTANet,
    JDC,
    MSNet,
    dcnet_loss,
    gaussian_blur_targets,
    jdc_loss,
    softmax_smoothed_loss,
)


def init_and_apply(model, x, train=False):
    rng = jax.random.PRNGKey(0)
    variables = model.init({"params": rng, "dropout": rng}, x, train=False)
    out = model.apply(
        variables, x, train=train,
        rngs={"dropout": rng} if train else {},
        mutable=["batch_stats"] if train else False,
    )
    return (out[0], variables) if train else (out, variables)


def test_dcnet_shapes():
    x = jnp.zeros((1, 40, 500))
    out, variables = init_and_apply(DCNet(), x)
    assert out.shape == (1, 40, 320)
    # weight-decay target exists in the param tree
    p = variables["params"]
    name, leaf = DCNet.global_conv_kernel_path()
    assert leaf in p[name]
    assert p[name][leaf].shape == (1, 97, 16, 128)


def test_dcnet_train_mode_runs():
    x = jnp.ones((1, 16, 500))
    out, _ = init_and_apply(DCNet(), x, train=True)
    assert out.shape == (1, 16, 320)
    assert np.all(np.isfinite(np.asarray(out)))


def test_msnet_shapes():
    x = jnp.zeros((1, 24, 320, 3))
    out, _ = init_and_apply(MSNet(), x)
    assert out.shape == (1, 24, 321)


def test_msnet_unpool_inverts_pool():
    from viterbi_spl_tpu.models.msnet import max_pool_freq4_argmax, unpool_freq4

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 3, 16, 5)).astype(np.float32)
    pooled, idx = max_pool_freq4_argmax(jnp.asarray(x))
    up = np.asarray(unpool_freq4(pooled, idx, 16))
    # NumPy oracle: scatter each group max back to its argmax slot
    expected = np.zeros_like(x)
    g = x.reshape(2, 3, 4, 4, 5)
    for b in range(2):
        for t in range(3):
            for f in range(4):
                for c in range(5):
                    k = int(np.argmax(g[b, t, f, :, c]))
                    expected[b, t, f * 4 + k, c] = g[b, t, f, k, c]
    np.testing.assert_allclose(up, expected, rtol=1e-6)


def test_ftanet_shapes():
    x = jnp.zeros((2, 128, 320, 3))
    out, _ = init_and_apply(FTANet(), x)
    assert out.shape == (2, 128, 321)


def test_jdc_shapes():
    x = jnp.zeros((2, 31, 513))
    out, variables = init_and_apply(JDC(), x)
    assert out["pitch"].shape == (2, 31, 722)
    assert out["voicing"].shape == (2, 31)
    p = variables["params"]
    for path in JDC.l2_param_paths():
        node = p
        for k in path:
            node = node[k]


def test_gaussian_targets_blur():
    note_range = jnp.asarray(23.6 + np.arange(320) / 5, jnp.float32)
    notes = jnp.asarray([60.0, 0.0])
    t = np.asarray(gaussian_blur_targets(notes, note_range, 0.18, normalize=False))
    center = int(round((60.0 - 23.6) * 5))
    assert t[0].argmax() == center
    assert t[0, center] == pytest.approx(1.0, abs=1e-5)
    assert t[0].sum() > 1.0  # several bins within the cutoff
    assert t[1].sum() == 0.0  # unvoiced -> all-zero targets (dcnet semantics)


def test_dcnet_loss_decreases_for_better_logits():
    notes = jnp.asarray(np.full(10, 60.0, np.float32))
    note_range = 23.6 + np.arange(320) / 5
    center = int(round((60.0 - 23.6) * 5))
    good = np.full((10, 320), -10.0, np.float32)
    good[:, center] = 10.0
    bad = -good
    assert float(dcnet_loss(notes, jnp.asarray(good))) < float(
        dcnet_loss(notes, jnp.asarray(bad))
    )


def test_softmax_loss_unvoiced_targets_class0():
    notes = jnp.asarray(np.zeros(5, np.float32))
    logits = np.full((5, 321), 0.0, np.float32)
    logits_good = logits.copy()
    logits_good[:, 0] = 8.0
    assert float(softmax_smoothed_loss(notes, jnp.asarray(logits_good))) < float(
        softmax_smoothed_loss(notes, jnp.asarray(logits))
    )


def test_jdc_loss_runs():
    rng = np.random.default_rng(0)
    notes = jnp.asarray(
        np.where(rng.random((4, 31)) < 0.3, 0.0, rng.uniform(40, 80, (4, 31))).astype(
            np.float32
        )
    )
    pitch = jnp.asarray(rng.normal(size=(4, 31, 722)).astype(np.float32))
    voicing = jnp.asarray(rng.normal(size=(4, 31)).astype(np.float32))
    loss = float(jdc_loss(notes, pitch, voicing))
    assert np.isfinite(loss) and loss > 0


def test_tonet_shapes():
    from viterbi_spl_tpu.models import TONet

    x = jnp.zeros((1, 3, 360, 128))
    out, _ = init_and_apply(TONet(), x)
    assert out["pitch"].shape == (1, 361, 128)
    assert out["chroma"].shape == (1, 13, 128)
    assert out["octave"].shape == (1, 7, 128)


def test_cfp_to_tcfp_shuffle():
    from viterbi_spl_tpu.models import cfp_to_tcfp

    x = np.arange(3 * 360 * 4).reshape(1, 3, 360, 4).astype(np.float32)
    t = np.asarray(cfp_to_tcfp(jnp.asarray(x)))
    # octave-major -> tone-major: bin (o, c) with o in 0..5, c in 0..59
    # moves from index o*60+c to c*6+o
    assert t.shape == x.shape
    np.testing.assert_array_equal(t[0, 0, 0], x[0, 0, 0])  # (0,0) fixed
    np.testing.assert_array_equal(t[0, 0, 6], x[0, 0, 1])  # c=1 -> idx 6
    np.testing.assert_array_equal(t[0, 0, 1], x[0, 0, 60])  # o=1 -> idx 1


def test_tonet_labels_and_loss():
    from viterbi_spl_tpu.models import TONet, tonet_labels, tonet_loss
    from viterbi_spl_tpu.models.targets import _tonet_note_range

    nr = _tonet_note_range()
    notes = jnp.asarray(
        np.array([[0.0, nr[0], nr[59], nr[60], nr[-1]]], np.float32)
    )
    lb = {k: np.asarray(v) for k, v in tonet_labels(notes).items()}
    assert lb["pitch"][0, 0] == 0  # unvoiced
    assert lb["pitch"][0, 1] == 1  # first grid note
    assert lb["octave"][0, 0] == 0 and lb["chroma"][0, 0] == 0
    assert lb["octave"][0, 1] == 1
    assert lb["octave"][0, 4] == 6  # last bin -> octave 6
    assert lb["chroma"][0, 2] == 12  # bin 60 -> last tone class
    assert lb["chroma"][0, 3] == 1  # bin 61 -> wraps to tone 1

    rng_np = np.random.default_rng(0)
    logits = dict(
        pitch=jnp.asarray(rng_np.normal(size=(1, 361, 5)).astype(np.float32)),
        chroma=jnp.asarray(rng_np.normal(size=(1, 13, 5)).astype(np.float32)),
        octave=jnp.asarray(rng_np.normal(size=(1, 7, 5)).astype(np.float32)),
    )
    loss = float(tonet_loss(notes, logits))
    assert np.isfinite(loss) and loss > 0


def test_mcdnn_shapes():
    from viterbi_spl_tpu.models.provenance import MCDNN

    x = jnp.zeros((2, 3, 360, 16))
    out, _ = init_and_apply(MCDNN(), x)
    assert out.shape == (2, 361, 16)


def test_mldrnet_shapes():
    from viterbi_spl_tpu.models.provenance import MLDRnet

    x = jnp.zeros((1, 3, 360, 16))
    out, _ = init_and_apply(MLDRnet(), x)
    assert out.shape == (1, 361, 16)
    assert np.all(np.isfinite(np.asarray(out)))


@pytest.mark.parametrize(
    "mode,backbone",
    [
        ("spat", "ftanet"),
        ("spl", "ftanet"),
        ("tcfp", "ftanet"),
        ("single", "ftanet"),
        ("all", "mcdnn"),
        ("single", "msnet"),
        ("single", "mldrnet"),
    ],
)
def test_tonet_ablation_variants(mode, backbone):
    """Backbone/mode ablations of the original TONet training module
    (tonet/model/tonet.py:24-265): forward shapes per variant, and the
    loss handles the pitch-only modes."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from viterbi_spl_tpu.models.tonet import TONet
    from viterbi_spl_tpu.models.targets import tonet_loss

    B, T = 1, 16
    model = TONet(mode=mode, backbone=backbone)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(B, 3, 360, T)),
                    jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(variables, x, train=False)
    assert out["pitch"].shape == (B, 361, T)
    if mode in ("tcfp", "single"):
        assert out["chroma"] is None and out["octave"] is None
    else:
        assert out["chroma"].shape == (B, 13, T)
        assert out["octave"].shape == (B, 7, T)
    notes = jnp.asarray(
        np.where(np.random.default_rng(1).random((B, T)) < 0.3, 0.0, 60.0),
        jnp.float32,
    )
    loss = float(tonet_loss(notes, out))
    assert np.isfinite(loss)
