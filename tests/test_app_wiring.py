"""The reference's training/eval semantics must be applied by the PRODUCT
path, not just exist as tested helpers (round-2 VERDICT Weak #1/#2):

- dcnet: wd=2e-4 on the global conv kernel enters the gradient every step
  (dcnet/softmax_viterbi.py:311, applied at :3426),
- jdc: l2(1e-5) on the conv kernels enters the training loss
  (jdc/acoustic_module.py:35,39,64),
- jdc: the combined voicing head drives the raw path's voicing decision and
  the validation grid (jdc/acoustic_module.py:74-81),
- tonet: the warm-up/decay LR schedule feeds the optimizer
  (tonet/model/tonet.py:474-490),
- the apps' DecoderSetup carries the family's interp_est_notes /
  threshold_is_logit flags (jdc/viterbi_softmax.py:2443-2470).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _one_step(cfg, model, variables, batch):
    import optax

    from viterbi_spl_tpu.apps.common import make_train_step

    tx = optax.adam(cfg.learning_rate)
    params, bs = variables["params"], variables.get("batch_stats", {})
    step_fn = make_train_step(cfg, model, tx)
    new_params, _, _, loss, _ = step_fn(
        params, bs, tx.init(params), batch, 0, 0.5
    )
    return params, new_params, float(loss)


def test_dcnet_train_step_applies_weight_decay():
    from viterbi_spl_tpu.apps import dcnet

    cfg = dcnet.config()
    assert cfg.weight_decay == (("global_conv", "kernel"), 2e-4)

    rng = np.random.default_rng(0)
    spec = jnp.asarray(rng.normal(size=(1, 48, 500)), jnp.float32)
    notes = jnp.asarray(
        np.where(rng.random(48) > 0.5, 60.0, 0.0), jnp.float32
    )[None]
    model = cfg.make_model(dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), spec, train=False)

    _, with_wd, _ = _one_step(cfg, model, variables, (spec, notes))
    cfg_no = dataclasses.replace(cfg, weight_decay=None)
    _, without_wd, _ = _one_step(cfg_no, model, variables, (spec, notes))

    # the decayed kernel takes a different update; every other param's
    # update is identical (adam is per-parameter)
    k_wd = np.asarray(with_wd["global_conv"]["kernel"])
    k_no = np.asarray(without_wd["global_conv"]["kernel"])
    assert np.abs(k_wd - k_no).max() > 0
    np.testing.assert_array_equal(
        np.asarray(with_wd["output_dense"]["kernel"]),
        np.asarray(without_wd["output_dense"]["kernel"]),
    )


def test_jdc_train_step_loss_includes_l2():
    from viterbi_spl_tpu.apps import jdc
    from viterbi_spl_tpu.harness.train import l2_regularization
    from viterbi_spl_tpu.models import JDC

    cfg = jdc.config()
    assert cfg.l2_reg == (JDC.l2_param_paths(), 1e-5)

    rng = np.random.default_rng(1)
    spec = jnp.asarray(rng.normal(size=(2, 31, 513)), jnp.float32)
    notes = jnp.asarray(
        np.where(rng.random((2, 31)) > 0.5, 50.0, 0.0), jnp.float32
    )
    model = cfg.make_model(dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), spec, train=False)

    _, _, loss_l2 = _one_step(cfg, model, variables, (spec, notes))
    cfg_no = dataclasses.replace(cfg, l2_reg=None)
    _, _, loss_no = _one_step(cfg_no, model, variables, (spec, notes))
    reg = float(
        l2_regularization(variables["params"], JDC.l2_param_paths(), 1e-5)
    )
    assert reg > 0
    assert loss_l2 - loss_no == pytest.approx(reg, rel=1e-4)


def test_tonet_optimizer_uses_warmup_schedule():
    """make_optimizer (what app_main builds) must run under the tonet
    schedule: a single adam update at step 0 has magnitude ~lr(0) =
    0.5 * base_lr, not base_lr."""
    import optax

    from viterbi_spl_tpu.apps import tonet
    from viterbi_spl_tpu.apps.common import make_optimizer
    from viterbi_spl_tpu.apps.tonet import tonet_lr_schedule

    cfg = tonet.config()
    assert cfg.lr_schedule is tonet_lr_schedule

    tx = make_optimizer(cfg, steps_per_epoch=10)
    params = {"w": jnp.zeros(3)}
    grads = {"w": jnp.ones(3)}
    updates, _ = tx.update(grads, tx.init(params), params)
    # adam's first update is -lr * g/ (sqrt(g^2)+eps) ~ -lr
    got = float(-updates["w"][0])
    assert got == pytest.approx(0.5 * cfg.learning_rate, rel=1e-3)


def test_model_logits_for_dataset_returns_voicing():
    """The plumbing: with_voicing returns the voicing head per track, both
    in the fixed-chunks path (jdc) and the ragged-snippet path."""
    import flax.linen as nn

    from viterbi_spl_tpu.apps.common import (
        AppConfig, model_logits_for_dataset, synthetic_dataset,
    )
    from viterbi_spl_tpu.families import family_spec
    from viterbi_spl_tpu.harness import TrainState

    class TinyHead(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            h = nn.Dense(8)(x)
            return dict(pitch=nn.Dense(6)(h), voicing=nn.Dense(1)(h)[..., 0])

    cfg = AppConfig(
        family=family_spec("jdc"),
        make_model=lambda **kw: TinyHead(),
        loss_fn=None,
        logits_adapter=lambda out: out["pitch"][..., 1:],
        snippet_len=16,
        batch_size=2,
        learning_rate=1e-3,
        feature_shape=(12,),
        fixed_chunks=True,
        voicing_adapter=lambda out: out["voicing"],
    )
    ds = synthetic_dataset(cfg, n_tracks=2, frames=40, seed=0)
    model = cfg.make_model()
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 16, 12)), train=False
    )
    state = TrainState(
        params=variables["params"], batch_stats={}, opt_state=None
    )
    logits_list, voicing_list = model_logits_for_dataset(
        cfg, model, state, ds, with_voicing=True
    )
    assert len(logits_list) == len(voicing_list) == 2
    for lg, v in zip(logits_list, voicing_list):
        assert lg.shape == (40, 5)
        assert v.shape == (40,)
    # no voicing head -> None sentinel
    cfg_no = dataclasses.replace(cfg, voicing_adapter=None)
    lg2, v2 = model_logits_for_dataset(
        cfg_no, model, state, ds, with_voicing=True
    )
    assert v2 is None and len(lg2) == 2


def test_raw_path_thresholds_voicing_head():
    """decode_and_score_track with voicing_logits: the raw voicing decision
    follows the head, not the peak probability."""
    from viterbi_spl_tpu.apps.common import build_decoder_setup
    from viterbi_spl_tpu.apps import jdc
    from viterbi_spl_tpu.apps.common import synthetic_dataset
    from viterbi_spl_tpu.harness.evaluate import decode_and_score_track

    cfg = jdc.config()
    val = synthetic_dataset(cfg, n_tracks=2, frames=120, seed=1)
    setup = build_decoder_setup(cfg, val, voicing_threshold=0.5)
    # the app's setup must carry the family flags
    assert setup.interp_est_notes is False

    T, n_bins = 100, cfg.family.n_bins
    rng = np.random.default_rng(2)
    logits = rng.normal(0, 1, (T, n_bins)).astype(np.float32)
    logits[:, 5] += 6.0  # strong peak everywhere
    voicing = np.where(np.arange(T) % 2 == 0, 4.0, -4.0).astype(np.float32)
    notes = np.full(T, float(cfg.family.note_range[5]), np.float32)

    r = decode_and_score_track(setup, logits, notes, voicing_logits=voicing)
    np.testing.assert_array_equal(r["raw_voiced"], voicing > 0)
    # direct est-note mapping (no +/-1-bin interpolation): exact grid value
    assert float(r["est_notes_raw"][0]) == pytest.approx(
        float(cfg.family.note_range[5])
    )


def test_validation_grid_uses_voicing_head():
    """make_validate under a voicing_adapter thresholds the HEAD: a model
    whose voicing head carries the label while pitch peaks are noise picks
    a mid-grid threshold and a high OA."""
    import flax.linen as nn

    from viterbi_spl_tpu.apps.common import (
        AppConfig, make_validate, synthetic_dataset,
    )
    from viterbi_spl_tpu.families import family_spec
    from viterbi_spl_tpu.harness import TrainState

    class Oracle(nn.Module):
        """Pitch logits: bump at the label bin; voicing head: the label."""

        n_bins: int

        @nn.compact
        def __call__(self, x, train=False):
            # first feature channel carries the label bump (synthetic_dataset)
            dummy = self.param("w", nn.initializers.zeros, (1,))
            pitch = x * 3.0 + dummy
            # the +2.0 label bump puts the max near 2; noise-only frames
            # max out around 1.1 over 721 bins of N(0, 0.3)
            voiced = jnp.max(x, axis=-1) - 1.5  # >0 iff bump present
            return dict(pitch=pitch, voicing=voiced * 4.0)

    spec = family_spec("jdc")
    cfg = AppConfig(
        family=spec,
        make_model=lambda **kw: Oracle(spec.n_bins),
        loss_fn=None,
        logits_adapter=lambda out: out["pitch"],
        snippet_len=32,
        batch_size=2,
        learning_rate=1e-3,
        feature_shape=(spec.n_bins,),
        fixed_chunks=True,
        voicing_adapter=lambda out: out["voicing"],
    )
    ds = synthetic_dataset(cfg, n_tracks=2, frames=200, seed=3)
    model = cfg.make_model()
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, spec.n_bins)), train=False
    )
    state = TrainState(
        params=variables["params"], batch_stats={}, opt_state=None
    )
    out = make_validate(cfg, model, ds)(state)
    assert out["oa"] > 0.9
    assert 0.01 <= out["voicing_threshold"] <= 0.99
