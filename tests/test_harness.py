"""Harness tests: config guards, tiny end-to-end training with early stop +
checkpoint resume, dual-path evaluation with the mir_eval cross-check,
reporting artifacts."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from viterbi_spl_tpu.harness import (
    HarnessConfig,
    Reporter,
    TrainOrInference,
    Trainer,
    TrainState,
    evaluate_posteriorgrams,
    metrics_markdown_table,
)
from viterbi_spl_tpu.harness.evaluate import DecoderSetup
from viterbi_spl_tpu.harness.train import add_weight_decay_grad, l2_regularization
from viterbi_spl_tpu.hmm import params as P


def test_config_collision_guard(tmp_path):
    cfg = HarnessConfig(
        mode=TrainOrInference(ckpt_prefix="x"),
        log_dir=str(tmp_path / "runs"),
        ckpt_dir=str(tmp_path / "ckpts"),
    )
    cfg.check_collisions()
    (tmp_path / "runs" / "x").mkdir(parents=True)
    with pytest.raises(FileExistsError):
        cfg.check_collisions()


def test_config_debug_truncation():
    cfg = HarnessConfig(debug=True)
    assert cfg.truncate_split(list("abcdefg")) == ["a", "b"]


def _tiny_trainer(tmp_path, target_w=3.0):
    """1-parameter linear model trained to fit y = target_w * x."""
    import optax

    tx = optax.sgd(0.1)

    @jax.jit
    def train_step(params, batch_stats, opt_state, batch, step):
        x, y = batch

        def loss_fn(p):
            return jnp.mean((p["w"] * x - y) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, batch_stats, opt_state, loss

    def batches():
        rng = np.random.default_rng(0)
        while True:
            x = rng.normal(size=8).astype(np.float32)
            yield jnp.asarray(x), jnp.asarray(target_w * x)

    def validate(state):
        # "oa" improves as w approaches the target
        err = abs(float(state.params["w"]) - target_w)
        return dict(oa=1.0 - err, voicing_threshold=0.4)

    params = {"w": jnp.asarray(1.0)}
    state = TrainState(
        params=params, batch_stats={}, opt_state=tx.init(params)
    )
    trainer = Trainer(
        train_step, validate, ckpt_path=str(tmp_path / "ckpt"),
        patience_epochs=3, max_epochs=50,
    )
    return trainer, state, batches()


def test_training_loop_early_stop_and_checkpoint(tmp_path):
    trainer, state, batches = _tiny_trainer(tmp_path)
    state = trainer.fit(state, batches, steps_per_epoch=5)
    assert state.best_oa > 0.95
    assert state.voicing_threshold == pytest.approx(0.4)
    # early stopping triggered before max_epochs
    assert state.epoch < 50

    # restore reproduces the best params
    restored = trainer.restore(state)
    assert float(restored.params["w"]) == pytest.approx(3.0, abs=0.1)
    assert restored.best_oa == pytest.approx(state.best_oa)


def test_training_resume(tmp_path):
    trainer, state, batches = _tiny_trainer(tmp_path)
    state = trainer.fit(state, batches, steps_per_epoch=2)
    # resume: restores, validates first, continues without crashing
    trainer2, state2, batches2 = _tiny_trainer(tmp_path)
    trainer2.max_epochs = state.epoch + 2
    resumed = trainer2.fit(state2, batches2, steps_per_epoch=1, resume=True)
    assert resumed.best_oa >= state.best_oa - 1e-6


def test_restore_pre_step_counter_checkpoint(tmp_path):
    """Checkpoints written before TrainState grew the `step` scalar must
    still restore (resume at step 0) — the restore template falls back to
    the legacy scalar set."""
    trainer, state, batches = _tiny_trainer(tmp_path)
    state = trainer.fit(state, batches, steps_per_epoch=2)

    # rewrite the checkpoint WITHOUT the step scalar (legacy layout)
    legacy = state.as_pytree()
    legacy["scalars"].pop("step")
    import shutil

    shutil.rmtree(trainer.ckpt_path)
    trainer._ckpt.save(trainer.ckpt_path, legacy)
    trainer._ckpt.wait_until_finished()

    restored = trainer.restore(state)
    assert restored.step == 0
    assert restored.best_oa == pytest.approx(state.best_oa)


def test_train_step_dropout_rng_varies_per_step():
    """The app train step must draw FRESH dropout masks every step (the
    reference trains with stochastic dropout, dcnet/softmax_viterbi.py:
    3399-3434); round 1 reused PRNGKey(1) at every step."""
    import flax.linen as nn
    import optax

    from viterbi_spl_tpu.apps.common import AppConfig, make_train_step

    class DropNet(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            w = self.param("w", nn.initializers.ones, (1,))
            y = nn.BatchNorm(use_running_average=not train)(x * w)
            return nn.Dropout(0.5, deterministic=not train)(y)

    model = DropNet()
    x = jnp.asarray(
        np.random.default_rng(7).normal(size=(8, 64)), jnp.float32
    )
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    tx = optax.sgd(0.0)  # lr 0: the loss value depends only on the mask
    cfg = AppConfig(
        family=None, make_model=None,
        loss_fn=lambda notes, out: jnp.sum(out * notes),
        logits_adapter=None, snippet_len=64, batch_size=1,
        learning_rate=0.0, feature_shape=(64,),
    )
    step_fn = make_train_step(cfg, model, tx)
    params, bs = variables["params"], variables["batch_stats"]
    opt = tx.init(params)
    notes = jnp.linspace(0.5, 1.5, 8 * 64).reshape(8, 64)
    losses = [
        float(step_fn(params, bs, opt, (x, notes), s, 0.5)[3])
        for s in (0, 1, 0)
    ]
    assert losses[0] != losses[1], "dropout mask identical across steps"
    assert losses[0] == losses[2], "dropout mask not reproducible per step"


def test_weight_decay_and_l2():
    params = {"a": {"kernel": jnp.ones((2, 2))}, "b": jnp.zeros(3)}
    grads = {"a": {"kernel": jnp.zeros((2, 2))}, "b": jnp.ones(3)}
    g2 = add_weight_decay_grad(grads, params, ("a", "kernel"), 0.1)
    np.testing.assert_allclose(np.asarray(g2["a"]["kernel"]), 0.1)
    np.testing.assert_allclose(np.asarray(g2["b"]), 1.0)  # untouched
    reg = float(l2_regularization(params, (("a", "kernel"),), 1e-2))
    assert reg == pytest.approx(4e-2)


def _setup_and_tracks(rng, n_tracks=2, T=300, n_bins=40):
    tracks_q = [
        np.clip(20 + np.cumsum(rng.integers(-1, 2, 800)), 0, n_bins - 1)
    ]
    stats = P.count_statistics(tracks_q, n_bins)
    A = P.shape_transition_matrix(
        stats.transition_counts, np.array([[0.98, 0.02], [0.03, 0.97]]),
        n_bins, 4, 2,
    )
    pi = P.shape_init_probs(stats.p_steady, p_th=1e-4)
    note_min, bps = 40.0, 5.0
    setup = DecoderSetup(
        transition_matrix=A, init_probs=pi, n_bins=n_bins,
        note_min=note_min, bins_per_semitone=bps, spw=3,
        voicing_threshold=0.4, hop_seconds=0.01,
    )
    tracks = []
    for _ in range(n_tracks):
        path = np.clip(20 + np.cumsum(rng.integers(-1, 2, T)), 0, n_bins - 1)
        voiced = rng.random(T) > 0.2
        notes = np.where(voiced, note_min + path / bps, 0.0).astype(np.float32)
        logits = np.full((T, n_bins), -6.0, np.float32)
        logits[np.arange(T), path] = np.where(voiced, 6.0, -6.0)
        from viterbi_spl_tpu.metrics.mel_eval import midi_to_hz

        freqs = np.where(notes > 0, midi_to_hz(notes), 0.0)
        times = np.arange(T) * 0.01
        tracks.append(
            dict(logits=logits, notes=notes, original=dict(times=times, freqs=freqs))
        )
    return setup, tracks


def test_evaluate_posteriorgrams_cross_check(rng):
    setup, tracks = _setup_and_tracks(rng)
    out = evaluate_posteriorgrams(setup, tracks)
    # clean synthetic logits: both paths should score high
    assert out["raw_mean_oa"] > 0.9
    assert out["viterbi_mean_oa"] > 0.9
    # accumulated OA must agree with the mir_eval OA (identical timebases)
    for d in out["cross_check_diff_raw"] + out["cross_check_diff_viterbi"]:
        assert abs(d) < 1e-6


def test_markdown_table_and_reporter(tmp_path):
    results = {m: np.asarray([0.5, 0.75]) for m in
               ("vrr", "vfa", "va", "rpa_strict", "rpa_wide",
                "rca_strict", "rca_wide", "oa")}
    table = metrics_markdown_table(results, ["t1", "t2"])
    assert "| t1 | 0.5000" in table
    assert "**average**" in table

    rep = Reporter(tmp_path / "log")
    rep.scalar("loss", 1.5, step=0)
    rep.table("metrics", results, ["t1", "t2"])
    events = rep.read_events()
    assert events[0]["kind"] == "scalar"
    assert "0.7500" in events[1]["text"]


def test_piano_roll_figure(tmp_path, rng):
    from viterbi_spl_tpu.harness.reporting import piano_roll_figure

    T = 50
    notes = np.where(rng.random(T) > 0.3, 60.0, 0.0)
    v = notes > 0
    out = tmp_path / "roll.png"
    piano_roll_figure(out, notes, notes, v, notes, v, title="test")
    assert out.exists() and out.stat().st_size > 0


def test_reporter_tensorboard_mirror(tmp_path):
    """Reporter(tensorboard=True) mirrors scalars/tables into TensorBoard
    event files (the reference's TBSummary surface, SURVEY.md §5)."""
    pytest.importorskip("torch.utils.tensorboard")
    from viterbi_spl_tpu.harness.reporting import Reporter

    rep = Reporter(tmp_path, tensorboard=True)
    rep.scalar("val_oa", 0.75, step=3)
    rep.text("note", "hello **table**", step=0)

    event_files = list(tmp_path.glob("events.out.tfevents.*"))
    assert event_files, "no TensorBoard event files written"

    from tensorboard.backend.event_processing.event_accumulator import (
        EventAccumulator,
    )

    acc = EventAccumulator(str(tmp_path))
    acc.Reload()
    assert "val_oa" in acc.Tags()["scalars"]
    ev = acc.Scalars("val_oa")[0]
    assert ev.step == 3 and abs(ev.value - 0.75) < 1e-6
    # JSONL log still written alongside
    kinds = [e["kind"] for e in rep.read_events()]
    assert kinds == ["scalar", "text"]


def test_trainer_step_introspection(tmp_path):
    """The metrics-reporting train step is detected by a parameter named
    `threshold`; variadic or extra-default-arg steps stay on the legacy
    5-arg protocol instead of being misclassified by arg count."""
    from viterbi_spl_tpu.harness.train import Trainer

    def legacy(params, bs, opt, batch, step):
        pass

    def with_threshold(params, bs, opt, batch, step, threshold):
        pass

    def variadic(*args):
        pass

    def extra_default(params, bs, opt, batch, step, rng_seed=0):
        pass

    def mk(f):
        return Trainer(f, lambda s: {"oa": 0.0}, ckpt_path=tmp_path / "ck")

    assert not mk(legacy)._step_takes_threshold
    assert mk(with_threshold)._step_takes_threshold
    assert not mk(variadic)._step_takes_threshold
    assert not mk(extra_default)._step_takes_threshold
