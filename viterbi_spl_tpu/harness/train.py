"""Training loop: epoch driver with early stopping + orbax checkpointing.

Re-design of the reference's main()/training_fn/inference_fn template
(dcnet/softmax_viterbi.py:3377-3602):
- epoch loop: train `batches_per_epoch` steps, then validate,
- the validation grid picks the voicing threshold and it is CHECKPOINTED
  with the model (the reference stores it as a tf.Variable, :313, :2179-2207),
- checkpoint saved only when validation OA improves; early stop when
  `epoch - best_epoch >= patience` (:3568-3584),
- resume re-runs validation first to re-establish best_oa
  (reproduce-val-first, :3536-3556).

The Trainer is model-agnostic: it takes a jittable train step, a stream of
batches, and a validate callable.
"""

from __future__ import annotations

import dataclasses
import logging
from pathlib import Path
from typing import Any, Callable, Iterator

import numpy as np
import orbax.checkpoint as ocp


@dataclasses.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    voicing_threshold: float = 0.5
    epoch: int = 0
    best_oa: float = -1.0
    best_epoch: int = -1
    step: int = 0  # global train-step counter (drives the dropout RNG)

    def as_pytree(self) -> dict:
        return dict(
            params=self.params,
            batch_stats=self.batch_stats,
            opt_state=self.opt_state,
            scalars=dict(
                voicing_threshold=np.asarray(self.voicing_threshold, np.float32),
                epoch=np.asarray(self.epoch, np.int32),
                best_oa=np.asarray(self.best_oa, np.float32),
                best_epoch=np.asarray(self.best_epoch, np.int32),
                step=np.asarray(self.step, np.int32),
            ),
        )

    def load_pytree(self, tree: dict) -> "TrainState":
        s = tree["scalars"]
        return TrainState(
            params=tree["params"],
            batch_stats=tree["batch_stats"],
            opt_state=tree["opt_state"],
            voicing_threshold=float(s["voicing_threshold"]),
            epoch=int(s["epoch"]),
            best_oa=float(s["best_oa"]),
            best_epoch=int(s["best_epoch"]),
            # checkpoints written before the step counter existed have no
            # "step" scalar; resume them at step 0
            step=int(s.get("step", 0)),
        )


class Trainer:
    """Epoch driver.

    train_step(params, batch_stats, opt_state, batch, step[, threshold]) ->
        (new_params, new_batch_stats, new_opt_state, loss[, counts]) —
        jitted by the caller; `step` is the global step counter (fold it
        into the dropout RNG so every step draws fresh masks, matching the
        reference's stochastic dropout, dcnet/softmax_viterbi.py:3399-3434).
        A 6-arg step additionally receives the current voicing threshold
        and returns per-batch training-split metric counts; the epoch
        accumulates them into the full VRR..OA set (the reference's
        MetricsTrainingModeTrainingSplit, dcnet/softmax_viterbi.py:
        1599-1850) surfaced as info["train_metrics"]. The sixth parameter
        MUST be literally named `threshold` — the metrics protocol is
        detected by that name (a 6-arg step without it is treated as the
        5-arg protocol, with a warning).
    validate(state) -> dict with at least {"oa": float,
        "voicing_threshold": float} (from MelodyMetrics.validation_grid).
    """

    def __init__(
        self,
        train_step: Callable,
        validate: Callable[[TrainState], dict],
        ckpt_path: str,
        patience_epochs: int = 20,
        max_epochs: int = 10_000,
    ):
        self.train_step = train_step
        self.validate = validate
        self.patience = patience_epochs
        self.max_epochs = max_epochs
        self.ckpt_path = Path(ckpt_path).absolute()
        self._ckpt = ocp.StandardCheckpointer()
        import inspect

        # a metrics-reporting step declares a parameter literally named
        # `threshold` (make_train_step does); counting parameters would
        # misread variadic steps or steps with unrelated optional args
        try:
            params = inspect.signature(train_step).parameters
        except (TypeError, ValueError):
            params = {}
        self._step_takes_threshold = "threshold" in params
        if not self._step_takes_threshold and len(params) >= 6:
            import logging

            logging.warning(
                "train_step has %d parameters but none named 'threshold'; "
                "using the 5-arg protocol (no training-split metrics). "
                "Name the sixth parameter 'threshold' to enable them.",
                len(params),
            )

    # -- checkpointing ---------------------------------------------------
    def save(self, state: TrainState) -> None:
        """max_to_keep=1, like the reference. Multi-process safe: only
        process 0 clears the stale directory, all processes enter the
        (collective, multihost-aware) orbax save after a barrier, and a
        final barrier holds everyone until the write is durable — no
        process can race ahead into the next rmtree."""
        import jax

        path = self.ckpt_path
        multiprocess = jax.process_count() > 1
        if jax.process_index() == 0 and path.exists():
            import shutil

            shutil.rmtree(path)
        if multiprocess:
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices("vspl_ckpt_cleared")
        self._ckpt.save(path, state.as_pytree())
        self._ckpt.wait_until_finished()
        if multiprocess:
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices("vspl_ckpt_saved")

    def restore(self, state_like: TrainState) -> TrainState:
        template = state_like.as_pytree()
        try:
            tree = self._ckpt.restore(self.ckpt_path, template)
        except Exception:
            # pre-step-counter checkpoint: restore without the "step"
            # scalar and resume at step 0 (load_pytree defaults it)
            template["scalars"].pop("step", None)
            tree = self._ckpt.restore(self.ckpt_path, template)
        return state_like.load_pytree(tree)

    # -- loops -----------------------------------------------------------
    def train_epoch(
        self, state: TrainState, batches: Iterator[Any], steps: int
    ) -> tuple[TrainState, float, dict | None]:
        losses = []
        count_list = []
        for _ in range(steps):
            batch = next(batches)
            if self._step_takes_threshold:
                (state.params, state.batch_stats, state.opt_state, loss,
                 counts) = self.train_step(
                    state.params, state.batch_stats, state.opt_state, batch,
                    state.step, state.voicing_threshold,
                )
                if counts is not None:
                    count_list.append(counts)
            else:
                (state.params, state.batch_stats, state.opt_state,
                 loss) = self.train_step(
                    state.params, state.batch_stats, state.opt_state, batch,
                    state.step,
                )
            state.step += 1
            losses.append(loss)
        mean_loss = float(np.mean([float(l) for l in losses]))
        train_metrics = None
        if count_list:
            # one device->host sync for the whole epoch's counts
            import jax

            from ..metrics.melody import MelodyMetrics

            summed = jax.tree.map(lambda *xs: sum(xs), *count_list)
            mm = MelodyMetrics(
                1, np.asarray([state.voicing_threshold], np.float32)
            )
            mm.update(0, {k: np.asarray(v) for k, v in summed.items()},
                      loss=mean_loss)
            train_metrics = {
                k: (float(v) if np.ndim(v) == 0 else float(np.asarray(v)[0]))
                for k, v in mm.results(0).items()
            }
        return state, mean_loss, train_metrics

    def fit(
        self,
        state: TrainState,
        batches: Iterator[Any],
        steps_per_epoch: int,
        resume: bool = False,
        on_epoch_end: Callable[[TrainState, dict], None] | None = None,
    ) -> TrainState:
        if resume:
            state = self.restore(state)
            # reproduce-val-first: re-establish best_oa from the restored
            # weights before training continues
            val = self.validate(state)
            state.best_oa = val["oa"]
            state.best_epoch = state.epoch
            logging.info("resumed at epoch %d, val oa %.4f", state.epoch, val["oa"])

        while state.epoch < self.max_epochs:
            state, train_loss, train_metrics = self.train_epoch(
                state, batches, steps_per_epoch
            )
            val = self.validate(state)
            state.voicing_threshold = val.get(
                "voicing_threshold", state.voicing_threshold
            )
            improved = val["oa"] > state.best_oa
            if improved:
                state.best_oa = val["oa"]
                state.best_epoch = state.epoch
                self.save(state)
            if on_epoch_end is not None:
                on_epoch_end(
                    state,
                    dict(train_loss=train_loss, val=val, improved=improved,
                         train_metrics=train_metrics),
                )
            if state.epoch - state.best_epoch >= self.patience:
                logging.info(
                    "early stop at epoch %d (best %.4f @ %d)",
                    state.epoch,
                    state.best_oa,
                    state.best_epoch,
                )
                break
            state.epoch += 1
        return state


def add_weight_decay_grad(grads, params, path: tuple[str, ...], wd: float):
    """Manual weight decay on a single kernel — the dcnet rule
    (dcnet/softmax_viterbi.py:293-364): grad += wd * param, only for the
    global conv kernel."""

    def walk(tree, p):
        return tree if not p else walk(tree[p[0]], p[1:])

    g = walk(grads, path)
    w = walk(params, path)
    new_leaf = g + wd * w

    def rebuild(tree, p):
        if not p:
            return new_leaf
        return {**tree, p[0]: rebuild(tree[p[0]], p[1:])}

    return rebuild(grads, path)


def l2_regularization(params, paths, scale: float):
    """sum(scale * ||w||^2) over the given kernel paths (jdc's l2(1e-5))."""
    import jax.numpy as jnp

    def walk(tree, p):
        return tree if not p else walk(tree[p[0]], p[1:])

    return sum(scale * jnp.sum(walk(params, p) ** 2) for p in paths)
