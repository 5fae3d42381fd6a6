"""Tensor-parallel parameter sharding (GSPMD) over a named "model" axis.

TPU-first model parallelism for the training harness: parameters, their
optimizer moments, and batch stats are sharded over a `model` mesh axis by
a shape rule (the output-channel dimension of conv/dense kernels and the
matching per-channel vectors), the unchanged jitted train step runs on the
sharded pytrees, and GSPMD inserts the collectives (all-gathers on the
contracting edges, reduce-scatters on the gradients) so they ride ICI.

The acoustic models here (SURVEY.md §2.6: ~1-10 M params) fit on one chip,
so tp exists as the production template the training stack needs at larger
scale, composed with the "data" axis the apps already use
(`--mesh data=N,model=M`). Correctness bar: the tp step must produce the
same loss and the same updated parameters as the replicated step (up to
GSPMD reduction-order ulp) — asserted in tests/test_dist.py and certified
in the driver's multichip dryrun.

No reference analog (the reference is single-GPU, SURVEY.md §2.10); the
sharding recipe follows the public scaling-book pattern: pick a mesh,
annotate shardings, let XLA insert collectives.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_tp_mesh(data: int, model: int, devices=None) -> Mesh:
    """Mesh over (data, model): batches shard over "data", channel dims
    over "model"."""
    devices = devices if devices is not None else jax.devices()
    if data * model > len(devices):
        raise ValueError(
            f"mesh {data}x{model} needs more than {len(devices)} devices"
        )
    grid = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(grid, ("data", "model"))


def tp_spec(shape, model_axis_size: int, axis: str = "model") -> P:
    """The tp shape rule: shard the trailing (output-channel) dimension of
    any array it divides evenly and is worth splitting; replicate the rest.

    Covers conv kernels [kh, kw, cin, cout], dense kernels [cin, cout],
    per-channel biases / BN scales / BN running stats [cout], and adam
    moments (same shapes as their params — the rule is a pure function of
    shape, so moments land on their param's sharding automatically).
    Small heads (e.g. 361-class output layers with odd sizes) and scalars
    stay replicated; GSPMD propagates/reshards at the layer seams, so
    mixed sharded/replicated trees are correct by construction.
    """
    if (
        len(shape) >= 1
        and shape[-1] >= 2 * model_axis_size
        and shape[-1] % model_axis_size == 0
    ):
        return P(*([None] * (len(shape) - 1) + [axis]))
    return P()


def tp_param_specs(tree, model_axis_size: int, axis: str = "model"):
    """PartitionSpec pytree for a flax param / batch-stats / opt-state
    tree under the tp shape rule."""
    return jax.tree.map(
        lambda leaf: tp_spec(np.shape(leaf), model_axis_size, axis), tree
    )


def tp_shard_tree(tree, mesh: Mesh, axis: str = "model"):
    """device_put every leaf of a pytree onto the mesh under the tp shape
    rule. Works for params, batch stats, and optimizer states alike."""
    size = mesh.shape[axis]

    def put(leaf):
        spec = tp_spec(np.shape(leaf), size, axis)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree.map(put, tree)
