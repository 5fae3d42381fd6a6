"""DCNet ("shaun") — the author's dilated-CNN melody extractor, in flax.

Architecture parity with dcnet/acoustic_model_shaun.py:23-91:
- input [B, T, 500] NSGT feature (reference uses B=1 whole snippets),
- "local" stack: 4 conv layers over (time, freq), 16 channels, kernel
  [5,5] then [3,5], time-dilation 2^layer, SAME padding, no bias, each
  followed by BatchNorm(scale=False) + ReLU (+ dropout 0.2 from layer 1),
- "global" layer: freq pad [240, 60] then a [1, 97] conv with freq-dilation
  5 (VALID) -> 128 channels over exactly 320 output bins, BN + ReLU + drop,
- fusion dense 64 (no bias) + BN + ReLU + drop, output dense 1 (bias),
- squeeze -> [B, T, 320] sigmoid logits.

Trained with per-bin BCE vs Gaussian-blurred targets (targets.dcnet_loss)
and manual weight decay 2e-4 applied ONLY to the global conv kernel
(dcnet/softmax_viterbi.py:293-364) — see `global_conv_kernel_path`.

`dtype` is the compute dtype (mixed precision): convs/denses run in it
(bf16 feeds the MXU single-pass and halves activation HBM traffic),
while params, BatchNorm statistics, and the returned logits stay float32.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


class DCNet(nn.Module):
    n_freq_in: int = 500
    n_bins: int = 320
    dropout_rate: float = 0.2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, valid_frames=None):
        # x: [B, T, 500]
        # valid_frames (optional scalar): frames >= valid_frames are bucket
        # padding. Zeroing them immediately before every time-mixing conv
        # reproduces the exact SAME-padding zeros a valid_frames-length run
        # would see, so logits[:, :valid_frames] are op-level identical to
        # running the unpadded input (under jit, XLA's shape-dependent
        # vectorization adds ~1e-7 ulp noise; tests/test_bucketing.py pins
        # both) — one compiled shape serves a whole bucket of
        # ragged snippet lengths (utils.shape_bucket; eval only, where
        # BatchNorm uses running stats and frames never mix elsewhere).
        if x.ndim != 3 or x.shape[-1] != self.n_freq_in:
            raise ValueError(f"expected [B, T, {self.n_freq_in}], got {x.shape}")
        h = x[..., None]
        tmask = None
        if valid_frames is not None:
            t = jnp.arange(x.shape[1])
            tmask = (t < valid_frames)[None, :, None, None]

        for layer_idx in range(4):
            if tmask is not None:
                h = jnp.where(tmask, h, 0.0)
            h = nn.Conv(
                features=16,
                kernel_size=(5, 5) if layer_idx == 0 else (3, 5),
                kernel_dilation=(2**layer_idx, 1),
                padding="SAME",
                use_bias=False,
                dtype=self.dtype,
                name=f"local_conv_{layer_idx}",
            )(h)
            h = nn.BatchNorm(
                use_running_average=not train,
                use_scale=False,
                name=f"local_bn_{layer_idx}",
            )(h)
            h = nn.relu(h)
            if layer_idx > 0:
                h = nn.Dropout(self.dropout_rate, deterministic=not train)(h)

        # global context: freq pad [240, 60], kernel width 97 with dilation 5
        h = jnp.pad(h, [(0, 0), (0, 0), (240, 60), (0, 0)])
        h = nn.Conv(
            features=128,
            kernel_size=(1, 97),
            kernel_dilation=(1, 5),
            padding="VALID",
            use_bias=False,
            dtype=self.dtype,
            name="global_conv",
        )(h)
        if h.shape[2] != self.n_bins:
            raise AssertionError(f"global conv produced {h.shape[2]} bins")
        h = nn.BatchNorm(
            use_running_average=not train, use_scale=False, name="global_bn"
        )(h)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout_rate, deterministic=not train)(h)

        h = nn.Dense(64, use_bias=False, dtype=self.dtype, name="fusion_dense")(h)
        h = nn.BatchNorm(
            use_running_average=not train, use_scale=False, name="fusion_bn"
        )(h)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout_rate, deterministic=not train)(h)

        h = nn.Dense(1, use_bias=True, dtype=self.dtype, name="output_dense")(h)
        return jnp.squeeze(h, axis=-1).astype(jnp.float32)  # [B, T, 320]

    @staticmethod
    def global_conv_kernel_path() -> tuple[str, str]:
        """Param-tree path of the kernel that receives manual weight decay
        (the reference's locate_global_kernel_fn targets the 1x97 conv,
        dcnet/softmax_viterbi.py:293-322)."""
        return ("global_conv", "kernel")
