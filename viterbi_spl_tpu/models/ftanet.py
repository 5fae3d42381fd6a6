"""FTANet (Yu's frequency/time-attention network), flax.

Architecture parity with ftanet/acoustic_model.py:13-129:
- input [B, 128, 320, 3] CFP snippets, transposed to (freq, time) layout,
- bottom branch: strided (4,1) SELU convs collapsing 320 freq bins -> 1
  non-melody row,
- U-shape: FTA modules (residual 1x1 conv + time attention + freq
  attention) fused by SF modules (selective-kernel fusion with a softmax
  over the CHANNEL axis, exactly as the reference code does), channels
  32 -> 64 -> 128 with 2x2 max-pool down and 2x2 nearest upsampling,
- concat non-melody row + 320-bin map -> [B, 128, 321] softmax logits
  (class 0 = non-melody).

Trained with the same smoothed softmax CE as msnet (targets.softmax_
smoothed_loss), batched 16 x 128-frame snippets (ftanet/yu.py:280-316).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


class SFModule(nn.Module):
    """Selective-kernel fusion (ftanet/acoustic_model.py:13-44)."""

    n_channel: int
    reduction: int = 4
    limitation: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x_list, train: bool = False):
        fused = sum(x_list)
        fused = jnp.mean(fused, axis=(1, 2))  # GlobalAveragePooling2D -> [B, C]
        fused = nn.BatchNorm(use_running_average=not train, name="bn")(fused)
        fused = nn.Dense(
            max(self.n_channel // self.reduction, self.limitation),
            dtype=self.dtype, name="fuse_dense",
        )(fused)
        fused = nn.selu(fused)

        masks = [
            nn.Dense(self.n_channel, dtype=self.dtype, name=f"mask_dense_{i}")(fused)
            for i in range(len(x_list))
        ]
        mask_stack = jnp.stack(masks, axis=-1)  # [B, C, K]
        # NOTE: the reference applies Softmax(axis=-2), i.e. over channels —
        # kept verbatim for parity. Softmax runs in f32 under mixed precision.
        mask_stack = nn.softmax(mask_stack.astype(jnp.float32), axis=-2).astype(
            self.dtype
        )

        selected = 0.0
        for i, x_s in enumerate(x_list):
            mask = mask_stack[:, :, i][:, None, None, :]  # [B,1,1,C]
            selected = selected + x_s * mask
        return selected


class FTAModule(nn.Module):
    """Residual + time-attention + freq-attention branches
    (ftanet/acoustic_model.py:47-77). Input [B, F, T, C_in]."""

    out_channels: int
    kt: int = 3
    kf: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        C = self.out_channels
        dt = self.dtype
        x = nn.BatchNorm(use_running_average=not train, name="bn")(x)

        x_r = nn.relu(nn.Conv(C, (1, 1), padding="SAME", dtype=dt, name="res_conv")(x))

        # time attention: mean over freq -> [B, T, C_in]
        a_t = jnp.mean(x, axis=1)
        a_t = nn.selu(nn.Conv(C, (self.kt,), padding="SAME", dtype=dt, name="ta_conv1")(a_t))
        a_t = nn.selu(nn.Conv(C, (self.kt,), padding="SAME", dtype=dt, name="ta_conv2")(a_t))
        a_t = nn.softmax(a_t.astype(jnp.float32), axis=-2).astype(dt)  # over time
        a_t = a_t[:, None, :, :]  # [B, 1, T, C]
        x_t = nn.selu(nn.Conv(C, (3, 3), padding="SAME", dtype=dt, name="t_conv3")(x))
        x_t = nn.selu(nn.Conv(C, (5, 5), padding="SAME", dtype=dt, name="t_conv5")(x_t))
        x_t = x_t * a_t

        # frequency attention: mean over time -> [B, F, C_in]
        a_f = jnp.mean(x, axis=2)
        a_f = nn.selu(nn.Conv(C, (self.kf,), padding="SAME", dtype=dt, name="fa_conv1")(a_f))
        a_f = nn.selu(nn.Conv(C, (self.kf,), padding="SAME", dtype=dt, name="fa_conv2")(a_f))
        a_f = nn.softmax(a_f.astype(jnp.float32), axis=-2).astype(dt)  # over freq
        a_f = a_f[:, :, None, :]  # [B, F, 1, C]
        x_f = nn.selu(nn.Conv(C, (3, 3), padding="SAME", dtype=dt, name="f_conv3")(x))
        x_f = nn.selu(nn.Conv(C, (5, 5), padding="SAME", dtype=dt, name="f_conv5")(x_f))
        x_f = x_f * a_f

        return x_r, x_t, x_f


def _maxpool22(x):
    return nn.max_pool(x, (2, 2), strides=(2, 2))


def _upsample22(x):
    B, F, T, C = x.shape
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


class FTANet(nn.Module):
    n_bins: int = 320
    snippet_len: int = 128
    # compute dtype for convs/denses (mixed precision); params, BatchNorm,
    # softmax attention, and the returned logits stay f32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        # x: [B, 128, 320, 3] (time, freq, ch)
        if x.ndim != 4 or x.shape[2] != self.n_bins:
            raise ValueError(f"expected [B, T, {self.n_bins}, 3], got {x.shape}")
        x = jnp.transpose(x, (0, 2, 1, 3))  # -> [B, F, T, 3]
        x = nn.BatchNorm(use_running_average=not train, name="in_bn")(x)

        # bottom (non-melody) branch: collapse freq 320 -> 1
        bm = x
        for i in range(3):
            bm = nn.selu(
                nn.Conv(16, (4, 1), strides=(4, 1), padding="VALID", dtype=dt,
                        name=f"bm_conv_{i}")(bm)
            )
        bm = nn.selu(nn.Conv(1, (5, 1), strides=(5, 1), padding="VALID", dtype=dt,
                             name="bm_conv_3")(bm))
        # [B, 1, T, 1]

        h = x
        h = SFModule(32, dtype=dt, name="sf0")(FTAModule(32, dtype=dt, name="fta0")(h, train), train)
        h = _maxpool22(h)
        h = SFModule(64, dtype=dt, name="sf1")(FTAModule(64, dtype=dt, name="fta1")(h, train), train)
        h = _maxpool22(h)
        h = SFModule(128, dtype=dt, name="sf2")(FTAModule(128, dtype=dt, name="fta2")(h, train), train)
        h = SFModule(128, dtype=dt, name="sf3")(FTAModule(128, dtype=dt, name="fta3")(h, train), train)
        h = _upsample22(h)
        h = SFModule(64, dtype=dt, name="sf4")(FTAModule(64, dtype=dt, name="fta4")(h, train), train)
        h = _upsample22(h)
        h = SFModule(32, dtype=dt, name="sf5")(FTAModule(32, dtype=dt, name="fta5")(h, train), train)
        h = SFModule(1, dtype=dt, name="sf6")(FTAModule(1, dtype=dt, name="fta6")(h, train), train)

        out = jnp.concatenate(
            [bm.astype(jnp.float32), h.astype(jnp.float32)], axis=1
        )  # [B, 321, T, 1]
        out = jnp.squeeze(out, axis=-1)
        return jnp.transpose(out, (0, 2, 1))  # [B, T, 321]
