"""Provenance backbones: MCDNN and MLDRnet (tonet's alternative torch
backbones, kept by the reference for provenance — tonet/model/mcdnn.py:5-44,
tonet/model/multi_dr.py:5-187). The retrained TONet uses the FTAnet
backbone; these are here for capability parity and ablations.

Both take tonet-layout input [B, 3, 360, T] and return pitch logits
[B, 361, T] (non-melody row first), like TorchFTAnet.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


class MCDNN(nn.Module):
    """Per-frame MLP over the flattened 3x360 CFP column."""

    freq_bin: int = 360
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: [B, 3, F, T] -> [B, T, 3*F]
        B, C, F, T = x.shape
        h = jnp.transpose(x.reshape(B, C * F, T), (0, 2, 1))

        def mlp(h, widths, name, last_selu):
            for i, w in enumerate(widths):
                h = nn.Dense(w, dtype=self.dtype, name=f"{name}_{i}")(h)
                if i < len(widths) - 1:
                    h = nn.Dropout(0.2, deterministic=not train)(h)
                    h = nn.selu(h)
                elif last_selu:
                    h = nn.selu(h)
            return h.astype(jnp.float32)

        pitch = mlp(h, (2048, 1024, 512, self.freq_bin), "mcdnn", last_selu=False)
        bm = mlp(h, (512, 128, 1), "bm", last_selu=True)
        out = jnp.concatenate([bm, pitch], axis=-1)  # [B, T, 361]
        return jnp.transpose(out, (0, 2, 1))


def _pool_freq_argmax(x, g: int):
    """[B, F, T, C] -> ([B, F//g, T, C] max-pooled over freq groups of g,
    in-group argmax) — MaxPool2d((g,1), return_indices=True) semantics."""
    B, F, T, C = x.shape
    grp = x.reshape(B, F // g, g, T, C)
    return jnp.max(grp, axis=2), jnp.argmax(grp, axis=2)


def _unpool_freq(x, idx, g: int):
    """Inverse of _pool_freq_argmax: scatter values to their argmax slots."""
    B, Fp, T, C = x.shape
    onehot = jax.nn.one_hot(idx, g, axis=2, dtype=x.dtype)  # [B,Fp,g,T,C]
    return (x[:, :, None] * onehot).reshape(B, Fp * g, T, C)


class TonetMSNet(nn.Module):
    """The 360-bin MSnet backbone variant TONet ablates against
    (tonet/model/msnet.py:6-72): freq pools 4/3/6 with argmax unpooling,
    a 5-bin VALID "bottom" conv producing the non-melody row. Input
    [B, 3, 360, T] (tonet layout) -> pre-softmax logits [B, 361, T]
    (non-melody row first)."""

    freq_bin: int = 360
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        h = jnp.transpose(x, (0, 2, 3, 1))  # [B, F, T, 3]

        def block(h, ch, name):
            h = nn.BatchNorm(use_running_average=not train,
                             name=f"{name}_bn")(h)
            h = nn.Conv(ch, (5, 5), padding="SAME", use_bias=True, dtype=dt,
                        name=f"{name}_conv")(h)
            return nn.selu(h)

        inds = []
        for i, (ch, g) in enumerate(((32, 4), (64, 3), (128, 6))):
            h = block(h, ch, f"enc_{i}")
            h, idx = _pool_freq_argmax(h, g)
            inds.append((idx, g))
        # h: [B, 5, T, 128]

        bm = nn.BatchNorm(use_running_average=not train, name="bm_bn")(h)
        bm = nn.Conv(1, (5, 5), padding=((0, 0), (2, 2)), use_bias=True,
                     dtype=dt, name="bm_conv")(bm)
        bm = nn.selu(bm)  # [B, 1, T, 1]

        for i, ch in zip((2, 1, 0), (64, 32, 1)):
            idx, g = inds[i]
            h = _unpool_freq(h, idx, g)
            h = block(h, ch, f"dec_{i}")
        # h: [B, 360, T, 1]

        out = jnp.concatenate(
            [bm.astype(jnp.float32), h.astype(jnp.float32)], axis=1
        )
        return out[..., 0]  # [B, 361, T]


class _MultiDilation(nn.Module):
    """Densely-connected dilated conv block (multi_dr.py:161-181)."""

    out_ch: int = 10
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        def bn(h, name):
            return nn.BatchNorm(use_running_average=not train, name=name)(h)

        x1 = nn.selu(
            nn.Conv(self.out_ch, (3, 3), kernel_dilation=(3, 3), padding="SAME",
                    dtype=self.dtype, name="c1")(bn(x, "bn1"))
        ).astype(jnp.float32)
        x2 = jnp.concatenate([x, x1], axis=-1)
        x2 = nn.selu(
            nn.Conv(self.out_ch, (3, 3), kernel_dilation=(6, 6), padding="SAME",
                    dtype=self.dtype, name="c2")(bn(x2, "bn2"))
        ).astype(jnp.float32)
        x3 = jnp.concatenate([x, x1, x2], axis=-1)
        return nn.selu(
            nn.Conv(self.out_ch, (3, 3), kernel_dilation=(6, 6), padding="SAME",
                    dtype=self.dtype, name="c3")(bn(x3, "bn3"))
        ).astype(jnp.float32)


class MLDRnet(nn.Module):
    """Multi-dilation pyramid network (tonet/model/multi_dr.py:5-187)."""

    freq_bin: int = 360
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: [B, 3, F, T] -> channels-last [B, F, T, 3]
        h = jnp.transpose(x, (0, 2, 3, 1))
        h = nn.BatchNorm(use_running_average=not train, name="enc_bn")(h)

        def conv_s2(ch, name):
            return nn.Conv(ch, (3, 3), strides=(2, 2), padding="SAME",
                           dtype=self.dtype, name=name)

        def up2(ch, name):
            return nn.ConvTranspose(ch, (1, 1), strides=(2, 2),
                                    dtype=self.dtype, name=name)

        f1 = h
        f2 = conv_s2(3, "c2_1")(f1)
        f3 = conv_s2(3, "c3_1")(f2)
        f1 = _MultiDilation(dtype=self.dtype, name="md_0")(f1, train)
        f2 = _MultiDilation(dtype=self.dtype, name="md_1")(f2, train)
        f3 = _MultiDilation(dtype=self.dtype, name="md_2")(f3, train)

        f1_2 = conv_s2(10, "c1_1")(f1)
        f1_3 = conv_s2(10, "c1_2")(f1_2)
        f2_1 = up2(10, "c2_2")(f2)
        f2_3 = conv_s2(10, "c2_3")(f2)
        f3_2 = up2(10, "c3_2")(f3)
        f3_1 = up2(10, "c3_3")(f3_2)

        f1 = jnp.concatenate([f1, f2_1, f3_1], axis=-1)
        f2 = jnp.concatenate([f2, f1_2, f3_2], axis=-1)
        f3 = jnp.concatenate([f3, f1_3, f2_3], axis=-1)

        f1 = _MultiDilation(dtype=self.dtype, name="md_3")(f1, train)
        f2 = _MultiDilation(dtype=self.dtype, name="md_4")(f2, train)
        f3 = _MultiDilation(dtype=self.dtype, name="md_5")(f3, train)

        f2 = up2(10, "c2_4")(f2)
        f3 = up2(10, "c3_4")(f3)
        f3 = up2(10, "c3_5")(f3)
        enc = jnp.concatenate([f1, f2, f3], axis=-1)
        enc = nn.Conv(10, (1, 1), dtype=self.dtype, name="enc_final")(enc)

        # decoder
        d = nn.BatchNorm(use_running_average=not train, name="dec_bn")(enc)
        d = nn.selu(nn.Conv(10, (3, 3), padding="SAME", dtype=self.dtype,
                            name="dec_c1")(d))

        bm = jnp.mean(d, axis=1, keepdims=True)  # avg-pool over freq
        bm = nn.BatchNorm(use_running_average=not train, name="bm_bn")(bm)
        bm = nn.selu(nn.Conv(1, (3, 3), padding="SAME", dtype=self.dtype,
                             name="bm_conv")(bm))

        fin = nn.BatchNorm(use_running_average=not train, name="fin_bn")(d)
        fin = nn.selu(nn.Conv(10, (3, 3), padding="SAME", dtype=self.dtype,
                              name="fin_c1")(fin))
        fin = nn.selu(nn.Conv(1, (3, 3), padding="SAME", dtype=self.dtype,
                              name="fin_c2")(fin))

        out = jnp.concatenate(
            [bm.astype(jnp.float32), fin.astype(jnp.float32)], axis=1
        )  # [B, 1+F, T, 1]
        return jnp.transpose(out[..., 0], (0, 1, 2))  # [B, 361, T]
