"""JDC (Kum's joint detection & classification network), flax.

Architecture parity with jdc/acoustic_module.py:8-85:
- conv block (64ch, two 3x3 convs) + 3 ResNet blocks (128/192/256) each
  preceded by BN + LeakyReLU(0.01) + 1x4 freq max-pool,
- pitch head: BN/LReLU/1x4-pool/dropout -> reshape [B, 31, 512] ->
  BiLSTM(256) -> Dense 722 logits (class 0 = non-melody),
- voicing head: multi-scale concat of the pooled blocks -> 1x1 conv 256 ->
  BN/LReLU/dropout -> reshape -> BiLSTM(32) -> Dense 2 softmax, COMBINED
  with the pitch-derived voicing (softmax mass off class 0); the output
  voicing logit is voiced-minus-unvoiced of the combined distribution,
- l2(1e-5) regularization on the first conv + 1x1 voicing conv kernels is
  exposed via `l2_param_paths` for the trainer.

Works on [B, 31, 513] spectrogram chunks (64-chunk batches in the
reference, jdc/kum_m2m3.py:511-590).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


def _lrelu(x):
    return nn.leaky_relu(x, 0.01)


def _pool14(x):
    return nn.max_pool(x, (1, 4), strides=(1, 4))


class ResNetBlock(nn.Module):
    filters: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.BatchNorm(use_running_average=not train, name="pre_bn")(x)
        h = _lrelu(h)
        h = _pool14(h)
        init = nn.Conv(
            self.filters, (1, 1), padding="SAME", use_bias=False,
            kernel_init=nn.initializers.he_normal(), dtype=self.dtype,
            name="conv_1x1",
        )(h)
        h = nn.Conv(
            self.filters, (3, 3), padding="SAME", use_bias=False,
            kernel_init=nn.initializers.he_normal(), dtype=self.dtype,
            name="conv_1",
        )(h)
        h = nn.BatchNorm(use_running_average=not train, name="mid_bn")(h)
        h = _lrelu(h)
        h = nn.Conv(
            self.filters, (3, 3), padding="SAME", use_bias=False,
            kernel_init=nn.initializers.he_normal(), dtype=self.dtype,
            name="conv_2",
        )(h)
        return init.astype(jnp.float32) + h.astype(jnp.float32)


class BiLSTM(nn.Module):
    """Bidirectional LSTM over the time axis, concat-merged."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        fwd = nn.RNN(nn.OptimizedLSTMCell(self.features, dtype=self.dtype),
                     name="fwd")
        bwd = nn.RNN(nn.OptimizedLSTMCell(self.features, dtype=self.dtype),
                     reverse=True, keep_order=True, name="bwd")
        return jnp.concatenate([fwd(x), bwd(x)], axis=-1)


class JDC(nn.Module):
    n_pitch_classes: int = 722
    chunk_len: int = 31
    # compute dtype for convs/LSTMs/denses (mixed precision); params,
    # BatchNorm, softmaxes, and returned logits stay f32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: [B, 31, 513]
        if x.ndim != 3:
            raise ValueError(f"expected [B, T, 513], got {x.shape}")
        B, T, F = x.shape
        h = x[..., None]

        dt = self.dtype
        b1 = nn.Conv(64, (3, 3), padding="SAME", use_bias=False,
                     kernel_init=nn.initializers.he_normal(), dtype=dt,
                     name="conv1_1")(h)
        b1 = nn.BatchNorm(use_running_average=not train, name="bn1")(b1)
        b1 = _lrelu(b1)
        b1 = nn.Conv(64, (3, 3), padding="SAME", use_bias=False,
                     kernel_init=nn.initializers.he_normal(), dtype=dt,
                     name="conv1_2")(b1)
        b1 = b1.astype(jnp.float32)

        b2 = ResNetBlock(128, dtype=dt, name="block2")(b1, train)
        b3 = ResNetBlock(192, dtype=dt, name="block3")(b2, train)
        b4 = ResNetBlock(256, dtype=dt, name="block4")(b3, train)  # [B, 31, 8, 256]

        b4p = nn.BatchNorm(use_running_average=not train, name="bn4")(b4)
        b4p = _lrelu(b4p)
        b4p = _pool14(b4p)  # [B, 31, 2, 256]
        b4p = nn.Dropout(0.5, deterministic=not train)(b4p)

        pitch = b4p.reshape(B, T, 512)
        pitch = BiLSTM(256, dtype=dt, name="pitch_lstm")(pitch)
        pitch = nn.Dense(self.n_pitch_classes, dtype=dt, name="pitch_dense")(pitch)
        pitch = pitch.astype(jnp.float32)

        v1 = nn.max_pool(b1, (1, 4**4), strides=(1, 4**4))
        v2 = nn.max_pool(b2, (1, 4**3), strides=(1, 4**3))
        v3 = nn.max_pool(b3, (1, 4**2), strides=(1, 4**2))
        voicing = jnp.concatenate([v1, v2, v3, b4p], axis=-1)
        voicing = nn.Conv(256, (1, 1), padding="SAME", use_bias=False,
                          kernel_init=nn.initializers.he_normal(), dtype=dt,
                          name="v_conv")(voicing)
        voicing = nn.BatchNorm(use_running_average=not train, name="v_bn")(voicing)
        voicing = _lrelu(voicing)
        voicing = nn.Dropout(0.5, deterministic=not train)(voicing)
        voicing = voicing.reshape(B, T, 512)
        voicing = BiLSTM(32, dtype=dt, name="v_lstm")(voicing)
        voicing = nn.softmax(
            nn.Dense(2, dtype=dt, name="v_dense")(voicing).astype(jnp.float32),
            axis=-1,
        )

        # combine with pitch-derived voicing (jdc/acoustic_module.py:74-81)
        p_nonvoice = nn.softmax(pitch, axis=-1)[..., 0]
        pitch_voicing = jnp.stack([p_nonvoice, 1.0 - p_nonvoice], axis=-1)
        voicing = voicing + pitch_voicing
        voicing_logit = voicing[..., 1] - voicing[..., 0]

        return dict(pitch=pitch, voicing=voicing_logit)

    @staticmethod
    def l2_param_paths() -> tuple[tuple[str, ...], ...]:
        """Kernels carrying the reference's l2(1e-5) regularizer."""
        return (("conv1_1", "kernel"), ("conv1_2", "kernel"), ("v_conv", "kernel"))
