"""MSNet (Hsieh's encoder/decoder streaming-capable melody extractor), flax.

Architecture parity with msnet/acoustic_model_correct.py:9-138:
- encoder: 3 x [BatchNorm(no scale/center) -> 5x5 SELU conv (lecun init,
  no bias, 32/64/128 ch) -> 1x4 max-pool over frequency with argmax],
- non-melody head: BatchNorm(center) -> time pad [2,2] -> 5x5 VALID conv
  -> [B, T, 1, 1] (one logit per frame),
- decoder: mirror with argmax UNpooling (scatter back to the argmax
  positions), SELU convs 64/32 ch, final BatchNorm(center) + 5x5 conv to 1,
- concat non-melody + 320 decoder bins on the frequency axis ->
  [B, T, 321] softmax logits (class 0 = non-melody).

Max-pool-with-argmax is expressed as a grouped reshape + in-group argmax and
the unpooling as an in-group one-hot scatter — no tf.scatter_nd analog
needed, and it vectorizes cleanly on TPU.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


def max_pool_freq4_argmax(x):
    """[B, T, F, C] -> ([B, T, F//4, C] pooled, argmax in-group [B,T,F//4,C])."""
    B, T, F, C = x.shape
    g = x.reshape(B, T, F // 4, 4, C)
    idx = jnp.argmax(g, axis=3)
    pooled = jnp.max(g, axis=3)
    return pooled, idx


def unpool_freq4(x, idx, F_out: int):
    """Inverse of max_pool_freq4_argmax: scatter each value back to its
    argmax slot within the group of 4 (other slots zero)."""
    B, T, Fp, C = x.shape
    onehot = jax.nn.one_hot(idx, 4, axis=3, dtype=x.dtype)  # [B,T,Fp,4,C]
    out = x[:, :, :, None, :] * onehot
    return out.reshape(B, T, Fp * 4, C)[:, :, :F_out, :]


class MSNet(nn.Module):
    n_bins: int = 320
    # compute dtype for convs (mixed precision); params/BN/logits stay f32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, valid_frames=None):
        # x: [B, T, 320, 3]
        # valid_frames (optional scalar): frames >= valid_frames are bucket
        # padding — zeroed immediately before every time-mixing conv (i.e.
        # AFTER each BatchNorm, which maps padded zeros to a nonzero
        # per-channel constant) so logits[:, :valid_frames] are identical
        # to running the unpadded input (eval only; see DCNet.__call__).
        if x.ndim != 4 or x.shape[2] != self.n_bins:
            raise ValueError(f"expected [B, T, {self.n_bins}, 3], got {x.shape}")
        h = x
        tmask = None
        if valid_frames is not None:
            tmask = (jnp.arange(x.shape[1]) < valid_frames)[None, :, None, None]
        zpad = (lambda a: a) if tmask is None else (
            lambda a: jnp.where(tmask, a, 0.0)
        )
        argmaxes = []
        for layer_idx, ch in enumerate((32, 64, 128)):
            h = nn.BatchNorm(
                use_running_average=not train,
                use_scale=False,
                use_bias=False,
                name=f"enc_bn_{layer_idx}",
            )(h)
            h = zpad(h)
            h = nn.Conv(
                ch,
                (5, 5),
                padding="SAME",
                use_bias=False,
                kernel_init=nn.initializers.lecun_normal(),
                dtype=self.dtype,
                name=f"enc_conv_{layer_idx}",
            )(h)
            h = nn.selu(h)
            h, idx = max_pool_freq4_argmax(h)
            argmaxes.append(idx)
        encoder_out = h  # [B, T, 5, 128]

        # non-melody head
        nm = nn.BatchNorm(
            use_running_average=not train, use_scale=False, name="nm_bn"
        )(encoder_out)
        nm = zpad(nm)
        nm = jnp.pad(nm, [(0, 0), (2, 2), (0, 0), (0, 0)])
        nm = nn.Conv(1, (5, 5), padding="VALID", use_bias=True, dtype=self.dtype,
                     name="nm_conv")(nm)
        # [B, T, 1, 1]

        # decoder
        h = encoder_out
        dec_ch = {2: 64, 1: 32}
        for layer_idx in (2, 1, 0):
            F_out = self.n_bins // (4**layer_idx)
            h = unpool_freq4(h, argmaxes[layer_idx], F_out)
            if layer_idx > 0:
                h = nn.BatchNorm(
                    use_running_average=not train,
                    use_scale=False,
                    use_bias=False,
                    name=f"dec_bn_{layer_idx}",
                )(h)
                h = zpad(h)
                h = nn.Conv(
                    dec_ch[layer_idx],
                    (5, 5),
                    padding="SAME",
                    use_bias=False,
                    kernel_init=nn.initializers.lecun_normal(),
                    dtype=self.dtype,
                    name=f"dec_conv_{layer_idx}",
                )(h)
                h = nn.selu(h)
            else:
                h = nn.BatchNorm(
                    use_running_average=not train, use_scale=False, name="dec_bn_0"
                )(h)
                h = zpad(h)
                h = nn.Conv(1, (5, 5), padding="SAME", use_bias=True,
                            dtype=self.dtype, name="dec_conv_0")(h)

        combined = jnp.concatenate(
            [nm.astype(jnp.float32), h.astype(jnp.float32)], axis=2
        )  # [B, T, 321, 1]
        return jnp.squeeze(combined, axis=-1)  # [B, T, 321]
