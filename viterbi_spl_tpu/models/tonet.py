"""TONet (Ke Chen) — tone-octave network with dual FTAnet backbones, flax.

Architecture parity with the reference's retrained variant
tonet/model/tonet_shaun_simple.py:27-153 ("all" mode) +
tonet/model/ftanet.py:8-196 (the 360-bin torch FTAnet backbone) +
tonet/model/attention_layer.py:8-180 (pre-LN transformer encoder):

- two FTAnet-360 backbones: one on the CFP, one on the tone-shuffled TCFP
  (reshape/transpose trick, tonet/main_shaun.py:276-286),
- per-frame 720-dim aggregate feature -> tone & octave branches:
  Linear(720->2048) + sinusoid positional encoding + 2x CombineLayer
  (8-head pre-LN self-attention, d_k = d_v = 256, FFN 4096) -> MLP decoders
  to 12 tone / 6 octave classes (+ a non-melody logit from the bm rows),
- tcfp fusion conv (720->360 over time, k=5) and the final conv combining
  tone(13) + octave(7) + fused 360 + bm(1) = 381 -> 360 pitch logits,
  concat bm -> [B, 361, T].

Inputs follow the reference layout [B, 3, 360, T] (T = 128 snippets).
Loss: mean of 3 CEs on integer pitch/chroma/octave labels
(targets.tonet_loss).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


def cfp_to_tcfp(cfp: jnp.ndarray) -> jnp.ndarray:
    """Tone-shuffle: [B, 3, 360, T] -> octave-major to tone-major bin order
    (tonet/main_shaun.py:276-286)."""
    b = cfp.shape[0]
    t = cfp.shape[-1]
    out = cfp.reshape(b, 3, 6, 60, t)
    out = jnp.swapaxes(out, 2, 3)
    return out.reshape(b, 3, 360, t)


class TorchSFModule(nn.Module):
    """Selective-kernel fusion, torch variant (tonet/model/ftanet.py:8-55):
    avg-pool -> BatchNorm1d -> Linear+SELU -> per-branch masks, softmax over
    the channel axis."""

    n_channel: int
    reduction: int = 4
    limitation: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x_list, train: bool = False):
        fused = sum(x_list)  # [B, F, T, C]
        fused = jnp.mean(fused, axis=(1, 2))  # [B, C]
        fused = nn.BatchNorm(use_running_average=not train, name="bn")(fused)
        fused = nn.selu(
            nn.Dense(max(self.n_channel // self.reduction, self.limitation),
                     dtype=self.dtype, name="fuse")(fused)
        )
        masks = [
            nn.Dense(self.n_channel, dtype=self.dtype, name=f"mask_{i}")(fused)
            for i in range(len(x_list))
        ]
        mask_stack = nn.softmax(
            jnp.stack(masks, axis=-1).astype(jnp.float32), axis=-2
        ).astype(self.dtype)
        out = 0.0
        for i, x_s in enumerate(x_list):
            out = out + x_s * mask_stack[:, :, i][:, None, None, :]
        return out


class TorchFTAModule(nn.Module):
    """FTA module, torch variant (tonet/model/ftanet.py:58-123). Input
    [B, F, T, C_in] -> three [B, F, T, C_out] branches."""

    out_channels: int
    kt: int = 3
    kf: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        C = self.out_channels
        dt = self.dtype
        x = nn.BatchNorm(use_running_average=not train, name="bn")(x)
        x_r = nn.relu(nn.Conv(C, (1, 1), dtype=dt, name="res")(x))

        a_t = jnp.mean(x, axis=1)  # [B, T, C_in]
        a_t = nn.selu(nn.Conv(C, (self.kt,), padding="SAME", dtype=dt, name="ta1")(a_t))
        a_t = nn.selu(nn.Conv(C, (self.kt,), padding="SAME", dtype=dt, name="ta2")(a_t))
        # over time (torch Softmax(dim=-1) on [B,C,T]); f32 under mixed precision
        a_t = nn.softmax(a_t.astype(jnp.float32), axis=1).astype(dt)
        x_t = nn.selu(nn.Conv(C, (3, 3), padding="SAME", dtype=dt, name="ta3")(x))
        x_t = nn.selu(nn.Conv(C, (5, 5), padding="SAME", dtype=dt, name="ta4")(x_t))
        x_t = x_t * a_t[:, None, :, :]

        a_f = jnp.mean(x, axis=2)  # [B, F, C_in]
        a_f = nn.selu(nn.Conv(C, (self.kf,), padding="SAME", dtype=dt, name="fa1")(a_f))
        a_f = nn.selu(nn.Conv(C, (self.kf,), padding="SAME", dtype=dt, name="fa2")(a_f))
        a_f = nn.softmax(a_f.astype(jnp.float32), axis=1).astype(dt)  # over freq
        x_f = nn.selu(nn.Conv(C, (3, 3), padding="SAME", dtype=dt, name="fa3")(x))
        x_f = nn.selu(nn.Conv(C, (5, 5), padding="SAME", dtype=dt, name="fa4")(x_f))
        x_f = x_f * a_f[:, :, None, :]

        return x_r, x_t, x_f


class TorchFTAnet(nn.Module):
    """360-bin torch FTAnet backbone (tonet/model/ftanet.py:126-196).
    Input [B, F=360, T, 3] -> logits [B, 361, T] (bm row first)."""

    freq_bin: int = 360
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        x = nn.BatchNorm(use_running_average=not train, name="in_bn")(x)

        bm = x
        for i, (ch, k) in enumerate(((16, 4), (16, 3), (16, 6), (1, 5))):
            bm = nn.selu(
                nn.Conv(ch, (k, 1), strides=(k, 1), padding="VALID", dtype=dt,
                        name=f"bm_{i}")(bm)
            )
        # bm: [B, 1, T, 1]

        def fta_sf(h, c, name):
            branches = TorchFTAModule(c, dtype=dt, name=f"fta_{name}")(h, train)
            return TorchSFModule(c, dtype=dt, name=f"sf_{name}")(branches, train)

        h = fta_sf(x, 32, "1")
        h = nn.max_pool(h, (2, 2), strides=(2, 2))
        h = fta_sf(h, 64, "2")
        h = nn.max_pool(h, (2, 2), strides=(2, 2))
        h = fta_sf(h, 128, "3")
        h = fta_sf(h, 128, "4")
        h = jnp.repeat(jnp.repeat(h, 2, axis=1), 2, axis=2)
        h = fta_sf(h, 64, "5")
        h = jnp.repeat(jnp.repeat(h, 2, axis=1), 2, axis=2)
        h = fta_sf(h, 32, "6")
        h = fta_sf(h, 1, "7")

        out = jnp.concatenate(
            [bm.astype(jnp.float32), h.astype(jnp.float32)], axis=1
        )  # [B, 361, T, 1]
        return jnp.squeeze(out, axis=-1)  # [B, 361, T]


def sinusoid_table(n_position: int, d_hid: int) -> np.ndarray:
    pos = np.arange(n_position)[:, None]
    j = np.arange(d_hid)[None, :]
    angle = pos / np.power(10000, 2 * (j // 2) / d_hid)
    table = np.zeros((n_position, d_hid))
    table[:, 0::2] = np.sin(angle[:, 0::2])
    table[:, 1::2] = np.cos(angle[:, 1::2])
    return table.astype(np.float32)


class CombineLayer(nn.Module):
    """Pre-LN transformer encoder layer (attention_layer.py:122-135):
    MHA (no-bias projections, residual) + position-wise FFN (residual)."""

    d_model: int = 2048
    d_inner: int = 4096
    n_head: int = 8
    dropout: float = 0.2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        d_k = self.d_model // self.n_head
        residual = x
        h = nn.LayerNorm(epsilon=1e-6, name="attn_ln")(x)
        B, T, _ = h.shape

        def proj(name):
            return nn.Dense(self.n_head * d_k, use_bias=False, dtype=dt,
                            name=name)(h).reshape(B, T, self.n_head, d_k)

        q, k, v = proj("w_qs"), proj("w_ks"), proj("w_vs")
        # scores/softmax in f32 under mixed precision; attn·v back in dtype
        attn = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32)
        attn = attn / jnp.sqrt(jnp.float32(d_k))
        attn = nn.softmax(attn, axis=-1)
        attn = nn.Dropout(0.1, deterministic=not train)(attn).astype(dt)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(B, T, -1)
        out = nn.Dense(self.d_model, use_bias=False, dtype=dt, name="fc")(out)
        out = nn.Dropout(self.dropout, deterministic=not train)(out)
        x = out.astype(jnp.float32) + residual

        residual = x
        h = nn.LayerNorm(epsilon=1e-6, name="ffn_ln")(x)
        h = nn.Dense(self.d_inner, dtype=dt, name="w1")(h)
        h = nn.relu(h)
        h = nn.Dense(self.d_model, dtype=dt, name="w2")(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        return h.astype(jnp.float32) + residual


class _MLPDecoder(nn.Module):
    """Dense->Dropout->SELU stack (tonet_shaun_simple.py:96-115)."""

    widths: tuple[int, ...]
    dropout: float = 0.2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i, w in enumerate(self.widths):
            x = nn.Dense(w, dtype=self.dtype, name=f"dense_{i}")(x)
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
            x = nn.selu(x)
        return x


TONET_MODES = ("all", "spat", "spl", "tcfp", "single")
TONET_BACKBONES = ("ftanet", "mcdnn", "msnet", "mldrnet")


class TONet(nn.Module):
    """TONet with the original training module's ablation axes
    (tonet/model/tonet.py:24-265):

    mode — "all" (dual backbone + transformer tone/octave decoders, the
      retrained headline variant), "spat" (single backbone + transformer
      decoders), "spl" (single backbone + linear decoders, the GRU-replaced
      variant the reference ships commented out), "tcfp" (dual backbone,
      direct 720->360 fusion, no tone/octave decoders), "single" (the bare
      backbone).
    backbone — "ftanet" | "mcdnn" | "msnet" | "mldrnet"
      (tonet/model/{ftanet,mcdnn,msnet,multi_dr}.py), applied to both
      branches in the dual modes.

    Convention: the non-melody row comes FIRST in every output (class 0),
    matching tonet_shaun_simple.py and this framework's adapters; the
    original module appends it LAST for the spl/spat modes — equivalent up
    to class order. Returns dict(pitch[, chroma, octave]); chroma/octave
    are None for the tcfp/single modes (the reference trains those on the
    pitch CE alone, tonet/model/tonet.py:278-300)."""

    freq_bin: int = 360
    tone_class: int = 12
    octave_class: int = 6
    attn_dim: int = 2048
    seg_frame: int = 128
    mode: str = "all"
    backbone: str = "ftanet"
    # compute dtype (mixed precision); params, norms, softmaxes, and the
    # returned logits stay f32
    dtype: Any = jnp.float32

    def _run_backbone(self, name: str, x, train: bool):
        dt = self.dtype
        if self.backbone == "ftanet":
            return TorchFTAnet(self.freq_bin, dtype=dt, name=name)(
                jnp.transpose(x, (0, 2, 3, 1)), train
            )
        from .provenance import MCDNN, MLDRnet, TonetMSNet

        cls = {"mcdnn": MCDNN, "msnet": TonetMSNet, "mldrnet": MLDRnet}[
            self.backbone
        ]
        return cls(self.freq_bin, dtype=dt, name=name)(x, train)

    @nn.compact
    def __call__(self, cfp, tcfp=None, train: bool = False):
        # cfp: [B, 3, 360, T]
        if cfp.ndim != 4 or cfp.shape[1] != 3 or cfp.shape[2] != self.freq_bin:
            raise ValueError(f"expected [B, 3, {self.freq_bin}, T], got {cfp.shape}")
        if self.mode not in TONET_MODES:
            raise ValueError(f"unknown TONet mode {self.mode!r}")
        if self.backbone not in TONET_BACKBONES:
            raise ValueError(f"unknown TONet backbone {self.backbone!r}")
        dt = self.dtype

        out_l = self._run_backbone("l_model", cfp, train)
        if self.mode == "single":
            return dict(pitch=out_l, chroma=None, octave=None)

        bm_l, feat_l = out_l[:, :1, :], out_l[:, 1:, :]
        dual = self.mode in ("all", "tcfp")
        if dual:
            if tcfp is None:
                tcfp = cfp_to_tcfp(cfp)
            out_r = self._run_backbone("r_model", tcfp, train)
            bm_r, feat_r = out_r[:, :1, :], out_r[:, 1:, :]
            feature_agg = jnp.concatenate([feat_l, feat_r], axis=1)  # [B,720,T]
            bm_agg = jnp.concatenate([bm_l, bm_r], axis=1)  # [B, 2, T]
        else:  # spat / spl: the single branch's features
            feature_agg = feat_l  # [B, 360, T]
            bm_agg = bm_l  # [B, 1, T]

        if self.mode == "tcfp":
            # direct fusion: Linear(720 -> 360) + SELU per frame, bm 2 -> 1
            # (tonet/model/tonet.py:139-151, 219-235)
            fa = jnp.swapaxes(feature_agg, 1, 2)  # [B, T, 720]
            fin = nn.selu(
                nn.Dense(self.freq_bin, dtype=dt, name="final_linear_tcfp")(fa)
            ).astype(jnp.float32)
            ba = jnp.swapaxes(bm_agg, 1, 2)  # [B, T, 2]
            fbm = nn.selu(
                nn.Dense(1, dtype=dt, name="final_bm")(ba)
            ).astype(jnp.float32)
            pitch = jnp.concatenate(
                [jnp.swapaxes(fbm, 1, 2), jnp.swapaxes(fin, 1, 2)], axis=1
            )  # [B, 361, T]
            return dict(pitch=pitch, chroma=None, octave=None)

        fa = jnp.swapaxes(feature_agg, 1, 2)  # [B, T, 720] ("all") / 360
        ba = jnp.swapaxes(bm_agg, 1, 2)  # [B, T, 2] ("all") / 1
        if dual:
            # "all": tcfp fusion convs over time (channels = freq bins)
            feature_agg_mi = nn.selu(
                nn.Conv(self.freq_bin, (5,), padding="SAME", dtype=dt,
                        name="tcfp_linear")(fa)
            ).astype(jnp.float32)
            feature_agg_mi = jnp.swapaxes(feature_agg_mi, 1, 2)  # [B, 360, T]
            bm_agg_mi = nn.selu(
                nn.Conv(1, (5,), padding="SAME", dtype=dt, name="tcfp_bm")(ba)
            ).astype(jnp.float32)
            bm_agg_mi = jnp.swapaxes(bm_agg_mi, 1, 2)  # [B, 1, T]
        else:
            # spat/spl: the raw single-branch features flow into the final
            # fusion (tonet/model/tonet.py:236-263)
            feature_agg_mi = feature_agg  # [B, 360, T]
            bm_agg_mi = bm_agg  # [B, 1, T]

        # tone / octave decoders
        pos = jnp.asarray(sinusoid_table(self.seg_frame, self.attn_dim))

        def branch(name, widths, n_cls):
            if self.mode == "spl":
                # linear stand-in for the BiGRU (reference ships the GRU
                # commented out, tonet/model/tonet.py:62-72): 2*gru_dim
                h = nn.Dense(1024, dtype=dt, name=f"{name}_gru")(fa)
            else:
                h = nn.Dense(self.attn_dim, dtype=dt, name=f"{name}_in")(fa)
                h = h.astype(jnp.float32) + pos[None, : h.shape[1], :]
                h = nn.Dropout(0.2, deterministic=not train)(h)
                h = nn.LayerNorm(epsilon=1e-6, name=f"{name}_norm")(h)
                for i in range(2):
                    h = CombineLayer(
                        self.attn_dim, self.attn_dim * 2, dtype=dt,
                        name=f"{name}_attn_{i}",
                    )(h, train)
            h = _MLPDecoder(widths + (n_cls,), dtype=dt, name=f"{name}_linear")(h, train)
            return jnp.swapaxes(h.astype(jnp.float32), 1, 2)  # [B, n_cls, T]

        tone_prob = branch("tone", (512, 128), self.tone_class)
        octave_prob = branch("octave", (256, 64), self.octave_class)

        if dual:
            tone_bm = nn.selu(nn.Dense(1, dtype=dt, name="tone_bm")(ba)).astype(
                jnp.float32
            )  # [B, T, 1]
            octave_bm = nn.selu(
                nn.Dense(1, dtype=dt, name="octave_bm")(ba)
            ).astype(jnp.float32)
        else:
            # spat/spl: the raw bm row joins the class axes directly
            tone_bm = octave_bm = ba.astype(jnp.float32)  # [B, T, 1]
        tone_prob = jnp.concatenate(
            [jnp.swapaxes(tone_bm, 1, 2), tone_prob], axis=1
        )  # [B, 13, T]
        octave_prob = jnp.concatenate(
            [jnp.swapaxes(octave_bm, 1, 2), octave_prob], axis=1
        )  # [B, 7, T]

        final = jnp.concatenate(
            [tone_prob, octave_prob, feature_agg_mi, bm_agg_mi], axis=1
        )  # [B, 381, T]
        final = jnp.swapaxes(final, 1, 2)
        final = nn.selu(
            nn.Conv(self.freq_bin, (5,), padding="SAME", dtype=dt,
                    name="final_linear")(final)
        ).astype(jnp.float32)
        final = jnp.swapaxes(final, 1, 2)  # [B, 360, T]
        pitch = jnp.concatenate([bm_agg_mi, final], axis=1)  # [B, 361, T]

        return dict(pitch=pitch, chroma=tone_prob, octave=octave_prob)
