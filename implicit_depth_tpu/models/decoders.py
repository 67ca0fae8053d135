"""Cost-volume encoder + U-Net++-style decoders + binary MLP head
(flax.linen, NHWC).

Parity targets:
- CVEncoder: modules/networks.py:186-215
- BDDecoderPP / DepthDecoderPP dense-skip grid: modules/networks.py:20-84,
  118-183. The reference recomputes `output_{i}` heads every column and
  overwrites the dict entry; only the final column's value survives
  (j == 4 - i), so we compute exactly that one.
- SkipDecoder / SkipDecoderRegression: modules/networks_fast.py:49-145
- BinaryMLPNetwork: modules/networks.py:87-115
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from implicit_depth_tpu.models.blocks import (
    BasicBlock,
    DoubleBasicBlock,
    upsample2x_bilinear,
    upsample2x_nearest,
)

Array = jnp.ndarray

NUM_CH_DEC = (64, 64, 128, 256)


class CVEncoder(nn.Module):
    """Fuses the cost volume (as channels) with image-encoder stages.

    Call with the cost volume (b, h, w, num_planes) at matching resolution
    and the list of image features from matching_scale onwards.
    """

    num_ch_outs: Sequence[int] = (64, 128, 256, 384)
    dtype: Any = None

    @nn.compact
    def __call__(self, cost_bhwd: Array, img_feats: Sequence[Array]) -> list[Array]:
        x = cost_bhwd
        outputs = []
        for i, ch in enumerate(self.num_ch_outs):
            x = BasicBlock(ch, stride=1 if i == 0 else 2, name=f"ds_conv_{i}", dtype=self.dtype)(x)
            x = jnp.concatenate([x, img_feats[i].astype(x.dtype)], axis=-1)
            x = BasicBlock(ch, name=f"conv_{i}_0", dtype=self.dtype)(x)
            x = BasicBlock(ch, name=f"conv_{i}_1", dtype=self.dtype)(x)
            outputs.append(x)
        return outputs


class DecoderPP(nn.Module):
    """Dense-skip grid decoder shared by BD and depth variants.

    Input: 5 encoder features, coarse stride 2..32. Output: per-scale
    feature maps {scale: (b, h_s, w_s, NUM_CH_DEC[scale])} for scales 0..3.
    `head_channels` > 0 appends a 1x1 conv head per scale
    (DepthDecoderPP, modules/networks.py:158-161).
    """

    head_channels: int = 0
    dtype: Any = None

    @nn.compact
    def __call__(self, enc_feats: Sequence[Array]) -> dict:
        dt = self.dtype
        prev = list(enc_feats)  # index i = scale i (stride 2^(i+1))
        outputs: dict = {}
        for j in range(1, 5):
            col = []
            max_i = 4 - j
            for i in range(max_i, -1, -1):
                ch = NUM_CH_DEC[i]
                parts = [BasicBlock(ch, name=f"right_conv_{i}{j - 1}", dtype=dt)(prev[i])]
                parts.append(
                    upsample2x_bilinear(BasicBlock(ch, name=f"diag_conv_{i + 1}{j - 1}", dtype=dt)(prev[i + 1]))
                )
                if i + j != 4:
                    parts.append(
                        upsample2x_bilinear(BasicBlock(ch, name=f"up_conv_{i + 1}{j}", dtype=dt)(col[-1]))
                    )
                out = DoubleBasicBlock(ch, name=f"in_conv_{i}{j}", dtype=dt)(jnp.concatenate(parts, axis=-1))
                col.append(out)
                if i + j == 4:  # final column for this scale
                    head = out if i == 0 else BasicBlock(ch, name=f"output_{i}", dtype=dt)(out)
                    if self.head_channels:
                        head = nn.Conv(self.head_channels, (1, 1), name=f"output_head_{i}", dtype=dt)(head)
                    outputs[i] = head
            prev = col[::-1] + prev[max_i + 1:]
        return outputs


class BDDecoderPP(DecoderPP):
    head_channels: int = 0


class DepthDecoderPP(DecoderPP):
    head_channels: int = 1


class ConvBlockELU(nn.Module):
    """Two 3x3 convs with ELU (modules/networks_fast.py:10-28)."""

    features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = nn.elu(nn.Conv(self.features, (3, 3), padding=1, name="conv1", dtype=self.dtype)(x))
        return nn.elu(nn.Conv(self.features, (3, 3), padding=1, name="conv2", dtype=self.dtype)(x))


class SkipDecoder(nn.Module):
    """Simple upsample+concat decoder (modules/networks_fast.py:49-99).
    num_ch_dec mirrors the reference: (64, 64, 128, 256)."""

    regression_heads: bool = False
    num_ch_dec: Sequence[int] = NUM_CH_DEC
    dtype: Any = None

    @nn.compact
    def __call__(self, enc_feats: Sequence[Array]) -> dict:
        dt = self.dtype
        out_ch = (256, 128, 64, 64)
        x = enc_feats[-1]
        outputs: dict = {}
        for bi in range(4):
            x = ConvBlockELU(out_ch[bi], name=f"block{bi + 1}_pre", dtype=dt)(x)
            x = upsample2x_nearest(x)
            x = jnp.concatenate([x, enc_feats[-(bi + 2)].astype(x.dtype)], axis=-1)
            x = ConvBlockELU(out_ch[bi], name=f"block{bi + 1}_post", dtype=dt)(x)
            scale = 3 - bi
            outputs[scale] = x
            if self.regression_heads:
                h = nn.elu(nn.Conv(128, (1, 1), name=f"out{bi + 1}_0", dtype=dt)(x))
                h = nn.elu(nn.Conv(128, (1, 1), name=f"out{bi + 1}_1", dtype=dt)(h))
                outputs[f"log_depth_{scale}"] = nn.Conv(1, (1, 1), name=f"out{bi + 1}_2", dtype=dt)(h)
        return outputs


class BinaryMLPNetwork(nn.Module):
    """Per-scale query MLPs (modules/networks.py:87-115).

    Input per scale: (..., C_scale + 1 [+1 with prior]) where the extra
    channels are the query depth (and prior). 3 Linear layers, ELU."""

    mlp_size: int = 128
    dtype: Any = None

    @nn.compact
    def __call__(self, inputs: Sequence[Array], max_scale_only: bool = False) -> dict:
        outputs = {}
        scales = [0] if max_scale_only else range(len(inputs))
        for s in scales:
            x = inputs[s]
            x = nn.elu(nn.Dense(self.mlp_size, name=f"s{s}_fc0", dtype=self.dtype)(x))
            x = nn.elu(nn.Dense(self.mlp_size, name=f"s{s}_fc1", dtype=self.dtype)(x))
            outputs[f"pred_{s}"] = nn.Dense(1, name=f"s{s}_fc2", dtype=self.dtype)(x)
        return outputs

    def factored(self, feats: Sequence[Array], depths: Sequence[Array],
                 priors: Optional[Sequence[Array]] = None,
                 use_pallas: bool = False) -> dict:
        """Same map as __call__ on concat([depth, feat, prior]) inputs,
        with fc0 distributed over the concat: the feature term is computed
        ONCE per ray and broadcast across the S depth samples instead of
        re-multiplying the (C,128) block for every sample. Exact algebra
        (fc0 is linear); avoids materialising the (b, N, S, C+2) concat
        that dominates the train query head's HBM traffic on TPU.

        feats[s]: (b, N_s, C_s) per-ray features; depths[s]: (b, N_s, S);
        priors[s]: (b, N_s, S) or None. Row layout of the fc0 kernel
        matches the reference concat order [depth, feat..., prior]
        (bd_model.py:313-393). Params must already exist (__call__ ran at
        init).

        With use_pallas=True (TPU training path) the per-sample chain
        elu(fp + d*k0_d [+ p*k0_p]) -> fc1 -> elu -> fc2 runs as the fused
        Pallas kernel ops/ray_head.py::ray_head_mlp (custom VJP, hiddens
        never touch HBM); requires mlp_size == 128."""
        pallas_ok = use_pallas and self.mlp_size == 128
        outputs = {}
        for s in range(len(feats)):
            w0 = self.get_variable("params", f"s{s}_fc0")
            w1 = self.get_variable("params", f"s{s}_fc1")
            w2 = self.get_variable("params", f"s{s}_fc2")
            feat = feats[s]
            dt = feat.dtype if self.dtype is None else self.dtype
            k0 = w0["kernel"].astype(dt)
            c = feat.shape[-1]
            fp = feat.astype(dt) @ k0[1: 1 + c] + w0["bias"].astype(dt)
            if pallas_ok:
                from implicit_depth_tpu.ops.ray_head import ray_head_mlp

                kern = w0["kernel"]
                pred = ray_head_mlp(
                    fp, depths[s],
                    priors[s] if priors is not None else None,
                    kern[0], kern[1 + c] if priors is not None else None,
                    w1["kernel"], w1["bias"], w2["kernel"], w2["bias"])
                outputs[f"pred_{s}"] = pred[..., None]
                continue
            h = fp[:, :, None, :] + depths[s][..., None].astype(dt) * k0[0]
            if priors is not None:
                h = h + priors[s][..., None].astype(dt) * k0[1 + c]
            h = nn.elu(h)
            h = nn.elu(h @ w1["kernel"].astype(dt) + w1["bias"].astype(dt))
            outputs[f"pred_{s}"] = h @ w2["kernel"].astype(dt) + w2["bias"].astype(dt)
        return outputs
