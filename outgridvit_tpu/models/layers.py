"""Shared NHWC layers: stem, MBConv, SE, downsample, MLPs, DropPath.

TPU-first notes:
- Everything is NHWC; there are no layout permutes anywhere in the model
  (the reference round-trips NCHW<->BHWC three times per block,
  `src/model/Out_Grid_Block.py:96,107`).
- 1x1 convs are ``nn.Dense`` over the channel axis — identical math, and XLA
  fuses them into neighboring elementwise ops more readily.
- Norms run in fp32 (``dtype=float32``) while matmuls/convs run in the compute
  dtype (bf16 by default in training) — params are always fp32.

Behavioral parity targets are cited per-layer against the reference.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from outgridvit_tpu.ops.activations import make_activation
from outgridvit_tpu.ops.drop_path import drop_path as _drop_path_fn
from outgridvit_tpu.stage_config import DownsampleConfig, MBConvConfig

Dtype = jnp.dtype


class DropPath(nn.Module):
    """Per-sample stochastic depth (reference `src/model/Outlook_Block.py:7-22`)."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        if self.rate == 0.0 or deterministic:
            return x
        rng = self.make_rng("droppath")
        return _drop_path_fn(x, self.rate, rng, deterministic=False)


class _BNFoldedAffine(nn.Module):
    """BatchNorm whose big-tensor pass is ONE low-precision multiply-add.

    Same parameter/collection tree as ``nn.BatchNorm`` (params
    ``scale``/``bias``, batch_stats ``mean``/``var``, all fp32) so
    checkpoints are interchangeable with the default path. Stats are fp32
    (one fused mean/mean-of-squares pass, global-batch under GSPMD), then
    the per-channel affine ``g = scale*rsqrt(var+eps)``, ``b = bias -
    mean*g`` folds the whole normalize into ``x*g + b`` in ``x.dtype`` —
    the fp32 elementwise chain over the 4x-expanded MBConv tensors is
    where the default path spends its HBM bytes (docs/PERFORMANCE.md
    64px profile)."""

    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, use_running_average: bool):
        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((C,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((C,), jnp.float32))
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            axes = tuple(range(x.ndim - 1))
            x32 = x.astype(jnp.float32)
            mean = jnp.mean(x32, axis=axes)
            mean2 = jnp.mean(x32 * x32, axis=axes)
            # fast-variance form, clamped at 0 (same as flax)
            var = jnp.maximum(0.0, mean2 - mean * mean)
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1.0 - m) * mean
                ra_var.value = m * ra_var.value + (1.0 - m) * var
        g = scale * jax.lax.rsqrt(var + self.epsilon)
        b = bias - mean * g
        return x * g.astype(x.dtype) + b.astype(x.dtype)


class BatchNorm(nn.Module):
    """BatchNorm with torch-compatible defaults (eps 1e-5, momentum 0.1 torch
    == 0.9 flax). Stats/affine in fp32; output cast back to input dtype.

    Under jit with a batch-sharded input, the batch statistics are global-batch
    statistics automatically (GSPMD inserts the cross-device reductions), which
    is the TPU-native replacement for SyncBatchNorm.

    ``OUTGRIDVIT_BN_FOLD=1`` (trace-time, A/B knob) routes low-precision
    inputs through ``_BNFoldedAffine``: fp32 stats but a single
    ``x*g + b`` big-tensor pass in ``x.dtype`` instead of the default
    fp32 normalize chain — same checkpoint tree, bf16-rounding-level
    numerics difference.
    """

    use_running_average: Optional[bool] = None
    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, use_running_average: Optional[bool] = None):
        ura = nn.merge_param(
            "use_running_average", self.use_running_average, use_running_average
        )
        import os

        if (x.dtype != jnp.float32
                and os.environ.get("OUTGRIDVIT_BN_FOLD", "0")
                in ("1", "true")):
            return _BNFoldedAffine(
                momentum=self.momentum, epsilon=self.epsilon, name="bn"
            )(x, ura)
        y = nn.BatchNorm(
            use_running_average=ura,
            momentum=self.momentum,
            epsilon=self.epsilon,
            dtype=jnp.float32,
            param_dtype=jnp.float32,
            name="bn",
        )(x)
        return y.astype(x.dtype)


class _LNScaleBias(nn.Module):
    """Parameter holder for LayerNorm — same tree as ``nn.LayerNorm``
    (leaves "scale"/"bias", fp32), so checkpoints are interchangeable."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.features,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        return scale, bias


def layernorm_fp32(x, scale, bias, eps):
    """flax ``nn.LayerNorm`` numerics (fast variance clamped at 0, fp32
    stats, scale folded into rsqrt), output cast back to ``x.dtype``."""
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.maximum(0.0, jnp.mean(x32 * x32, axis=-1, keepdims=True)
                      - mu * mu)
    y = (x32 - mu) * (jax.lax.rsqrt(var + eps) * scale) + bias
    return y.astype(x.dtype)


class LayerNorm(nn.Module):
    """Channel LayerNorm over the last axis; fp32 params + fp32 stats.

    Replaces the reference's permute->LN->permute ``LayerNorm2d``
    (`src/model/outlook_attention.py:17-31`) — NHWC makes it a plain LN.
    With ``return_params=True`` it returns the (scale, bias) parameters
    instead of computing, so a caller can fuse the norm into a downstream
    Pallas kernel (ops/attn_branch_pallas.py) while this module keeps owning
    the parameters (tree: ``<name>/ln/{scale,bias}``, identical to the
    ``nn.LayerNorm``-backed original).
    """

    epsilon: float = 1e-6
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, return_params: bool = False):
        scale, bias = _LNScaleBias(x.shape[-1], name="ln")()
        if return_params:
            return scale, bias
        return layernorm_fp32(x, scale, bias, self.epsilon)


class DenseParams(nn.Module):
    """Parameter holder producing ``nn.Dense``'s exact tree/init
    ("kernel" lecun-normal [in, out], optional zero "bias"), so fused Pallas
    paths and plain XLA paths share checkpoints."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (in_features, self.features), jnp.float32)
        bias = (self.param("bias", nn.initializers.zeros, (self.features,),
                           jnp.float32) if self.use_bias else None)
        return kernel, bias


class ChannelMLP(nn.Module):
    """MLP over the channel axis of any [..., C] tensor.

    Unifies the reference's ``MLP2d`` (1x1 convs, `outlook_attention.py:33-49`)
    and ``MLP`` (linears, `Out_Grid_Block.py:10-32`) — on NHWC they are the
    same operator.

    Pass ``ln=(scale, bias, eps)`` to apply the pre-norm inside the branch:
    on TPU the whole LN->fc1->act->fc2 then runs as ONE fused Pallas kernel
    (ops/mlp_branch_pallas.py); elsewhere (or with dropout active) the same
    math runs unfused. Parameter tree is unchanged ("fc1"/"fc2").
    """

    dim: int
    mlp_ratio: float = 4.0
    drop: float = 0.0
    act: str = "gelu"
    use_pallas: Optional[bool] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True, ln=None):
        hidden = max(1, int(self.dim * self.mlp_ratio))
        act = make_activation(self.act)
        C = x.shape[-1]
        dt = self.dtype
        w1, b1 = DenseParams(hidden, name="fc1")(C)
        w2, b2 = DenseParams(self.dim, name="fc2")(hidden)

        import os

        # OUTGRIDVIT_FUSED_MLP modes (full-step A/Bs in docs/PERFORMANCE.md;
        # 32px flagship: t 6658 / unfused 6339 / row 6236 imgs/s; 64px
        # TIN-200: row-at-stage0 781 vs t 749 — at 64x64 spatial the t-kernel
        # boundary pays an XLA relayout copy that outweighs its win):
        #   auto (default) row kernel for large-spatial narrow-C shapes
        #   (H*W >= 4096 and C <= 64), transposed kernel otherwise;
        #   t transposed everywhere; 0 unfused XLA; 1/true row everywhere;
        #   tN transposed only for C <= N, unfused above; rN row for C <= N
        #   and transposed above; uN unfused for C <= N, transposed above.
        mode = os.environ.get("OUTGRIDVIT_FUSED_MLP", "auto").lower()
        kernel = "t"  # which pallas variant ("t" | "row" | None = unfused)
        if mode == "auto":
            spatial = 1
            for d in x.shape[1:-1]:
                spatial *= d
            kernel = "row" if (spatial >= 4096 and C <= 64) else "t"
        elif mode in ("0", "false", ""):
            kernel = None
        elif mode in ("1", "true"):
            kernel = "row"
        elif len(mode) > 1 and mode[0] in "tru":
            try:
                thr = int(mode[1:])
                below = {"t": "t", "r": "row", "u": None}[mode[0]]
                above = None if mode[0] == "t" else "t"
                kernel = below if C <= thr else above
            except ValueError:
                pass
        use_pallas = self.use_pallas
        if use_pallas is None:
            use_pallas = (jax.default_backend() == "tpu"
                          and kernel is not None)
        elif use_pallas and kernel is None:
            kernel = "t"  # explicit use_pallas=True overrides the env mode
        dropout_active = self.drop > 0.0 and not deterministic
        if use_pallas:
            M = 1
            for d in x.shape[:-1]:
                M *= d
            if kernel == "t":
                from outgridvit_tpu.ops.mlp_branch_pallas_t import mlp_t_fits

                if not mlp_t_fits(M, C, hidden, dt):
                    use_pallas = False  # awkward token count: unfused XLA
            elif M < 8 or M % 8 != 0:
                # the row-layout kernel tiles 8-granular token rows
                # (_pick_rows); a ragged M would leave the last M%8 rows
                # unwritten (and M<8 cannot tile at all) — unfused XLA
                use_pallas = False
        if use_pallas and not dropout_active:
            if kernel == "t":
                from outgridvit_tpu.ops.mlp_branch_pallas_t import (
                    mlp_branch_pallas_t as mlp_branch_pallas,
                )
            else:
                from outgridvit_tpu.ops.mlp_branch_pallas import (
                    mlp_branch_pallas,
                )

            if ln is not None:
                ls, lb, eps = ln
                apply_ln = True
            else:
                ls = jnp.ones((C,), jnp.float32)
                lb = jnp.zeros((C,), jnp.float32)
                eps, apply_ln = 1e-5, False
            return mlp_branch_pallas(
                x.astype(dt), ls, lb, w1.astype(dt), b1.astype(dt),
                w2.astype(dt), b2.astype(dt), self.act.lower(), float(eps),
                apply_ln)

        if ln is not None:
            ls, lb, eps = ln
            x = layernorm_fp32(x, ls, lb, eps)
        x = x.astype(dt) @ w1.astype(dt) + b1.astype(dt)
        x = act(x)
        x = nn.Dropout(self.drop, deterministic=deterministic)(x)
        x = x @ w2.astype(dt) + b2.astype(dt)
        x = nn.Dropout(self.drop, deterministic=deterministic)(x)
        return x


class _DepthwiseConv3x3(nn.Module):
    """Depthwise 3x3 with ``nn.Conv``'s exact param tree ("kernel"
    [3,3,1,C] lecun-normal, optional zero "bias").

    A transposed-layout Pallas stencil exists (ops/experimental/dwconv_pallas_t.py) but
    measured ~4x SLOWER than XLA's conv lowering standalone on every stage
    shape (docs/PERFORMANCE.md negative results: the 9-tap shift-mac is
    VPU-op-bound while XLA rides the MXU), so the default is the plain XLA
    ``conv_general_dilated``; OUTGRIDVIT_DW_T=1 opts into the kernel."""

    features: int
    stride: int = 1
    use_bias: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        C = self.features
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, 1, C), jnp.float32)
        bias = (self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
                if self.use_bias else None)
        dt = self.dtype
        import os

        use_t = (self.stride == 1 and jax.default_backend() == "tpu"
                 and os.environ.get("OUTGRIDVIT_DW_T", "0")
                 in ("1", "true"))
        use_taps = (self.stride == 1
                    and os.environ.get("OUTGRIDVIT_DW_XLA_TAPS", "0")
                    in ("1", "true"))
        use_bwd_kernel = (self.stride == 1 and not use_t and not use_taps
                          and jax.default_backend() == "tpu"
                          and os.environ.get("OUTGRIDVIT_DW_BWD", "0")
                          in ("1", "true", "auto"))
        if use_bwd_kernel:
            from outgridvit_tpu.ops.experimental.dwconv_bwd_pallas import (
                dwconv3x3,
                dwconv3x3_bwd_feasible,
            )

            B, H, W, _ = x.shape
            if dwconv3x3_bwd_feasible(B, H, W, C, jnp.dtype(dt).name):
                # XLA forward conv + fused one-pass Pallas backward: the
                # grouped-conv GRAD lowering is the slow half (profiled
                # ~3.7x over roofline; docs/PERFORMANCE.md round 3)
                y = dwconv3x3(x.astype(dt), kernel.reshape(9, C).astype(dt))
                if bias is not None:
                    y = y + bias.astype(dt)
                return y
        if use_t:
            from outgridvit_tpu.ops.experimental.dwconv_pallas_t import dwconv3x3_t

            y = dwconv3x3_t(x.astype(dt), kernel.reshape(3, 3, C).astype(dt))
        elif use_taps:
            # 9 shifted slices x per-channel scalar, pure elementwise XLA —
            # avoids the conv op entirely (and with it XLA's conv-driven
            # layout choice for the surrounding activations)
            xb = x.astype(dt)
            B, H, W, _ = xb.shape
            xp = jnp.pad(xb, ((0, 0), (1, 1), (1, 1), (0, 0)))
            k9 = kernel.reshape(9, C).astype(jnp.float32)
            acc = jnp.zeros((B, H, W, C), jnp.float32)
            for t in range(9):
                ky, kx = divmod(t, 3)
                tap = jax.lax.slice(
                    xp, (0, ky, kx, 0), (B, ky + H, kx + W, C))
                acc = acc + tap.astype(jnp.float32) * k9[t]
            y = acc.astype(dt)
        else:
            y = jax.lax.conv_general_dilated(
                x.astype(dt), kernel.astype(dt),
                (self.stride, self.stride), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=C)
        if bias is not None:
            y = y + bias.astype(dt)
        return y


class SqueezeExcite(nn.Module):
    """Squeeze-and-excitation gate (reference `src/model/mbc_conv.py:9-27`)."""

    channels: int
    se_ratio: float = 0.25
    act: str = "silu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if not (0.0 < self.se_ratio <= 1.0):
            raise ValueError("se_ratio must be in (0, 1].")
        hidden = max(1, int(self.channels * self.se_ratio))
        act = make_activation(self.act)
        s = jnp.mean(x.astype(jnp.float32), axis=(1, 2), keepdims=True).astype(x.dtype)
        s = nn.Dense(hidden, dtype=self.dtype, name="fc1")(s)
        s = act(s)
        s = nn.Dense(self.channels, dtype=self.dtype, name="fc2")(s)
        return x * nn.sigmoid(s.astype(jnp.float32)).astype(x.dtype)


class MBConv(nn.Module):
    """Inverted residual block, NHWC (reference `src/model/mbc_conv.py:44-98`):
    expand 1x1 (skipped if mid==in) -> depthwise 3x3 -> SE -> project 1x1,
    residual iff stride==1 and in==out.
    """

    in_ch: int
    out_ch: int
    stride: int = 1
    cfg: MBConvConfig = MBConvConfig()
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, deterministic: bool = True):
        if self.in_ch <= 0 or self.out_ch <= 0:
            raise ValueError("in_ch and out_ch must be > 0")
        if self.stride not in (1, 2):
            raise ValueError("stride must be 1 or 2")
        cfg = self.cfg
        act = make_activation(cfg.act)
        use_bn = cfg.use_bn
        mid = max(1, int(round(self.in_ch * cfg.expand_ratio)))

        out = x
        if mid != self.in_ch:
            out = nn.Dense(mid, use_bias=not use_bn, dtype=self.dtype,
                           name="expand")(out)
            if use_bn:
                out = BatchNorm(name="expand_bn")(out, use_running_average=not train)
            out = act(out)

        out = _DepthwiseConv3x3(mid, stride=self.stride, use_bias=not use_bn,
                                dtype=self.dtype, name="depthwise")(out)
        if use_bn:
            out = BatchNorm(name="depthwise_bn")(out, use_running_average=not train)
        out = act(out)

        if cfg.se_ratio > 0:
            out = SqueezeExcite(mid, cfg.se_ratio, cfg.act, dtype=self.dtype,
                                name="se")(out)

        out = nn.Dense(self.out_ch, use_bias=not use_bn, dtype=self.dtype,
                       name="project")(out)
        if use_bn:
            out = BatchNorm(name="project_bn")(out, use_running_average=not train)

        if self.stride == 1 and self.in_ch == self.out_ch:
            out = x + DropPath(cfg.drop_path, name="drop_path")(
                out, deterministic=deterministic
            )
        return out


class Downsample(nn.Module):
    """Between-stage downsampling (reference `src/model/downsampling.py:28-65`):
    "conv" = 3x3 stride-2 conv + BN + act; "pool" = avgpool 2x2 + 1x1 + BN + act.
    """

    in_ch: int
    out_ch: int
    cfg: DownsampleConfig = DownsampleConfig()
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.cfg
        act = make_activation(cfg.act)
        use_bn = cfg.use_bn
        if cfg.kind == "conv":
            x = nn.Conv(
                self.out_ch, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                use_bias=not use_bn, dtype=self.dtype, name="conv",
            )(x)
        elif cfg.kind == "pool":
            x = nn.avg_pool(x, (2, 2), strides=(2, 2))
            x = nn.Dense(self.out_ch, use_bias=not use_bn, dtype=self.dtype,
                         name="conv")(x)
        else:
            raise ValueError("cfg.kind must be 'conv' or 'pool'")
        if use_bn:
            x = BatchNorm(name="bn")(x, use_running_average=not train)
        return act(x)


class ConvStem(nn.Module):
    """3x3 stride-1 CIFAR-style stem (reference `src/model/stem_head.py:23-32`)."""

    out_ch: int
    act: str = "silu"
    use_bn: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        act = make_activation(self.act)
        x = nn.Conv(
            self.out_ch, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)),
            use_bias=not self.use_bn, dtype=self.dtype, name="conv",
        )(x)
        if self.use_bn:
            x = BatchNorm(name="bn")(x, use_running_average=not train)
        return act(x)
