"""Attention blocks: outlook attention, grid MHSA, and the hybrid OutGrid block.

All NHWC, all permute-free. Analysis capture uses Flax ``sow`` into the
"intermediates" collection instead of forward hooks (the reference hooks conv
outputs / stashes attn tensors on modules, `src/model/grid_attention.py:77-83`,
`src/experiments/heat_map_att_outlooker.py:12-53`); run any model with
``mutable=["intermediates"]`` and ``capture=True`` to get the same tensors,
keyed by module path.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from outgridvit_tpu.ops.grid import grid_partition, grid_unpartition
from outgridvit_tpu.ops.layout_pin import pin_default
from outgridvit_tpu.ops.outlook import outlook_aggregate
from outgridvit_tpu.models.layers import (
    ChannelMLP,
    DenseParams,
    DropPath,
    LayerNorm,
    MBConv,
    layernorm_fp32,
)
from outgridvit_tpu.stage_config import MBConvConfig, StageCfg

Dtype = jnp.dtype

_DenseParams = DenseParams


class OutlookAttention2d(nn.Module):
    """VOLO-style outlook attention on NHWC (reference
    `src/model/outlook_attention.py:52-124`).

    A 1x1 projection produces ``heads*K^2`` logits per pixel (avg-pooled when
    stride>1), softmaxed over the K^2 taps; values come from a 1x1 projection
    and are aggregated with :func:`outlook_aggregate` — no unfold tensor is
    ever materialized.
    """

    dim: int
    num_heads: int = 6
    kernel_size: int = 3
    stride: int = 1
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    qkv_bias: bool = True
    use_pallas: Optional[bool] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True, capture: bool = False):
        if self.dim % self.num_heads != 0:
            raise ValueError("dim must be divisible by num_heads")
        if self.kernel_size <= 0 or self.kernel_size % 2 == 0:
            raise ValueError("kernel_size must be odd and >0 (e.g., 3,5,7)")
        if self.stride <= 0:
            raise ValueError("stride must be > 0")
        B, H, W, C = x.shape
        k, s, heads = self.kernel_size, self.stride, self.num_heads
        kk = k * k

        a = nn.Dense(heads * kk, use_bias=self.qkv_bias, dtype=self.dtype,
                     name="attn")(x)
        # v/proj as raw params (same tree/init as nn.Dense) so the fused
        # aggregate+projection Pallas path shares the checkpoint layout
        vw, vb = DenseParams(self.dim, use_bias=self.qkv_bias, name="v")(C)
        pw, pb = DenseParams(self.dim, use_bias=True, name="proj")(self.dim)
        dt = self.dtype

        def _v():
            # lazy: the v-fold kernel path computes the value projection
            # IN-KERNEL and must not pay it (again) here
            v = x.astype(dt) @ vw.astype(dt)
            return v + vb.astype(dt) if vb is not None else v

        # A fused Pallas outlook kernel exists
        # (outgridvit_tpu/ops/experimental/outlook_pallas.py) but measured SLOWER than
        # this XLA shift-and-accumulate path on v5e: Mosaic's rotate op only
        # supports 32-bit data, forcing fp32 shifts, and per-tap lane padding
        # wastes VMEM. Kept off by default until Mosaic grows bf16 rotates;
        # enable explicitly with use_pallas="fused_outlook".
        if self.use_pallas == "fused_outlook" and s == 1 and not capture and \
                not (self.attn_drop > 0.0 and not deterministic):
            from outgridvit_tpu.ops.experimental.outlook_pallas import outlook_attention_pallas

            y = outlook_attention_pallas(_v(), a, heads, k)
        else:
            if s > 1:
                a = nn.avg_pool(a, (s, s), strides=(s, s))
            Hs, Ws = a.shape[1], a.shape[2]
            a = a.reshape(B, Hs, Ws, heads, kk)
            if capture:
                # pre-softmax logits — what the reference's hook on the attn
                # conv captures (`heat_map_att_outlooker.py:44-53`)
                self.sow("intermediates", "outlook_logits",
                         a.astype(jnp.float32))
            a = jax.nn.softmax(a.astype(jnp.float32), axis=-1).astype(x.dtype)
            a = nn.Dropout(self.attn_drop, deterministic=deterministic)(a)
            # Fused aggregate+projection kernel (ops/experimental/outlook_agg_pallas.py):
            # v and attn read ONCE per image instead of XLA's 9 shifted
            # re-reads, the aggregate never touches HBM, projection on the
            # MXU in-kernel. Opt-in via OUTGRIDVIT_OUTAGG=1 (stride-1 K=3
            # only) pending the on-chip A/B; use_pallas="fused_agg" forces
            # it for tests.
            import os

            mode = os.environ.get("OUTGRIDVIT_OUTAGG", "0")
            if self.use_pallas == "fused_agg":
                mode = "1"
            elif self.use_pallas == "fused_agg_v":
                mode = "2"
            elif jax.default_backend() != "tpu":
                mode = "0"
            forced = self.use_pallas in ("fused_agg", "fused_agg_v")
            if mode in ("1", "2") and s == 1 and k == 3:
                a2 = a.reshape(B, Hs, Ws, heads * kk)
                if mode == "2":
                    # v-fold: x -> v-proj -> aggregate -> out-proj in ONE
                    # kernel; the value tensor never touches HBM
                    from outgridvit_tpu.ops.experimental.outlook_agg_pallas import (
                        outlook_branch_feasible,
                        outlook_branch_pallas,
                    )

                    if forced or outlook_branch_feasible(
                            B, Hs, Ws, C, self.dim, heads,
                            str(jnp.dtype(dt))):
                        bv = (vb if vb is not None
                              else jnp.zeros((self.dim,), jnp.float32))
                        out = outlook_branch_pallas(
                            x.astype(dt), a2, vw.astype(dt), bv.astype(dt),
                            pw.astype(dt), pb.astype(dt))
                        return nn.Dropout(
                            self.proj_drop,
                            deterministic=deterministic)(out)
                from outgridvit_tpu.ops.experimental.outlook_agg_pallas import (
                    outlook_agg_feasible,
                    outlook_attention_proj_pallas,
                )

                if forced or outlook_agg_feasible(B, Hs, Ws, self.dim,
                                                  heads, str(jnp.dtype(dt))):
                    out = outlook_attention_proj_pallas(
                        _v(), a2, pw.astype(dt), pb.astype(dt))
                    return nn.Dropout(self.proj_drop,
                                      deterministic=deterministic)(out)
            y = outlook_aggregate(_v(), a, kernel_size=k, stride=s,
                                  use_pallas=False)
        y = y.astype(dt) @ pw.astype(dt) + pb.astype(dt)
        y = nn.Dropout(self.proj_drop, deterministic=deterministic)(y)
        return y


class MultiHeadSelfAttention(nn.Module):
    """Standard MHSA on [B, N, C] tokens (reference
    `src/model/grid_attention.py:33-89`). Logits/softmax in fp32.

    With ``use_pallas`` (default on TPU) the whole branch — optional pre-LN
    (pass ``ln=(scale, bias, eps)``), qkv projection, softmax(qk^T)v, output
    projection — runs as ONE fused Pallas kernel
    (:mod:`outgridvit_tpu.ops.attn_branch_pallas`): the only HBM traffic is
    x in / y out. Falls back to the XLA einsum path when capturing attention,
    when attention dropout is active, or off-TPU. Both paths share the same
    parameters ("qkv"/"proj" with nn.Dense's exact tree).
    """

    dim: int
    num_heads: int
    qkv_bias: bool = True
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    use_pallas: Optional[bool] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True, capture: bool = False,
                 ln=None, nhwc_grid: Optional[int] = None):
        if self.dim <= 0:
            raise ValueError("dim must be > 0")
        if self.num_heads <= 0:
            raise ValueError("num_heads must be > 0")
        if self.dim % self.num_heads != 0:
            raise ValueError(
                f"dim ({self.dim}) must be divisible by num_heads ({self.num_heads})"
            )
        # nhwc_grid: x is the raw [B, H, W, C] map and this module owns the
        # dilated grid partition (GridAttention2D passes it down so the
        # fused branch kernel can fold the partition into its BlockSpecs —
        # ops/attn_branch_nhwc_pallas.py — skipping the 6-D layout copies).
        # Every non-fused path partitions here and unpartitions on return;
        # parameters and math are identical either way.
        x_nhwc = None
        unpartition_meta = None
        if nhwc_grid is not None:
            if x.ndim != 4:
                raise ValueError(
                    f"nhwc_grid set: expected NHWC. Got {tuple(x.shape)}")
            x_nhwc = x
            grids, unpartition_meta = grid_partition(x, nhwc_grid)
            Bg, Hg, Wg, _ = grids.shape
            x = grids.reshape(Bg, Hg * Wg, grids.shape[-1])
            # opt-in layout pin (OUTGRIDVIT_PIN_LAYOUT=1): force the
            # partitioned tokens into the default layout HERE so the 6-D
            # transpose materializes once, in the layout every Pallas
            # kernel boundary demands (ops/layout_pin.py).
            x = pin_default(x)
        if x.ndim != 3:
            raise ValueError(f"Expected [B, N, C]. Got {tuple(x.shape)}")
        B, N, C = x.shape
        if C != self.dim:
            raise ValueError(f"Expected last dim C={self.dim}. Got C={C}")
        heads = self.num_heads
        hd = C // heads
        scale = hd**-0.5
        dt = self.dtype

        wqkv, bqkv = _DenseParams(3 * C, use_bias=self.qkv_bias,
                                  name="qkv")(C)
        wproj, bproj = _DenseParams(C, use_bias=True, name="proj")(C)

        use_pallas = self.use_pallas
        if use_pallas is None:
            use_pallas = jax.default_backend() == "tpu"
        if use_pallas:
            # A/B knob: OUTGRIDVIT_ATTN_XLA_N=<thr> routes grids of
            # N >= thr to the plain XLA batched-einsum path — at the 64px
            # configs' N=64 stages the per-grid [64, hd]x[hd, 64] dots are
            # MXU-reasonable for XLA while the block-packed kernel pays
            # group-minor<->row-major layout copies at its boundary
            # (docs/PERFORMANCE.md round-3 64px tail)
            import os

            try:
                thr = int(os.environ.get("OUTGRIDVIT_ATTN_XLA_N", "0"))
            except ValueError:
                thr = 0
            if thr > 0 and N >= thr:
                use_pallas = False
        dropout_active = self.attn_drop > 0.0 and not deterministic
        if use_pallas and not capture and not dropout_active:
            import os

            # A/B on a v5e full train step (docs/PERFORMANCE.md): the
            # attention-core kernel + XLA projections beats the fully-fused
            # branch kernel in context (6341 vs 6104 imgs/s), even though the
            # fused kernel wins standalone — XLA overlaps the projection dots
            # with neighboring ops, a serial Pallas body cannot. Fused path
            # kept as an opt-in (OUTGRIDVIT_FUSED_ATTN=1) for wide-C models.
            fuse_branch = os.environ.get("OUTGRIDVIT_FUSED_ATTN") in (
                "1", "true")
            if not fuse_branch:
                # Shape-keyed dispatch (default): grids of N >= 64 tokens
                # run the fused branch kernel. At those shapes the unfused
                # path pays three full HBM round-trips between the qkv dot
                # and the attention kernel (LN convert, bias add, kernel
                # read — profiled ~1.2-1.5 ms each at 64px stage-0) that
                # the branch kernel collapses to x-in/y-out: same-window
                # A/B +4.6% on TIN-64 (docs/PERFORMANCE.md round 3). The
                # N<=16 stages keep the winning lane-batched t-kernels.
                # OUTGRIDVIT_FUSED_ATTN_N overrides the threshold (0 = off);
                # feasibility comes from a cached compile-probe of the
                # exact shape.
                thr_env = os.environ.get("OUTGRIDVIT_FUSED_ATTN_N",
                                         "").strip()
                thr_f = 64
                if thr_env:
                    try:
                        thr_f = int(thr_env)
                    except ValueError:
                        import warnings

                        warnings.warn(
                            "OUTGRIDVIT_FUSED_ATTN_N="
                            f"{thr_env!r} is not an int; using the "
                            "default threshold 64 (set 0 to disable)")
                fuse_branch = thr_f > 0 and N >= thr_f
                if fuse_branch:
                    from outgridvit_tpu.ops.attn_branch_pallas import (
                        attn_branch_feasible,
                    )

                    fuse_branch = attn_branch_feasible(
                        B, N, C, heads, jnp.dtype(dt).name, ln is not None)
            if fuse_branch:
                from outgridvit_tpu.ops.attn_branch_pallas import (
                    attn_branch_pallas,
                )

                if ln is not None:
                    ls, lb, eps = ln
                    apply_ln = True
                else:
                    ls = jnp.ones((C,), jnp.float32)
                    lb = jnp.zeros((C,), jnp.float32)
                    eps, apply_ln = 1e-5, False
                bq = (bqkv if bqkv is not None
                      else jnp.zeros((3 * C,), jnp.float32))
                # NHWC-direct variant: same branch math, partition folded
                # into the kernel's BlockSpecs (no XLA layout copies).
                # OFF by default: same-window A/Bs on TIN-64 lose 792 vs
                # 838 imgs/s at both the default and a doubled fwd tile
                # budget (docs/evidence/campaign_r4/ab_nhwc_tin64.json) —
                # the in-VMEM window shuffle serializes work the XLA
                # copies overlap with neighboring ops. Opt-in A/B knob:
                # OUTGRIDVIT_FUSED_ATTN_NHWC=1.
                use_nhwc = (
                    x_nhwc is not None
                    and os.environ.get("OUTGRIDVIT_FUSED_ATTN_NHWC", "0")
                    in ("1", "true")
                )
                if use_nhwc:
                    from outgridvit_tpu.ops.experimental.attn_branch_nhwc_pallas import (  # noqa: E501
                        attn_branch_nhwc_feasible,
                        attn_branch_nhwc_pallas,
                    )

                    Bi, Hi, Wi, _ = x_nhwc.shape
                    use_nhwc = attn_branch_nhwc_feasible(
                        Bi, Hi, Wi, C, heads, nhwc_grid,
                        jnp.dtype(dt).name, apply_ln)
                if use_nhwc:
                    out = attn_branch_nhwc_pallas(
                        x_nhwc.astype(dt), ls, lb, wqkv.astype(dt),
                        bq.astype(dt), wproj.astype(dt), bproj.astype(dt),
                        heads, nhwc_grid, float(eps), apply_ln)
                    unpartition_meta = None  # already NHWC
                else:
                    out = attn_branch_pallas(
                        x.astype(dt), ls, lb, wqkv.astype(dt), bq.astype(dt),
                        wproj.astype(dt), bproj.astype(dt), heads, float(eps),
                        apply_ln)
            else:
                # small grids (N<=16, i.e. every stage of the 32px models):
                # lane-batched VPU kernel in XLA's own transposed layout
                # (OUTGRIDVIT_ATTN_T=0 to disable). Wide-C N=16 shapes whose
                # full-C blocks overflow scoped VMEM (the 64px configs) use
                # the head-chunked variant; feasibility comes from a
                # compile-probe of the exact shape, not a heuristic.
                mhsa_kernel = None
                if (N <= 16 and os.environ.get("OUTGRIDVIT_ATTN_T", "1")
                        not in ("0", "false")):
                    from outgridvit_tpu.ops.grid_attention_pallas_t import (
                        attn_kernel_feasible,
                        grid_mhsa_pallas_t,
                        grid_mhsa_pallas_th,
                    )

                    dt_str = jnp.dtype(dt).name
                    if attn_kernel_feasible("t", B, N, C, heads, dt_str):
                        mhsa_kernel = grid_mhsa_pallas_t
                    elif heads > 1 and attn_kernel_feasible(
                            "th", B, N, C, heads, dt_str):
                        mhsa_kernel = grid_mhsa_pallas_th
                if mhsa_kernel is None:
                    from outgridvit_tpu.ops.grid_attention_pallas import (
                        grid_mhsa_pallas as mhsa_kernel,
                    )

                if ln is not None:
                    ls, lb, eps = ln
                    x = layernorm_fp32(x, ls, lb, eps)
                qkv = x.astype(dt) @ wqkv.astype(dt)
                if bqkv is not None:
                    qkv = qkv + bqkv.astype(dt)
                qkv = pin_default(qkv)
                out = mhsa_kernel(qkv, heads)
                out = out @ wproj.astype(dt) + bproj.astype(dt)
        else:
            if ln is not None:
                ls, lb, eps = ln
                x = layernorm_fp32(x, ls, lb, eps)
            # nn.Dense semantics: operands promoted to the compute dtype
            qkv = x.astype(dt) @ wqkv.astype(dt)
            if bqkv is not None:
                qkv = qkv + bqkv.astype(dt)
            qkv_ = qkv.reshape(B, N, 3, heads, hd)
            q, k, v = qkv_[:, :, 0], qkv_[:, :, 1], qkv_[:, :, 2]

            logits = jnp.einsum("bnhd,bmhd->bhnm", q, k,
                                preferred_element_type=jnp.float32) * scale
            attn = jax.nn.softmax(logits, axis=-1)
            if capture:
                # reference stashes `last_attn` pre-dropout
                # (`grid_attention.py:77-78`)
                self.sow("intermediates", "attn", attn)
            attn = nn.Dropout(self.attn_drop, deterministic=deterministic)(attn)
            out = jnp.einsum("bhnm,bmhd->bnhd", attn.astype(qkv.dtype), v,
                             preferred_element_type=jnp.float32
                             ).astype(qkv.dtype)
            out = out.reshape(B, N, C)
            out = out @ wproj.astype(dt) + bproj.astype(dt)
        if unpartition_meta is not None:
            _, H_, W_, _, g_ = unpartition_meta  # (B, H, W, C, g)
            Hg_, Wg_ = H_ // g_, W_ // g_
            out = grid_unpartition(out.reshape(B, Hg_, Wg_, C),
                                   unpartition_meta)
            # matching pin on the way out: the unpartition transpose
            # lands directly in the residual add's default layout.
            out = pin_default(out)
        out = nn.Dropout(self.proj_drop, deterministic=deterministic)(out)
        return out


class GridAttention2D(nn.Module):
    """MaxViT-style dilated grid attention wrapper, NHWC in/out (reference
    `src/model/grid_attention.py:93-131`): grid_partition -> token MHSA over
    the B*g^2 independent grids -> unpartition.

    The MHSA core dispatches to the fused Pallas kernel on TPU (see
    :class:`MultiHeadSelfAttention`); both paths share parameters.
    """

    dim: int
    num_heads: int
    grid_size: int
    qkv_bias: bool = True
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    use_pallas: Optional[bool] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True, capture: bool = False,
                 ln=None):
        if x.ndim != 4:
            raise ValueError(f"Expected NHWC. Got {tuple(x.shape)}")
        B, H, W, C = x.shape
        if C != self.dim:
            raise ValueError(f"Expected C=={self.dim}. Got C={C}")
        g = self.grid_size
        # LN is per-token, so it commutes with the partition; passing it
        # down lets the MHSA fuse it into the Pallas branch kernel. The
        # partition itself is owned by the MHSA (nhwc_grid): the fused
        # branch kernel folds it into its BlockSpecs and every other path
        # partitions/unpartitions internally with identical semantics.
        return MultiHeadSelfAttention(
            dim=C,
            num_heads=self.num_heads,
            qkv_bias=self.qkv_bias,
            attn_drop=self.attn_drop,
            proj_drop=self.proj_drop,
            use_pallas=self.use_pallas,
            dtype=self.dtype,
            name="mhsa",
        )(x, deterministic=deterministic, capture=capture, ln=ln,
          nhwc_grid=g)


class OutlookerBlock2d(nn.Module):
    """Pre-LN outlooker transformer block, NHWC (reference
    `src/model/Outlook_Block.py:26-64`): x + DP(attn(LN(x))); x + DP(mlp(LN(x)))."""

    dim: int
    num_heads: int
    kernel_size: int = 3
    stride: int = 1
    mlp_ratio: float = 2.0
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    drop_path: float = 0.0
    mlp_drop: float = 0.0
    act: str = "gelu"
    norm_eps: float = 1e-6
    use_pallas: Optional[bool] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True, capture: bool = False):
        y = LayerNorm(epsilon=self.norm_eps, dtype=self.dtype, name="norm1")(x)
        y = OutlookAttention2d(
            dim=self.dim,
            num_heads=self.num_heads,
            kernel_size=self.kernel_size,
            stride=self.stride,
            attn_drop=self.attn_drop,
            proj_drop=self.proj_drop,
            use_pallas=self.use_pallas,
            dtype=self.dtype,
            name="attn",
        )(y, deterministic=deterministic, capture=capture)
        x = x + DropPath(self.drop_path, name="dp1")(y, deterministic=deterministic)

        ls, lb = LayerNorm(epsilon=self.norm_eps, dtype=self.dtype,
                           name="norm2")(x, return_params=True)
        y = ChannelMLP(dim=self.dim, mlp_ratio=self.mlp_ratio, drop=self.mlp_drop,
                       act=self.act, use_pallas=self.use_pallas,
                       dtype=self.dtype, name="mlp")(
            x, deterministic=deterministic, ln=(ls, lb, self.norm_eps))
        x = x + DropPath(self.drop_path, name="dp2")(y, deterministic=deterministic)
        return x


class OutGridBlock(nn.Module):
    """The signature hybrid block (reference `src/model/Out_Grid_Block.py:35-107`):
    Outlooker -> MBConv -> GridAttn -> MLP, all NHWC with pre-LN residuals.

    First-class ablations (SURVEY.md §2.6): ``outlook_heads==0`` skips the
    outlooker, ``num_heads==0`` skips grid attention, ``use_mbconv=False``
    skips MBConv.
    """

    cfg: StageCfg
    use_pallas: Optional[bool] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, deterministic: bool = True,
                 capture: bool = False):
        cfg = self.cfg
        C = cfg.dim

        if cfg.outlook_heads > 0:
            x = OutlookerBlock2d(
                dim=C,
                num_heads=cfg.outlook_heads,
                kernel_size=cfg.outlook_kernel,
                stride=1,
                mlp_ratio=cfg.outlook_mlp_ratio,
                attn_drop=cfg.attn_drop,
                proj_drop=cfg.proj_drop,
                mlp_drop=cfg.ffn_drop,
                drop_path=cfg.drop_path,
                act=cfg.mlp_act,
                use_pallas=self.use_pallas,
                dtype=self.dtype,
                name="outlook",
            )(x, deterministic=deterministic, capture=capture)

        if cfg.use_mbconv:
            x = MBConv(
                in_ch=C,
                out_ch=C,
                stride=1,
                cfg=MBConvConfig(
                    expand_ratio=cfg.mbconv_expand_ratio,
                    se_ratio=cfg.mbconv_se_ratio,
                    act=cfg.mbconv_act,
                    use_bn=cfg.use_bn,
                    drop_path=0.0,
                ),
                dtype=self.dtype,
                name="mbconv",
            )(x, train=train, deterministic=deterministic)

        if cfg.num_heads > 0:
            # grid-attn + MLP sub-block norms use torch nn.LayerNorm default
            # eps 1e-5 (`Out_Grid_Block.py:69,84`). The norm params are owned
            # here but applied inside the attention branch (fused into the
            # Pallas kernel on TPU).
            ls, lb = LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(
                x, return_params=True)
            y = GridAttention2D(
                dim=C,
                num_heads=cfg.num_heads,
                grid_size=cfg.grid_size,
                qkv_bias=True,
                attn_drop=cfg.attn_drop,
                proj_drop=cfg.proj_drop,
                use_pallas=self.use_pallas,
                dtype=self.dtype,
                name="grid_attn",
            )(x, deterministic=deterministic, capture=capture,
              ln=(ls, lb, 1e-5))
            x = x + DropPath(cfg.drop_path, name="dp2")(y, deterministic=deterministic)

        ls, lb = LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm3")(
            x, return_params=True)
        y = ChannelMLP(dim=C, mlp_ratio=cfg.mlp_ratio, drop=cfg.ffn_drop,
                       act=cfg.mlp_act, use_pallas=self.use_pallas,
                       dtype=self.dtype, name="mlp")(
            x, deterministic=deterministic, ln=(ls, lb, 1e-5))
        x = x + DropPath(cfg.drop_path, name="dp3")(y, deterministic=deterministic)
        return x


class GridOnlyBlock(nn.Module):
    """Model-B unit (reference `src/model/Grid_Only_Block.py:21-73`):
    MBConv -> GridAttn -> MLP (no outlooker)."""

    cfg: StageCfg
    use_pallas: Optional[bool] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, deterministic: bool = True,
                 capture: bool = False):
        cfg = self.cfg
        C = cfg.dim

        if cfg.use_mbconv:
            x = MBConv(
                in_ch=C,
                out_ch=C,
                stride=1,
                cfg=MBConvConfig(
                    expand_ratio=cfg.mbconv_expand_ratio,
                    se_ratio=cfg.mbconv_se_ratio,
                    act=cfg.mbconv_act,
                    use_bn=cfg.use_bn,
                    drop_path=0.0,
                ),
                dtype=self.dtype,
                name="mbconv",
            )(x, train=train, deterministic=deterministic)

        if cfg.num_heads > 0:
            ls, lb = LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(
                x, return_params=True)
            y = GridAttention2D(
                dim=C,
                num_heads=cfg.num_heads,
                grid_size=cfg.grid_size,
                qkv_bias=True,
                attn_drop=cfg.attn_drop,
                proj_drop=cfg.proj_drop,
                use_pallas=self.use_pallas,
                dtype=self.dtype,
                name="grid_attn",
            )(x, deterministic=deterministic, capture=capture,
              ln=(ls, lb, 1e-5))
            x = x + DropPath(cfg.drop_path, name="dp2")(y, deterministic=deterministic)

        ls, lb = LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm3")(
            x, return_params=True)
        y = ChannelMLP(dim=C, mlp_ratio=cfg.mlp_ratio, drop=cfg.ffn_drop,
                       act=cfg.mlp_act, use_pallas=self.use_pallas,
                       dtype=self.dtype, name="mlp")(
            x, deterministic=deterministic, ln=(ls, lb, 1e-5))
        x = x + DropPath(cfg.drop_path, name="dp3")(y, deterministic=deterministic)
        return x


class MaxOutStage(nn.Module):
    """Sequential stack of OutGridBlocks (reference
    `src/model/Grid_Only_Block.py:11-19`; defined for composition parity —
    the shipped models inline their stages)."""

    cfg: StageCfg
    depth: int
    use_pallas: Optional[bool] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, deterministic: bool = True,
                 capture: bool = False):
        for i in range(self.depth):
            x = OutGridBlock(cfg=self.cfg, use_pallas=self.use_pallas,
                             dtype=self.dtype, name=f"blocks_{i}")(
                x, train=train, deterministic=deterministic, capture=capture)
        return x


class StageOutThenGrid(nn.Module):
    """N Outlookers followed by M GridOnlyBlocks (reference
    `src/model/Grid_Only_Block.py:76-104`)."""

    cfg: StageCfg
    depth: int
    out_depth: int = 1
    use_pallas: Optional[bool] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, deterministic: bool = True,
                 capture: bool = False):
        cfg = self.cfg
        for i in range(self.out_depth):
            x = OutlookerBlock2d(
                dim=cfg.dim, num_heads=cfg.outlook_heads,
                kernel_size=cfg.outlook_kernel, stride=1,
                mlp_ratio=cfg.outlook_mlp_ratio, attn_drop=cfg.attn_drop,
                proj_drop=cfg.proj_drop, mlp_drop=cfg.ffn_drop,
                drop_path=cfg.drop_path, act=cfg.mlp_act,
                use_pallas=self.use_pallas, dtype=self.dtype,
                name=f"outlookers_{i}",
            )(x, deterministic=deterministic, capture=capture)
        for i in range(self.depth):
            x = GridOnlyBlock(cfg=cfg, use_pallas=self.use_pallas,
                              dtype=self.dtype, name=f"blocks_{i}")(
                x, train=train, deterministic=deterministic, capture=capture)
        return x


class WindowAttention2D(nn.Module):
    """MaxViT-style block (window) attention: contiguous w x w windows,
    NHWC in/out — the local counterpart of :class:`GridAttention2D`. The
    reference config reserves ``window_size`` but restricts mode to "grid"
    (`grid_attention.py:101-102`); here the mode is implemented, sharing the
    same fused MHSA core."""

    dim: int
    num_heads: int
    window_size: int
    qkv_bias: bool = True
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    use_pallas: Optional[bool] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True, capture: bool = False):
        from outgridvit_tpu.ops.grid import window_partition, window_unpartition

        if x.ndim != 4:
            raise ValueError(f"Expected NHWC. Got {tuple(x.shape)}")
        B, H, W, C = x.shape
        if C != self.dim:
            raise ValueError(f"Expected C=={self.dim}. Got C={C}")
        wins, meta = window_partition(x, self.window_size)
        Bw, wh, ww, _ = wins.shape
        tokens = wins.reshape(Bw, wh * ww, C)
        tokens = MultiHeadSelfAttention(
            dim=C, num_heads=self.num_heads, qkv_bias=self.qkv_bias,
            attn_drop=self.attn_drop, proj_drop=self.proj_drop,
            use_pallas=self.use_pallas, dtype=self.dtype, name="mhsa",
        )(tokens, deterministic=deterministic, capture=capture)
        return window_unpartition(tokens.reshape(Bw, wh, ww, C), meta)
