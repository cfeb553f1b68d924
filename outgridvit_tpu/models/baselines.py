"""Baseline model zoo for the comparison harness.

The reference benchmarks 6 timm models under the identical training recipe
(`scripts/train_cifar32_baselines.py:26-131`: DeiT-T/S patch4, Swin-T
patch2, MaxViT-T/Nano, ResNet18 with CIFAR stem). timm does not exist for
JAX, so the architectures are implemented here directly (NHWC, same
CIFAR-stem surgery ideas):

- ``resnet18_cifar``: ResNet-18 with the 3x3/stride-1 CIFAR stem (no maxpool)
- ``deit_tiny_patch4`` / ``deit_small_patch4``: ViT with 4x4 patch embedding,
  cls token, learned position embeddings
- ``vit_micro_patch4``: a small smoke-scale ViT for tests

All take/return the same (NHWC image -> logits) contract as the main models
and train through the same ``train_model`` loop.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from outgridvit_tpu.models.layers import BatchNorm

Dtype = jnp.dtype


class _BasicBlock(nn.Module):
    filters: int
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = nn.Conv(self.filters, (3, 3), strides=(self.stride,) * 2,
                    padding=((1, 1), (1, 1)), use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        y = BatchNorm(name="bn1")(y, use_running_average=not train)
        y = nn.relu(y)
        y = nn.Conv(self.filters, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=False, dtype=self.dtype, name="conv2")(y)
        y = BatchNorm(name="bn2")(y, use_running_average=not train)
        if residual.shape != y.shape:
            residual = nn.Conv(self.filters, (1, 1),
                               strides=(self.stride,) * 2, use_bias=False,
                               dtype=self.dtype, name="downsample")(residual)
            residual = BatchNorm(name="downsample_bn")(
                residual, use_running_average=not train)
        return nn.relu(residual + y)


class ResNet18Cifar(nn.Module):
    """ResNet-18 with CIFAR stem (3x3 s1, no maxpool) — the reference's
    'surgery' baseline (`train_cifar32_baselines.py:112-131`)."""

    num_classes: int = 100
    width: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False,
                 deterministic: Optional[bool] = None, capture: bool = False):
        x = x.astype(self.dtype)
        x = nn.Conv(self.width, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=False, dtype=self.dtype, name="stem")(x)
        x = BatchNorm(name="stem_bn")(x, use_running_average=not train)
        x = nn.relu(x)
        for si, (filters, stride) in enumerate(
            [(self.width, 1), (self.width * 2, 2), (self.width * 4, 2),
             (self.width * 8, 2)]
        ):
            for bi in range(2):
                x = _BasicBlock(filters, stride if bi == 0 else 1,
                                dtype=self.dtype,
                                name=f"layer{si}_{bi}")(x, train=train)
        x = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
        return nn.Dense(self.num_classes, dtype=jnp.float32, name="fc")(x)


class _ViTBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    drop_path: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        from outgridvit_tpu.models.blocks import MultiHeadSelfAttention
        from outgridvit_tpu.models.layers import ChannelMLP, DropPath, LayerNorm

        y = LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        y = MultiHeadSelfAttention(dim=self.dim, num_heads=self.num_heads,
                                   use_pallas=False, dtype=self.dtype,
                                   name="attn")(y, deterministic=deterministic)
        x = x + DropPath(self.drop_path, name="dp1")(y, deterministic=deterministic)
        y = LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        y = ChannelMLP(dim=self.dim, mlp_ratio=self.mlp_ratio,
                       dtype=self.dtype, name="mlp")(y, deterministic=deterministic)
        x = x + DropPath(self.drop_path, name="dp2")(y, deterministic=deterministic)
        return x


class DeiT(nn.Module):
    """DeiT/ViT with patch embedding + cls token + learned pos-embed; the
    patch4 small-image variant the reference benchmarks
    (`train_cifar32_baselines.py:26-60`)."""

    num_classes: int = 100
    patch: int = 4
    dim: int = 192
    depth: int = 12
    num_heads: int = 3
    mlp_ratio: float = 4.0
    dpr_max: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False,
                 deterministic: Optional[bool] = None, capture: bool = False):
        from outgridvit_tpu.models.layers import LayerNorm
        from outgridvit_tpu.stage_config import make_dpr

        if deterministic is None:
            deterministic = not train
        x = x.astype(self.dtype)
        B, H, W, _ = x.shape
        x = nn.Conv(self.dim, (self.patch,) * 2, strides=(self.patch,) * 2,
                    dtype=self.dtype, name="patch_embed")(x)
        n = (H // self.patch) * (W // self.patch)
        x = x.reshape(B, n, self.dim)
        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, self.dim))
        pos = self.param("pos_embed",
                         nn.initializers.normal(0.02), (1, n + 1, self.dim))
        x = jnp.concatenate([jnp.broadcast_to(cls, (B, 1, self.dim)).astype(x.dtype), x], 1)
        x = x + pos.astype(x.dtype)
        dprs = make_dpr(self.depth, self.dpr_max)
        for i in range(self.depth):
            x = _ViTBlock(self.dim, self.num_heads, self.mlp_ratio,
                          drop_path=dprs[i], dtype=self.dtype,
                          name=f"blocks_{i}")(x, deterministic=deterministic)
        x = LayerNorm(epsilon=1e-6, name="norm")(x)
        return nn.Dense(self.num_classes, dtype=jnp.float32,
                        name="head")(x[:, 0].astype(jnp.float32))


def build_baseline(name: str, num_classes: int, dtype=jnp.float32):
    name = name.lower()
    if name in ("resnet18", "resnet18_cifar"):
        return ResNet18Cifar(num_classes=num_classes, dtype=dtype)
    if name in ("resnet50", "resnet50_cifar"):
        return ResNet50Cifar(num_classes=num_classes, dtype=dtype)
    if name in ("convnext_tiny", "convnext_tiny_patch2"):
        return ConvNeXtTiny(num_classes=num_classes, dtype=dtype)
    if name in ("effnetv2_s", "efficientnetv2_s"):
        return EfficientNetV2S(num_classes=num_classes, dtype=dtype)
    if name in ("deit_tiny", "deit_tiny_patch4"):
        return DeiT(num_classes=num_classes, patch=4, dim=192, depth=12,
                    num_heads=3, dtype=dtype)
    if name in ("deit_small", "deit_small_patch4"):
        return DeiT(num_classes=num_classes, patch=4, dim=384, depth=12,
                    num_heads=6, dtype=dtype)
    if name in ("vit_micro", "vit_micro_patch4"):
        return DeiT(num_classes=num_classes, patch=4, dim=32, depth=2,
                    num_heads=2, dtype=dtype)
    if name in ("maxvit_nano", "maxvit_nano_cifar"):
        return MaxViTNano(num_classes=num_classes, dtype=dtype)
    if name in ("maxvit_tiny", "maxvit_tiny_cifar"):
        return MaxViTTiny(num_classes=num_classes, dtype=dtype)
    if name in ("swin_tiny", "swin_tiny_patch2"):
        return SwinTiny(num_classes=num_classes, dtype=dtype)
    raise ValueError(
        f"Unknown baseline '{name}'. Available: resnet18_cifar, "
        f"resnet50_cifar, convnext_tiny, effnetv2_s, deit_tiny_patch4, "
        f"deit_small_patch4, vit_micro_patch4, maxvit_nano, maxvit_tiny, "
        f"swin_tiny_patch2"
    )


class _Bottleneck(nn.Module):
    """ResNet bottleneck: 1x1 reduce -> 3x3 (stride) -> 1x1 expand(4x),
    BN after each, projection shortcut on shape change."""

    width: int
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        out_ch = self.width * 4
        y = nn.Conv(self.width, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        y = BatchNorm(name="bn1")(y, use_running_average=not train)
        y = nn.relu(y)
        y = nn.Conv(self.width, (3, 3), strides=(self.stride,) * 2,
                    padding=((1, 1), (1, 1)), use_bias=False,
                    dtype=self.dtype, name="conv2")(y)
        y = BatchNorm(name="bn2")(y, use_running_average=not train)
        y = nn.relu(y)
        y = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv3")(y)
        y = BatchNorm(name="bn3")(y, use_running_average=not train)
        if residual.shape != y.shape:
            residual = nn.Conv(out_ch, (1, 1), strides=(self.stride,) * 2,
                               use_bias=False, dtype=self.dtype,
                               name="downsample")(residual)
            residual = BatchNorm(name="downsample_bn")(
                residual, use_running_average=not train)
        return nn.relu(residual + y)


class ResNet50Cifar(nn.Module):
    """ResNet-50 with the reference's CIFAR surgery — conv1 -> 3x3 stride-1
    pad-1, maxpool -> identity (`training_notebooks/train_comparision_models/
    ResNet50.ipynb`; the robustness study's main rival, README.md:153-158).
    Bottleneck depths 3/4/6/3, widths 64/128/256/512 (x4 expansion);
    23.71M params at 100 classes (README.md:140)."""

    num_classes: int = 100
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False,
                 deterministic: Optional[bool] = None, capture: bool = False):
        x = x.astype(self.dtype)
        x = nn.Conv(64, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                    dtype=self.dtype, name="stem")(x)
        x = BatchNorm(name="stem_bn")(x, use_running_average=not train)
        x = nn.relu(x)
        for si, (width, depth, stride) in enumerate(
                [(64, 3, 1), (128, 4, 2), (256, 6, 2), (512, 3, 2)]):
            for bi in range(depth):
                x = _Bottleneck(width, stride if bi == 0 else 1,
                                dtype=self.dtype,
                                name=f"layer{si}_{bi}")(x, train=train)
        x = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
        return nn.Dense(self.num_classes, dtype=jnp.float32, name="fc")(x)


class _ConvNeXtBlock(nn.Module):
    """dw7x7 -> LN -> 4x pointwise -> GELU -> pointwise -> layer-scale,
    residual (ConvNeXt's standard block; no drop-path — the reference trains
    timm defaults, drop_path_rate=0)."""

    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from outgridvit_tpu.models.layers import LayerNorm

        y = nn.Conv(self.dim, (7, 7), padding=((3, 3), (3, 3)),
                    feature_group_count=self.dim, dtype=self.dtype,
                    name="dwconv")(x)
        y = LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(y)
        y = nn.Dense(4 * self.dim, dtype=self.dtype, name="pwconv1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, dtype=self.dtype, name="pwconv2")(y)
        gamma = self.param("gamma",
                           nn.initializers.constant(1e-6), (self.dim,),
                           jnp.float32)
        return x + y * gamma.astype(y.dtype)


class ConvNeXtTiny(nn.Module):
    """ConvNeXt-T with the reference's small-image surgery — stem conv
    4x4/s4 -> 2x2/s2 (`ConvNetx_Tiny.ipynb`). Depths 3/3/9/3, dims
    96/192/384/768, LN+2x2/s2 downsampling between stages; 27.89M params at
    100 classes (README.md:133)."""

    num_classes: int = 100
    dims: tuple = (96, 192, 384, 768)
    depths: tuple = (3, 3, 9, 3)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False,
                 deterministic: Optional[bool] = None, capture: bool = False):
        from outgridvit_tpu.models.layers import LayerNorm

        x = x.astype(self.dtype)
        x = nn.Conv(self.dims[0], (2, 2), strides=(2, 2), dtype=self.dtype,
                    name="stem")(x)
        x = LayerNorm(epsilon=1e-6, dtype=self.dtype, name="stem_norm")(x)
        for si, (dim, depth) in enumerate(zip(self.dims, self.depths)):
            if si > 0:
                x = LayerNorm(epsilon=1e-6, dtype=self.dtype,
                              name=f"down_norm_{si}")(x)
                x = nn.Conv(dim, (2, 2), strides=(2, 2), dtype=self.dtype,
                            name=f"down_{si}")(x)
            for bi in range(depth):
                x = _ConvNeXtBlock(dim, dtype=self.dtype,
                                   name=f"stages_{si}_{bi}")(x)
        x = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
        x = LayerNorm(epsilon=1e-6, name="norm")(x)
        return nn.Dense(self.num_classes, dtype=jnp.float32, name="head")(x)


class _SEUnit(nn.Module):
    """EfficientNet squeeze-excite: GAP -> 1x1 reduce (SiLU) -> 1x1 expand
    (sigmoid gate); reduction computed on the BLOCK INPUT channels (timm's
    EfficientNetV2 convention), biased convs."""

    rd_ch: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x.astype(jnp.float32), axis=(1, 2), keepdims=True)
        s = nn.Conv(self.rd_ch, (1, 1), dtype=self.dtype,
                    name="reduce")(s.astype(x.dtype))
        s = nn.silu(s)
        s = nn.Conv(x.shape[-1], (1, 1), dtype=self.dtype, name="expand")(s)
        return x * nn.sigmoid(s)


class _FusedMBConv(nn.Module):
    """EfficientNetV2 fused block: 3x3 expand conv + BN + SiLU -> 1x1
    project + BN (plain 3x3 conv-bn-act when expand==1), residual at
    stride 1 with matching channels."""

    out_ch: int
    expand: int
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        residual = x
        if self.expand == 1:
            y = nn.Conv(self.out_ch, (3, 3), strides=(self.stride,) * 2,
                        padding=((1, 1), (1, 1)), use_bias=False,
                        dtype=self.dtype, name="conv")(x)
            y = BatchNorm(name="bn")(y, use_running_average=not train)
            y = nn.silu(y)
        else:
            mid = in_ch * self.expand
            y = nn.Conv(mid, (3, 3), strides=(self.stride,) * 2,
                        padding=((1, 1), (1, 1)), use_bias=False,
                        dtype=self.dtype, name="conv_exp")(x)
            y = BatchNorm(name="bn1")(y, use_running_average=not train)
            y = nn.silu(y)
            y = nn.Conv(self.out_ch, (1, 1), use_bias=False,
                        dtype=self.dtype, name="conv_pwl")(y)
            y = BatchNorm(name="bn2")(y, use_running_average=not train)
        if self.stride == 1 and in_ch == self.out_ch:
            y = y + residual
        return y


class _MBConvV2(nn.Module):
    """EfficientNetV2 inverted residual: 1x1 expand + BN + SiLU -> dw3x3 +
    BN + SiLU -> SE (ratio on block input) -> 1x1 project + BN."""

    out_ch: int
    expand: int
    stride: int = 1
    se_ratio: float = 0.25
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        residual = x
        mid = in_ch * self.expand
        y = nn.Conv(mid, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv_pw")(x)
        y = BatchNorm(name="bn1")(y, use_running_average=not train)
        y = nn.silu(y)
        y = nn.Conv(mid, (3, 3), strides=(self.stride,) * 2,
                    padding=((1, 1), (1, 1)), feature_group_count=mid,
                    use_bias=False, dtype=self.dtype, name="conv_dw")(y)
        y = BatchNorm(name="bn2")(y, use_running_average=not train)
        y = nn.silu(y)
        rd = max(1, int(in_ch * self.se_ratio))
        y = _SEUnit(rd_ch=rd, dtype=self.dtype, name="se")(y)
        y = nn.Conv(self.out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv_pwl")(y)
        y = BatchNorm(name="bn3")(y, use_running_average=not train)
        if self.stride == 1 and in_ch == self.out_ch:
            y = y + residual
        return y


class EfficientNetV2S(nn.Module):
    """EfficientNetV2-S with the reference's small-image surgery —
    conv_stem -> 3x3 stride-1 (`EfficientNetv2.ipynb`). timm's v2_s stage
    table: fused r2/e1/c24 s1, fused r4/e4/c48 s2, fused r4/e4/c64 s2,
    mbconv r6/e4/c128 s2 se.25, r9/e6/c160 s1 se.25, r15/e6/c256 s2 se.25;
    1x1 head conv to 1280. 20.31M params at 100 classes (README.md:136)."""

    num_classes: int = 100
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False,
                 deterministic: Optional[bool] = None, capture: bool = False):
        x = x.astype(self.dtype)
        x = nn.Conv(24, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                    dtype=self.dtype, name="conv_stem")(x)
        x = BatchNorm(name="stem_bn")(x, use_running_average=not train)
        x = nn.silu(x)
        stages = [
            ("fused", 2, 1, 24, 1, 0.0),
            ("fused", 4, 4, 48, 2, 0.0),
            ("fused", 4, 4, 64, 2, 0.0),
            ("mb", 6, 4, 128, 2, 0.25),
            ("mb", 9, 6, 160, 1, 0.25),
            ("mb", 15, 6, 256, 2, 0.25),
        ]
        for si, (kind, repeat, expand, out_ch, stride, se) in enumerate(
                stages):
            for bi in range(repeat):
                s = stride if bi == 0 else 1
                if kind == "fused":
                    x = _FusedMBConv(out_ch=out_ch, expand=expand, stride=s,
                                     dtype=self.dtype,
                                     name=f"blocks_{si}_{bi}")(x, train=train)
                else:
                    x = _MBConvV2(out_ch=out_ch, expand=expand, stride=s,
                                  se_ratio=se, dtype=self.dtype,
                                  name=f"blocks_{si}_{bi}")(x, train=train)
        x = nn.Conv(1280, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv_head")(x)
        x = BatchNorm(name="head_bn")(x, use_running_average=not train)
        x = nn.silu(x)
        x = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
        return nn.Dense(self.num_classes, dtype=jnp.float32,
                        name="classifier")(x)


class _MaxViTBlock(nn.Module):
    """MBConv (optional stride-2) -> window attention -> grid attention,
    each with pre-LN residual — the MaxViT unit the reference benchmarks via
    timm (`train_cifar32_baselines.py:62-111`)."""

    in_ch: int
    dim: int
    num_heads: int
    window_size: int
    grid_size: int
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, deterministic: bool = True):
        from outgridvit_tpu.models.blocks import GridAttention2D, WindowAttention2D
        from outgridvit_tpu.models.layers import ChannelMLP, LayerNorm, MBConv
        from outgridvit_tpu.stage_config import MBConvConfig

        x = MBConv(in_ch=self.in_ch, out_ch=self.dim, stride=self.stride,
                   cfg=MBConvConfig(), dtype=self.dtype, name="mbconv")(
            x, train=train, deterministic=deterministic)
        y = LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm_w")(x)
        y = WindowAttention2D(dim=self.dim, num_heads=self.num_heads,
                              window_size=self.window_size, dtype=self.dtype,
                              name="window_attn")(y, deterministic=deterministic)
        x = x + y
        y = LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm_g")(x)
        y = GridAttention2D(dim=self.dim, num_heads=self.num_heads,
                            grid_size=self.grid_size, dtype=self.dtype,
                            name="grid_attn")(y, deterministic=deterministic)
        x = x + y
        y = LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm_m")(x)
        y = ChannelMLP(dim=self.dim, dtype=self.dtype, name="mlp")(
            y, deterministic=deterministic)
        return x + y


class MaxViTNano(nn.Module):
    """Compact MaxViT for the 32px comparison harness."""

    num_classes: int = 100
    stem_dim: int = 48
    dims: tuple = (48, 96, 192)
    depths: tuple = (1, 2, 2)
    window_size: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False,
                 deterministic: Optional[bool] = None, capture: bool = False):
        if deterministic is None:
            deterministic = not train
        x = x.astype(self.dtype)
        x = nn.Conv(self.stem_dim, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=False, dtype=self.dtype, name="stem")(x)
        x = BatchNorm(name="stem_bn")(x, use_running_average=not train)
        x = nn.gelu(x, approximate=False)
        in_ch = self.stem_dim
        for si, (dim, depth) in enumerate(zip(self.dims, self.depths)):
            for bi in range(depth):
                stride = 2 if (bi == 0 and si > 0) else 1
                H = x.shape[1] // stride
                x = _MaxViTBlock(
                    in_ch=in_ch, dim=dim, num_heads=max(2, dim // 32),
                    window_size=min(self.window_size, H),
                    grid_size=min(self.window_size, H), stride=stride,
                    dtype=self.dtype, name=f"stages_{si}_{bi}")(
                    x, train=train, deterministic=deterministic)
                in_ch = dim
        x = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
        return nn.Dense(self.num_classes, dtype=jnp.float32, name="head")(x)


class MaxViTTiny(nn.Module):
    """MaxViT-T for the 32px comparison harness — the reference benchmarks
    timm's ``maxvit_tiny_tf_224`` with a CIFAR stem surgery (both stem convs
    3x3 stride-1, `train_cifar32_baselines.py:61-87`): dims 64/128/256/512,
    depths 2/2/5/2, stride-2 MBConv at the first block of every stage."""

    num_classes: int = 100
    stem_dim: int = 64
    dims: tuple = (64, 128, 256, 512)
    depths: tuple = (2, 2, 5, 2)
    window_size: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False,
                 deterministic: Optional[bool] = None, capture: bool = False):
        if deterministic is None:
            deterministic = not train
        x = x.astype(self.dtype)
        # CIFAR stem surgery: two 3x3 stride-1 convs (timm's stem is
        # conv1 s2 + conv2 s1; the reference rewrites both to s1/pad1)
        x = nn.Conv(self.stem_dim, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=False, dtype=self.dtype, name="stem_conv1")(x)
        x = BatchNorm(name="stem_bn1")(x, use_running_average=not train)
        x = nn.gelu(x, approximate=False)
        x = nn.Conv(self.stem_dim, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=False, dtype=self.dtype, name="stem_conv2")(x)
        in_ch = self.stem_dim
        for si, (dim, depth) in enumerate(zip(self.dims, self.depths)):
            for bi in range(depth):
                stride = 2 if bi == 0 else 1  # every stage downsamples first
                H = max(1, x.shape[1] // stride)
                x = _MaxViTBlock(
                    in_ch=in_ch, dim=dim, num_heads=max(2, dim // 32),
                    window_size=min(self.window_size, H),
                    grid_size=min(self.window_size, H), stride=stride,
                    dtype=self.dtype, name=f"stages_{si}_{bi}")(
                    x, train=train, deterministic=deterministic)
                in_ch = dim
        x = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
        return nn.Dense(self.num_classes, dtype=jnp.float32, name="head")(x)


class _SwinBlock(nn.Module):
    """Swin transformer block: (optionally shifted) window MHSA + MLP.

    Shifted windows are implemented with a cyclic roll and an additive
    attention mask that blocks cross-boundary pairs (Swin's standard
    efficient formulation)."""

    dim: int
    num_heads: int
    window_size: int
    shift: int = 0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        import jax
        import numpy as onp

        from outgridvit_tpu.models.layers import ChannelMLP, LayerNorm
        from outgridvit_tpu.ops.grid import window_partition, window_unpartition

        B, H, W, C = x.shape
        w = self.window_size
        s = self.shift
        heads = self.num_heads
        hd = C // heads

        y = LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        if s > 0:
            y = jnp.roll(y, shift=(-s, -s), axis=(1, 2))
        wins, meta = window_partition(y, w)
        Bw, _, _, _ = wins.shape
        N = w * w
        tokens = wins.reshape(Bw, N, C)

        qkv = nn.Dense(3 * C, dtype=self.dtype, name="qkv")(tokens)
        qkv = qkv.reshape(Bw, N, 3, heads, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        logits = jnp.einsum("bnhd,bmhd->bhnm", q, k,
                            preferred_element_type=jnp.float32) * hd**-0.5

        if s > 0:
            # static region-id mask: tokens from different pre-roll regions
            # must not attend to each other
            region = onp.zeros((H, W), onp.int32)
            rid = 0
            for hs in (slice(0, H - w), slice(H - w, H - s), slice(H - s, H)):
                for ws_ in (slice(0, W - w), slice(W - w, W - s), slice(W - s, W)):
                    region[hs, ws_] = rid
                    rid += 1
            region = onp.roll(region, (-s, -s), axis=(0, 1))
            Hb, Wb = H // w, W // w
            region = region.reshape(Hb, w, Wb, w).transpose(0, 2, 1, 3)
            region = region.reshape(Hb * Wb, N)  # [nW, N]
            mask = (region[:, :, None] != region[:, None, :])
            mask = jnp.asarray(onp.where(mask, -1e30, 0.0), jnp.float32)
            nW = Hb * Wb
            logits = logits.reshape(Bw // nW, nW, heads, N, N) + mask[None, :, None]
            logits = logits.reshape(Bw, heads, N, N)

        attn = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn.astype(x.dtype), v,
                         preferred_element_type=jnp.float32).astype(x.dtype)
        out = nn.Dense(C, dtype=self.dtype, name="proj")(out.reshape(Bw, N, C))
        y = window_unpartition(out.reshape(Bw, w, w, C), meta)
        if s > 0:
            y = jnp.roll(y, shift=(s, s), axis=(1, 2))
        x = x + y

        from outgridvit_tpu.models.layers import LayerNorm as _LN

        y = _LN(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        y = ChannelMLP(dim=C, dtype=self.dtype, name="mlp")(
            y, deterministic=deterministic)
        return x + y


class SwinTiny(nn.Module):
    """Swin-style hierarchical transformer for the small-image comparison
    harness (the reference benchmarks timm's Swin-T with patch-2 surgery,
    `train_cifar32_baselines.py:62-86`): patch embed -> stages of
    [window, shifted-window] blocks with patch-merging downsampling."""

    num_classes: int = 100
    patch: int = 2
    dims: tuple = (96, 192, 384)
    depths: tuple = (2, 2, 4)
    window_size: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False,
                 deterministic: Optional[bool] = None, capture: bool = False):
        from outgridvit_tpu.models.layers import LayerNorm

        if deterministic is None:
            deterministic = not train
        x = x.astype(self.dtype)
        x = nn.Conv(self.dims[0], (self.patch,) * 2,
                    strides=(self.patch,) * 2, dtype=self.dtype,
                    name="patch_embed")(x)
        for si, (dim, depth) in enumerate(zip(self.dims, self.depths)):
            if si > 0:
                # patch merging: 2x2 space-to-depth + linear reduction
                B, H, W, C = x.shape
                x = x.reshape(B, H // 2, 2, W // 2, 2, C)
                x = jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(
                    B, H // 2, W // 2, 4 * C)
                x = LayerNorm(epsilon=1e-5, dtype=self.dtype,
                              name=f"merge_norm_{si}")(x)
                x = nn.Dense(dim, use_bias=False, dtype=self.dtype,
                             name=f"merge_{si}")(x)
            w = min(self.window_size, x.shape[1])
            for bi in range(depth):
                shift = (w // 2) if (bi % 2 == 1 and x.shape[1] > w) else 0
                x = _SwinBlock(dim=dim, num_heads=max(2, dim // 32),
                               window_size=w, shift=shift, dtype=self.dtype,
                               name=f"stages_{si}_{bi}")(
                    x, deterministic=deterministic)
        x = LayerNorm(epsilon=1e-5, name="norm")(x)
        x = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
        return nn.Dense(self.num_classes, dtype=jnp.float32, name="head")(x)
