"""IGEV feature extractors in flax.linen.

* ``MobileNetV2Feature``: the reference uses timm's pretrained
  ``mobilenetv2_100`` trunk (KITTI15/core/extractor.py:327-361).  timm is not
  available here, so the identical architecture (conv stem + inverted-residual
  blocks, ReLU6, width 1.0) is implemented from scratch; pretrained timm
  weights can be mapped in with tools/convert_torch.py conventions.  Returns
  pyramid features at 1/4 (48), 1/8 (64), 1/16 (192), 1/32 (160) after the
  Conv2x_IN FPN fusion.
* ``MultiBasicEncoder``: the RAFT-style context encoder
  (KITTI15/core/extractor.py:200-304) producing per-GRU-level (hidden,
  context) pairs at 1/4, 1/8, 1/16.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from diffuvolume_tpu.models.layers import ConvBN, ConvTransposeBN, torch_conv_init


def relu6(x):
    return jnp.minimum(jax.nn.relu(x), 6.0)


class InstanceNorm(nn.Module):
    """torch nn.InstanceNorm2d default: per-sample per-channel spatial
    normalization, no affine params, no running stats."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        axes = tuple(range(1, x.ndim - 1))
        mean = jnp.mean(x, axis=axes, keepdims=True)
        var = jnp.var(x, axis=axes, keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + self.epsilon)


class BasicConvIN(nn.Module):
    """Conv(+transpose) + InstanceNorm + LeakyReLU (submodule.py:84-106)."""

    features: int
    kernel_size: Any = 3
    stride: Any = 1
    padding: Any = 1
    deconv: bool = False
    use_in: bool = True
    relu: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        ndim = x.ndim - 2
        k = (self.kernel_size,) * ndim if isinstance(self.kernel_size, int) else tuple(self.kernel_size)
        s = (self.stride,) * ndim if isinstance(self.stride, int) else tuple(self.stride)
        p = (self.padding,) * ndim if isinstance(self.padding, int) else tuple(self.padding)
        if self.deconv:
            x = ConvTransposeBN(
                self.features, k, s, p, 0, use_bn=False, dtype=self.dtype, name="conv"
            )(x)
        elif (ndim == 2 and x.shape[-1] <= 4 and len(set(k)) == 1
              and len(set(s)) == 1 and len(set(p)) == 1):
            # Image-entry conv (stems): unfold+matmul on the TPU eval path.
            from diffuvolume_tpu.models.layers import EntryConv

            x = EntryConv(self.features, k[0], s[0], p[0], use_bias=False,
                          kernel_init=torch_conv_init(k), dtype=self.dtype,
                          name="conv")(x)
        else:
            x = nn.Conv(
                self.features, k, s, [(pi, pi) for pi in p], use_bias=False,
                kernel_init=torch_conv_init(k), dtype=self.dtype, name="conv",
            )(x)
        if self.use_in:
            x = InstanceNorm(name="in")(x)
        if self.relu:
            x = jax.nn.leaky_relu(x, negative_slope=0.01)
        return x


class BasicConvBN(nn.Module):
    """Conv(+transpose) + BatchNorm + LeakyReLU (submodule.py:9-37)."""

    features: int
    kernel_size: Any = 3
    stride: Any = 1
    padding: Any = 1
    deconv: bool = False
    use_bn: bool = True
    relu: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        ndim = x.ndim - 2
        k = (self.kernel_size,) * ndim if isinstance(self.kernel_size, int) else tuple(self.kernel_size)
        s = (self.stride,) * ndim if isinstance(self.stride, int) else tuple(self.stride)
        p = (self.padding,) * ndim if isinstance(self.padding, int) else tuple(self.padding)
        if self.deconv:
            x = ConvTransposeBN(
                self.features, k, s, p, 0, use_bn=False, dtype=self.dtype, name="conv"
            )(x)
        elif ndim == 3 and k == (1, 1, 1) and s == (1, 1, 1) and p == (0, 0, 0):
            from diffuvolume_tpu.models.layers import (
                _ConvKernel, _conv1x1_dot_ok, conv1x1_dot,
            )

            kernel = _ConvKernel((*k, x.shape[-1], self.features), name="conv")()
            if _conv1x1_dot_ok(x, k, s, (1, 1, 1), 1, train, default="1"):
                # 1×1×1 conv as a minor-dim dot (GEV hourglass agg heads ran
                # at 0.5 TF/s through XLA's conv emitter — see conv1x1_dot).
                x = conv1x1_dot(x, kernel, dtype=self.dtype)
            else:
                x = jax.lax.conv_general_dilated(
                    x.astype(self.dtype), kernel.astype(self.dtype),
                    (1, 1, 1), [(0, 0)] * 3,
                    dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
                )
        elif (ndim == 3 and k == (3, 3, 3) and s == (1, 1, 1) and p == (1, 1, 1)
              and x.shape[-1] in (8, 16, 32, 64, 128)
              and x.shape[1] % (128 // x.shape[-1]) == 0):
            # Small-channel 3D convs (corr_stem 8ch, GEV hourglass aggs) run
            # ~100× off SOL through XLA's conv; route through the channel-
            # aware conv3x3x3 dispatch (same nn.Conv param tree).  Stride-2
            # convs stay on XLA: running the kernel at stride 1 + [::2]³ was
            # measured a wash (the strided slice lowers as a 3.6 ms gather).
            from diffuvolume_tpu.models.layers import _ConvKernel, conv3x3x3

            kernel = _ConvKernel((*k, x.shape[-1], self.features), name="conv")()
            x = conv3x3x3(x, kernel, train=train, dtype=self.dtype)
        else:
            x = nn.Conv(
                self.features, k, s, [(pi, pi) for pi in p], use_bias=False,
                kernel_init=torch_conv_init(k), dtype=self.dtype, name="conv",
            )(x)
        if self.use_bn:
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype, name="bn")(x)
        if self.relu:
            x = jax.nn.leaky_relu(x, negative_slope=0.01)
        return x


class Conv2xIN(nn.Module):
    """Upsample(or downsample)-and-fuse block (submodule.py:110-148)."""

    features: int
    deconv: bool = False
    concat: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, rem: jax.Array) -> jax.Array:
        k = 4 if self.deconv else 3
        x = BasicConvIN(self.features, k, 2, 1, deconv=self.deconv,
                        dtype=self.dtype, name="conv1")(x)
        if x.shape[1:3] != rem.shape[1:3]:
            # nearest-resize to rem (submodule.py:70-74)
            x = jax.image.resize(x, (x.shape[0], *rem.shape[1:3], x.shape[-1]), "nearest")
        x = jnp.concatenate([x, rem], axis=-1) if self.concat else x + rem
        return BasicConvIN(self.features * 2 if self.concat else self.features,
                           3, 1, 1, dtype=self.dtype, name="conv2")(x)


class Conv2xBN(nn.Module):
    """BatchNorm variant of Conv2x (submodule.py:41-80)."""

    features: int
    deconv: bool = False
    concat: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, rem: jax.Array, train: bool = False) -> jax.Array:
        k = 4 if self.deconv else 3
        x = BasicConvBN(self.features, k, 2, 1, deconv=self.deconv,
                        dtype=self.dtype, name="conv1")(x, train)
        if x.shape[1:3] != rem.shape[1:3]:
            x = jax.image.resize(x, (x.shape[0], *rem.shape[1:3], x.shape[-1]), "nearest")
        x = jnp.concatenate([x, rem], axis=-1) if self.concat else x + rem
        return BasicConvBN(self.features * 2 if self.concat else self.features,
                           3, 1, 1, dtype=self.dtype, name="conv2")(x, train)


class InvertedResidual(nn.Module):
    """MobileNetV2 inverted-residual block (expansion → depthwise → project)."""

    features: int
    stride: int = 1
    expand: int = 6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        c_in = x.shape[-1]
        mid = c_in * self.expand
        y = x
        if self.expand != 1:
            y = nn.Conv(mid, (1, 1), use_bias=False, dtype=self.dtype,
                        kernel_init=torch_conv_init((1, 1)), name="pw")(y)
            y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype, name="pw_bn")(y)
            y = relu6(y)
        y = nn.Conv(mid, (3, 3), (self.stride, self.stride), [(1, 1), (1, 1)],
                    feature_group_count=mid, use_bias=False, dtype=self.dtype,
                    kernel_init=torch_conv_init((3, 3)), name="dw")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="dw_bn")(y)
        y = relu6(y)
        y = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                    kernel_init=torch_conv_init((1, 1)), name="proj")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="proj_bn")(y)
        if self.stride == 1 and c_in == self.features:
            y = y + x
        return y


# mobilenetv2_100 stage configs used by the reference's Feature split
# (extractor.py:332-341): (expand, channels, repeats, first-stride)
_MBV2_STAGES = [
    (1, 16, 1, 1),   # block0 → 1/2 (after stem)
    (6, 24, 2, 2),   # block1 → 1/4
    (6, 32, 3, 2),   # block2 → 1/8
    (6, 64, 4, 2), (6, 96, 3, 1),   # block3 → 1/16
    (6, 160, 3, 2),  # block4 → 1/32
]


class MobileNetV2Feature(nn.Module):
    """MobileNetV2 trunk + Conv2x_IN FPN fusion (extractor.py:327-361).

    Returns ``[x4 (48ch @1/4), x8 (64 @1/8), x16 (192 @1/16), x32 (160 @1/32)]``.
    """

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> list[jax.Array]:
        dt = self.dtype
        from diffuvolume_tpu.models.layers import EntryConv

        y = EntryConv(32, 3, 2, 1, use_bias=False,
                      kernel_init=torch_conv_init((3, 3)), dtype=dt,
                      name="conv_stem")(x, train)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=dt, name="bn1")(y)
        y = relu6(y)

        feats = {}
        stage_ends = {0: "x2", 1: "x4", 2: "x8", 4: "x16", 5: "x32"}
        idx = 0
        for si, (t, c, n, s) in enumerate(_MBV2_STAGES):
            for bi in range(n):
                y = InvertedResidual(
                    c, stride=s if bi == 0 else 1, expand=t, dtype=dt,
                    name=f"block{idx}",
                )(y, train)
                idx += 1
            if si in stage_ends:
                feats[stage_ends[si]] = y

        x16 = Conv2xIN(96, deconv=True, dtype=dt, name="deconv32_16")(feats["x32"], feats["x16"])
        x8 = Conv2xIN(32, deconv=True, dtype=dt, name="deconv16_8")(x16, feats["x8"])
        x4 = Conv2xIN(24, deconv=True, dtype=dt, name="deconv8_4")(x8, feats["x4"])
        x4 = BasicConvIN(48, 3, 1, 1, dtype=dt, name="conv4")(x4)
        return [x4, x8, x16, feats["x32"]]


class ResidualBlockCtx(nn.Module):
    """RAFT ResidualBlock with selectable norm (extractor.py:10-65)."""

    features: int
    stride: int = 1
    norm: str = "batch"  # batch | instance | none
    dtype: Any = jnp.float32

    def _norm(self, name):
        if self.norm == "batch":
            return lambda x, train: nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype, name=name)(x)
        if self.norm == "instance":
            return lambda x, train: InstanceNorm(name=name)(x)
        return lambda x, train: x

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        conv = lambda f, s, name: nn.Conv(
            f, (3, 3), (s, s), [(1, 1), (1, 1)], use_bias=True, dtype=self.dtype,
            kernel_init=nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal"),
            name=name,
        )
        y = conv(self.features, self.stride, "conv1")(x)
        y = jax.nn.relu(self._norm("norm1")(y, train))
        y = conv(self.features, 1, "conv2")(y)
        y = jax.nn.relu(self._norm("norm2")(y, train))
        if self.stride != 1 or x.shape[-1] != self.features:
            x = nn.Conv(self.features, (1, 1), (self.stride, self.stride),
                        use_bias=True, dtype=self.dtype, name="downsample")(x)
            x = self._norm("norm3")(x, train)
        return jax.nn.relu(x + y)


class MultiBasicEncoder(nn.Module):
    """Context encoder: trunk → per-level (hidden, context) heads
    (extractor.py:200-304, downsample=2 config)."""

    output_dims: Sequence[Sequence[int]] = ((128, 128, 128), (128, 128, 128))
    norm: str = "batch"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        dt = self.dtype
        from diffuvolume_tpu.models.layers import EntryConv

        y = EntryConv(64, 7, 1, 3, use_bias=True, dtype=dt, name="conv1")(x, train)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=dt, name="norm1")(y)
        y = jax.nn.relu(y)
        for i, (f, s) in enumerate([(64, 1), (96, 2), (128, 2)]):
            y = ResidualBlockCtx(f, s, self.norm, dt, name=f"layer{i+1}_0")(y, train)
            y = ResidualBlockCtx(f, 1, self.norm, dt, name=f"layer{i+1}_1")(y, train)
        x04 = y
        y = ResidualBlockCtx(128, 2, self.norm, dt, name="layer4_0")(y, train)
        y = ResidualBlockCtx(128, 1, self.norm, dt, name="layer4_1")(y, train)
        x08 = y
        y = ResidualBlockCtx(128, 2, self.norm, dt, name="layer5_0")(y, train)
        y = ResidualBlockCtx(128, 1, self.norm, dt, name="layer5_1")(y, train)
        x16 = y

        outs = []
        for lvl, feat in (("04", x04), ("08", x08), ("16", x16)):
            per_dim = []
            for di, dims in enumerate(self.output_dims):
                target = {"04": dims[2], "08": dims[1], "16": dims[0]}[lvl]
                if lvl == "16":
                    o = nn.Conv(target, (3, 3), padding=[(1, 1)] * 2, use_bias=True,
                                dtype=dt, name=f"out{lvl}_{di}")(feat)
                else:
                    o = ResidualBlockCtx(128, 1, self.norm, dt,
                                         name=f"out{lvl}_{di}_res")(feat, train)
                    o = nn.Conv(target, (3, 3), padding=[(1, 1)] * 2, use_bias=True,
                                dtype=dt, name=f"out{lvl}_{di}_conv")(o)
                per_dim.append(o)
            outs.append(per_dim)
        # [(hidden04, ctx04), (hidden08, ctx08), (hidden16, ctx16)]
        return outs
