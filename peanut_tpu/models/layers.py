"""Building-block layers (flax.linen, NHWC) with torch-compatible semantics.

ConvModule mirrors the mmcv conv+norm+act unit the reference zoo is built
from; BatchNorm uses torch eps/momentum defaults so imported running stats
reproduce reference activations exactly.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple, Union

import jax.numpy as jnp
from flax import linen as nn


def _pair(v):
    return (v, v) if isinstance(v, int) else tuple(v)


class Conv2d(nn.Module):
    """torch-compatible conv: explicit symmetric padding, HWIO kernels."""
    features: int
    kernel_size: Union[int, Tuple[int, int]]
    stride: Union[int, Tuple[int, int]] = 1
    padding: Union[int, Tuple[int, int]] = 0
    dilation: Union[int, Tuple[int, int]] = 1
    use_bias: bool = True
    groups: int = 1
    kernel_init: Optional[Callable] = None

    @nn.compact
    def __call__(self, x):
        k = _pair(self.kernel_size)
        s = _pair(self.stride)
        p = _pair(self.padding)
        d = _pair(self.dilation)
        extra = {}
        if self.kernel_init is not None:
            extra["kernel_init"] = self.kernel_init
        return nn.Conv(
            features=self.features,
            kernel_size=k,
            strides=s,
            padding=((p[0], p[0]), (p[1], p[1])),
            kernel_dilation=d,
            feature_group_count=self.groups,
            use_bias=self.use_bias,
            dtype=x.dtype,
            name="conv",
            **extra)(x)


class BatchNorm(nn.Module):
    """BatchNorm2d with torch defaults (eps=1e-5, momentum 0.1)."""
    use_running_average: Optional[bool] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        ura = (not train if self.use_running_average is None
               else self.use_running_average)
        return nn.BatchNorm(
            use_running_average=ura,
            momentum=0.9,
            epsilon=1e-5,
            dtype=x.dtype,
            name="bn")(x)


class ConvModule(nn.Module):
    """conv -> norm -> act, the mmcv unit used across the reference zoo."""
    features: int
    kernel_size: Union[int, Tuple[int, int]]
    stride: Union[int, Tuple[int, int]] = 1
    padding: Union[int, Tuple[int, int]] = 0
    dilation: Union[int, Tuple[int, int]] = 1
    with_norm: bool = True
    with_act: bool = True
    act: Callable = nn.relu
    groups: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Conv2d(self.features, self.kernel_size, self.stride, self.padding,
                   self.dilation, use_bias=not self.with_norm,
                   groups=self.groups, name="conv_unit")(x)
        if self.with_norm:
            x = BatchNorm(name="norm")(x, train=train)
        if self.with_act:
            x = self.act(x)
        return x


def max_pool_torch(x, kernel: int, stride: int, padding: int):
    """torch MaxPool2d parity: pads with -inf, NHWC."""
    neg = jnp.finfo(x.dtype).min
    x = jnp.pad(x, ((0, 0), (padding, padding), (padding, padding), (0, 0)),
                constant_values=neg)
    return nn.max_pool(x, (kernel, kernel), strides=(stride, stride),
                       padding="VALID")
