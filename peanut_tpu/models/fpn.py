"""Feature Pyramid Network neck (flax.linen, NHWC).

detectron2-parity FPN over ResNet res2..res5: 1x1 lateral convs, nearest
-neighbour top-down upsampling with sum fusion, 3x3 output convs, and a
stride-2 maxpool p6 (LastLevelMaxPool, used by the RPN only).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..registry import NECKS
from .layers import Conv2d


@NECKS.register()
class FPN(nn.Module):
    out_channels: int = 256
    num_levels: int = 4        # inputs res2..res5
    add_p6_pool: bool = True

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        laterals = [
            Conv2d(self.out_channels, 1, use_bias=True,
                   name=f"lateral{i + 2}")(x)
            for i, x in enumerate(inputs)]

        # top-down pathway: coarse -> fine, nearest 2x upsampling
        for i in range(len(laterals) - 2, -1, -1):
            up = laterals[i + 1]
            h, w = laterals[i].shape[-3], laterals[i].shape[-2]
            up = jnp.repeat(jnp.repeat(up, 2, axis=-3), 2, axis=-2)
            laterals[i] = laterals[i] + up[..., :h, :w, :]

        outs = [Conv2d(self.out_channels, 3, padding=1, use_bias=True,
                       name=f"output{i + 2}")(laterals[i])
                for i in range(len(laterals))]

        if self.add_p6_pool:
            p5 = outs[-1]
            p6 = nn.max_pool(p5, (1, 1), strides=(2, 2), padding="VALID")
            outs.append(p6)
        return tuple(outs)
