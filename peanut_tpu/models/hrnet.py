"""HRNet backbone (zoo; reference mmseg backbones/hrnet.py).

Parallel multi-resolution streams with repeated cross-resolution fusion.
Stage/branch structure follows the W18/W32/W48 configs; output is the
list of all branch features (finest first), which UPer/FCN heads consume
after upsample-concat (the hrnet decode configs use in_index=(0,1,2,3)).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..registry import BACKBONES
from .layers import ConvModule, Conv2d, BatchNorm
from .ops import resize_bilinear
from .resnet import BasicBlock, Bottleneck


class HRModule(nn.Module):
    """num_branches parallel streams + full cross fusion."""
    num_branches: int
    num_blocks: int
    channels: Sequence[int]

    @nn.compact
    def __call__(self, xs, train: bool = False):
        outs = []
        for b in range(self.num_branches):
            x = xs[b]
            for j in range(self.num_blocks):
                x = BasicBlock(self.channels[b],
                               name=f"branch{b}_block{j}")(x, train=train)
            outs.append(x)

        # cross-resolution fusion
        fused = []
        for i in range(self.num_branches):
            acc = outs[i]
            hw = (acc.shape[-3], acc.shape[-2])
            for j in range(self.num_branches):
                if j == i:
                    continue
                y = outs[j]
                if j > i:  # lower res -> upsample + 1x1
                    y = Conv2d(self.channels[i], 1, use_bias=False,
                               name=f"fuse{i}_{j}_conv")(y)
                    y = BatchNorm(name=f"fuse{i}_{j}_bn")(y, train=train)
                    y = resize_bilinear(y, hw, align_corners=False)
                else:  # higher res -> strided conv chain
                    for k in range(i - j):
                        last = k == i - j - 1
                        ch = self.channels[i] if last else self.channels[j]
                        y = Conv2d(ch, 3, stride=2, padding=1, use_bias=False,
                                   name=f"fuse{i}_{j}_down{k}")(y)
                        y = BatchNorm(name=f"fuse{i}_{j}_down{k}_bn")(
                            y, train=train)
                        if not last:
                            y = nn.relu(y)
                acc = acc + y
            fused.append(nn.relu(acc))
        return fused


@BACKBONES.register()
class HRNet(nn.Module):
    """HRNet-W<base>; channels per branch = base * 2^i."""
    base_channels: int = 18
    stage_modules: Sequence[int] = (1, 1, 4, 3)   # modules per stage
    stage_blocks: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        # stem: two stride-2 convs
        x = ConvModule(64, 3, stride=2, padding=1, name="stem0")(x, train=train)
        x = ConvModule(64, 3, stride=2, padding=1, name="stem1")(x, train=train)
        # stage 1: 4 bottleneck blocks at 1/4 resolution
        for j in range(4):
            x = Bottleneck(64, downsample=(j == 0),
                           name=f"layer1_{j}")(x, train=train)

        chans = [self.base_channels * 2 ** i for i in range(4)]
        xs = [ConvModule(chans[0], 3, padding=1, name="trans1_0")(x,
                                                                  train=train),
              ConvModule(chans[1], 3, stride=2, padding=1,
                         name="trans1_1")(x, train=train)]

        for stage, n_modules in enumerate(self.stage_modules[1:], start=2):
            n_branches = stage
            for m in range(n_modules):
                xs = HRModule(n_branches, self.stage_blocks,
                              chans[:n_branches],
                              name=f"stage{stage}_m{m}")(xs, train=train)
            if stage < 4:
                xs = list(xs)
                xs.append(ConvModule(chans[stage], 3, stride=2, padding=1,
                                     name=f"trans{stage}")(xs[-1],
                                                           train=train))
        return tuple(xs)
