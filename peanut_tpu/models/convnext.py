"""ConvNeXt backbone (flax, NHWC).

Reference: the convnext config family
(/root/reference/prediction/configs/convnext/, backbone type
``mmcls.ConvNeXt`` pulled from mmclassification) — the primary user of the
LearningRateDecayOptimizerConstructor (stage_wise decay).  Architecture per
"A ConvNet for the 2020s": patchify stem, depthwise-7x7 + LN + inverted
MLP blocks with layer scale, 2x2 strided downsample layers, and a LayerNorm
per output index for dense prediction (gap_before_final_norm=False mode).

Parameter naming mirrors mmcls (downsample_layers / stages / gamma) via
zoo_import.convert_mmcls_convnext so official checkpoints drop in.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..registry import BACKBONES
from .layers import Conv2d

ARCHS = {
    "tiny": ((3, 3, 9, 3), (96, 192, 384, 768)),
    "small": ((3, 3, 27, 3), (96, 192, 384, 768)),
    "base": ((3, 3, 27, 3), (128, 256, 512, 1024)),
    "large": ((3, 3, 27, 3), (192, 384, 768, 1536)),
    "xlarge": ((3, 3, 27, 3), (256, 512, 1024, 2048)),
}


class ConvNeXtBlock(nn.Module):
    dim: int
    layer_scale_init_value: float = 1e-6

    @nn.compact
    def __call__(self, x):
        shortcut = x
        # depthwise 7x7 (per-channel conv)
        x = nn.Conv(self.dim, (7, 7), padding=3,
                    feature_group_count=self.dim,
                    name="depthwise_conv")(x)
        x = nn.LayerNorm(epsilon=1e-6, name="norm")(x)
        x = nn.Dense(4 * self.dim, name="pointwise_conv1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(self.dim, name="pointwise_conv2")(x)
        if self.layer_scale_init_value > 0:
            gamma = self.param(
                "gamma",
                nn.initializers.constant(self.layer_scale_init_value),
                (self.dim,))
            x = x * gamma
        return shortcut + x


@BACKBONES.register()
class ConvNeXt(nn.Module):
    arch: str = "tiny"
    out_indices: Sequence[int] = (0, 1, 2, 3)
    layer_scale_init_value: float = 1e-6

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple[jnp.ndarray, ...]:
        depths, dims = ARCHS[self.arch]
        outs = []
        for i in range(4):
            if i == 0:
                # patchify stem: conv 4x4/4 + LN  (downsample_layers.0)
                x = Conv2d(dims[0], 4, stride=4, use_bias=True,
                           name="downsample0_conv")(x)
                x = nn.LayerNorm(epsilon=1e-6, name="downsample0_norm")(x)
            else:
                # LN + conv 2x2/2  (downsample_layers.i)
                x = nn.LayerNorm(epsilon=1e-6,
                                 name=f"downsample{i}_norm")(x)
                x = Conv2d(dims[i], 2, stride=2, use_bias=True,
                           name=f"downsample{i}_conv")(x)
            for j in range(depths[i]):
                x = ConvNeXtBlock(dims[i], self.layer_scale_init_value,
                                  name=f"stage{i}_block{j}")(x)
            if i in self.out_indices:
                outs.append(nn.LayerNorm(epsilon=1e-6,
                                         name=f"out_norm{i}")(x))
        return tuple(outs)
