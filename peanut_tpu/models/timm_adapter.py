"""timm backbone adapter (zoo; reference backbones/timm_backbone.py).

The reference wraps ``timm.create_model(features_only=True)`` to expose any
timm classifier as a multi-level segmentation backbone.  timm (and a torch
compute path) are not part of this framework's runtime: on TPU the compute
graph must be jittable JAX.  This adapter keeps the registry surface — the
config shape ``dict(type='TIMMBackbone', model_name=...)`` resolves — and
maps the common model names onto the native flax zoo equivalents where one
exists, erroring with a clear message otherwise.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

from flax import linen as nn

from ..registry import BACKBONES

# timm model-name prefixes with a native flax equivalent in this zoo
_NATIVE_EQUIV = {
    "resnet18": dict(type="ResNet", depth=18),
    "resnet34": dict(type="ResNet", depth=34),
    "resnet50": dict(type="ResNet", depth=50),
    "resnet101": dict(type="ResNet", depth=101),
    "resnext50_32x4d": dict(type="ResNeXt", depth=50, groups=32,
                            base_width=4),
    "resnest50d": dict(type="ResNeSt", depth=50),
    "mobilenetv2_100": dict(type="MobileNetV2"),
    "mobilenetv3_large_100": dict(type="MobileNetV3", arch="large"),
    "mobilenetv3_small_100": dict(type="MobileNetV3", arch="small"),
}


@BACKBONES.register()
class TIMMBackbone(nn.Module):
    """Config-compatible stand-in for the reference's timm adapter."""
    model_name: str = "resnet50"
    features_only: bool = True
    in_channels: int = 3
    extra: Dict[str, Any] | None = None

    def setup(self):
        if self.model_name not in _NATIVE_EQUIV:
            raise NotImplementedError(
                f"TIMMBackbone: no native equivalent for "
                f"{self.model_name!r}; available: "
                f"{sorted(_NATIVE_EQUIV)}. (timm itself is a torch-side "
                f"dependency with no TPU compute path.)")
        cfg = dict(_NATIVE_EQUIV[self.model_name])
        cfg.update(self.extra or {})
        if cfg["type"] in ("ResNet", "ResNeXt", "ResNeSt"):
            cfg["in_channels"] = self.in_channels
        elif self.in_channels != 3:
            raise NotImplementedError(
                f"{self.model_name!r} equivalent only supports 3-channel "
                f"input")
        self._model = BACKBONES.get(cfg.pop("type"))(**cfg, name="model")

    def __call__(self, x, train: bool = False):
        return self._model(x, train=train)
