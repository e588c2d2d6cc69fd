"""Registry-driven model zoo (flax.linen, NHWC, XLA-compiled).

Covers the subset of the reference's vendored MMSegmentation model zoo that
PEANUT's path depends on with full fidelity (ResNetV1c + PSPHead + FCNHead +
EncoderDecoder; SURVEY.md §2.2) plus progressively more of the zoo.  Models
are built from plain dict configs via the registries in peanut_tpu.registry,
preserving the reference's fake-component testing pattern.
"""

from . import layers  # noqa: F401
from . import resnet  # noqa: F401
from . import heads  # noqa: F401
from . import heads_attention  # noqa: F401
from . import heads_zoo  # noqa: F401
from . import necks  # noqa: F401
from . import losses  # noqa: F401
from . import losses_extra  # noqa: F401
from . import encoder_decoder  # noqa: F401
from . import cascade  # noqa: F401
from . import fpn  # noqa: F401
from . import mobilenet  # noqa: F401
from . import mit  # noqa: F401
from . import unet  # noqa: F401
from . import hrnet  # noqa: F401
from . import vit  # noqa: F401
from . import backbones_zoo  # noqa: F401
from . import convnext  # noqa: F401
from . import knet  # noqa: F401
from . import timm_adapter  # noqa: F401
from .builder import build_segmentor, init_segmentor_params
from .encoder_decoder import EncoderDecoder
from .ops import resize_bilinear, adaptive_avg_pool

__all__ = [
    "build_segmentor",
    "init_segmentor_params",
    "EncoderDecoder",
    "resize_bilinear",
    "adaptive_avg_pool",
]
