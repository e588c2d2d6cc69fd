"""High-level API facade (mmseg apis parity).

Function names and call shapes mirror the reference's mmseg.apis
(init_segmentor / inference_segmentor / train_segmentor;
prediction/mmseg/apis/*.py) so reference-style user code ports directly:

    from peanut_tpu import apis
    bundle = apis.init_segmentor("configs/pspnet/peanut_prediction.py",
                                 checkpoint="pred_model_wts.pth")
    probs = apis.inference_segmentor(bundle, chw_map)
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional, Union

import numpy as np


@dataclass
class SegmentorBundle:
    model: Any
    variables: Any
    cfg: Dict[str, Any]

    def __call__(self, img, **kw):
        return inference_segmentor(self, img, **kw)


def init_segmentor(config: Union[str, Dict], checkpoint: Optional[str] = None,
                   input_size: int = 512) -> SegmentorBundle:
    """Build a segmentor from a config file/dict, optionally loading a torch
    ``.pth`` or orbax checkpoint (mmseg apis/inference.py:12-40 parity)."""
    from .core.config_file import load_config
    from .core.checkpoint import (load_torch_state_dict,
                                  convert_encoder_decoder_state,
                                  load_checkpoint)
    from .models import build_segmentor, init_segmentor_params

    if isinstance(config, str):
        cfg = load_config(config)
    else:
        cfg = dict(config)
    model_cfg = cfg["model"] if "model" in cfg else cfg
    model = build_segmentor(model_cfg)

    if checkpoint and checkpoint.endswith((".pth", ".pt")):
        variables = convert_encoder_decoder_state(
            load_torch_state_dict(checkpoint))
    elif checkpoint:
        variables, _ = load_checkpoint(checkpoint)
        if "params" not in variables:  # TrainState tree
            variables = {"params": variables.get("params"),
                         "batch_stats": variables.get("batch_stats", {})}
    else:
        in_ch = model_cfg["backbone"].get("in_channels", 3)
        variables = init_segmentor_params(
            model, (1, input_size, input_size, in_ch))
    return SegmentorBundle(model=model, variables=variables, cfg=cfg)


def inference_segmentor(bundle: SegmentorBundle, img, logits: bool = False):
    """Run whole/slide inference on one image.

    img: (H, W, C) or (C, H, W) numpy array.  Returns sigmoid probabilities
    (PEANUT passthrough semantics) or raw logits, shape (C_out, H, W).
    """
    import jax
    import jax.numpy as jnp

    arr = np.asarray(img, np.float32)
    if arr.shape[0] <= 32 and arr.shape[-1] > 32:  # CHW -> HWC
        arr = arr.transpose(1, 2, 0)
    x = jnp.asarray(arr)[None]
    out = bundle.model.apply(bundle.variables, x,
                             method=bundle.model.inference)
    out = jnp.transpose(out[0], (2, 0, 1))
    if not logits:
        out = jax.nn.sigmoid(out)
    return np.asarray(out)


def train_segmentor(config: Union[str, Dict], data_root: str,
                    work_dir: str, **overrides):
    """Config-driven training entry (mmseg apis/train.py:71 shape)."""
    from .cli.train_prediction_model import main as train_main

    argv = ["--data_root", data_root, "--work_dir", work_dir]
    for k, v in overrides.items():
        argv += [f"--{k}", str(v)]
    return train_main(argv)
