"""Unseen-target prediction model (inference wrapper).

Twin of the reference PEANUT_Prediction_Model
(/root/reference/nav/agent/prediction.py:140-158): a PSPNet over the partial
14-channel semantic map emitting 6 per-category probability maps via
sigmoid(raw logits).  The reference's mmcv test pipeline (MultiScaleFlipAug,
ratio 1.0, no normalization — prediction.py:124-131 with identity mean/std)
reduces to a plain whole-image forward, which is what runs here: one jit
-compiled NHWC forward per call, batched over parallel episodes.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import NavConfig
from ..models import build_segmentor, init_segmentor_params
from ..models.builder import peanut_prediction_config
from ..core.checkpoint import (
    load_torch_state_dict,
    convert_encoder_decoder_state,
)


class PredictionModel:
    def __init__(self, cfg: NavConfig, variables=None, model_cfg=None,
                 input_size: Optional[int] = None):
        self.cfg = cfg
        self.model_cfg = model_cfg or peanut_prediction_config(
            in_channels=4 + cfg.num_sem_categories, num_classes=6)
        self.model = build_segmentor(self.model_cfg)
        size = input_size or cfg.prediction_window
        if variables is not None:
            self.variables = variables
        else:
            try:
                sd = load_torch_state_dict(cfg.pred_model_wts)
                self.variables = convert_encoder_decoder_state(sd)
            except (FileNotFoundError, OSError):
                # no reference weights available: random init (tests/benches)
                self.variables = init_segmentor_params(
                    self.model, (1, size, size,
                                 4 + cfg.num_sem_categories))

        if cfg.serve_bf16:
            # MXU-native serving: bf16 weights/activations, f32 sigmoid out
            self.variables = jax.tree.map(
                lambda x: x.astype(jnp.bfloat16)
                if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
                self.variables)

        serve_dtype = jnp.bfloat16 if cfg.serve_bf16 else jnp.float32

        @jax.jit
        def _infer(variables, chw_maps):
            nhwc = jnp.transpose(chw_maps, (0, 2, 3, 1)).astype(serve_dtype)
            logits = self.model.apply(variables, nhwc,
                                      method=self.model.inference)
            logits = logits.astype(jnp.float32)
            return jax.nn.sigmoid(jnp.transpose(logits, (0, 3, 1, 2)))

        self._infer = _infer

    def get_prediction(self, full_map: np.ndarray) -> np.ndarray:
        """full_map: (C, H, W) float -> (6, H, W) per-category probabilities."""
        probs = self._infer(self.variables, jnp.asarray(full_map)[None])
        return np.asarray(probs[0])

    def get_prediction_batch(self, full_maps) -> np.ndarray:
        """(B, C, H, W) -> (B, 6, H, W), one device call for all episodes."""
        return np.asarray(self._infer(self.variables, jnp.asarray(full_maps)))

    def get_prediction_sharded(self, full_map: np.ndarray, mesh,
                               axis: str = "spatial") -> np.ndarray:
        """Whole-map inference with the HEIGHT dimension sharded over a
        mesh axis (the reference's slide_inference analog scaled out:
        SURVEY.md §5.7 — spatial sharding of the 960^2 map conv with
        halo exchange over ICI).

        Idiomatic form: annotate the input sharding and let GSPMD insert
        the conv halo exchanges — no hand-written collectives.  Numerically
        identical to the unsharded forward (tests/test_training.py twin in
        tests/test_spatial_inference.py).
        """
        from jax.sharding import NamedSharding, PartitionSpec as P

        x = jnp.asarray(full_map)[None]                 # (1, C, H, W)
        sh = NamedSharding(mesh, P(None, None, axis, None))
        x = jax.device_put(x, sh)
        with mesh:
            probs = self._infer(self.variables, x)
        return np.asarray(probs[0])
