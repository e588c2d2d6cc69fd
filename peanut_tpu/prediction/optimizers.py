"""Layer-decay optimizer constructor (optax).

TPU-native twin of the reference's LearningRateDecayOptimizerConstructor
(/root/reference/prediction/mmseg/core/optimizers/
layer_decay_optimizer_constructor.py): per-layer learning-rate decay for
transformer backbones (BEiT/MAE/ViT fine-tuning) plus the standard
no-weight-decay grouping (1-dim params, biases, pos_embed/cls_token).

Instead of torch param groups, the constructor computes a per-leaf LR-scale
pytree from the flax parameter paths and applies it as a final optax
transformation — the update (gradient step AND decoupled weight decay)
scales exactly like a torch param group's ``lr = scale * base_lr``.
"""

from __future__ import annotations

import re
from typing import Any, Callable, Optional

import jax
import optax


def _path_names(path) -> list:
    return [getattr(p, "key", getattr(p, "name", str(p))) for p in path]


def vit_layer_id(names, max_layer_id: int) -> int:
    """Layer id for ViT/BEiT/MAE-style backbones (reference
    get_layer_id_for_vit): embeddings -> 0, block i -> i+1, everything
    else (decode head, norms after blocks) -> max_layer_id - 1."""
    if "backbone" not in names:
        return max_layer_id - 1
    for n in names:
        if n in ("cls_token", "mask_token", "pos_embed", "patch_embed"):
            return 0
        m = re.fullmatch(r"block(\d+)", str(n))
        if m:
            return int(m.group(1)) + 1
    return max_layer_id - 1


def stage_layer_id(names, max_stage_id: int) -> int:
    """Stage-wise id (reference get_stage_id_for_convnext adapted to this
    framework's stageS_blockB naming): embeddings/downsamples -> 0,
    stage s -> s+1, head -> max_stage_id - 1."""
    if "backbone" not in names:
        return max_stage_id - 1
    for n in names:
        if n in ("cls_token", "mask_token", "pos_embed", "patch_embed"):
            return 0
        m = re.match(r"stage(\d+)_", str(n))
        if m:
            return int(m.group(1)) + 1
    return max_stage_id - 1


def _is_no_decay(names, leaf) -> bool:
    """mmseg rule: 1-dim params, biases, pos_embed/cls_token skip wd."""
    last = str(names[-1]) if names else ""
    return (getattr(leaf, "ndim", 2) <= 1 or last == "bias"
            or any(n in ("pos_embed", "cls_token") for n in names))


def layer_decay_scales(params, decay_rate: float, num_layers: int,
                       decay_type: str = "layer_wise"):
    """Per-leaf LR-scale pytree: scale = decay_rate**(L - layer_id - 1)
    with L = num_layers + 2 (reference add_params convention)."""
    total = num_layers + 2
    id_fn = vit_layer_id if "layer" in decay_type else stage_layer_id

    def one(path, leaf):
        names = _path_names(path)
        return decay_rate ** (total - id_fn(names, total) - 1)

    return jax.tree_util.tree_map_with_path(one, params)


def scale_updates_by_tree(scales) -> optax.GradientTransformation:
    """Final transformation multiplying each leaf's update by its scale."""

    def init(params):
        return optax.EmptyState()

    def update(updates, state, params=None):
        scaled = jax.tree.map(lambda u, s: u * s, updates, scales)
        return scaled, state

    return optax.GradientTransformation(init, update)


def make_layer_decay_optimizer(
        params, learning_rate, decay_rate: float = 0.9,
        num_layers: int = 12, weight_decay: float = 0.05,
        decay_type: str = "layer_wise",
        base_tx: Optional[Callable[..., Any]] = None
) -> optax.GradientTransformation:
    """Build the full optimizer: AdamW with the mmseg no-decay mask chained
    with per-layer LR scaling.

    Args:
      params: the model's parameter pytree (paths drive the grouping).
      learning_rate: float or optax schedule (the base LR).
      decay_rate / num_layers / decay_type: paramwise_cfg twins.
      weight_decay: decoupled wd for the 'decay' group (0 for 'no_decay').
      base_tx: optional factory (lr, wd, mask) -> GradientTransformation to
        swap the inner optimizer (default optax.adamw).
    """
    wd_mask = jax.tree_util.tree_map_with_path(
        lambda path, leaf: not _is_no_decay(_path_names(path), leaf), params)
    scales = layer_decay_scales(params, decay_rate, num_layers, decay_type)
    if base_tx is None:
        inner = optax.adamw(learning_rate=learning_rate,
                            weight_decay=weight_decay, mask=wd_mask)
    else:
        inner = base_tx(learning_rate, weight_decay, wd_mask)
    return optax.chain(inner, scale_updates_by_tree(scales))
