"""Prediction-training pipeline tests: dataset semantics, augmentation,
train-step convergence, checkpoint/resume, and DP sharding."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from peanut_tpu.core.mesh import make_mesh
from peanut_tpu.prediction.dataset import (
    SemMapDataset, PrefetchLoader, load_map_sample, training_pipeline,
    Pad, RandomCrop, RandomFlip, RandomRotate)
from peanut_tpu.prediction.runner import IterRunner
from peanut_tpu.prediction.train import (
    TrainConfig, create_train_state, make_train_step, poly_schedule)
from peanut_tpu.models import build_segmentor, init_segmentor_params


MAPSZ = 64


def write_fake_maps(dirpath, n_files=2, map_size=MAPSZ, seed=0):
    rng = np.random.RandomState(seed)
    os.makedirs(dirpath, exist_ok=True)
    for i in range(n_files):
        seq = np.zeros((20, 14, map_size, map_size), np.uint8)
        for t in range(20):
            r = 3 + t * 2
            seq[t, 1, :r, :r] = 255                       # explored grows
            seq[t, 0, :r:4, :r] = 255                     # some obstacles
        seq[:, 4:10] = (rng.rand(1, 6, map_size, map_size) > 0.97) * 255
        np.savez_compressed(os.path.join(dirpath, f"f{i:05d}.npz"), maps=seq)


def tiny_model(base=8):
    cfg = dict(
        type="EncoderDecoder",
        backbone=dict(type="ResNetV1c", depth=50, num_stages=4,
                      out_indices=(0, 1, 2, 3), dilations=(1, 1, 2, 4),
                      strides=(1, 2, 1, 1), contract_dilation=True,
                      base_channels=base, stem_channels=base, in_channels=14),
        decode_head=dict(type="PSPHead", in_channels=base * 32, in_index=3,
                         channels=base * 8, pool_scales=(1, 2, 3, 6),
                         dropout_ratio=0.1, num_classes=6,
                         align_corners=False),
        auxiliary_head=dict(type="FCNHead", in_channels=base * 16, in_index=2,
                            channels=base * 4, num_convs=1, concat_input=False,
                            dropout_ratio=0.1, num_classes=6,
                            align_corners=False),
        test_cfg=dict(mode="whole"),
    )
    return build_segmentor(cfg)


def test_load_map_sample_gt_semantics(tmp_path):
    """GT = final map's goal channels masked to regions unexplored at t
    (train_prediction_model.py:85-89)."""
    write_fake_maps(tmp_path / "train")
    path = str(tmp_path / "train" / "f00000.npz")
    s = load_map_sample(path, 3)
    assert s["img"].shape == (MAPSZ, MAPSZ, 14)
    assert s["img"].max() <= 1.0
    maps = np.load(path)["maps"]
    explored_t3 = (maps[3, 1] / 255.0) > 0
    gt_expected = maps[-1, 4:10] * (1 - explored_t3)
    np.testing.assert_array_equal(s["gt"].transpose(2, 0, 1), gt_expected)
    # explored regions carry no supervision signal
    assert s["gt"][explored_t3].sum() == 0


def test_pipeline_shapes_and_determinism(tmp_path):
    write_fake_maps(tmp_path / "train")
    rng = np.random.RandomState(7)
    ds = SemMapDataset(str(tmp_path), "train",
                       pipeline=training_pipeline(MAPSZ, rng=rng))
    assert len(ds) == 20  # 2 files x 10 timesteps
    s = ds[0]
    assert s["img"].shape == (MAPSZ, MAPSZ, 14)
    assert s["gt"].shape == (MAPSZ, MAPSZ, 6)
    assert set(np.unique(s["gt"])) <= {0.0, 255.0}  # nearest keeps labels


@pytest.mark.slow
def test_train_step_reduces_loss(tmp_path):
    model = tiny_model()
    variables = init_segmentor_params(model, (1, 32, 32, 14), train=True)
    tcfg = TrainConfig(lr=1e-3, max_iters=100, batch_size=2)
    tx = optax.adam(learning_rate=poly_schedule(tcfg))
    state, tx = create_train_state(model, variables, tcfg, tx=tx)
    step_fn, _ = make_train_step(model, tcfg, tx)

    rng = np.random.RandomState(0)
    batch = {"img": jnp.asarray(rng.rand(2, 32, 32, 14), jnp.float32),
             "gt": jnp.asarray((rng.rand(2, 32, 32, 6) > 0.9) * 255.0)}
    losses = []
    for _ in range(8):
        state, metrics = step_fn(state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 8


@pytest.mark.slow
def test_runner_checkpoints_and_resumes(tmp_path):
    write_fake_maps(tmp_path / "train", map_size=32)
    ds = SemMapDataset(str(tmp_path), "train",
                       pipeline=training_pipeline(32,
                                                  np.random.RandomState(0)))
    model = tiny_model()
    variables = init_segmentor_params(model, (1, 32, 32, 14), train=True)
    tcfg = TrainConfig(lr=1e-3, max_iters=4, batch_size=2,
                       checkpoint_interval=2, log_interval=2)
    tx = optax.adam(learning_rate=poly_schedule(tcfg))
    state, tx = create_train_state(model, variables, tcfg, tx=tx)
    step_fn, _ = make_train_step(model, tcfg, tx)
    loader = PrefetchLoader(ds, 2, num_workers=1)

    work = str(tmp_path / "work")
    runner = IterRunner(step_fn, state, loader, tcfg, work, auto_resume=False)
    final = runner.run(max_iters=2)
    assert os.path.isdir(os.path.join(work, "iter_2"))

    # resume: fresh state + auto_resume should pick up iter_2
    state2, _ = create_train_state(model, variables, tcfg, tx=tx)
    runner2 = IterRunner(step_fn, state2, loader, tcfg, work, auto_resume=True)
    assert int(runner2.state.step) == 2
    runner2.run(max_iters=4)
    assert os.path.isdir(os.path.join(work, "iter_4"))


@pytest.mark.slow
def test_dp_sharded_step_matches_single(tmp_path):
    """Mesh-sharded train step computes the same update as unsharded."""
    model = tiny_model()
    variables = init_segmentor_params(model, (1, 32, 32, 14), train=True)
    tcfg = TrainConfig(lr=1e-3, batch_size=8)
    tx = optax.adam(learning_rate=poly_schedule(tcfg))
    state, tx = create_train_state(model, variables, tcfg, tx=tx)
    rng = np.random.RandomState(1)
    batch = {"img": jnp.asarray(rng.rand(8, 32, 32, 14), jnp.float32),
             "gt": jnp.asarray((rng.rand(8, 32, 32, 6) > 0.9) * 255.0)}

    plain_fn, _ = make_train_step(model, tcfg, tx)
    _, m_plain = plain_fn(state, batch)

    mesh = make_mesh({"data": len(jax.devices())})
    with mesh:
        shard_fn, _ = make_train_step(model, tcfg, tx, mesh=mesh)
        _, m_shard = shard_fn(state, batch)

    np.testing.assert_allclose(float(m_plain["loss"]),
                               float(m_shard["loss"]), rtol=1e-5)


@pytest.mark.slow
def test_remat_model_matches_plain():
    """remat=True must be numerically identical (same params, same loss,
    same grads) — it only changes what backward stores."""
    import optax
    from peanut_tpu.models import build_segmentor, init_segmentor_params

    def small(remat):
        return dict(
            type="EncoderDecoder",
            backbone=dict(type="ResNetV1c", depth=50, num_stages=4,
                          out_indices=(0, 1, 2, 3), dilations=(1, 1, 2, 4),
                          strides=(1, 2, 1, 1), contract_dilation=True,
                          base_channels=8, stem_channels=8, in_channels=14,
                          remat=remat),
            decode_head=dict(type="PSPHead", in_channels=256, in_index=3,
                             channels=64, pool_scales=(1, 2, 3, 6),
                             dropout_ratio=0.0, num_classes=6,
                             align_corners=False),
            test_cfg=dict(mode="whole"),
        )

    m0 = build_segmentor(small(False))
    m1 = build_segmentor(small(True))
    v = init_segmentor_params(m0, (1, 64, 64, 14), train=True)
    x = jnp.asarray(np.random.RandomState(0).rand(2, 64, 64, 14),
                    jnp.float32)

    def loss(model, params):
        out, _ = model.apply(
            {"params": params, "batch_stats": v["batch_stats"]}, x,
            train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(0)})
        logits = out[0] if isinstance(out, tuple) else out
        return jnp.mean(jnp.abs(logits))

    l0, g0 = jax.value_and_grad(lambda p: loss(m0, p))(v["params"])
    l1, g1 = jax.value_and_grad(lambda p: loss(m1, p))(v["params"])
    assert np.isclose(float(l0), float(l1), atol=1e-6)
    diffs = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))), g0, g1)
    assert max(jax.tree_util.tree_leaves(diffs)) < 1e-5
