"""Zoo weight converters vs the flax init structures (model_converters
parity — reference prediction/tools/model_converters/)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from peanut_tpu.models.zoo_import import (convert_augreg_vit,
                                          convert_official_mit,
                                          convert_timm_vit)


def _flat_shapes(tree, prefix=()):
    out = {}
    for k, v in dict(tree).items():
        if hasattr(v, "items"):
            out.update(_flat_shapes(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = tuple(v.shape)
    return out


def _assert_same(converted_params, init_params):
    got = _flat_shapes(converted_params)
    want = _flat_shapes(init_params)
    missing = sorted(set(want) - set(got))
    extra = sorted(set(got) - set(want))
    assert not missing, f"missing {missing[:6]}"
    assert not extra, f"extra {extra[:6]}"
    bad = [(p, got[p], want[p]) for p in want if got[p] != want[p]]
    assert not bad, f"shape mismatch {bad[:6]}"


def timm_vit_manifest(d=8, depth=2, patch=16, img=224):
    sd = {}
    n = (img // patch) ** 2
    sd["cls_token"] = (1, 1, d)
    sd["pos_embed"] = (1, n + 1, d)
    sd["patch_embed.proj.weight"] = (d, 3, patch, patch)
    sd["patch_embed.proj.bias"] = (d,)
    for i in range(depth):
        t = f"blocks.{i}"
        sd[f"{t}.norm1.weight"] = (d,)
        sd[f"{t}.norm1.bias"] = (d,)
        sd[f"{t}.attn.qkv.weight"] = (3 * d, d)
        sd[f"{t}.attn.qkv.bias"] = (3 * d,)
        sd[f"{t}.attn.proj.weight"] = (d, d)
        sd[f"{t}.attn.proj.bias"] = (d,)
        sd[f"{t}.norm2.weight"] = (d,)
        sd[f"{t}.norm2.bias"] = (d,)
        sd[f"{t}.mlp.fc1.weight"] = (4 * d, d)
        sd[f"{t}.mlp.fc1.bias"] = (4 * d,)
        sd[f"{t}.mlp.fc2.weight"] = (d, 4 * d)
        sd[f"{t}.mlp.fc2.bias"] = (d,)
    sd["norm.weight"] = (d,)
    sd["norm.bias"] = (d,)
    return sd


def test_timm_vit_converter(rng):
    from peanut_tpu.models.vit import VisionTransformer

    d, depth = 8, 2
    sd = {k: rng.randn(*s).astype(np.float32)
          for k, s in timm_vit_manifest(d, depth).items()}
    converted, leftovers = convert_timm_vit(sd)
    # cls_token and the (unused) final norm are the only acceptable rest
    assert set(leftovers) <= {"cls_token", "norm.weight", "norm.bias"}

    model = VisionTransformer(embed_dim=d, depth=depth, num_heads=2,
                              out_indices=(0, 1))
    init = model.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 32, 32, 3), jnp.float32))
    _assert_same(converted["params"], init["params"])
    # value check through the qkv transpose
    np.testing.assert_allclose(
        converted["params"]["block0"]["attn"]["qkv"]["kernel"],
        sd["blocks.0.attn.qkv.weight"].T)


def mit_b0_manifest():
    dims = (32, 64, 160, 256)
    layers = (2, 2, 2, 2)
    sr = (8, 4, 2, 1)
    patch = (7, 3, 3, 3)
    sd = {}
    in_c = 3
    for i, (d, nl) in enumerate(zip(dims, layers), 1):
        sd[f"patch_embed{i}.proj.weight"] = (d, in_c, patch[i - 1],
                                             patch[i - 1])
        sd[f"patch_embed{i}.proj.bias"] = (d,)
        sd[f"patch_embed{i}.norm.weight"] = (d,)
        sd[f"patch_embed{i}.norm.bias"] = (d,)
        sd[f"norm{i}.weight"] = (d,)
        sd[f"norm{i}.bias"] = (d,)
        for j in range(nl):
            t = f"block{i}.{j}"
            for ln in ("norm1", "norm2"):
                sd[f"{t}.{ln}.weight"] = (d,)
                sd[f"{t}.{ln}.bias"] = (d,)
            sd[f"{t}.attn.q.weight"] = (d, d)
            sd[f"{t}.attn.q.bias"] = (d,)
            sd[f"{t}.attn.kv.weight"] = (2 * d, d)
            sd[f"{t}.attn.kv.bias"] = (2 * d,)
            sd[f"{t}.attn.proj.weight"] = (d, d)
            sd[f"{t}.attn.proj.bias"] = (d,)
            if sr[i - 1] > 1:
                sd[f"{t}.attn.sr.weight"] = (d, d, sr[i - 1], sr[i - 1])
                sd[f"{t}.attn.sr.bias"] = (d,)
                sd[f"{t}.attn.norm.weight"] = (d,)
                sd[f"{t}.attn.norm.bias"] = (d,)
            hidden = d * 4
            sd[f"{t}.mlp.fc1.weight"] = (hidden, d)
            sd[f"{t}.mlp.fc1.bias"] = (hidden,)
            sd[f"{t}.mlp.dwconv.dwconv.weight"] = (hidden, 1, 3, 3)
            sd[f"{t}.mlp.dwconv.dwconv.bias"] = (hidden,)
            sd[f"{t}.mlp.fc2.weight"] = (d, hidden)
            sd[f"{t}.mlp.fc2.bias"] = (d,)
        in_c = d
    return sd


@pytest.mark.slow
def test_official_mit_converter(rng):
    from peanut_tpu.models.mit import MITB0

    sd = {k: rng.randn(*s).astype(np.float32) * 0.05
          for k, s in mit_b0_manifest().items()}
    converted, leftovers = convert_official_mit(sd)
    assert not leftovers, leftovers[:8]

    model = MITB0()
    init = model.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 64, 64, 3), jnp.float32))
    _assert_same(converted["params"], init["params"])


def _official_swin_sd(rng, dim=8, heads=2, window=7):
    n_tbl = (2 * window - 1) ** 2
    return {
        "patch_embed.proj.weight":
            rng.randn(dim, 3, 4, 4).astype(np.float32),
        "patch_embed.proj.bias": rng.randn(dim).astype(np.float32),
        "patch_embed.norm.weight": rng.randn(dim).astype(np.float32),
        "patch_embed.norm.bias": rng.randn(dim).astype(np.float32),
        "layers.0.blocks.0.norm1.weight": rng.randn(dim).astype(np.float32),
        "layers.0.blocks.0.norm1.bias": rng.randn(dim).astype(np.float32),
        "layers.0.blocks.0.norm2.weight": rng.randn(dim).astype(np.float32),
        "layers.0.blocks.0.norm2.bias": rng.randn(dim).astype(np.float32),
        "layers.0.blocks.0.attn.qkv.weight":
            rng.randn(3 * dim, dim).astype(np.float32),
        "layers.0.blocks.0.attn.qkv.bias":
            rng.randn(3 * dim).astype(np.float32),
        "layers.0.blocks.0.attn.proj.weight":
            rng.randn(dim, dim).astype(np.float32),
        "layers.0.blocks.0.attn.proj.bias":
            rng.randn(dim).astype(np.float32),
        "layers.0.blocks.0.attn.relative_position_bias_table":
            (rng.randn(n_tbl, heads) * 0.5).astype(np.float32),
        "layers.0.blocks.0.attn.relative_position_index":
            np.zeros((window * window, window * window), np.int64),
        "layers.0.blocks.0.mlp.fc1.weight":
            rng.randn(4 * dim, dim).astype(np.float32),
        "layers.0.blocks.0.mlp.fc1.bias":
            rng.randn(4 * dim).astype(np.float32),
        "layers.0.blocks.0.mlp.fc2.weight":
            rng.randn(dim, 4 * dim).astype(np.float32),
        "layers.0.blocks.0.mlp.fc2.bias": rng.randn(dim).astype(np.float32),
    }


def test_official_swin_zero_leftovers(rng):
    """The converter consumes EVERY key: rel-pos bias tables and the
    patch-embed norm are mapped, index buffers are recomputed statically
    (round-2 caveat at zoo_import.py retired)."""
    from peanut_tpu.models.zoo_import import convert_official_swin

    sd = _official_swin_sd(rng)
    converted, leftovers = convert_official_swin(sd)
    assert leftovers == []
    p = converted["params"]
    assert "stage0_block0" in p
    assert p["stage0_block0"]["attn"]["rel_pos_bias_table"].shape == (169, 2)
    assert "patch_norm_ln" in p


def _merge(dst, src):
    for k, v in src.items():
        if isinstance(v, dict):
            _merge(dst[k], v)
        else:
            assert dst[k].shape == np.asarray(v).shape, \
                f"{k}: {dst[k].shape} vs {np.asarray(v).shape}"
            dst[k] = jnp.asarray(v)


def test_official_swin_roundtrip_forward(rng):
    """Converted params drop into SwinTransformer and the imported bias
    table actually changes the output (it is consumed, not dead)."""
    from peanut_tpu.models.vit import SwinTransformer
    from peanut_tpu.models.zoo_import import convert_official_swin

    model = SwinTransformer(embed_dim=8, depths=(1,), num_heads=(2,))
    x = jnp.asarray(rng.rand(1, 16, 16, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    params = jax.tree.map(np.asarray, variables["params"])

    sd = _official_swin_sd(rng)
    converted, leftovers = convert_official_swin(sd)
    assert leftovers == []
    _merge(params, converted["params"])
    out1 = model.apply({"params": params}, x)[0]

    sd2 = dict(sd)
    tbl = sd["layers.0.blocks.0.attn.relative_position_bias_table"]
    sd2["layers.0.blocks.0.attn.relative_position_bias_table"] = \
        (tbl + rng.randn(*tbl.shape)).astype(np.float32)
    converted2, _ = convert_official_swin(sd2)
    _merge(params, converted2["params"])
    out2 = model.apply({"params": params}, x)[0]
    assert np.abs(np.asarray(out1) - np.asarray(out2)).max() > 1e-4


def test_augreg_vit_converter(rng):
    d, heads, dh, depth = 8, 2, 4, 2
    npz = {
        "embedding/kernel": rng.randn(16, 16, 3, d).astype(np.float32),
        "embedding/bias": rng.randn(d).astype(np.float32),
        "Transformer/posembed_input/pos_embedding":
            rng.randn(1, 197, d).astype(np.float32),
    }
    for i in range(depth):
        t = f"Transformer/encoderblock_{i}"
        a = f"{t}/MultiHeadDotProductAttention_1"
        for nm in ("query", "key", "value"):
            npz[f"{a}/{nm}/kernel"] = rng.randn(d, heads, dh).astype(
                np.float32)
            npz[f"{a}/{nm}/bias"] = rng.randn(heads, dh).astype(np.float32)
        npz[f"{a}/out/kernel"] = rng.randn(heads, dh, d).astype(np.float32)
        npz[f"{a}/out/bias"] = rng.randn(d).astype(np.float32)
        for ln in ("LayerNorm_0", "LayerNorm_2"):
            npz[f"{t}/{ln}/scale"] = rng.randn(d).astype(np.float32)
            npz[f"{t}/{ln}/bias"] = rng.randn(d).astype(np.float32)
        npz[f"{t}/MlpBlock_3/Dense_0/kernel"] = rng.randn(d, 4 * d).astype(
            np.float32)
        npz[f"{t}/MlpBlock_3/Dense_0/bias"] = rng.randn(4 * d).astype(
            np.float32)
        npz[f"{t}/MlpBlock_3/Dense_1/kernel"] = rng.randn(4 * d, d).astype(
            np.float32)
        npz[f"{t}/MlpBlock_3/Dense_1/bias"] = rng.randn(d).astype(np.float32)

    converted, leftovers = convert_augreg_vit(npz)
    assert not leftovers
    from peanut_tpu.models.vit import VisionTransformer

    model = VisionTransformer(embed_dim=d, depth=depth, num_heads=heads,
                              out_indices=(0, 1))
    init = model.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 32, 32, 3), jnp.float32))
    _assert_same(converted["params"], init["params"])


def test_dataset_remap_cli(tmp_path, rng):
    import cv2
    import json
    from peanut_tpu.cli import convert as convert_cli

    src = tmp_path / "in"
    dst = tmp_path / "out"
    src.mkdir()
    ann = (rng.rand(16, 16) * 4).astype(np.uint8)
    cv2.imwrite(str(src / "a.png"), ann)
    table = {"0": 10, "1": 11, "2": 12, "3": 13}
    tp = tmp_path / "t.json"
    tp.write_text(json.dumps(table))
    convert_cli.main(["dataset", "remap", str(src), str(dst),
                      "--table", str(tp)])
    out = cv2.imread(str(dst / "a.png"), cv2.IMREAD_UNCHANGED)
    np.testing.assert_array_equal(out, ann + 10)


def convnext_tiny_manifest():
    """mmcls ConvNeXt-tiny key set (reference configs' pretrained format)."""
    depths, dims = (3, 3, 9, 3), (96, 192, 384, 768)
    sd = {}
    in_c = 3
    for i, (nd, d) in enumerate(zip(depths, dims)):
        t = f"backbone.downsample_layers.{i}"
        k = 4 if i == 0 else 2
        conv_idx, norm_idx = (0, 1) if i == 0 else (1, 0)
        sd[f"{t}.{conv_idx}.weight"] = (d, in_c, k, k)
        sd[f"{t}.{conv_idx}.bias"] = (d,)
        sd[f"{t}.{norm_idx}.weight"] = (in_c if i else d,) if i else (d,)
        sd[f"{t}.{norm_idx}.bias"] = sd[f"{t}.{norm_idx}.weight"]
        for j in range(nd):
            t2 = f"backbone.stages.{i}.{j}"
            sd[f"{t2}.depthwise_conv.weight"] = (d, 1, 7, 7)
            sd[f"{t2}.depthwise_conv.bias"] = (d,)
            sd[f"{t2}.norm.weight"] = (d,)
            sd[f"{t2}.norm.bias"] = (d,)
            sd[f"{t2}.pointwise_conv1.weight"] = (4 * d, d)
            sd[f"{t2}.pointwise_conv1.bias"] = (4 * d,)
            sd[f"{t2}.pointwise_conv2.weight"] = (d, 4 * d)
            sd[f"{t2}.pointwise_conv2.bias"] = (d,)
            sd[f"{t2}.gamma"] = (d,)
        sd[f"backbone.norm{i}.weight"] = (d,)
        sd[f"backbone.norm{i}.bias"] = (d,)
        in_c = d
    return sd


@pytest.mark.slow
def test_mmcls_convnext_converter(rng):
    from peanut_tpu.models.convnext import ConvNeXt
    from peanut_tpu.models.zoo_import import convert_mmcls_convnext

    manifest = convnext_tiny_manifest()
    sd = {k: rng.randn(*s).astype(np.float32) * 0.05
          for k, s in manifest.items()}
    converted, leftovers = convert_mmcls_convnext(sd)
    assert not leftovers, leftovers[:8]

    model = ConvNeXt(arch="tiny")
    init = model.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 64, 64, 3), jnp.float32))
    _assert_same(converted["params"], init["params"])


@pytest.mark.slow
def test_convnext_forward_shapes(rng):
    from peanut_tpu.models.convnext import ConvNeXt

    model = ConvNeXt(arch="tiny")
    x = jnp.asarray(rng.rand(1, 64, 96, 3).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x)
    outs = model.apply(params, x)
    assert [o.shape for o in outs] == [
        (1, 16, 24, 96), (1, 8, 12, 192), (1, 4, 6, 384), (1, 2, 3, 768)]


def test_dataset_binarize_cli(tmp_path, rng):
    import cv2
    from peanut_tpu.cli import convert as convert_cli

    src = tmp_path / "ann"
    dst = tmp_path / "out"
    src.mkdir()
    ann = (rng.rand(20, 20) * 255).astype(np.uint8)
    cv2.imwrite(str(src / "v.png"), ann)
    convert_cli.main(["dataset", "binarize", str(src), str(dst)])
    out = cv2.imread(str(dst / "v.png"), cv2.IMREAD_UNCHANGED)
    np.testing.assert_array_equal(out, (ann >= 128).astype(np.uint8))


def np_swin_block_oracle(x, p, ws, shift, heads):
    """Independent numpy WindowMSA + shifted-window oracle (official Swin
    forward semantics: LN -> pad -> roll -> window attention with rel-pos
    bias + seam mask -> reverse -> residual -> LN -> MLP(GELU exact))."""
    from math import erf

    from peanut_tpu.models.vit import _rel_pos_index

    def ln(t, prm):
        mu = t.mean(-1, keepdims=True)
        v = ((t - mu) ** 2).mean(-1, keepdims=True)
        return (t - mu) / np.sqrt(v + 1e-6) * prm["scale"] + prm["bias"]

    def softmax(a):
        a = a - a.max(-1, keepdims=True)
        e = np.exp(a)
        return e / e.sum(-1, keepdims=True)

    gelu = np.vectorize(lambda t: 0.5 * t * (1.0 + erf(t / np.sqrt(2.0))))

    b, h, w, c = x.shape
    assert b == 1
    y = ln(x, p["norm1"])
    ph, pw = (-h) % ws, (-w) % ws
    y = np.pad(y, ((0, 0), (0, ph), (0, pw), (0, 0)))
    hp, wp = y.shape[1:3]
    region = np.zeros((hp, wp))
    if shift:
        y = np.roll(y, (-shift, -shift), axis=(1, 2))
        cnt = 0
        for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            for vs in (slice(0, -ws), slice(-ws, -shift),
                       slice(-shift, None)):
                region[hs, vs] = cnt
                cnt += 1

    table = p["attn"]["rel_pos_bias_table"]
    idx = _rel_pos_index(ws)
    rel = table[idx.reshape(-1)].reshape(ws * ws, ws * ws,
                                         heads).transpose(2, 0, 1)
    qkvk, qkvb = p["attn"]["qkv"]["kernel"], p["attn"]["qkv"]["bias"]
    projk, projb = p["attn"]["proj"]["kernel"], p["attn"]["proj"]["bias"]
    hd = c // heads
    out_img = np.zeros_like(y)
    for wy in range(hp // ws):
        for wx in range(wp // ws):
            sl = (slice(wy * ws, (wy + 1) * ws), slice(wx * ws,
                                                       (wx + 1) * ws))
            win = y[0][sl].reshape(ws * ws, c)
            reg = region[sl].reshape(-1)
            qkv = win @ qkvk + qkvb
            q, k, v = np.split(qkv, 3, axis=-1)
            ow = np.zeros((ws * ws, c), np.float64)
            for hh in range(heads):
                s = slice(hh * hd, (hh + 1) * hd)
                a = q[:, s] @ k[:, s].T / np.sqrt(hd) + rel[hh]
                if shift:
                    a = a + np.where(reg[None, :] != reg[:, None],
                                     -100.0, 0.0)
                ow[:, s] = softmax(a) @ v[:, s]
            out_img[0][sl] = (ow @ projk + projb).reshape(ws, ws, c)
    if shift:
        out_img = np.roll(out_img, (shift, shift), axis=(1, 2))
    y2 = x + out_img[:, :h, :w]
    z = ln(y2, p["norm2"])
    hmid = gelu(z @ p["mlp"]["fc1"]["kernel"] + p["mlp"]["fc1"]["bias"])
    return y2 + hmid @ p["mlp"]["fc2"]["kernel"] + p["mlp"]["fc2"]["bias"]


@pytest.mark.parametrize("shift", [0, 2])
def test_swin_block_matches_numpy_oracle(rng, shift):
    """SwinBlock (rel-pos bias + shifted-window seam mask) vs an
    independent numpy oracle of the official forward (VERDICT r2 item 3)."""
    from peanut_tpu.models.vit import SwinBlock

    dim, heads, ws = 8, 2, 4
    block = SwinBlock(dim, heads, window=ws, shift=shift)
    x = rng.rand(1, 6, 6, dim).astype(np.float32)
    variables = block.init(jax.random.PRNGKey(1), jnp.asarray(x))
    p = jax.tree.map(np.asarray, variables["params"])
    p["attn"]["rel_pos_bias_table"] = (
        rng.randn(*p["attn"]["rel_pos_bias_table"].shape) * 0.3
    ).astype(np.float32)
    got = np.asarray(block.apply({"params": p}, jnp.asarray(x)))
    want = np_swin_block_oracle(x.astype(np.float64), p, ws, shift, heads)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# Round-3: the remaining reference converters (beit/stdc/twins2mmseg)
# ---------------------------------------------------------------------------

def _rand_sd(shapes, rng):
    return {k: (rng.randn(*s) * 0.05).astype(np.float32)
            if s else np.zeros((), np.float32)
            for k, s in shapes.items()}


def test_official_beit_converter(rng):
    from peanut_tpu.models.backbones_zoo import BEiT
    from peanut_tpu.models.zoo_import import convert_official_beit

    d, heads, depth, patch, img = 8, 2, 2, 4, 16
    g = img // patch
    shapes = {"patch_embed.proj.weight": (d, 3, patch, patch),
              "patch_embed.proj.bias": (d,),
              "cls_token": (1, 1, d)}
    for i in range(depth):
        t = f"blocks.{i}"
        shapes.update({
            f"{t}.norm1.weight": (d,), f"{t}.norm1.bias": (d,),
            f"{t}.norm2.weight": (d,), f"{t}.norm2.bias": (d,),
            f"{t}.attn.qkv.weight": (3 * d, d),
            f"{t}.attn.q_bias": (d,), f"{t}.attn.v_bias": (d,),
            f"{t}.attn.proj.weight": (d, d), f"{t}.attn.proj.bias": (d,),
            f"{t}.mlp.fc1.weight": (4 * d, d), f"{t}.mlp.fc1.bias": (4 * d,),
            f"{t}.mlp.fc2.weight": (d, 4 * d), f"{t}.mlp.fc2.bias": (d,),
            f"{t}.gamma_1": (d,), f"{t}.gamma_2": (d,),
            f"{t}.attn.relative_position_bias_table":
                ((2 * g - 1) ** 2 + 3, heads),
            f"{t}.attn.relative_position_index":
                (g * g + 1, g * g + 1)})
    sd = _rand_sd(shapes, rng)
    converted, leftovers = convert_official_beit(sd)
    assert leftovers == ["cls_token"], leftovers

    model = BEiT(embed_dim=d, depth=depth, num_heads=heads,
                 patch_size=patch, out_indices=(0, 1))
    init = model.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, img, img, 3), jnp.float32))
    _assert_same(converted["params"], init["params"])
    # qkv bias layout: q_bias ++ zeros ++ v_bias
    b = converted["params"]["block0"]["qkv"]["bias"]
    np.testing.assert_array_equal(b[:d], sd["blocks.0.attn.q_bias"])
    np.testing.assert_array_equal(b[d:2 * d], np.zeros(d, np.float32))
    np.testing.assert_array_equal(b[2 * d:], sd["blocks.0.attn.v_bias"])
    # forward runs with the converted tree
    out = model.apply(converted, jnp.zeros((1, img, img, 3), jnp.float32))
    assert out[0].shape[-1] == d


def _official_stdc_sd_shapes(channels=(8, 8, 16, 32, 64), stdc1=True,
                             num_convs=4):
    shapes = {}
    for n in (0, 1):
        cin = 3 if n == 0 else channels[0]
        shapes[f"features.{n}.conv.weight"] = (channels[n], cin, 3, 3)
        for s in ("weight", "bias", "running_mean", "running_var"):
            shapes[f"features.{n}.bn.{s}"] = (channels[n],)
    counts = (2, 2, 2) if stdc1 else (4, 5, 3)
    n = 2
    for s, cnt in enumerate(counts):
        out = channels[s + 2]
        for j in range(cnt):
            cin = channels[s + 1] if j == 0 else out
            t = f"features.{n}"
            # conv_list widths: out/2, out/4, out/8, ..., last repeats
            widths = [out // 2]
            for i in range(1, num_convs):
                f = 2 ** (i + 1) if i != num_convs - 1 else 2 ** i
                widths.append(out // f)
            prev = cin
            for m, wdt in enumerate(widths):
                k = 1 if m == 0 else 3
                shapes[f"{t}.conv_list.{m}.conv.weight"] = (wdt, prev, k, k)
                for sfx in ("weight", "bias", "running_mean", "running_var"):
                    shapes[f"{t}.conv_list.{m}.bn.{sfx}"] = (wdt,)
                prev = wdt
            if j == 0:  # stride-2: depthwise avd_layer
                shapes[f"{t}.avd_layer.0.weight"] = (out // 2, 1, 3, 3)
                for sfx in ("weight", "bias", "running_mean", "running_var"):
                    shapes[f"{t}.avd_layer.1.{sfx}"] = (out // 2,)
            n += 1
    return shapes


def test_official_stdc_converter(rng):
    from peanut_tpu.models.backbones_zoo import STDCNet
    from peanut_tpu.models.zoo_import import convert_official_stdc

    channels = (8, 8, 16, 32, 64)
    sd = _rand_sd(_official_stdc_sd_shapes(channels), rng)
    sd["fc.weight"] = np.zeros((10, 64), np.float32)  # classifier leftover
    # make BN vars positive
    for k in sd:
        if k.endswith("running_var"):
            sd[k] = np.abs(sd[k]) + 1.0
    converted, leftovers = convert_official_stdc(sd, "STDCNet1")
    assert leftovers == ["fc.weight"], leftovers

    model = STDCNet(channels=channels)
    init = model.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 64, 64, 3), jnp.float32))
    _assert_same(converted["params"], init["params"])
    _assert_same(converted["batch_stats"], init["batch_stats"])
    outs = model.apply(converted, jnp.zeros((1, 64, 64, 3), jnp.float32))
    assert len(outs) == 5


def test_official_twins_converter(rng):
    from peanut_tpu.models.backbones_zoo import PCPVT
    from peanut_tpu.models.zoo_import import convert_official_twins

    dims, heads, depths, srs, mlps = (8, 16), (2, 2), (1, 2), (2, 1), (2, 2)
    shapes = {"norm.weight": (dims[-1],), "norm.bias": (dims[-1],),
              "head.weight": (10, dims[-1])}
    for s, d in enumerate(dims):
        patch = 4 if s == 0 else 2
        cin = 3 if s == 0 else dims[s - 1]
        shapes.update({
            f"patch_embeds.{s}.proj.weight": (d, cin, patch, patch),
            f"patch_embeds.{s}.proj.bias": (d,),
            f"patch_embeds.{s}.norm.weight": (d,),
            f"patch_embeds.{s}.norm.bias": (d,),
            f"pos_block.{s}.proj.0.weight": (d, 1, 3, 3),
            f"pos_block.{s}.proj.0.bias": (d,)})
        for j in range(depths[s]):
            t = f"blocks.{s}.{j}"
            shapes.update({
                f"{t}.norm1.weight": (d,), f"{t}.norm1.bias": (d,),
                f"{t}.norm2.weight": (d,), f"{t}.norm2.bias": (d,),
                f"{t}.attn.q.weight": (d, d), f"{t}.attn.q.bias": (d,),
                f"{t}.attn.kv.weight": (2 * d, d),
                f"{t}.attn.kv.bias": (2 * d,),
                f"{t}.attn.proj.weight": (d, d),
                f"{t}.attn.proj.bias": (d,),
                f"{t}.mlp.fc1.weight": (mlps[s] * d, d),
                f"{t}.mlp.fc1.bias": (mlps[s] * d,),
                f"{t}.mlp.fc2.weight": (d, mlps[s] * d),
                f"{t}.mlp.fc2.bias": (d,)})
            if srs[s] > 1:
                shapes.update({
                    f"{t}.attn.sr.weight": (d, d, srs[s], srs[s]),
                    f"{t}.attn.sr.bias": (d,),
                    f"{t}.attn.norm.weight": (d,),
                    f"{t}.attn.norm.bias": (d,)})
    sd = _rand_sd(shapes, rng)
    converted, leftovers = convert_official_twins(sd)
    assert sorted(leftovers) == ["norm.bias", "norm.weight"], leftovers

    model = PCPVT(embed_dims=dims, num_heads=heads, depths=depths,
                  sr_ratios=srs, mlp_ratios=mlps, out_indices=(0, 1))
    init = model.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 32, 32, 3), jnp.float32))
    # official twins has no per-stage out norms; those stay at init
    got = _flat_shapes(converted["params"])
    want = _flat_shapes(init["params"])
    extra = sorted(set(got) - set(want))
    assert not extra, extra[:6]
    missing = sorted(set(want) - set(got))
    assert all(p[0].startswith("out_norm") for p in missing), missing[:6]
    bad = [(p, got[p], want[p]) for p in got if got[p] != want[p]]
    assert not bad, bad[:6]


def test_official_twins_svt_lsa_branch(rng):
    """SVT: even blocks are locally-grouped attention with a fused qkv in
    the official checkpoint — exercises the converter's LSA branch."""
    from peanut_tpu.models.backbones_zoo import PCPVT
    from peanut_tpu.models.zoo_import import convert_official_twins

    d = 8
    shapes = {
        "patch_embeds.0.proj.weight": (d, 3, 4, 4),
        "patch_embeds.0.proj.bias": (d,),
        "patch_embeds.0.norm.weight": (d,), "patch_embeds.0.norm.bias": (d,),
        "pos_block.0.proj.0.weight": (d, 1, 3, 3),
        "pos_block.0.proj.0.bias": (d,)}
    for j, lsa in ((0, True), (1, False)):  # even LSA, odd GSA (sr=1)
        t = f"blocks.0.{j}"
        shapes.update({
            f"{t}.norm1.weight": (d,), f"{t}.norm1.bias": (d,),
            f"{t}.norm2.weight": (d,), f"{t}.norm2.bias": (d,),
            f"{t}.attn.proj.weight": (d, d), f"{t}.attn.proj.bias": (d,),
            f"{t}.mlp.fc1.weight": (2 * d, d), f"{t}.mlp.fc1.bias": (2 * d,),
            f"{t}.mlp.fc2.weight": (d, 2 * d), f"{t}.mlp.fc2.bias": (d,)})
        if lsa:
            shapes.update({f"{t}.attn.qkv.weight": (3 * d, d),
                           f"{t}.attn.qkv.bias": (3 * d,)})
        else:
            shapes.update({f"{t}.attn.q.weight": (d, d),
                           f"{t}.attn.q.bias": (d,),
                           f"{t}.attn.kv.weight": (2 * d, d),
                           f"{t}.attn.kv.bias": (2 * d,)})
    converted, leftovers = convert_official_twins(_rand_sd(shapes, rng))
    assert leftovers == [], leftovers

    model = PCPVT(embed_dims=(d,), num_heads=(2,), depths=(2,),
                  sr_ratios=(1,), mlp_ratios=(2,), windows=(3,),
                  out_indices=(0,))
    init = model.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 16, 16, 3), jnp.float32))
    got = _flat_shapes(converted["params"])
    want = _flat_shapes(init["params"])
    assert not sorted(set(got) - set(want))
    missing = sorted(set(want) - set(got))
    assert all(p[0].startswith("out_norm") for p in missing), missing[:6]
