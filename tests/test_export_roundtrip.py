"""flax -> .pth -> flax roundtrip through the export + import converters."""

import numpy as np
import pytest

import jax

torch = pytest.importorskip("torch")

from peanut_tpu.core.checkpoint import (  # noqa: E402
    export_encoder_decoder_to_torch,
    load_torch_state_dict,
    convert_encoder_decoder_state,
)
from peanut_tpu.models import build_segmentor, init_segmentor_params  # noqa

from test_models import small_pspnet_config  # noqa: E402


def test_pth_export_import_roundtrip(tmp_path):
    model = build_segmentor(small_pspnet_config(16))
    variables = init_segmentor_params(model, (1, 32, 32, 14))

    path = str(tmp_path / "exported.pth")
    names = export_encoder_decoder_to_torch(variables, path)
    assert any(n.startswith("backbone.stem.0") for n in names)
    assert "decode_head.conv_seg.weight" in names

    sd = load_torch_state_dict(path)
    back = convert_encoder_decoder_state(sd)

    flat_a = dict(jax.tree_util.tree_flatten_with_path(variables)[0])
    flat_b = dict(jax.tree_util.tree_flatten_with_path(back)[0])
    assert set(flat_a) == set(flat_b)
    for k in flat_a:
        np.testing.assert_allclose(np.asarray(flat_a[k]),
                                   np.asarray(flat_b[k]), rtol=1e-6,
                                   err_msg=str(k))


@pytest.mark.slow
def test_stablehlo_export_roundtrip(tmp_path):
    """AOT export (cli/export.py): serialize the compiled inference program
    and verify the deserialized artifact reproduces the outputs."""
    from peanut_tpu.cli.export import export_segmentor

    out = str(tmp_path / "unet.stablehlo")
    path = export_segmentor("configs/unet/fcn_unet.py", out,
                            shape=(1, 64, 64, 3), verify=True)
    import os
    assert os.path.getsize(path) > 1000
