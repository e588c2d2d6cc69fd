"""Model export CLI — the TPU-native analog of the reference's deployment
exporters (prediction/tools/pytorch2onnx.py, pytorch2torchscript.py,
onnx2tensorrt.py, torchserve/): serialize a compiled inference program to a
portable artifact.

On the JAX stack the portable interchange format is a serialized StableHLO
module (`jax.export`): shape- and weight-complete, loadable from any process
with `jax.export.deserialize` and runnable on any backend XLA supports —
covering the roles ONNX (interchange), TensorRT engines (ahead-of-time
compilation), and torchscript (self-contained program) play for the
reference.  For torch-ecosystem interchange of *weights*, see
`core/checkpoint.py export_encoder_decoder_to_torch` (.pth round-trip).

Usage:
  python -m peanut_tpu.cli.export CONFIG OUT.stablehlo \
      [--checkpoint ckpt.pth] [--shape 1 720 720 14] [--verify]
"""

from __future__ import annotations

import argparse

import numpy as np


def export_segmentor(config_path: str, out_path: str, shape, checkpoint=None,
                     verify: bool = False) -> str:
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from ..apis import init_segmentor

    bundle = init_segmentor(config_path, checkpoint=checkpoint,
                            input_size=shape[1])
    model, variables = bundle.model, bundle.variables

    def infer(x):
        return model.apply(variables, x, method=model.inference)

    spec = jax.ShapeDtypeStruct(tuple(shape), jnp.float32)
    exported = jexport.export(jax.jit(infer))(spec)
    blob = exported.serialize()
    with open(out_path, "wb") as f:
        f.write(blob)

    if verify:
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.rand(*shape).astype(np.float32))
        reloaded = jexport.deserialize(blob)
        np.testing.assert_allclose(np.asarray(reloaded.call(x)),
                                   np.asarray(infer(x)), rtol=1e-5, atol=1e-5)
    return out_path


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("config")
    p.add_argument("out")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--shape", type=int, nargs="+",
                   default=[1, 720, 720, 14])
    p.add_argument("--verify", action="store_true",
                   help="round-trip the artifact and compare outputs")
    args = p.parse_args(argv)
    path = export_segmentor(args.config, args.out, args.shape,
                            checkpoint=args.checkpoint, verify=args.verify)
    print(f"exported: {path}")


if __name__ == "__main__":
    main()
