"""Generate the Mask R-CNN end-to-end golden fixture.

Runs detect() on a fixed synthetic scene with PRNGKey(0)-seeded weights on
CPU (highest matmul precision — the test environment's configuration) and
commits the expected boxes/scores/classes/masks as a regression anchor
(tests/test_mask_rcnn.py::test_detect_golden_regression).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from peanut_tpu.models.mask_rcnn import MaskRCNN  # noqa: E402


def synthetic_scene(h=128, w=160):
    """Structured scene: gradient background + two bright blobs."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.stack([xx / w * 60, yy / h * 60, (xx + yy) / (h + w) * 60], -1)
    img[30:70, 20:60] += np.array([80.0, -20.0, 30.0])
    img[60:110, 90:140] += np.array([-30.0, 70.0, 40.0])
    return img


def main():
    model = MaskRCNN(num_classes=9, depth=50, score_thresh=0.05)
    img = jnp.asarray(synthetic_scene())
    variables = jax.jit(
        lambda r, x: model.init(r, x, method=model.detect))(
        jax.random.PRNGKey(0), img)
    out = jax.jit(lambda v, x: model.apply(v, x, method=model.detect))(
        variables, img)
    out = {k: np.asarray(v) for k, v in out.items()}
    finite = np.isfinite(out["scores"])
    print("finite detections:", int(finite.sum()))
    print("top scores:", out["scores"][finite][:5])
    np.savez_compressed(
        os.path.join(os.path.dirname(__file__), os.pardir, "tests", "data",
                     "mask_rcnn_golden.npz"),
        boxes=out["boxes"], scores=out["scores"],
        classes=out["classes"], masks=out["masks"])


if __name__ == "__main__":
    main()
