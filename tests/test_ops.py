import numpy as np
import pytest

import jax.numpy as jnp

from s2r_tpu.ops.resize import resize_bilinear_align_corners

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


@pytest.mark.parametrize("in_hw,out_hw", [
    ((32, 32), (128, 128)),   # ASPP->decoder 4x upsample
    ((128, 128), (512, 512)),  # decoder->input 4x upsample
    ((1, 1), (32, 32)),        # ASPP GAP branch broadcast
    ((17, 23), (64, 48)),      # odd sizes
    ((64, 64), (33, 33)),      # downsample
    ((5, 5), (5, 5)),          # identity
])
def test_resize_matches_torch_align_corners(in_hw, out_hw):
    rng = np.random.RandomState(0)
    x = rng.randn(2, *in_hw, 3).astype(np.float32)
    ours = np.asarray(resize_bilinear_align_corners(jnp.asarray(x), out_hw))
    theirs = F.interpolate(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                           size=out_hw, mode="bilinear", align_corners=True)
    theirs = theirs.numpy().transpose(0, 2, 3, 1)
    # matmul-form interpolation reassociates float adds vs torch's gather
    # form; tolerate ~1e-4 absolute on O(1) inputs.
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


def test_resize_differentiable():
    import jax

    x = jnp.ones((1, 8, 8, 2))
    g = jax.grad(lambda v: resize_bilinear_align_corners(v, (16, 16)).sum())(x)
    # Sum-pooling adjoint: total mass preserved.
    assert np.isclose(float(g.sum()), 16 * 16 * 2, rtol=1e-5)
