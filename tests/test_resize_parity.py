"""Antialiased-resize parity vs the reference's torch formula.

The reference preprocesses CLIP inputs with a Gaussian prefilter + bicubic
interpolate (`_resize_with_antialiasing`, pipeline_evoworld.py:746-850). The
test re-derives that computation with torch inline (sigma = max((f-1)/2,
1e-3), ksize ~ 4*sigma odd, reflect pad, align_corners=True bicubic) and
checks our `ops.resize.resize_antialiased` against it."""

import numpy as np
import pytest
import jax.numpy as jnp

from evoworld_tpu.ops.resize import gaussian_blur2d, resize_antialiased


def _torch_reference_resize(x_nchw, size):
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    x = torch.tensor(x_nchw)
    h, w = x.shape[-2:]
    factors = (h / size[0], w / size[1])
    sigmas = (max((factors[0] - 1.0) / 2.0, 0.001), max((factors[1] - 1.0) / 2.0, 0.001))
    ks = int(max(2.0 * 2 * sigmas[0], 3)), int(max(2.0 * 2 * sigmas[1], 3))
    ks = (ks[0] + 1 - ks[0] % 2, ks[1] + 1 - ks[1] % 2)

    def gaussian(n, sigma):
        xs = torch.arange(n, dtype=torch.float64) - n // 2
        g = torch.exp(-xs.pow(2) / (2 * sigma**2))
        return (g / g.sum()).to(torch.float32)

    ky = gaussian(ks[0], sigmas[0])
    kx = gaussian(ks[1], sigmas[1])
    c = x.shape[1]
    pad_x = (ks[1] // 2, ks[1] - 1 - ks[1] // 2)
    pad_y = (ks[0] // 2, ks[0] - 1 - ks[0] // 2)
    x = F.pad(x, (pad_x[0], pad_x[1], 0, 0), mode="reflect")
    x = F.conv2d(x, kx.view(1, 1, 1, -1).expand(c, 1, 1, -1), groups=c)
    x = F.pad(x, (0, 0, pad_y[0], pad_y[1]), mode="reflect")
    x = F.conv2d(x, ky.view(1, 1, -1, 1).expand(c, 1, -1, 1), groups=c)
    out = F.interpolate(x, size=size, mode="bicubic", align_corners=True)
    return out.numpy()


class TestResizeParity:
    def test_blur_matches_torch(self):
        torch = pytest.importorskip("torch")
        import torch.nn.functional as F

        rng = np.random.default_rng(0)
        img = rng.uniform(size=(1, 3, 48, 64)).astype(np.float32)
        # Our blur (NHWC).
        ours = np.asarray(
            gaussian_blur2d(jnp.asarray(img.transpose(0, 2, 3, 1)), (5, 5), (1.2, 1.2))
        ).transpose(0, 3, 1, 2)

        xs = torch.arange(5, dtype=torch.float64) - 2
        g = torch.exp(-xs.pow(2) / (2 * 1.2**2))
        g = (g / g.sum()).to(torch.float32)
        x = torch.tensor(img)
        x = F.pad(x, (2, 2, 0, 0), mode="reflect")
        x = F.conv2d(x, g.view(1, 1, 1, -1).expand(3, 1, 1, -1), groups=3)
        x = F.pad(x, (0, 0, 2, 2), mode="reflect")
        want = F.conv2d(x, g.view(1, 1, -1, 1).expand(3, 1, -1, 1), groups=3).numpy()
        np.testing.assert_allclose(ours, want, atol=1e-5)

    def test_resize_close_to_torch_reference(self):
        rng = np.random.default_rng(1)
        img = rng.uniform(size=(1, 3, 256, 512)).astype(np.float32)
        want = _torch_reference_resize(img, (224, 224))
        got = np.asarray(resize_antialiased(jnp.asarray(img.transpose(0, 2, 3, 1)), (224, 224)))
        got = got.transpose(0, 3, 1, 2)
        diff = np.abs(got - want)
        assert diff.max() < 1e-4, diff.max()
