"""SiftLikeDeviceGen: the on-device port must be deterministic, land on
the uint8 grid, and match the numpy generator's corpus statistics (same
generative process, different PRNG — ivfhnsw_tpu/utils/siftlike.py)."""

import numpy as np
import jax.random as jr

from ivfhnsw_tpu.utils.siftlike import SiftLikeCorpus, SiftLikeDeviceGen

N = 8192
NCLS = 4096
SIGMA = 0.75


def test_device_gen_grid_determinism_and_statistics():
    dev = SiftLikeDeviceGen(n_classes=NCLS, sigma=SIGMA, seed=0)
    b = np.asarray(dev.batch_device(jr.PRNGKey(7), N))

    # uint8 grid: integers in [0, 255] (SIFT descriptors are quantized
    # bytes; the drivers promote .bvecs to f32 the same way).
    assert b.shape == (N, 128)
    assert b.min() >= 0.0 and b.max() <= 255.0
    assert np.array_equal(b, np.floor(b))

    # Deterministic per key: resumed streaming builds regenerate
    # identical bytes.
    b2 = np.asarray(dev.batch_device(jr.PRNGKey(7), N))
    assert np.array_equal(b, b2)
    b3 = np.asarray(dev.batch_device(jr.PRNGKey(8), N))
    assert not np.array_equal(b, b3)

    # Corpus statistics match the numpy generator (same pipeline): zero
    # fraction (empty bins), mean L2 norm (the x512 scale), mean value.
    host = SiftLikeCorpus(n_classes=NCLS, sigma=SIGMA, seed=0)
    a = host.batch(N, seed=7)
    za, zb = (a == 0).mean(), (b == 0).mean()
    assert abs(za - zb) < 0.05, (za, zb)
    na, nb = (np.linalg.norm(a, axis=1).mean(),
              np.linalg.norm(b, axis=1).mean())
    assert abs(na - nb) / na < 0.03, (na, nb)
    ma, mb = a.mean(), b.mean()
    assert abs(ma - mb) / ma < 0.10, (ma, mb)


def test_device_gen_release_frees_tables():
    dev = SiftLikeDeviceGen(n_classes=256, sigma=SIGMA, seed=0)
    _ = dev.batch_device(jr.PRNGKey(0), 64)
    dev.release()
    assert dev._state["dom"] is None and dev._state["cell_log"] is None
