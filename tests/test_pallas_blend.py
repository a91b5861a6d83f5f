"""Pallas blend kernel vs the XLA chunked blend (interpret mode on CPU)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vtgaussian_slam_tpu.ops.rasterizer.blend import blend_chunk, gaussian_alpha
from vtgaussian_slam_tpu.ops.rasterizer.pallas_blend import (RECW, TPX,
                                                             blend_tiles)

TILES_X = 3
N_TILES = 6
MPT = 64
CHUNK = 32
C = 8


def make_records(seed=0, dense=True):
    """Random per-tile records + counts."""
    rng = np.random.default_rng(seed)
    recs = np.zeros((N_TILES, MPT, RECW), np.float32)
    counts = rng.integers(5, MPT if dense else 20, size=(N_TILES,)).astype(
        np.int32)
    for t in range(N_TILES):
        ty, tx = divmod(t, TILES_X)
        n = counts[t]
        recs[t, :n, 0] = tx * 16 + rng.uniform(-2, 18, n)      # mean2d.x
        recs[t, :n, 1] = ty * 16 + rng.uniform(-2, 18, n)      # mean2d.y
        a = rng.uniform(0.05, 0.5, n)
        cband = rng.uniform(0.05, 0.5, n)
        b = rng.uniform(-0.1, 0.1, n) * np.sqrt(a * cband)
        recs[t, :n, 2] = a
        recs[t, :n, 3] = b
        recs[t, :n, 4] = cband
        recs[t, :n, 5] = rng.uniform(0.1, 0.95, n)             # opacity
        recs[t, :n, 6:6 + C] = rng.uniform(0, 1, (n, C))
    return jnp.asarray(recs), jnp.asarray(counts)


def xla_reference(recs, counts):
    """Same math via the XLA blend used by render_tiled."""
    out = []
    for t in range(N_TILES):
        ty, tx = divmod(t, TILES_X)
        ly, lx = np.meshgrid(np.arange(16), np.arange(16), indexing="ij")
        pix = jnp.asarray(
            np.stack([tx * 16 + lx.ravel(), ty * 16 + ly.ravel()], -1),
            jnp.float32)
        T = jnp.ones((TPX,))
        accum = jnp.zeros((TPX, C))
        for c0 in range(0, MPT, CHUNK):
            rec = recs[t, c0:c0 + CHUNK]
            valid = (jnp.arange(c0, c0 + CHUNK) < counts[t])
            alpha = gaussian_alpha(rec[:, :2], rec[:, 2:5], rec[:, 5], pix,
                                   valid)
            T, accum = blend_chunk(T, accum, alpha, rec[:, 6:6 + C])
        out.append(accum)
    return jnp.stack(out)


class TestPallasBlendInterpret:
    def test_forward_matches_xla(self):
        recs, counts = make_records()
        ref = xla_reference(recs, counts)
        out = blend_tiles(recs.transpose(0, 2, 1), counts, TILES_X, CHUNK,
                          C, True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5)

    def test_forward_sparse_counts(self):
        recs, counts = make_records(seed=3, dense=False)
        ref = xla_reference(recs, counts)
        out = blend_tiles(recs.transpose(0, 2, 1), counts, TILES_X, CHUNK,
                          C, True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5)

    def test_backward_matches_xla(self):
        recs, counts = make_records(seed=1)
        target = jax.random.uniform(jax.random.PRNGKey(5), (N_TILES, TPX, C))

        def loss_pallas(r):
            out = blend_tiles(r.transpose(0, 2, 1), counts, TILES_X, CHUNK,
                              C, True)
            return jnp.sum((out - target) ** 2)

        def loss_xla(r):
            return jnp.sum((xla_reference(r, counts) - target) ** 2)

        g_p = jax.grad(loss_pallas)(recs)
        g_x = jax.grad(loss_xla)(recs)
        np.testing.assert_allclose(np.asarray(g_p[..., :6 + C]),
                                   np.asarray(g_x[..., :6 + C]),
                                   atol=2e-3, rtol=1e-3)

    def test_early_termination_correct(self):
        """Opaque front chunk: later records must not contribute."""
        recs, counts = make_records(seed=2)
        # make the first CHUNK records fully opaque over the whole tile
        recs = recs.at[:, :CHUNK, 5].set(0.95)
        recs = recs.at[:, :CHUNK, 2].set(0.001)
        recs = recs.at[:, :CHUNK, 4].set(0.001)
        recs = recs.at[:, :CHUNK, 3].set(0.0)
        ref = xla_reference(recs, counts)
        out = blend_tiles(recs.transpose(0, 2, 1), counts, TILES_X, CHUNK,
                          C, True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
