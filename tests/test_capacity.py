"""Geometric capacity ladder (models/gaussians.round_capacity).

The ladder exists to bound XLA shape diversity: every distinct capacity is
a fresh compile of the binning builders (~45-60 s each at the Replica
working set — see ROADMAP.md round-3 notes), so capacities must come from a
small shared set rather than stepping by one quantum."""
import numpy as np

from vtgaussian_slam_tpu.models.gaussians import (DEFAULT_CAPACITY_QUANTUM,
                                                  round_capacity)


class TestCapacityLadder:
    def test_covers_and_bounds_waste(self):
        q = DEFAULT_CAPACITY_QUANTUM
        for n in [1, q - 1, q, q + 1, 100_000, 816_000, 900_000, 2_000_000]:
            cap = round_capacity(n, q)
            assert cap >= n
            assert cap % q == 0
            # waste bounded by one geometric step plus quantum rounding
            assert cap <= max(q, int(n * 1.25) + q), (n, cap)

    def test_idempotent_and_monotone(self):
        q = 4096
        prev = 0
        ladder = set()
        for n in range(1, 300_000, 7919):
            cap = round_capacity(n, q)
            assert cap >= prev  # monotone in n
            assert round_capacity(cap, q) == cap  # ladder values are fixed
            prev = cap
            ladder.add(cap)
        # few distinct shapes across a 300k range (the whole point)
        assert len(ladder) <= 20, sorted(ladder)

    def test_budget_boost_scales_target(self):
        # closed-loop pair budget (core/pipeline.auto_pair_budget): the
        # boost multiplies the saturation-depth target, so a measured-
        # truncation doubling reaches a bucket the open-loop estimate
        # missed (the 120x160 sensor-scene death spiral, ROADMAP round 3)
        from vtgaussian_slam_tpu.core.pipeline import auto_pair_budget
        base = auto_pair_budget(19_000, 80, 2, 256)
        boosted = auto_pair_budget(19_000, 80, 2, 256, boost=8)
        assert base == 256          # the open-loop estimate that spiraled
        assert boosted >= 1024      # the measured-healthy budget
        # boost never exceeds the per-tile entry cap
        assert auto_pair_budget(10_000_000, 80, 3, 256, boost=64) <= 8192

    def test_shared_across_similar_sections(self):
        # sections seeded from similar views land on the SAME capacity, so
        # one compile serves all of them
        q = DEFAULT_CAPACITY_QUANTUM
        caps = {round_capacity(n, q)
                for n in np.random.default_rng(0).integers(
                    800_000, 980_000, 50)}
        assert len(caps) <= 2, caps


class TestConcatActive:
    def test_matches_slice_concat_and_pads_zero(self):
        """The stable-shape _concat_active (dynamic-offset DMA writes +
        tail mask) equals the naive active-prefix concatenate + zero pad,
        for 1-D and 2-D fields and for capacity above/below sum(caps)."""
        import jax.numpy as jnp
        import numpy as np

        from vtgaussian_slam_tpu.models.gaussians import _concat_active

        caps, sizes = [32, 48, 16], [20, 41, 9]
        parts = tuple(
            jnp.arange(c * 3, dtype=jnp.float32).reshape(c, 3) + 100 * i
            for i, c in enumerate(caps))
        want = np.concatenate(
            [np.asarray(p)[:s] for p, s in zip(parts, sizes)])
        for cap_out in (96, 128):
            got = np.asarray(_concat_active(
                parts, jnp.asarray(sizes, jnp.int32), cap_out))
            pad = np.zeros((cap_out - want.shape[0], 3), np.float32)
            np.testing.assert_array_equal(got, np.concatenate([want, pad]))
        got1 = np.asarray(_concat_active(
            tuple(p[:, 0] for p in parts), jnp.asarray(sizes, jnp.int32), 96))
        np.testing.assert_array_equal(
            got1, np.concatenate([want[:, 0], np.zeros(26, np.float32)]))
