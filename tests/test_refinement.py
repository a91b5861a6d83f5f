import numpy as np
import jax
import jax.numpy as jnp

from vtgaussian_slam_tpu.models import gaussians as G
from vtgaussian_slam_tpu.models.optimizer import adam_init
from vtgaussian_slam_tpu.models.refinement import (accumulate_mean2d_gradient,
                                                   densify_split_clone,
                                                   prune_gaussians)


def make_section(n=10, cap=64, opac_logits=None, scales=None):
    pts = jnp.arange(n * 3, dtype=jnp.float32).reshape(n, 3) / 10.0
    sec = G.init_section(pts, jnp.ones((n, 3)) * 0.5, jnp.full((n,), 0.01),
                         n, cap, 0.0, scene_radius=1.0)
    if opac_logits is not None:
        lo = sec.params.logit_opacities.at[:n, 0].set(opac_logits)
        sec = sec.replace(params=sec.params.replace(logit_opacities=lo))
    if scales is not None:
        ls = sec.params.log_scales.at[:n, 0].set(jnp.log(scales))
        sec = sec.replace(params=sec.params.replace(log_scales=ls))
    return sec


PRUNE = dict(start_after=0, remove_big_after=0, stop_after=20, prune_every=20,
             removal_opacity_threshold=0.005,
             final_removal_opacity_threshold=0.005,
             reset_opacities=False, reset_opacities_every=500)


class TestPrune:
    def test_low_opacity_removed(self):
        logits = jnp.array([-10.0] * 3 + [2.0] * 7)  # 3 near-zero opacity
        sec = make_section(opac_logits=logits)
        opt = adam_init(sec.params)
        out, opt2 = prune_gaussians(sec, opt, it=20, prune_dict=PRUNE)
        assert int(out.n_active) == 7
        # survivors keep their means, compacted to the front
        kept = np.asarray(out.params.means3d[:7])
        orig = np.asarray(sec.params.means3d[3:10])
        np.testing.assert_allclose(kept, orig)

    def test_big_gaussians_removed(self):
        scales = jnp.array([0.01] * 8 + [0.5, 0.9])  # 2 over 0.1*scene_radius
        sec = make_section(scales=scales)
        out, _ = prune_gaussians(sec, None, it=20, prune_dict=PRUNE)
        assert int(out.n_active) == 8

    def test_outside_schedule_noop(self):
        sec = make_section(opac_logits=jnp.full((10,), -10.0))
        out, _ = prune_gaussians(sec, None, it=7, prune_dict=PRUNE)
        assert int(out.n_active) == 10

    def test_opacity_reset(self):
        pd = dict(PRUNE, reset_opacities=True, reset_opacities_every=5,
                  prune_every=100)
        sec = make_section(opac_logits=jnp.full((10,), 3.0))
        out, _ = prune_gaussians(sec, None, it=5, prune_dict=pd)
        op = jax.nn.sigmoid(out.params.logit_opacities[:10, 0])
        np.testing.assert_allclose(np.asarray(op), 0.01, atol=1e-5)


DENSIFY = dict(start_after=0, remove_big_after=10000, stop_after=5000,
               densify_every=1, grad_thresh=0.1, num_to_split_into=2,
               removal_opacity_threshold=0.005,
               final_removal_opacity_threshold=0.005,
               reset_opacities_every=3000)


class TestDensify:
    def test_clone_small_high_grad(self):
        sec = make_section(scales=jnp.full((10,), 0.005))  # small
        v = sec.vars.replace(
            means2d_grad_accum=sec.vars.means2d_grad_accum.at[:3].set(1.0),
            denom=sec.vars.denom.at[:10].set(1.0))
        sec = sec.replace(vars=v)
        out, _ = densify_split_clone(sec, None, it=1, densify_dict=DENSIFY,
                                     rng=jax.random.PRNGKey(0))
        assert int(out.n_active) == 13  # 10 + 3 clones

    def test_split_large_high_grad(self):
        scales = jnp.array([0.05] * 2 + [0.001] * 8)  # 2 large (> 0.01*r)
        sec = make_section(scales=scales)
        v = sec.vars.replace(
            means2d_grad_accum=sec.vars.means2d_grad_accum.at[:2].set(1.0),
            denom=sec.vars.denom.at[:10].set(1.0))
        sec = sec.replace(vars=v)
        out, _ = densify_split_clone(sec, None, it=1, densify_dict=DENSIFY,
                                     rng=jax.random.PRNGKey(0))
        # 2 split into 2 each (+4), originals removed (-2): 12
        assert int(out.n_active) == 12
        # split children have shrunk scales: log(s) - log(1.6)
        ls = np.asarray(out.params.log_scales[:12, 0])
        assert (ls < np.log(0.05)).sum() >= 4

    def test_grad_stats_accumulate(self):
        sec = make_section()
        g = jnp.zeros((64, 3)).at[1, :2].set(jnp.array([3.0, 4.0]))
        seen = jnp.zeros((64,), bool).at[1].set(True)
        v = accumulate_mean2d_gradient(sec.vars, g, seen)
        assert float(v.means2d_grad_accum[1]) == 5.0
        assert float(v.denom[1]) == 1.0
