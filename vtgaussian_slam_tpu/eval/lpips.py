"""LPIPS (AlexNet backbone) in JAX — eval-only perceptual metric.

The reference scores LPIPS via torchmetrics' pretrained AlexNet
(/root/reference/utils/eval_helpers.py:20-27,455). This environment has no
network egress and ships no pretrained weights, so:

- the full architecture (AlexNet feature trunk + per-layer 1x1 linear heads,
  unit-normalized feature differences, spatial averaging — Zhang et al. 2018)
  is implemented here in JAX;
- weights load from an .npz whose arrays follow torch naming
  (`net.slice*.{idx}.weight/bias`, `lin{i}.model.1.weight`) via
  `load_lpips_weights(path)` or the `VTGS_LPIPS_WEIGHTS` env var;
- without weights, `lpips_fn()` falls back to DETERMINISTIC seeded
  (untrained) backbone weights with uniform per-channel lin heads —
  "random-feature LPIPS". Zhang et al. 2018 (Table 5) report that even
  untrained-network feature distances correlate meaningfully with human
  perceptual judgments, so the fallback is a usable relative metric for
  comparing runs of THIS framework — but its absolute values are NOT
  comparable to published (pretrained-AlexNet) LPIPS numbers. The returned
  callable carries `.source` ("file" | "untrained-fallback") and callers
  label the output accordingly. Set VTGS_LPIPS_FALLBACK=0 to restore the
  old return-None/NaN behavior.
"""
from __future__ import annotations

import os

import numpy as np

try:
    import jax
    import jax.numpy as jnp
except ImportError:  # pragma: no cover
    jax = None

# AlexNet feature trunk: (out_ch, kernel, stride, pad), with maxpool markers
_ALEX_CFG = [
    ("conv", 64, 11, 4, 2), ("relu",), ("pool",),
    ("conv", 192, 5, 1, 2), ("relu",), ("pool",),
    ("conv", 384, 3, 1, 1), ("relu",),
    ("conv", 256, 3, 1, 1), ("relu",),
    ("conv", 256, 3, 1, 1), ("relu",),
]
# features taken after each relu block boundary (5 scales)
_SLICE_ENDS = (2, 5, 8, 10, 12)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def load_lpips_weights(path: str | None = None) -> dict | None:
    path = path or os.environ.get("VTGS_LPIPS_WEIGHTS")
    if not path or not os.path.exists(path):
        return None
    data = np.load(path)
    return {k: np.asarray(data[k]) for k in data.files}


# (name, out_ch, in_ch, kernel) of the AlexNet conv stack, torch-named
_CONV_SHAPES = (
    ("net.slice1.0", 64, 3, 11), ("net.slice2.3", 192, 64, 5),
    ("net.slice3.6", 384, 192, 3), ("net.slice4.8", 256, 384, 3),
    ("net.slice5.10", 256, 256, 3),
)


def synthetic_lpips_weights(seed: int = 0) -> dict:
    """Deterministic untrained-backbone weights (module docstring): He-scaled
    conv filters, zero biases, uniform 1/C lin heads (the "baseline" uniform
    weighting of Zhang et al. over unit-normalized feature differences)."""
    rng = np.random.default_rng(seed)
    state = {}
    for name, out_c, in_c, k in _CONV_SHAPES:
        fan_in = in_c * k * k
        state[f"{name}.weight"] = (rng.standard_normal((out_c, in_c, k, k))
                                   * np.sqrt(2.0 / fan_in)).astype(np.float32)
        state[f"{name}.bias"] = np.zeros(out_c, np.float32)
    for i, (_, out_c, _, _) in enumerate(_CONV_SHAPES):
        state[f"lin{i}.model.1.weight"] = np.full(
            (1, out_c, 1, 1), 1.0 / out_c, np.float32)
    return state


def _conv(x, w, b, stride, pad):
    out = jax.lax.conv_general_dilated(
        x, jnp.asarray(w), (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return out + jnp.asarray(b)[None, :, None, None]


def _alexnet_features(x, params):
    """x (N,3,H,W) in [-1,1] -> list of 5 feature maps."""
    feats = []
    h = (x - jnp.asarray(_SHIFT)[None, :, None, None]) / \
        jnp.asarray(_SCALE)[None, :, None, None]
    conv_i = 0
    for li, layer in enumerate(_ALEX_CFG):
        if layer[0] == "conv":
            w = params[f"conv{conv_i}.weight"]
            b = params[f"conv{conv_i}.bias"]
            h = _conv(h, w, b, layer[3], layer[4])
            conv_i += 1
        elif layer[0] == "relu":
            h = jax.nn.relu(h)
        elif layer[0] == "pool":
            h = jax.lax.reduce_window(h, -jnp.inf, jax.lax.max,
                                      (1, 1, 3, 3), (1, 1, 2, 2), "VALID")
        if li + 1 in _SLICE_ENDS:
            feats.append(h)
    return feats


def _normalize(feat, eps=1e-10):
    n = jnp.sqrt(jnp.sum(feat * feat, axis=1, keepdims=True))
    return feat / (n + eps)


def lpips_fn(weights: dict | None = None):
    """Build `f(img0, img1) -> score` (with a `.source` attribute) or None.
    Images are (3, H, W) or (1, 3, H, W) in [0, 1] (normalize=True parity).

    Weight resolution order: explicit `weights` dict -> VTGS_LPIPS_WEIGHTS
    npz -> the untrained-fallback (module docstring; disable with
    VTGS_LPIPS_FALLBACK=0, which restores return-None/NaN)."""
    source = "file"
    if weights is None:
        weights = load_lpips_weights()
        if weights is None and os.environ.get(
                "VTGS_LPIPS_FALLBACK", "1") != "0":
            weights = synthetic_lpips_weights()
            source = "untrained-fallback"
    if weights is None or jax is None:
        return None

    # remap torch-style names (KeyError -> the documented return-None
    # degradation, not a crash: a weight key without its bias twin means a
    # filtered/partial conversion)
    params = {}
    conv_i = 0
    try:
        for k in sorted(weights):
            if ".weight" in k and k.startswith("net"):
                params[f"conv{conv_i}.weight"] = weights[k]
                params[f"conv{conv_i}.bias"] = \
                    weights[k.replace("weight", "bias")]
                conv_i += 1
    except KeyError:
        return None
    lins = [weights[k] for k in sorted(weights) if "lin" in k and "weight" in k]
    if conv_i != 5 or len(lins) != 5:
        # fall back to direct names conv0..4 / lin0..4
        try:
            params = {k: weights[k] for k in weights if k.startswith("conv")}
            lins = [weights[f"lin{i}.weight"] for i in range(5)]
        except KeyError:
            return None

    @jax.jit
    def f(img0, img1):
        x0 = jnp.asarray(img0, jnp.float32)
        x1 = jnp.asarray(img1, jnp.float32)
        if x0.ndim == 3:
            x0, x1 = x0[None], x1[None]
        x0 = 2 * x0 - 1
        x1 = 2 * x1 - 1
        f0 = _alexnet_features(x0, params)
        f1 = _alexnet_features(x1, params)
        total = 0.0
        for i, (a, b) in enumerate(zip(f0, f1)):
            d = (_normalize(a) - _normalize(b)) ** 2
            w = jnp.asarray(lins[i]).reshape(1, -1, 1, 1)
            total = total + jnp.mean(jnp.sum(d * w, axis=1))
        return total

    def score(a, b):
        return float(f(a, b))

    score.source = source
    return score
