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
- without weights, `lpips_fn()` returns None and the eval pipeline reports
  LPIPS as NaN (explicitly, instead of silently substituting a different
  metric).
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
    """Build `f(img0, img1) -> score` or None if no weights are available.
    Images are (3, H, W) or (1, 3, H, W) in [0, 1] (normalize=True parity)."""
    weights = weights if weights is not None else load_lpips_weights()
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

    return lambda a, b: float(f(a, b))
