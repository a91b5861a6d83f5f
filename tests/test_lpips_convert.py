"""End-to-end proof of the LPIPS weights path (VERDICT r4 item 4).

Builds a random-weight torch LPIPS(AlexNet) state dict with the exact key
layout of the `lpips` package (richzhang/PerceptualSimilarity) — the format
the reference's torchmetrics metric wraps
(/root/reference/utils/eval_helpers.py:19-27,455) — saves it as a .pth,
runs `eval/lpips_convert.convert`, loads the .npz into the JAX `lpips_fn`,
and asserts the JAX forward matches a torch forward of the same architecture
on random images. The torch forward is written here from the published LPIPS
definition (AlexNet trunk, unit-normalized feature diffs, 1x1 lin heads,
spatial average, sum over 5 taps) so the comparison exercises the converter
key mapping AND the JAX architecture (strides, pads, pooling, scaling layer).
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F

from vtgaussian_slam_tpu.eval.lpips import lpips_fn, load_lpips_weights
from vtgaussian_slam_tpu.eval.lpips_convert import convert, convert_state_dict

# (lpips-package key prefix, out_ch, in_ch, kernel, stride, pad)
_CONVS = [
    ("net.slice1.0", 64, 3, 11, 4, 2),
    ("net.slice2.3", 192, 64, 5, 1, 2),
    ("net.slice3.6", 384, 192, 3, 1, 1),
    ("net.slice4.8", 256, 384, 3, 1, 1),
    ("net.slice5.10", 256, 256, 3, 1, 1),
]
_SHIFT = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
_SCALE = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)


def _random_state_dict(seed=0):
    g = torch.Generator().manual_seed(seed)
    state = {}
    for name, oc, ic, k, _, _ in _CONVS:
        state[f"{name}.weight"] = 0.1 * torch.randn((oc, ic, k, k),
                                                    generator=g)
        state[f"{name}.bias"] = 0.01 * torch.randn((oc,), generator=g)
    for i, (_, oc, _, _, _, _) in enumerate(_CONVS):
        state[f"lin{i}.model.1.weight"] = torch.rand((1, oc, 1, 1),
                                                     generator=g)
    return state


def _torch_lpips(state, img0, img1):
    """Reference-architecture LPIPS forward in torch (normalize=True)."""

    def feats(x):
        h = (2 * x - 1 - _SHIFT) / _SCALE
        out = []
        for i, (name, _, _, _, stride, pad) in enumerate(_CONVS):
            if i in (1, 2):  # maxpool before conv2 and conv3
                h = F.max_pool2d(h, 3, 2)
            h = F.relu(F.conv2d(h, state[f"{name}.weight"],
                                state[f"{name}.bias"], stride, pad))
            out.append(h)
        return out

    def unit(f):
        return f / (f.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)

    total = 0.0
    for i, (a, b) in enumerate(zip(feats(img0), feats(img1))):
        d = (unit(a) - unit(b)) ** 2
        w = state[f"lin{i}.model.1.weight"]
        total = total + (d * w.view(1, -1, 1, 1)).sum(1).mean()
    return float(total)


def test_convert_roundtrip_matches_torch(tmp_path):
    state = _random_state_dict()
    pth = tmp_path / "lpips_alex.pth"
    torch.save(state, str(pth))
    npz = tmp_path / "lpips_alex.npz"
    convert(str(pth), str(npz))

    weights = load_lpips_weights(str(npz))
    assert weights is not None and len(weights) == 15
    f = lpips_fn(weights)
    assert f is not None and f.source == "file"

    rng = np.random.default_rng(0)
    a = rng.random((1, 3, 96, 128), dtype=np.float32)
    b = np.clip(a + 0.2 * rng.standard_normal(a.shape).astype(np.float32),
                0, 1)
    ref = _torch_lpips(state, torch.from_numpy(a), torch.from_numpy(b))
    got = f(a[0], b[0])
    assert abs(ref - got) < 1e-5, (ref, got)
    # identical images score ~0
    assert f(a[0], a[0]) < 1e-6


def test_convert_torchmetrics_wrapping():
    """torchmetrics double-wraps the lpips module under `net.` and adds
    metric-state buffers; the converter must unwrap and filter them."""
    state = _random_state_dict(1)
    wrapped = {f"net.{k}": v for k, v in state.items()}
    wrapped["sum_scores"] = torch.zeros(())
    wrapped["total"] = torch.zeros(())
    out = convert_state_dict(wrapped)
    assert sorted(out) == sorted(state)
    for k in state:
        np.testing.assert_array_equal(out[k], state[k].numpy())


def test_fallback_labeling(monkeypatch):
    monkeypatch.delenv("VTGS_LPIPS_WEIGHTS", raising=False)
    monkeypatch.setenv("VTGS_LPIPS_FALLBACK", "1")
    f = lpips_fn()
    assert f is not None and f.source == "untrained-fallback"
    monkeypatch.setenv("VTGS_LPIPS_FALLBACK", "0")
    assert lpips_fn() is None
