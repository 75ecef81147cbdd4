"""LPIPS-in-JAX graph parity.

No pretrained weights exist in this image (zero egress), so the graph is
pinned against a torch re-implementation of the SAME lpips-v0.1
architecture built from random weights: convs/strides/padding/pool
placement, unit-normalization, head weighting and spatial averaging all
have to line up for the outputs to match.  When a real weights file
appears (tools/export_lpips.py), rgb_lpips_jax produces real LPIPS with
no further code changes.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from egonerf_tpu.render.lpips_jax import (_NETS, _SCALE, _SHIFT, _lpips_pair,
                                          load_lpips_params, rgb_lpips_jax,
                                          weights_path)

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def _rand_params(net: str, rng):
    """Random weight pytree with the right shapes (alex: 3->64->192->384->
    256->256; vgg: the 13-conv VGG16 ladder)."""
    chans = {"alex": [3, 64, 192, 384, 256, 256],
             "vgg": [3, 64, 64, 128, 128, 256, 256, 256, 512, 512, 512,
                     512, 512, 512]}[net]
    specs = _NETS[net]["convs"]
    convs = []
    for i, (k, _, _, _) in enumerate(specs):
        w = rng.normal(size=(k, k, chans[i], chans[i + 1])).astype(np.float32) * 0.05
        b = rng.normal(size=(chans[i + 1],)).astype(np.float32) * 0.01
        convs.append((jnp.asarray(w), jnp.asarray(b)))
    lins = [jnp.asarray(np.abs(rng.normal(size=(chans[t + 1],))).astype(np.float32))
            for t in _NETS[net]["taps"]]
    return {"convs": convs, "lins": lins}


def _torch_lpips(params, im0, im1, net):
    """Independent torch build of the lpips-v0.1 graph from the same
    weights (reference architecture: the lpips package; wrapper
    reference: utils.py:77-104)."""
    specs = _NETS[net]["convs"]
    pk, ps = _NETS[net]["pool"]
    taps = set(_NETS[net]["taps"])
    x = torch.from_numpy(np.stack([im0, im1])).permute(0, 3, 1, 2)
    x = x * 2.0 - 1.0
    shift = torch.tensor(_SHIFT).view(1, 3, 1, 1)
    scale = torch.tensor(_SCALE).view(1, 3, 1, 1)
    x = (x - shift) / scale
    total = 0.0
    li = 0
    for i, ((k, stride, pad, pool_before), (w, b)) in enumerate(
            zip(specs, params["convs"])):
        if pool_before:
            x = F.max_pool2d(x, pk, ps)
        wt = torch.from_numpy(np.asarray(w)).permute(3, 2, 0, 1)
        x = F.conv2d(x, wt, torch.from_numpy(np.asarray(b)), stride=stride,
                     padding=pad)
        x = F.relu(x)
        if i in taps:
            # lpips v0.1 normalize_tensor: eps OUTSIDE the sqrt
            f = x / (torch.sqrt((x * x).sum(dim=1, keepdim=True)) + 1e-10)
            d = (f[0] - f[1]) ** 2
            lin = torch.from_numpy(np.asarray(params["lins"][li])).view(-1, 1, 1)
            total = total + (d * lin).sum(dim=0).mean()
            li += 1
    return float(total)


@pytest.mark.parametrize("net", ["alex", "vgg"])
def test_lpips_graph_matches_torch(net):
    rng = np.random.default_rng(0)
    params = _rand_params(net, rng)
    im0 = rng.uniform(0, 1, (64, 96, 3)).astype(np.float32)
    im1 = np.clip(im0 + rng.normal(0, 0.1, im0.shape), 0, 1).astype(np.float32)

    got = float(_lpips_pair(params, jnp.asarray(im0), jnp.asarray(im1), net=net))
    want = _torch_lpips(params, im0, im1, net)
    np.testing.assert_allclose(got, want, rtol=2e-4)
    assert got > 0.0


def test_lpips_identical_images_zero():
    rng = np.random.default_rng(1)
    params = _rand_params("alex", rng)
    im = rng.uniform(0, 1, (48, 48, 3)).astype(np.float32)
    assert float(_lpips_pair(params, jnp.asarray(im), jnp.asarray(im))) == 0.0


def test_lpips_loads_from_weights_file(tmp_path, monkeypatch):
    """End-to-end through the discovery path: save a random-weight npz to
    the documented location, rgb_lpips_jax picks it up."""
    from egonerf_tpu.render import lpips_jax

    rng = np.random.default_rng(2)
    params = _rand_params("alex", rng)
    arrays = {}
    for i, (w, b) in enumerate(params["convs"]):
        arrays[f"conv{i}_w"] = np.asarray(w)
        arrays[f"conv{i}_b"] = np.asarray(b)
    for j, lin in enumerate(params["lins"]):
        arrays[f"lin{j}_w"] = np.asarray(lin)
    monkeypatch.setenv("EGONERF_LPIPS_WEIGHTS_DIR", str(tmp_path))
    np.savez(tmp_path / "lpips_alex.npz", **arrays)
    monkeypatch.setattr(lpips_jax, "_PARAM_CACHE", {})

    assert weights_path("alex") == str(tmp_path / "lpips_alex.npz")
    im0 = rng.uniform(0, 1, (40, 40, 3)).astype(np.float32)
    im1 = rng.uniform(0, 1, (40, 40, 3)).astype(np.float32)
    v = rgb_lpips_jax(im0, im1)
    assert v is not None and v > 0
    want = _torch_lpips(load_lpips_params("alex"), im0, im1, "alex")
    np.testing.assert_allclose(v, want, rtol=2e-4)
    # absent weights for vgg -> graceful None
    assert rgb_lpips_jax(im0, im1, net="vgg") is None
