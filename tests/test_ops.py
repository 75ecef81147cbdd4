"""Op-level golden tests.

The bilinear samplers are checked bit-for-bit against
``torch.nn.functional.grid_sample`` (CPU) — the exact kernel the reference
leans on — without sharing any implementation code."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from egonerf_tpu.ops import (
    eval_sh_bases,
    positional_encoding,
    raw2alpha,
    ray_entropy,
    sample_line,
    sample_plane,
    sample_pdf,
    sample_volume,
)

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def test_sample_plane_matches_torch_grid_sample():
    rng = np.random.default_rng(0)
    c, h, w, n = 6, 17, 23, 500
    img = rng.normal(size=(1, c, h, w)).astype(np.float32)
    # include out-of-range coords to exercise zeros padding
    x = rng.uniform(-1.3, 1.3, n).astype(np.float32)
    y = rng.uniform(-1.3, 1.3, n).astype(np.float32)

    grid = torch.from_numpy(np.stack([x, y], -1)).view(1, n, 1, 2)
    want = F.grid_sample(torch.from_numpy(img), grid, align_corners=True)
    want = want.view(c, n).T.numpy()

    planes = jnp.asarray(img.transpose(0, 2, 3, 1))  # (1, H, W, C)
    got = np.asarray(sample_plane(planes, jnp.asarray(x), jnp.asarray(y)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_sample_plane_stacked_selector():
    rng = np.random.default_rng(1)
    c, h, w, n = 4, 9, 11, 300
    imgs = rng.normal(size=(2, c, h, w)).astype(np.float32)
    x = rng.uniform(-1, 1, n).astype(np.float32)
    y = rng.uniform(-1, 1, n).astype(np.float32)
    sel = rng.integers(0, 2, n).astype(np.int32)

    want = np.zeros((n, c), np.float32)
    for s in range(2):
        grid = torch.from_numpy(np.stack([x, y], -1)).view(1, n, 1, 2)
        out = F.grid_sample(torch.from_numpy(imgs[s : s + 1]), grid, align_corners=True)
        out = out.view(c, n).T.numpy()
        want[sel == s] = out[sel == s]

    planes = jnp.asarray(imgs.transpose(0, 2, 3, 1))
    got = np.asarray(sample_plane(planes, jnp.asarray(x), jnp.asarray(y), jnp.asarray(sel)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_sample_line_matches_torch():
    """The reference samples lines as a 2-D grid_sample with x pinned to 0
    on a (C, L, 1) image (reference: models/EgoNeRF.py:311-313)."""
    rng = np.random.default_rng(2)
    c, l, n = 5, 31, 400
    line = rng.normal(size=(1, c, l, 1)).astype(np.float32)
    coord = rng.uniform(-1.2, 1.2, n).astype(np.float32)

    grid = torch.from_numpy(np.stack([np.zeros_like(coord), coord], -1)).view(1, n, 1, 2)
    want = F.grid_sample(torch.from_numpy(line), grid, align_corners=True).view(c, n).T.numpy()

    lines = jnp.asarray(line[:, :, :, 0].transpose(0, 2, 1))  # (1, L, C)
    got = np.asarray(sample_line(lines, jnp.asarray(coord)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_sample_volume_matches_torch():
    rng = np.random.default_rng(3)
    d, h, w, n = 7, 9, 11, 200
    vol = rng.normal(size=(1, 1, d, h, w)).astype(np.float32)
    x = rng.uniform(-1.1, 1.1, n).astype(np.float32)
    y = rng.uniform(-1.1, 1.1, n).astype(np.float32)
    z = rng.uniform(-1.1, 1.1, n).astype(np.float32)

    grid = torch.from_numpy(np.stack([x, y, z], -1)).view(1, n, 1, 1, 3)
    want = F.grid_sample(torch.from_numpy(vol), grid, align_corners=True).view(n).numpy()

    volume = jnp.asarray(vol.transpose(0, 2, 3, 4, 1))  # (1, D, H, W, C)
    got = np.asarray(sample_volume(volume, jnp.asarray(x), jnp.asarray(y), jnp.asarray(z)))[:, 0]
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_sample_plane_gradients_flow():
    planes = jnp.ones((2, 8, 8, 3))
    x = jnp.asarray([0.1, -0.5])
    y = jnp.asarray([0.3, 0.9])
    sel = jnp.asarray([0, 1], jnp.int32)

    def loss(p):
        return jnp.sum(sample_plane(p, x, y, sel) ** 2)

    g = jax.grad(loss)(planes)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0


def test_raw2alpha_against_bruteforce():
    rng = np.random.default_rng(4)
    sigma = jnp.asarray(rng.uniform(0, 3, size=(16, 24)).astype(np.float32))
    dist = jnp.asarray(rng.uniform(0.01, 0.2, size=(16, 24)).astype(np.float32))
    alpha, weights, bg = raw2alpha(sigma, dist)

    a = 1 - np.exp(-np.asarray(sigma) * np.asarray(dist))
    t = np.ones((16,))
    w_ref = np.zeros_like(a)
    for i in range(a.shape[1]):
        w_ref[:, i] = a[:, i] * t
        t = t * (1 - a[:, i] + 1e-10)
    np.testing.assert_allclose(np.asarray(alpha), a, atol=1e-5)
    np.testing.assert_allclose(np.asarray(weights), w_ref, atol=1e-5)
    np.testing.assert_allclose(np.asarray(bg)[:, 0], t, atol=1e-5)
    # weights + background mass telescopes to ~1
    np.testing.assert_allclose(np.asarray(weights).sum(-1) + t, 1.0, atol=1e-3)


def test_sample_pdf_deterministic_inverse_cdf():
    """Eval-mode sampling must concentrate where the pdf mass is."""
    n_rays, n_bins = 8, 64
    bins = jnp.broadcast_to(jnp.linspace(0.0, 1.0, n_bins), (n_rays, n_bins))
    w = np.zeros((n_rays, n_bins - 1), np.float32)
    w[:, 20:30] = 1.0  # all mass in [bins[20], bins[30]]
    samples = np.asarray(sample_pdf(bins, jnp.asarray(w), 32, key=None))
    assert samples.shape == (8, 32)
    lo, hi = float(bins[0, 19]), float(bins[0, 31])
    # the 1e-5 pdf floor (reference: dataLoader/ray_utils.py:159) leaks the
    # u=0 / u=1 endpoints to the support edges; all interior samples must
    # land in the mass region
    inside = (samples >= lo - 1e-4) & (samples <= hi + 1e-4)
    assert inside.mean() > 0.9
    assert samples.min() >= float(bins[0, 0]) - 1e-6
    assert samples.max() <= float(bins[0, -1]) + 1e-6
    assert np.all(np.diff(samples, axis=-1) >= -1e-6)


def test_sample_pdf_train_mode_in_support():
    n_rays, n_bins = 4, 32
    bins = jnp.broadcast_to(jnp.linspace(2.0, 5.0, n_bins), (n_rays, n_bins))
    w = jnp.asarray(np.random.default_rng(5).uniform(0, 1, (n_rays, n_bins - 1)).astype(np.float32))
    samples = np.asarray(sample_pdf(bins, w, 64, key=jax.random.PRNGKey(0)))
    assert samples.min() >= 2.0 - 1e-5 and samples.max() <= 5.0 + 1e-5


def test_packed_lookup_matches_grid_sample_out_of_range_band(monkeypatch):
    """The einsum-path packed lookups must equal
    F.grid_sample(align_corners=True, padding_mode='zeros') EXACTLY —
    including coords one cell below -1 (p in (-1, 0)), where the clamped
    pair fetch must put the surviving corner's weight on pair position 0.
    Regression for a weight-shift bug in that band (found via the
    hat-matrix formulation).  The production matmul-combine path reorders
    the f32 corner reduction; its epsilon-equivalence to this bit-exact
    anchor is pinned by test_combine_mm_matches_einsum."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F
    from egonerf_tpu.ops import vm_lookup as vl

    monkeypatch.setattr(vl, "_COMBINE_MM", False)

    rng = np.random.default_rng(7)
    n, c = 4000, 8
    sel = jnp.zeros((n,), jnp.int32)

    l = 37
    line_np = rng.normal(size=(1, l, c)).astype(np.float32)
    coord_np = np.concatenate([rng.uniform(-1.3, 1.3, n - 6),
        [-1.0, 1.0, -1.02, 1.02, -0.999, 0.0]]).astype(np.float32)
    out = np.asarray(vl._gather_combine(
        vl.pack_line(jnp.asarray(line_np), jnp.float32),
        *vl.line_idx_weights(jnp.asarray(coord_np), sel, l), 2, jnp.float32))
    tline = torch.from_numpy(line_np[0].T[None, :, :, None].copy())
    grid = torch.zeros((1, n, 1, 2))
    grid[0, :, 0, 1] = torch.from_numpy(coord_np)
    want = F.grid_sample(tline, grid, mode="bilinear", align_corners=True,
                         padding_mode="zeros")[0, :, :, 0].T.numpy()
    np.testing.assert_array_equal(out, want)

    h, w = 19, 23
    plane_np = rng.normal(size=(1, h, w, c)).astype(np.float32)
    x_np = np.concatenate([rng.uniform(-1.3, 1.3, n - 2), [-1.01, 0.3]]).astype(np.float32)
    y_np = np.concatenate([rng.uniform(-1.3, 1.3, n - 2), [0.2, -1.02]]).astype(np.float32)
    pout = np.asarray(vl._gather_combine(
        vl.pack_plane(jnp.asarray(plane_np), jnp.float32),
        *vl.plane_idx_weights(jnp.asarray(x_np), jnp.asarray(y_np), sel, h, w),
        4, jnp.float32))
    tplane = torch.from_numpy(plane_np.transpose(0, 3, 1, 2).copy())
    grid2 = torch.zeros((1, n, 1, 2))
    grid2[0, :, 0, 0] = torch.from_numpy(x_np)
    grid2[0, :, 0, 1] = torch.from_numpy(y_np)
    want2 = F.grid_sample(tplane, grid2, mode="bilinear", align_corners=True,
                          padding_mode="zeros")[0, :, :, 0].T.numpy()
    np.testing.assert_array_equal(pout, want2)


def test_line_hat_matches_packed_within_bf16_weights():
    """The hat-matrix line path (interpolation weights folded into a bf16
    MXU matmul) vs the packed gather path: bounded by one bf16 rounding
    of the tent weights, forward and backward, incl. out-of-range coords
    and both charts."""
    from egonerf_tpu.ops import vm_lookup as vl

    rng = np.random.default_rng(8)
    l, c, n = 37, 8, 2000
    line = jnp.asarray(rng.normal(size=(2, l, c)).astype(np.float32))
    coord = jnp.asarray(np.concatenate([
        rng.uniform(-1.3, 1.3, n - 4), [-1.0, 1.0, -1.05, 0.0]]).astype(np.float32))
    sel = jnp.asarray(rng.integers(0, 2, n).astype(np.int32))
    dout = jnp.asarray(rng.normal(size=(n, c)).astype(np.float32))

    ref = np.asarray(vl.sample_line_packed(line, coord, sel))
    hat = np.asarray(vl.sample_line_hat(line, coord, sel))
    scale = np.abs(ref).max()
    np.testing.assert_allclose(hat, ref, atol=1.5e-2 * scale)

    g_ref = np.asarray(jax.grad(
        lambda L: jnp.vdot(vl.sample_line_packed(L, coord, sel), dout))(line))
    g_hat = np.asarray(jax.grad(
        lambda L: jnp.vdot(vl.sample_line_hat(L, coord, sel), dout))(line))
    np.testing.assert_allclose(g_hat, g_ref, atol=2e-2 * np.abs(g_ref).max())


def test_mixed_matmul_matches_f32():
    """bf16-in/f32-accumulate matmul and its custom VJP vs plain f32 @ —
    bounded by one bf16 rounding per operand element."""
    from egonerf_tpu.ops.mm import mixed_matmul

    rng = np.random.default_rng(9)
    a = jnp.asarray(rng.normal(size=(64, 32)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(32, 16)).astype(np.float32))
    d = jnp.asarray(rng.normal(size=(64, 16)).astype(np.float32))
    np.testing.assert_allclose(np.asarray(mixed_matmul(a, b)), np.asarray(a @ b),
                               atol=2e-2 * float(jnp.abs(a @ b).max()))
    ga, gb = jax.grad(lambda a, b: jnp.vdot(mixed_matmul(a, b), d),
                      argnums=(0, 1))(a, b)
    ga_r, gb_r = jax.grad(lambda a, b: jnp.vdot(a @ b, d), argnums=(0, 1))(a, b)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(ga_r),
                               atol=2e-2 * float(jnp.abs(ga_r).max()))
    np.testing.assert_allclose(np.asarray(gb), np.asarray(gb_r),
                               atol=2e-2 * float(jnp.abs(gb_r).max()))
    # batched leading dims (the shader feeds (..., K))
    a3 = jnp.asarray(rng.normal(size=(4, 8, 32)).astype(np.float32))
    assert mixed_matmul(a3, b).shape == (4, 8, 16)
    assert jax.grad(lambda x: jnp.sum(mixed_matmul(x, b)))(a3).shape == a3.shape


def test_sample_pdf_masked_reduction_matches_searchsorted_gather():
    """The gather-free monotone bracketing (masked min/max reductions) must
    be BIT-identical to the searchsorted + take_along_axis formulation it
    replaced (the per-index gathers cost ~27 ms/step on TPU)."""
    def reference_formulation(bins, weights, n_samples, key):
        weights = weights + 1e-5
        pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
        cdf = jnp.cumsum(pdf, axis=-1)
        cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)
        n = cdf.shape[0]
        if key is None:
            u = jnp.broadcast_to(
                jnp.linspace(0.0, 1.0, n_samples, dtype=cdf.dtype), (n, n_samples))
        else:
            u = jax.random.uniform(key, (n, n_samples), dtype=cdf.dtype)
        inds = jax.vmap(lambda c, uu: jnp.searchsorted(
            c, uu, side="right", method="compare_all"))(cdf, u)
        below = jnp.maximum(inds - 1, 0)
        above = jnp.minimum(inds, cdf.shape[-1] - 1)
        cdf_lo = jnp.take_along_axis(cdf, below, axis=-1)
        cdf_hi = jnp.take_along_axis(cdf, above, axis=-1)
        bins_lo = jnp.take_along_axis(bins, below, axis=-1)
        bins_hi = jnp.take_along_axis(bins, above, axis=-1)
        denom = jnp.where(cdf_hi - cdf_lo < 1e-5, 1.0, cdf_hi - cdf_lo)
        t = (u - cdf_lo) / denom
        return bins_lo + t * (bins_hi - bins_lo)

    rng = np.random.default_rng(11)
    n_rays, n_bins = 32, 129
    bins = jnp.asarray(np.sort(
        rng.uniform(0.1, 10, (n_rays, n_bins)), axis=-1).astype(np.float32))
    # half the bins empty: exercises the 1e-5 floor + near-flat cdf runs
    w = jnp.asarray((rng.uniform(0, 1, (n_rays, n_bins - 1))
                     * (rng.uniform(size=(n_rays, n_bins - 1)) > 0.5)
                     ).astype(np.float32))
    for key in (None, jax.random.PRNGKey(3)):
        got = np.asarray(sample_pdf(bins, w, 64, key=key))
        want = np.asarray(reference_formulation(bins, w, 64, key=key))
        np.testing.assert_array_equal(got, want)


def test_normalize_r_lookup_masked_reduction_matches_gather():
    """Same guarantee for the radial-grid lerp: masked-reduction bracketing
    bit-identical to clip(searchsorted) + grid[lo]/grid[hi], including
    r=0, exact grid nodes, and r beyond the far edge."""
    from egonerf_tpu.coords.expgrid import make_reference_r_grid, normalize_r_lookup

    grid = make_reference_r_grid(0.03, 15.0, 150)
    n_r = len(grid) - 1
    rng = np.random.default_rng(12)
    r = jnp.asarray(np.concatenate([
        rng.uniform(0, 16, 20000), [0.0], grid[:4], [grid[-1]],
        [grid[-1] + 1.0], [25.0]]).astype(np.float32))

    gj = jnp.asarray(grid)
    hi = jnp.clip(jnp.searchsorted(gj, r, side="right", method="compare_all"), 1, n_r)
    lo = hi - 1
    t = (r - gj[lo]) / (gj[hi] - gj[lo])
    want = np.asarray((lo.astype(r.dtype) + t) / n_r)
    np.testing.assert_array_equal(np.asarray(normalize_r_lookup(r, grid)), want)


def test_positional_encoding_layout():
    """(D, F) flattening then [sin | cos] blocks (reference: models/tensorBase.py:14-19)."""
    pos = jnp.asarray([[0.5, -1.0]])
    out = np.asarray(positional_encoding(pos, 3))
    assert out.shape == (1, 12)
    expect_args = np.array([0.5, 1.0, 2.0, -1.0, -2.0, -4.0])
    np.testing.assert_allclose(out[0, :6], np.sin(expect_args), atol=1e-6)
    np.testing.assert_allclose(out[0, 6:], np.cos(expect_args), atol=1e-6)


def test_sh_bases_low_degrees():
    dirs = jnp.asarray([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0]])
    b = np.asarray(eval_sh_bases(2, dirs))
    assert b.shape == (2, 9)
    np.testing.assert_allclose(b[:, 0], 0.28209479, atol=1e-6)
    np.testing.assert_allclose(b[0, 2], 0.48860251, atol=1e-6)  # C1 * z
    np.testing.assert_allclose(b[1, 3], -0.48860251, atol=1e-6)  # -C1 * x
    np.testing.assert_allclose(b[0, 6], 0.31539157 * 2.0, atol=1e-6)  # C2[2]*(2z^2-x^2-y^2)


def test_ray_entropy_uniform_is_max():
    flat = jnp.full((4, 16), 0.25)
    peaked = jnp.asarray(np.eye(16, dtype=np.float32)[None, 0] * np.ones((4, 1), np.float32))
    assert float(ray_entropy(flat)) > float(ray_entropy(peaked))


# ---------------------------------------------------------------------------
# packed-lookup fast paths (ops/vm_lookup.py): the one-hot matmul line
# formulation and the sorted bf16 plane scatter must agree with the
# reference gather/scatter formulations
# ---------------------------------------------------------------------------
def _packed_line_case(l=37, c=8, n=600, seed=5):
    from egonerf_tpu.ops import vm_lookup as vl

    rng = np.random.default_rng(seed)
    line = jnp.asarray(rng.normal(size=(2, l, c)).astype(np.float32))
    coord = jnp.asarray(rng.uniform(-1.2, 1.2, n).astype(np.float32))
    sel = jnp.asarray(rng.integers(0, 2, n).astype(np.int32))
    dout = jnp.asarray(rng.normal(size=(n, c)).astype(np.float32))
    return vl, line, coord, sel, dout


def test_line_onehot_forward_bit_identical_to_gather(monkeypatch):
    """Small tables take the one-hot matmul fetch; it must be BIT-identical
    to the per-index gather (the one-hot picks whole bf16 rows)."""
    vl, line, coord, sel, _ = _packed_line_case()
    out_mm = np.asarray(vl.sample_line_packed(line, coord, sel))
    monkeypatch.setattr(vl, "_ONEHOT_FWD_MAX_ROWS", 0)  # force the gather
    out_gather = np.asarray(vl.sample_line_packed(line, coord, sel))
    np.testing.assert_array_equal(out_mm, out_gather)


def test_line_fastgrad_backward_matches_f32_scatter():
    """One-hot matmul backward (bf16 cotangents, f32 MXU accumulation) vs
    the exact f32 chunked scatter: bounded by one bf16 rounding of each
    corner cotangent."""
    vl, line, coord, sel, dout = _packed_line_case()

    def loss(fn, l):
        return jnp.vdot(fn(l, coord, sel), dout)

    g_exact = np.asarray(jax.grad(lambda l: loss(vl.sample_line_packed, l))(line))
    g_fast = np.asarray(jax.grad(
        lambda l: loss(vl.sample_line_packed_fastgrad, l))(line))
    scale = np.abs(g_exact).max()
    np.testing.assert_allclose(g_fast, g_exact, atol=1.2e-2 * scale)
    # forwards are the same function
    a = vl.sample_line_packed(line, coord, sel)
    b = vl.sample_line_packed_fastgrad(line, coord, sel)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("sorted_scatter", [False, True])
def test_plane_bf16_backward_matches_f32_scatter(monkeypatch, sorted_scatter):
    """Both bf16 plane-scatter formulations (unsorted default; opt-in
    sorted-destination with the payload permute fused into the corner
    multiply) vs the exact f32 path."""
    from egonerf_tpu.ops import vm_lookup as vl

    monkeypatch.setattr(vl, "_PLANE_SORTED_SCATTER", sorted_scatter)
    rng = np.random.default_rng(6)
    h, w, c, n = 19, 23, 8, 800
    plane = jnp.asarray(rng.normal(size=(2, h, w, c)).astype(np.float32))
    x = jnp.asarray(rng.uniform(-1.1, 1.1, n).astype(np.float32))
    y = jnp.asarray(rng.uniform(-1.1, 1.1, n).astype(np.float32))
    sel = jnp.asarray(rng.integers(0, 2, n).astype(np.int32))
    dout = jnp.asarray(rng.normal(size=(n, c)).astype(np.float32))

    def loss(fn, p):
        return jnp.vdot(fn(p, x, y, sel), dout)

    g_exact = np.asarray(jax.grad(lambda p: loss(vl.sample_plane_packed, p))(plane))
    g_fast = np.asarray(jax.grad(
        lambda p: loss(vl.sample_plane_packed_fastgrad, p))(plane))
    scale = np.abs(g_exact).max()
    np.testing.assert_allclose(g_fast, g_exact, atol=1.5e-2 * scale)


def test_merge_sorted_equals_sort_concat():
    """Bitonic merge of two per-row sorted arrays == full sort of the
    union (the reference's torch.sort(torch.cat(...)),
    models/EgoNeRF.py:536-539), including ties and non-power-of-two."""
    from egonerf_tpu.ops.merge import merge_sorted

    rng = np.random.default_rng(7)
    for n, m in [(128, 128), (48, 48), (17, 31), (5, 1), (128, 0)]:
        a = np.sort(rng.normal(size=(6, n)).astype(np.float32), axis=-1)
        b = np.sort(rng.integers(0, 4, size=(6, m)).astype(np.float32), axis=-1)
        want = np.sort(np.concatenate([a, b], axis=-1), axis=-1)
        got = np.asarray(merge_sorted(jnp.asarray(a), jnp.asarray(b)))
        np.testing.assert_array_equal(got, want)


def test_sorted_uniform_distribution():
    """Order-statistics draws are sorted, in (0,1), and match the
    empirical distribution of sort(iid uniforms)."""
    from egonerf_tpu.ops.merge import sorted_uniform

    u = np.asarray(sorted_uniform(jax.random.PRNGKey(0), (4000, 16)))
    assert (np.diff(u, axis=-1) >= 0).all()
    assert (u > 0).all() and (u < 1).all()
    # E[u_(k)] = k/(n+1) for sorted U(0,1) order statistics
    want = np.arange(1, 17) / 17.0
    np.testing.assert_allclose(u.mean(axis=0), want, atol=0.02)


def test_sample_pdf_sorted_draws_same_law():
    """sorted_draws=True yields per-row sorted depths whose empirical cdf
    matches the unsorted default (same inverse-CDF law)."""
    rng = np.random.default_rng(8)
    bins = np.sort(rng.uniform(0, 10, size=(1, 17)).astype(np.float32), axis=-1)
    bins = np.broadcast_to(bins, (2000, 17))
    w = np.abs(rng.normal(size=(1, 16)).astype(np.float32))
    w = np.broadcast_to(w, (2000, 16))
    plain = np.asarray(sample_pdf(jnp.asarray(bins), jnp.asarray(w), 32,
                                  key=jax.random.PRNGKey(1)))
    srt = np.asarray(sample_pdf(jnp.asarray(bins), jnp.asarray(w), 32,
                                key=jax.random.PRNGKey(2), sorted_draws=True))
    assert (np.diff(srt, axis=-1) >= 0).all()
    qs = np.linspace(5, 95, 19)
    np.testing.assert_allclose(np.percentile(plain, qs), np.percentile(srt, qs),
                               atol=0.25)


def test_combine_mm_matches_einsum():
    """The matmul corner-combine (rows * (w @ R)) @ S vs the reshape ->
    einsum formulation: forward equal to f32 epsilon (reduction reorder
    only), backward corner cotangents BIT-identical (the 0/1-matrix dots
    only add exact zeros around the same single multiplies)."""
    from egonerf_tpu.ops import vm_lookup as vl

    rng = np.random.default_rng(11)
    for n_corners, c in ((4, 48), (2, 16), (4, 64)):
        n = 3000
        rows = jnp.asarray(rng.normal(size=(n, n_corners * c))
                           .astype(np.float32)).astype(jnp.bfloat16)
        w = jnp.asarray(rng.uniform(size=(n, n_corners)).astype(np.float32))
        got = np.asarray(vl._combine_mm(rows, w, n_corners, jnp.float32))
        want = np.asarray(jnp.einsum(
            "nk,nkc->nc", w, rows.astype(jnp.float32).reshape(n, n_corners, c)))
        np.testing.assert_allclose(got, want, rtol=0, atol=2e-5)

        dout = jnp.asarray(rng.normal(size=(n, c)).astype(np.float32))
        got_b = np.asarray(vl._corner_cotangents(w, dout, n_corners, c))
        want_b = np.asarray(
            (w[:, :, None] * dout[:, None, :]).reshape(n, n_corners * c))
        np.testing.assert_array_equal(got_b, want_b)


def test_unpack_plane_grads_flat_matches_legacy(monkeypatch):
    """The flat-row unpack of packed corner cotangents (vm_lookup
    _UNPACK_FLAT, pad-stencil OFF) must reproduce the legacy
    reshape+pad/DUS expression exactly — same f32 values, same summation
    order (the formulation change is layout-only)."""
    from egonerf_tpu.ops import vm_lookup as vl

    monkeypatch.setattr(vl, "_UNPACK_FLAT", True)
    monkeypatch.setattr(vl, "_UNPACK_PAD", False)
    rng = np.random.default_rng(11)
    for s, h, w, c in ((2, 6, 5, 4), (1, 3, 7, 2), (2, 4, 4, 3)):
        gpacked = jnp.asarray(
            rng.normal(size=(s * h * w, 4 * c)).astype(np.float32))
        flat = vl._unpack_plane_grads(gpacked, s, h, w, c)
        legacy_g = gpacked.astype(jnp.float32).reshape(s, h, w, 4, c)
        legacy = (legacy_g[..., 0, :] + vl._unshift_x(legacy_g[..., 1, :])
                  + vl._unshift_y(legacy_g[..., 2, :])
                  + vl._unshift_x(vl._unshift_y(legacy_g[..., 3, :])))
        np.testing.assert_array_equal(np.asarray(flat), np.asarray(legacy))
        # bf16 input path (the production fastgrad scatter result dtype)
        gb = gpacked.astype(jnp.bfloat16)
        flat_b = vl._unpack_plane_grads(gb, s, h, w, c)
        legacy_gb = gb.astype(jnp.float32).reshape(s, h, w, 4, c)
        legacy_b = (legacy_gb[..., 0, :] + vl._unshift_x(legacy_gb[..., 1, :])
                    + vl._unshift_y(legacy_gb[..., 2, :])
                    + vl._unshift_x(vl._unshift_y(legacy_gb[..., 3, :])))
        np.testing.assert_array_equal(np.asarray(flat_b), np.asarray(legacy_b))


def test_unpack_plane_grads_pad_matches_legacy(monkeypatch):
    """The pad-stencil unpack (the shipped default) computes the same
    exact-arithmetic sum as the legacy expression; only the f32 ADD ORDER
    differs at edge-clamped rows, so equality holds to reassociation
    epsilon (interior rows, where no clamp term fires, stay bit-exact)."""
    from egonerf_tpu.ops import vm_lookup as vl

    monkeypatch.setattr(vl, "_UNPACK_FLAT", True)
    monkeypatch.setattr(vl, "_UNPACK_PAD", True)
    rng = np.random.default_rng(11)
    for s, h, w, c in ((2, 6, 5, 4), (1, 3, 7, 2), (2, 4, 4, 3)):
        gpacked = jnp.asarray(
            rng.normal(size=(s * h * w, 4 * c)).astype(np.float32))
        pad = np.asarray(vl._unpack_plane_grads(gpacked, s, h, w, c))
        legacy_g = gpacked.astype(jnp.float32).reshape(s, h, w, 4, c)
        legacy = np.asarray(
            legacy_g[..., 0, :] + vl._unshift_x(legacy_g[..., 1, :])
            + vl._unshift_y(legacy_g[..., 2, :])
            + vl._unshift_x(vl._unshift_y(legacy_g[..., 3, :])))
        np.testing.assert_allclose(pad, legacy, rtol=1e-5, atol=1e-6)
        # interior rows (no x0/x_last/y_last clamp term fires) see the
        # identical add order -> bit-exact
        np.testing.assert_array_equal(pad[:, :-1, 1:-1], legacy[:, :-1, 1:-1])


def test_unpack_flat_is_pack_plane_adjoint():
    """<pack_plane(P), G> == <P, unpack(G)>: the flat unpack is the exact
    adjoint of the corner packing, including every edge clamp."""
    from egonerf_tpu.ops import vm_lookup as vl

    rng = np.random.default_rng(12)
    s, h, w, c = 2, 5, 6, 3
    plane = jnp.asarray(rng.normal(size=(s, h, w, c)).astype(np.float32))
    gpack = jnp.asarray(
        rng.normal(size=(s * h * w, 4 * c)).astype(np.float32))
    lhs = jnp.sum(vl.pack_plane(plane, dtype=jnp.float32) * gpack)
    rhs = jnp.sum(plane * vl._unpack_plane_grads(gpack, s, h, w, c))
    np.testing.assert_allclose(float(lhs), float(rhs), rtol=1e-5)


def test_unpack_plane_grads_pad_stencil_matches(monkeypatch):
    """The "pad" stencil sub-variant (one zero-padded buffer, static
    windows) matches the legacy unpack to f32 association epsilon — the
    edge clamp terms re-associate two-term sums."""
    from egonerf_tpu.ops import vm_lookup as vl

    monkeypatch.setattr(vl, "_UNPACK_FLAT", True)
    monkeypatch.setattr(vl, "_UNPACK_PAD", True)
    rng = np.random.default_rng(13)
    for s, h, w, c in ((2, 6, 5, 4), (1, 3, 7, 2), (2, 4, 4, 3)):
        gpacked = jnp.asarray(
            rng.normal(size=(s * h * w, 4 * c)).astype(np.float32))
        got = np.asarray(vl._unpack_plane_grads(gpacked, s, h, w, c))
        g = gpacked.reshape(s, h, w, 4, c)
        want = np.asarray(
            g[..., 0, :] + vl._unshift_x(g[..., 1, :])
            + vl._unshift_y(g[..., 2, :])
            + vl._unshift_x(vl._unshift_y(g[..., 3, :])))
        np.testing.assert_allclose(got, want, rtol=2e-6, atol=1e-6)
