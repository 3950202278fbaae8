"""Pallas TV-L1 kernels vs the XLA reference implementation (interpret mode
on the CPU mesh; the same code compiles for real TPUs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from videoquery.kernels.tvl1 import TVL1Params, _tvl1_level
from videoquery.kernels.warp import bilinear_warp


def make_texture(rng, h, w):
    import jax.image

    base = jnp.asarray(rng.normal(size=(h // 8, w // 8)))
    img = jax.image.resize(base, (h, w), "cubic")
    return ((img - img.min()) / (img.max() - img.min())).astype(jnp.float32)


def test_window_warp_matches_bilinear(rng):
    """Full (non-separable) window warp is exact bilinear for ANY flow."""
    from videoquery.kernels.tvl1_pallas import window_warp_pallas

    img = make_texture(rng, 32, 128)
    u = jnp.asarray(rng.uniform(-3, 3, (32, 128)), jnp.float32)
    v = jnp.asarray(rng.uniform(-3, 3, (32, 128)), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(window_warp_pallas(img[None], u[None], v[None], d=4,
                                            separable=False)[0])
    want = np.asarray(bilinear_warp(img, u, v))
    np.testing.assert_allclose(got[4:-4, 4:-4], want[4:-4, 4:-4],
                               rtol=1e-5, atol=1e-5)


def test_separable_window_warp_smooth_flow(rng):
    """The factorized (2*nwin-term) warp matches exact bilinear wherever the
    flow is smooth — the regime the TV prior guarantees."""
    from videoquery.kernels.tvl1_pallas import window_warp_pallas

    img = make_texture(rng, 32, 128)
    v = (jnp.linspace(-2, 2, 32)[:, None] * jnp.ones((1, 128))).astype(jnp.float32)
    u = (jnp.ones((32, 1)) * jnp.linspace(-2.5, 2.5, 128)[None]).astype(jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(window_warp_pallas(img[None], u[None], v[None], d=4,
                                            separable=True)[0])
    want = np.asarray(bilinear_warp(img, u, v))
    np.testing.assert_allclose(got[4:-4, 4:-4], want[4:-4, 4:-4],
                               rtol=1e-5, atol=1e-5)


def test_separable_equals_full_for_constant_flow(rng):
    """Level kernel: separable == full window warp when the flow is constant
    over the window (weights factor exactly)."""
    import dataclasses

    from videoquery.kernels.tvl1_pallas import tvl1_level_pallas

    i0 = make_texture(rng, 32, 128)[None]
    i1 = make_texture(rng, 32, 128)[None]
    u = jnp.full((1, 32, 128), 1.3, jnp.float32)
    v = jnp.full((1, 32, 128), -0.7, jnp.float32)
    pf = TVL1Params(n_scales=1, n_warps=1, n_iters=4, separable_warp=False)
    ps = dataclasses.replace(pf, separable_warp=True)
    with pltpu.force_tpu_interpret_mode():
        uf, vf = tvl1_level_pallas(i0, i1, u, v, pf, 6, 1)
        us, vs = tvl1_level_pallas(i0, i1, u, v, ps, 6, 1)
    np.testing.assert_allclose(np.asarray(us), np.asarray(uf),
                               rtol=1e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(vs), np.asarray(vf),
                               rtol=1e-5, atol=2e-6)


def test_level_kernel_matches_xla_reference(rng):
    from videoquery.kernels.tvl1_pallas import tvl1_level_pallas

    img = make_texture(rng, 32, 128)
    moved = bilinear_warp(img, -0.6 * jnp.ones_like(img), 0.3 * jnp.ones_like(img))
    I0, I1 = img[None], moved[None]
    u0 = jnp.zeros((1, 32, 128))
    v0 = jnp.zeros((1, 32, 128))
    p = TVL1Params(n_scales=1, n_warps=2, n_iters=8, separable_warp=False)
    ux, vx = jax.vmap(lambda a, b, c, d: _tvl1_level(a, b, c, d, p))(I0, I1, u0, v0)
    with pltpu.force_tpu_interpret_mode():
        up, vp = tvl1_level_pallas(I0, I1, u0, v0, p, max_disp=4)
    # identical update equations; differences only at the 1px border
    np.testing.assert_allclose(np.asarray(up)[0, 4:-4, 4:-4],
                               np.asarray(ux)[0, 4:-4, 4:-4],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(vp)[0, 4:-4, 4:-4],
                               np.asarray(vx)[0, 4:-4, 4:-4],
                               rtol=1e-4, atol=1e-5)


def test_affine_rollwindow_matches_gather_warp(rng):
    from videoquery.kernels.tvl1_pallas import _affine_warp_rollwindow
    from videoquery.kernels.warp import warp_affine

    img = make_texture(rng, 32, 128)
    # translation of 7px (beyond the d=4 window -> exercises the roll) plus
    # a mild shear/zoom residual
    A = jnp.asarray([[[0.01, 0.002, 7.0], [0.001, -0.01, -3.0]]])
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(_affine_warp_rollwindow(img[None], A, d=4)[0])
    eye = jnp.asarray([[1.0, 0, 0], [0, 1.0, 0]])
    want = np.asarray(warp_affine(img, A[0] + eye))
    # separable warp (production default): O(d*|dflow|) factorization error
    np.testing.assert_allclose(got[8:-8, 12:-12], want[8:-8, 12:-12],
                               rtol=1e-4, atol=5e-4)


def test_pyramid_pallas_recovers_translation(rng):
    from videoquery.kernels.tvl1_pallas import tvl1_flow_pallas

    img = make_texture(rng, 64, 128)
    moved = bilinear_warp(img, -2.0 * jnp.ones_like(img), 1.0 * jnp.ones_like(img))
    p = TVL1Params(n_scales=3, n_warps=4, n_iters=25)
    with pltpu.force_tpu_interpret_mode():
        u, v = tvl1_flow_pallas(img[None], moved[None], p, max_disp=6)
    interior = (slice(0, 1), slice(12, -12), slice(12, -12))
    assert abs(float(jnp.median(u[interior])) - 2.0) < 0.8
    assert abs(float(jnp.median(v[interior])) + 1.0) < 0.8


def test_fused_query_matches_local_query(rng):
    """Fused streaming scoring kernel == the XLA local query, bit-exact
    scores and identical top-k."""
    import jax.numpy as jnp

    from videoquery.kernels.query_pallas import fused_query_scores, fused_query_topk
    from videoquery.search.distributed import _local_query

    S, K, N, D, Q = 2, 3, 256, 128, 4
    feats = jnp.asarray(rng.normal(size=(S, K, N, D)), jnp.float32)
    mask = jnp.asarray(rng.random((S, K, N)) > 0.25)
    targets = jnp.asarray(rng.normal(size=(Q, S, K, D)) * 0.05, jnp.float32)
    tmask = jnp.asarray(rng.random((Q, S, K)) > 0.1)
    weights = jnp.ones((Q, S), jnp.float32).at[:, 1].set(1.5)

    with pltpu.force_tpu_interpret_mode():
        scores = np.asarray(fused_query_scores(feats, mask, targets, tmask,
                                               weights, tile=128))
        v, i = fused_query_topk(feats, mask, targets, tmask, weights,
                                k=10, tile=128)
    v_ref, i_ref = _local_query(feats, mask, targets, tmask, weights, k=10)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))
    vr = np.asarray(v_ref)
    finite = np.isfinite(vr)
    np.testing.assert_allclose(np.asarray(v)[finite], vr[finite],
                               rtol=1e-5, atol=1e-6)


def test_sharded_search_pallas_impl(rng):
    """ShardedSearch(impl='pallas') returns the same results as the XLA
    impl on the virtual CPU mesh (interpret mode)."""
    from videoquery.core.meshes import make_mesh
    from videoquery.index.store import FeatureIndex, FeatureRecord
    from videoquery.search.distributed import ShardedSearch

    streams = ("rgb", "warped_optical_flow")
    records = [
        FeatureRecord(cid * 3, s, k, "global_pool", rng.normal(size=16))
        for cid in range(1, 65) for s in streams for k in (1, 2)
    ]
    index = FeatureIndex.build(records, streams, feature_dim=16,
                               pad_multiple=1024)
    mesh = make_mesh(model_parallel=1)
    targets = [{s: {k: rng.normal(size=16).tolist() for k in (1, 2)}
                for s in streams}]
    weights = [{"rgb": 1.0, "warped_optical_flow": 1.5}]
    vx, ix = ShardedSearch(index, mesh, impl="xla").query_dicts(
        targets, weights, k=8)
    with pltpu.force_tpu_interpret_mode():
        vp, ip = ShardedSearch(index, mesh, impl="pallas").query_dicts(
            targets, weights, k=8)
    np.testing.assert_array_equal(ip, ix)
    np.testing.assert_allclose(vp, vx, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("name,cin,hw", [("inception_3a", 256, 28),
                                         ("inception_5b", 1024, 7)])
def test_fused_inception_matches_xla(name, cin, hw, rng):
    """The fused Pallas inception block (experimental; one HBM read+write
    per block) computes exactly the XLA _inception: AVE-pool block with 1x1
    branch (3a) and MAX-pool block (5b)."""
    from tools.inception_pallas import fused_inception
    from videoquery.nn import bn_inception as bi

    base = jax.tree.map(jnp.asarray, bi.init_params(0, 3))
    spec = dict(bi.INCEPTION_BLOCKS)[name]
    x = jax.nn.relu(
        jnp.asarray(rng.normal(size=(5, hw, hw, cin)) * 0.3, jnp.float32))
    p = {}
    for lyr in ("1x1", "3x3_reduce", "double_3x3_reduce", "pool_proj"):
        key = f"{name}/{lyr}"
        w = base[key]["w"]
        p[key] = {"w": jnp.asarray(rng.normal(size=(1, 1, cin, w.shape[3]))
                                   * 0.05, jnp.float32),
                  "b": base[key]["b"]}
    for lyr in ("3x3", "double_3x3_1", "double_3x3_2"):
        p[f"{name}/{lyr}"] = dict(base[f"{name}/{lyr}"])
    want = bi._inception(p, name, spec, x)
    with pltpu.force_tpu_interpret_mode():
        got = fused_inception(p, name, spec, x, group=2)
        # ensemble path: vmapped over stacked params
        p3 = jax.tree.map(lambda a: jnp.stack([a] * 3), p)
        got3 = jax.vmap(lambda q: fused_inception(q, name, spec, x,
                                                  group=2))(p3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got3[1]), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_grad_source_warped_close_to_image(rng):
    """grad_source='warped' (differentiate the warped image; 1/3 the window
    rolls) must solve a REAL correspondence as accurately as the classical
    linearization. (The original form of this test compared the two on a
    pair of UNRELATED textures — meaningless under the round-4
    intensity-scale lambda correction, where the data term is strong
    enough to produce large non-matching fields on non-correspondence;
    under the old 255x-weak lambda both returned ~zero flow and trivially
    'matched'.)"""
    import dataclasses

    from videoquery.kernels.tvl1_pallas import tvl1_level_pallas

    i0 = make_texture(rng, 32, 128)
    i1 = jnp.asarray(np.roll(np.asarray(i0), 2, axis=1))  # exact 2-px shift
    pi = TVL1Params(n_scales=1, n_warps=3, n_iters=25)
    pw = dataclasses.replace(pi, grad_source="warped")
    z = jnp.zeros((1, 32, 128))
    with pltpu.force_tpu_interpret_mode():
        ui, vi = tvl1_level_pallas(i0[None], i1[None], z, z, pi, 6, 1)
        uw, vw = tvl1_level_pallas(i0[None], i1[None], z, z, pw, 6, 1)
    interior = (slice(None), slice(4, -4), slice(8, -8))
    med_i = float(jnp.median(ui[interior]))
    med_w = float(jnp.median(uw[interior]))
    # both linearizations recover the 2-px shift...
    assert abs(med_i - 2.0) < 0.35, med_i
    assert abs(med_w - 2.0) < 0.35, med_w
    # ...with comparable residual error over the interior
    err_i = float(jnp.abs(ui[interior] - 2.0).mean())
    err_w = float(jnp.abs(uw[interior] - 2.0).mean())
    assert err_w < err_i + 0.25, (err_w, err_i)


def test_warm_start_flow_recovers_translation(rng):
    """Temporal warm start: pairs refined at the finest level only from a
    neighbor pair's solution must recover the same constant translation the
    cold full-pyramid path does (VERDICT r2 #2)."""
    from videoquery.kernels.tvl1_pallas import (tvl1_flow_pallas,
                                                tvl1_flow_pallas_warm)
    from videoquery.pipeline.extract import warm_tvl1_params

    h, w = 64, 128
    img = make_texture(rng, h, w)
    # constant velocity (2, -1) px/frame via repeated bilinear warps (the
    # fixture style of test_full_pyramid_flow, which the cold solver is
    # known to converge on)
    fl = (2.0 * jnp.ones((h, w)), -1.0 * jnp.ones((h, w)))
    frames = [img]
    for _ in range(3):
        frames.append(bilinear_warp(frames[-1], *fl))
    i0 = jnp.stack(frames[:-1])
    i1 = jnp.stack(frames[1:])
    p = TVL1Params(n_scales=3, n_warps=4, n_iters=25)
    with pltpu.force_tpu_interpret_mode():
        uc, vc = tvl1_flow_pallas(i0[:1], i1[:1], p, max_disp=6)  # cold key
        uw, vw = tvl1_flow_pallas_warm(
            i0[1:], i1[1:],
            jnp.broadcast_to(uc, (2, h, w)), jnp.broadcast_to(vc, (2, h, w)),
            warm_tvl1_params(p), max_disp=6, levels=1)
        ucold, vcold = tvl1_flow_pallas(i0[1:], i1[1:], p, max_disp=6)
    interior = (slice(None), slice(12, -12), slice(12, -12))
    # true flow is (-2, +1); the ultra-smooth fixture under-converges both
    # paths equally (see test_full_pyramid_flow's 0.8 tolerance) — the
    # normative check is warm == cold, below
    assert abs(float(jnp.median(uw[interior])) + 2.0) < 1.3
    assert abs(float(jnp.median(vw[interior])) - 1.0) < 0.8
    # warm result tracks the cold solution of the SAME pairs closely
    assert abs(float(jnp.median(uw[interior]))
               - float(jnp.median(ucold[interior]))) < 0.25
    assert abs(float(jnp.median(vw[interior]))
               - float(jnp.median(vcold[interior]))) < 0.25


def test_pair_flow_warm_plan_matches_cold_quantized(rng):
    """_pair_flow with a warm plan must produce flow quantized within one
    dense_flow step of the cold path on smooth synthetic motion, with the
    scatter restoring pair order exactly."""
    from videoquery.pipeline.extract import _pair_flow
    from videoquery.pipeline.sampling import flow_pair_plan, flow_warm_plan

    h, w = 40, 128
    img = make_texture(rng, h, w)
    fl = (1.5 * jnp.ones((h, w)), -0.75 * jnp.ones((h, w)))
    frames = [img]
    for _ in range(11):
        frames.append(bilinear_warp(frames[-1], *fl))
    gray = jnp.stack(frames)[None]                      # [1, 12, h, w]
    pair_idx, _ = flow_pair_plan(12, 4, 5)
    plan = flow_warm_plan(pair_idx, 5)
    assert plan[1].size > 0
    p = TVL1Params(n_scales=2, n_warps=2, n_iters=8, fine_warps=2,
                   fine_iters=8)
    pj = jnp.asarray(pair_idx, jnp.int32)
    with pltpu.force_tpu_interpret_mode():
        cold = np.asarray(_pair_flow(gray, pj, 20.0, False, p, (1.0, 1.0)))
        warm = np.asarray(_pair_flow(
            gray, pj, 20.0, False, p, (1.0, 1.0),
            tuple(jnp.asarray(a) for a in plan)))
    assert warm.shape == cold.shape
    interior = (slice(None), slice(None), slice(8, -8), slice(8, -8))
    diff = np.abs(warm[interior].astype(int) - cold[interior].astype(int))
    assert np.median(diff) <= 1.0  # within one 8-bit flow quantization step


def test_flow_warm_plan_structure():
    """flow_warm_plan covers every pair exactly once, keys within each run,
    and every warm pair maps to a key at most `group` frames away."""
    from videoquery.pipeline.sampling import flow_pair_plan, flow_warm_plan

    for frame_cnt, ticks in [(150, 25), (30, 25), (12, 4), (150, 4)]:
        pair_idx, _ = flow_pair_plan(frame_cnt, ticks, 5)
        for group in (2, 3, 5):
            key_pos, warm_pos, warm_src = flow_warm_plan(pair_idx, group)
            allpos = np.concatenate([key_pos, warm_pos])
            assert sorted(allpos.tolist()) == list(range(len(pair_idx))), \
                (frame_cnt, ticks, group)
            assert len(warm_src) == len(warm_pos)
            for wp, ws in zip(warm_pos, warm_src):
                kp = key_pos[ws]
                assert abs(int(pair_idx[wp]) - int(pair_idx[kp])) <= group
                # key and warm pair belong to the same consecutive run
                lo, hi = min(kp, wp), max(kp, wp)
                seg = pair_idx[lo:hi + 1]
                assert np.all(np.diff(seg) == 1)


def test_warm_tvl1_params_iteration_budget():
    """The warm refinement schedule must honor warm_iters exactly, even
    above the inherited fine_iters (iters_at_level would otherwise clamp
    a sweep's warm_iters=15 silently back to fine_iters=10)."""
    from videoquery.kernels.tvl1 import TVL1Params
    from videoquery.pipeline.extract import warm_tvl1_params

    for wi in (6, 10, 15):  # below, at, and above fine_iters
        p = warm_tvl1_params(TVL1Params(n_iters=20, fine_iters=10,
                                        warm_iters=wi))
        assert p.n_warps == 1 and p.fine_warps == 1
        assert p.iters_at_level(0) == wi, wi
    # no warm_iters set: fall back to the fine-level budget
    p = warm_tvl1_params(TVL1Params(n_iters=20, fine_iters=10))
    assert p.iters_at_level(0) == 10


def test_warm_camera_key_matches_own_on_constant_pan(rng):
    """warm_camera='key' reuses the keyframe's camera affine; on constant
    camera motion it must produce the same flow as per-pair estimation."""
    from videoquery.pipeline.extract import _pair_flow_uv
    from videoquery.pipeline.sampling import flow_warm_plan

    h, w = 48, 128
    big = make_texture(rng, h + 40, w + 40)
    frames = [np.asarray(big[8 + 3 * t:8 + 3 * t + h, 8 + 2 * t:8 + 2 * t + w])
              for t in range(8)]          # constant pan (2, 3) px/frame
    gray = jnp.stack([jnp.asarray(f) for f in frames])[None]
    pair_idx = np.arange(7, dtype=np.int32)
    plan = tuple(jnp.asarray(a) for a in flow_warm_plan(pair_idx, 3))
    p = TVL1Params(n_scales=2, n_warps=2, n_iters=8)
    with pltpu.force_tpu_interpret_mode():
        u_own, v_own = _pair_flow_uv(gray, jnp.asarray(pair_idx), True, p,
                                     plan, "own")
        u_key, v_key = _pair_flow_uv(gray, jnp.asarray(pair_idx), True, p,
                                     plan, "key")
    interior = (slice(None), slice(None), slice(10, -10), slice(10, -10))
    assert float(jnp.median(jnp.abs(u_key[interior] - u_own[interior]))) < 0.15
    assert float(jnp.median(jnp.abs(v_key[interior] - v_own[interior]))) < 0.15
