"""Fused inverse-z + block-max + drill-down top-K == score-volume path.

The TPU sweep's fused-topk path (sweep/resplat.py:_fused_correlate_topk
-> correlate/pallas_invz_topk.py) must return the same top-K value
multiset and valid flat indices as the reference einsum score volume +
exact_block_topk — with and without a translation mask.  Runs the
Pallas kernels in interpret mode on small shapes (same policy as
tests/test_pallas_fused.py).
"""
import jax.numpy as jnp
import numpy as np
import pytest

from deeplocalproteindocking_tpu.correlate.dft import get_correlator
from deeplocalproteindocking_tpu.correlate.fft import receptor_transform
from deeplocalproteindocking_tpu.sweep.resplat import (
    _fused_correlate_topk)
from deeplocalproteindocking_tpu.sweep.topk import exact_block_topk

L, LS, C, B, K = 32, 16, 3, 2, 8


def _setup(seed=0):
    rng = np.random.default_rng(seed)
    rec = jnp.asarray(rng.normal(size=(L, L, L, C)).astype(np.float32))
    reps = jnp.asarray(
        rng.normal(size=(B, LS, LS, LS, C)).astype(np.float32))
    H = receptor_transform(rec, None)
    corr = get_correlator(L, LS, "float32")
    S = corr.scores(H.real.astype(jnp.float32),
                    H.imag.astype(jnp.float32), reps)
    return corr, H, reps, S


@pytest.mark.parametrize("masked", [False, True])
def test_fused_topk_matches_score_volume(masked):
    corr, H, reps, S = _setup()
    if masked:
        rng = np.random.default_rng(1)
        mask = jnp.asarray(rng.random((L, L, L)) < 0.7)
        S_ref = jnp.where(mask[None], S, -jnp.inf)
    else:
        mask = None
        S_ref = S
    vals_ref, flat_ref = exact_block_topk(S_ref.reshape(B, -1), K)
    vals, flat = _fused_correlate_topk(corr.prep_H(H), reps, L, LS,
                                       "float32", mask, K,
                                       interpret=True)
    vals_ref, vals = np.asarray(vals_ref), np.asarray(vals)
    np.testing.assert_allclose(vals, vals_ref, rtol=2e-4, atol=1e-3)
    # Returned flat indices address the claimed scores in the true
    # score volume (same x*L^2 + y*L + z convention).
    Sf = np.asarray(S_ref).reshape(B, -1)
    looked_up = np.take_along_axis(Sf, np.asarray(flat), axis=1)
    np.testing.assert_allclose(looked_up, vals, rtol=2e-4, atol=1e-3)
    # No masked-out cell leaks into the result.
    assert np.all(np.isfinite(looked_up))


def test_blockmax_kernel_matches_reduce():
    from deeplocalproteindocking_tpu.correlate.pallas_invz_topk import (
        YB, invz_blockmax)
    corr, H, reps, S = _setup(seed=2)
    f32 = jnp.float32
    # D exactly as production builds it (DFTCorrelator.fused_D is the
    # single shared implementation).
    HtRe, HtIm = corr.prep_H(H)
    Dre, Dim = corr.fused_D(HtRe, HtIm, reps, interpret=True)
    bias = jnp.zeros((L, L, L), f32)
    bmax = invz_blockmax(Dre, Dim, jnp.asarray(corr.MzRe, f32),
                         jnp.asarray(corr.MzIm, f32), bias,
                         interpret=True)
    # Reference: block-max over 32-wide y runs of the score volume.
    ref = np.asarray(S).reshape(B, L, L // YB, YB, L).max(axis=3)
    np.testing.assert_allclose(np.asarray(bmax), ref, rtol=2e-4,
                               atol=1e-3)


def test_blockmax_vmap_folds_into_b_axis():
    """jax.vmap of invz_blockmax must equal per-element calls — the
    custom_vmap rule folds the mapped axis into the kernel's b grid
    axis (round 5; a vmapped pallas_call faulted the TPU worker in
    round 4), both with per-element bias (rescore's per-head masks,
    batch_eval's per-complex masks) and with a shared bias."""
    import jax
    from deeplocalproteindocking_tpu.correlate.pallas_invz_topk import (
        invz_blockmax)
    corr, H, reps, S = _setup(seed=3)
    f32 = jnp.float32
    HtRe, HtIm = corr.prep_H(H)
    Dre, Dim = corr.fused_D(HtRe, HtIm, reps, interpret=True)
    n = 3
    rng = np.random.default_rng(7)
    Dre_n = jnp.asarray(rng.normal(
        size=(n,) + Dre.shape).astype(np.float32))
    Dim_n = jnp.asarray(rng.normal(
        size=(n,) + Dim.shape).astype(np.float32))
    bias_n = jnp.asarray(np.where(
        rng.random((n, L, L, L)) < 0.8, 0.0, -np.inf).astype(np.float32))
    MzRe = jnp.asarray(corr.MzRe, f32)
    MzIm = jnp.asarray(corr.MzIm, f32)

    fn = lambda dr, di, bi: invz_blockmax(dr, di, MzRe, MzIm, bi,
                                          interpret=True)
    got = jax.vmap(fn)(Dre_n, Dim_n, bias_n)
    want = jnp.stack([fn(Dre_n[i], Dim_n[i], bias_n[i])
                      for i in range(n)])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=1e-3)
    # Shared (unbatched) bias under vmap.
    bias_s = bias_n[0]
    got_s = jax.vmap(lambda dr, di: fn(dr, di, bias_s))(Dre_n, Dim_n)
    want_s = jnp.stack([fn(Dre_n[i], Dim_n[i], bias_s)
                        for i in range(n)])
    np.testing.assert_allclose(np.asarray(got_s), np.asarray(want_s),
                               rtol=2e-4, atol=1e-3)
    # Asymmetric vmap: Dim closed over — must broadcast Dim alone, not
    # piggyback on Dre's batched flag (round-5 review).
    Dim_0 = Dim_n[0]
    got_a = jax.vmap(lambda dr, bi: fn(dr, Dim_0, bi))(Dre_n, bias_n)
    want_a = jnp.stack([fn(Dre_n[i], Dim_0, bias_n[i])
                        for i in range(n)])
    np.testing.assert_allclose(np.asarray(got_a), np.asarray(want_a),
                               rtol=2e-4, atol=1e-3)


def test_blockmax_grouped_bias_direct():
    """Direct grouped-bias entry: bias [G, X, Y, Z] with G dividing b —
    each contiguous b//G run of batch rows gets its own group."""
    from deeplocalproteindocking_tpu.correlate.pallas_invz_topk import (
        invz_blockmax)
    corr, H, reps, S = _setup(seed=4)       # B = 2 rotations
    f32 = jnp.float32
    HtRe, HtIm = corr.prep_H(H)
    Dre, Dim = corr.fused_D(HtRe, HtIm, reps, interpret=True)
    rng = np.random.default_rng(9)
    bias_g = jnp.asarray(np.where(
        rng.random((B, L, L, L)) < 0.8, 0.0,
        -np.inf).astype(np.float32))        # G = b = 2, one group each
    MzRe = jnp.asarray(corr.MzRe, f32)
    MzIm = jnp.asarray(corr.MzIm, f32)
    got = invz_blockmax(Dre, Dim, MzRe, MzIm, bias_g, interpret=True)
    want = jnp.stack([
        invz_blockmax(Dre[i:i + 1], Dim[i:i + 1], MzRe, MzIm,
                      bias_g[i], interpret=True)[0]
        for i in range(B)])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=1e-3)


def test_fused_topk_vmapped_matches_sequential():
    """The full batched fused-topk entry (as rescore/batch_eval drive
    it: one vmap over the whole correlate+topk step with per-element
    masks) equals per-element sequential calls."""
    import jax
    corr, H, reps, S = _setup(seed=6)
    Ht = corr.prep_H(H)
    n = 2
    rng = np.random.default_rng(11)
    reps_n = jnp.asarray(rng.normal(
        size=(n,) + tuple(reps.shape)).astype(np.float32))
    masks = jnp.asarray(rng.random((n, L, L, L)) < 0.7)

    def one(r, m):
        return _fused_correlate_topk(Ht, r, L, LS, "float32", m, K,
                                     interpret=True)

    got_v, got_f = jax.vmap(one)(reps_n, masks)
    for i in range(n):
        want_v, want_f = one(reps_n[i], masks[i])
        np.testing.assert_allclose(np.asarray(got_v[i]),
                                   np.asarray(want_v),
                                   rtol=2e-4, atol=1e-3)
        # Indices must address the same scores in the true volume.
        Sref = corr.scores(jnp.asarray(H.real, jnp.float32),
                           jnp.asarray(H.imag, jnp.float32), reps_n[i])
        Sref = np.where(np.asarray(masks[i])[None], np.asarray(Sref),
                        -np.inf).reshape(B, -1)
        looked = np.take_along_axis(Sref, np.asarray(got_f[i]), axis=1)
        np.testing.assert_allclose(looked, np.asarray(got_v[i]),
                                   rtol=2e-4, atol=1e-3)


@pytest.mark.slow
def test_fused_topk_grid64_shape():
    """Grid 64 — the shape whose flattened-GEMM kernel form Mosaic
    rejected (round 4): assert math parity at the REAL eval grid in
    interpret mode (layout/compile validation runs on hardware)."""
    L2, LS2, C2, B2, K2 = 64, 32, 2, 1, 16
    rng = np.random.default_rng(5)
    rec = jnp.asarray(rng.normal(size=(L2, L2, L2, C2)).astype(np.float32))
    reps = jnp.asarray(
        rng.normal(size=(B2, LS2, LS2, LS2, C2)).astype(np.float32))
    H = receptor_transform(rec, None)
    corr = get_correlator(L2, LS2, "float32")
    vals, flat = _fused_correlate_topk(corr.prep_H(H), reps, L2, LS2,
                                       "float32", None, K2,
                                       interpret=True)
    S = corr.scores(H.real.astype(jnp.float32),
                    H.imag.astype(jnp.float32), reps)
    vref, _ = exact_block_topk(jnp.asarray(S).reshape(B2, -1), K2)
    np.testing.assert_allclose(np.asarray(vals), np.asarray(vref),
                               rtol=2e-4, atol=1e-3)
