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
