import numpy as np
import jax
import jax.numpy as jnp

from deeplocalproteindocking_tpu.correlate import (
    receptor_transform, correlate_scores, score_at,
    flat_index_to_shift, shift_to_flat_index, translation_mask,
)


def oracle_corr(rec, lig, A):
    """Brute-force circular correlation: S[t] = sum A[c,d] rec_c(x) lig_d(x-t)."""
    L = rec.shape[0]
    S = np.zeros((L, L, L))
    for tx in range(L):
        for ty in range(L):
            for tz in range(L):
                shifted = np.roll(lig, (tx, ty, tz), axis=(0, 1, 2))
                S[tx, ty, tz] = np.einsum(
                    "xyzc,cd,xyzd->", rec, A, shifted)
    return S


class TestCorrelate:
    def test_matches_bruteforce(self):
        L, C = 8, 3
        rng = np.random.default_rng(0)
        rec = rng.normal(size=(L, L, L, C)).astype(np.float32)
        lig = rng.normal(size=(L, L, L, C)).astype(np.float32)
        A = rng.normal(size=(C, C)).astype(np.float32)
        H = receptor_transform(jnp.asarray(rec), jnp.asarray(A))
        S = np.asarray(correlate_scores(H, jnp.asarray(lig)))
        np.testing.assert_allclose(S, oracle_corr(rec, lig, A),
                                   rtol=1e-4, atol=1e-3)

    def test_identity_coupling(self):
        L, C = 8, 2
        rng = np.random.default_rng(1)
        rec = jnp.asarray(rng.normal(size=(L, L, L, C)).astype(np.float32))
        lig = jnp.asarray(rng.normal(size=(L, L, L, C)).astype(np.float32))
        S_none = correlate_scores(receptor_transform(rec), lig)
        S_eye = correlate_scores(receptor_transform(rec, jnp.eye(C)), lig)
        np.testing.assert_allclose(np.asarray(S_none), np.asarray(S_eye),
                                   atol=1e-4)

    def test_planted_shift_recovered(self):
        # A ligand that is an exact circular shift of the receptor
        # maximizes correlation at that shift.
        L = 16
        rng = np.random.default_rng(2)
        rec = rng.normal(size=(L, L, L, 1)).astype(np.float32)
        shift = (3, -5, 2)
        lig = np.roll(rec, shift, axis=(0, 1, 2))
        # S[t] = sum rec(x) lig(x - t): peak where lig(x-t)=rec aligns
        H = receptor_transform(jnp.asarray(rec))
        S = correlate_scores(H, jnp.asarray(lig))
        flat = int(jnp.argmax(S))
        got = np.asarray(flat_index_to_shift(jnp.asarray(flat), L))
        # lig(x) = rec(x - s) -> lig(x - t) = rec(x - t - s): align at
        # t = -s.
        np.testing.assert_array_equal(got, [-3, 5, -2])

    def test_score_at_matches_volume(self):
        L, C = 8, 2
        rng = np.random.default_rng(3)
        rec = jnp.asarray(rng.normal(size=(L, L, L, C)).astype(np.float32))
        lig = jnp.asarray(rng.normal(size=(L, L, L, C)).astype(np.float32))
        H = receptor_transform(rec)
        S = correlate_scores(H, lig)
        shifts = jnp.array([[0, 0, 0], [1, -2, 3], [-4, 3, -1]])
        got = score_at(H, lig, shifts)
        want = [S[tuple(np.mod(s, L))] for s in np.asarray(shifts)]
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5)

    def test_flat_index_roundtrip(self):
        L = 12
        flat = jnp.arange(L ** 3)
        shifts = flat_index_to_shift(flat, L)
        back = shift_to_flat_index(shifts, L)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(flat))
        assert int(jnp.abs(shifts).max()) <= L // 2

    def test_translation_mask(self):
        m = translation_mask(16, 3)
        assert bool(m[0, 0, 0]) and bool(m[3, 16 - 3, 0])
        assert not bool(m[4, 0, 0]) and not bool(m[0, 16 - 4, 0])

    def test_gradients_flow_through_fft(self):
        # The "grads through FFT correlator" requirement.
        L, C = 8, 2
        rng = np.random.default_rng(4)
        rec = jnp.asarray(rng.normal(size=(L, L, L, C)).astype(np.float32))
        lig = jnp.asarray(rng.normal(size=(L, L, L, C)).astype(np.float32))

        def f(lig_v):
            H = receptor_transform(rec)
            return score_at(H, lig_v, jnp.array([[1, 2, 3]]))[0]

        g = jax.grad(f)(lig)
        assert np.isfinite(np.asarray(g)).all()
        eps, e = 1e-2, jnp.zeros_like(lig).at[2, 3, 4, 1].set(1.0)
        fd = (f(lig + eps * e) - f(lig - eps * e)) / (2 * eps)
        np.testing.assert_allclose(float((g * e).sum()), float(fd),
                                   rtol=5e-2, atol=1e-3)

    def test_translation_mask_center_wraps(self):
        # Center near the signed boundary: circular distance applies.
        m = translation_mask(16, 2, jnp.array([7, 0, 0]))
        assert bool(m[7, 0, 0]) and bool(m[5, 0, 0])
        # 9 maps to signed shift -7... circular distance |(-7)-7| -> 2
        assert bool(m[np.mod(9, 16), 0, 0])
        assert not bool(m[2, 0, 0])
