"""Pallas fused inverse-DFT kernel vs the einsum oracle (interpret mode
on CPU; the compiled path is exercised on real TPUs)."""
import numpy as np
import jax.numpy as jnp

from deeplocalproteindocking_tpu.correlate.dft import DFTCorrelator
from deeplocalproteindocking_tpu.correlate.pallas_idft import (
    correlator_pallas_inverse,
)


class TestPallasInverse:
    def test_matches_einsum_oracle(self):
        rng = np.random.default_rng(0)
        L, B = 16, 3
        corr = DFTCorrelator(L, 12)
        gre = jnp.asarray(rng.normal(size=(B, L, L, L // 2 + 1))
                          .astype(np.float32))
        gim = jnp.asarray(rng.normal(size=(B, L, L, L // 2 + 1))
                          .astype(np.float32))
        want = corr.inverse(gre, gim)
        got = correlator_pallas_inverse(corr, gre, gim, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)

    def test_scores_path_dispatch(self):
        # fft_impl="dft_pallas" through _correlate_batch == "dft".
        from deeplocalproteindocking_tpu.sweep.resplat import (
            _correlate_batch)
        from deeplocalproteindocking_tpu.correlate.fft import (
            receptor_transform)
        import jax
        if jax.default_backend() != "cpu":
            return
        rng = np.random.default_rng(1)
        L, Ls, C, B = 16, 8, 2, 2
        rec = jnp.asarray(rng.normal(size=(L, L, L, C)).astype(np.float32))
        H = receptor_transform(rec)
        reps = jnp.asarray(rng.normal(size=(B, Ls, Ls, Ls, C))
                           .astype(np.float32))
        want = _correlate_batch(H, reps, L, "dft", "float32")
        # On CPU the compiled Pallas path falls back to interpret-able
        # lowering via pallas CPU support.
        got = _correlate_batch(H, reps, L, "dft_pallas", "float32")
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)
