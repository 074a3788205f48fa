"""Pallas kernel tests (interpret mode on CPU)."""

from __future__ import annotations

import numpy as np


class TestPartSumsFused:
    def test_matches_einsum(self):
        import jax.numpy as jnp

        from smplfitter_tpu.ops.part_sums_pallas import part_sums_fused

        rng = np.random.default_rng(0)
        B, N, J = 16, 256, 24
        pm = np.zeros((J, N), np.float32)
        pm[rng.integers(0, J, N), np.arange(N)] = 1.0
        for Ba in (1, B):
            tT = jnp.asarray(rng.normal(size=(B, 3, N)).astype(np.float32))
            aT = jnp.asarray(rng.normal(size=(Ba, 3, N)).astype(np.float32))
            raw, st, sa = part_sums_fused(tT, aT, jnp.asarray(pm), interpret=True)
            a_full = np.broadcast_to(np.asarray(aT), (B, 3, N))
            raw_ref = np.einsum('jn,bcn,bdn->bjcd', pm, np.asarray(tT), a_full)
            st_ref = np.einsum('jn,bcn->bjc', pm, np.asarray(tT))
            sa_ref = np.einsum('jn,bcn->bjc', pm, np.asarray(aT))
            np.testing.assert_allclose(np.asarray(raw), raw_ref, atol=1e-4)
            np.testing.assert_allclose(np.asarray(st), st_ref, atol=1e-5)
            np.testing.assert_allclose(np.asarray(sa), sa_ref, atol=1e-5)
