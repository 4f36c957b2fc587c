"""Pair indexing / masked pairwise reduction tests."""
import jax.numpy as jnp
import numpy as np

from dlp_admm_tpu.ops import pairs


class TestPairs:
    def test_indices(self):
        idx_i, idx_j = pairs.pair_indices(4)
        assert pairs.num_pairs(4) == 6
        got = set(zip(np.asarray(idx_i).tolist(), np.asarray(idx_j).tolist()))
        assert got == {(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)}

    def test_gather_scatter_roundtrip(self):
        rng = np.random.default_rng(0)
        v = jnp.asarray(rng.normal(size=(5, 3)))
        gi, gj = pairs.pair_gather(v, 5)
        assert gi.shape == (10, 3)
        # scatter of ones counts each vehicle's pair membership (n-1 each)
        ones = jnp.ones((10, 3))
        counts = pairs.pair_scatter_sum(ones, ones, 5)
        np.testing.assert_allclose(np.asarray(counts), 4.0)
        # scatter(gather(x)) sums x over each vehicle's pairs
        out = pairs.pair_scatter_sum(gi, gj, 5)
        np.testing.assert_allclose(np.asarray(out), 4.0 * np.asarray(v),
                                   atol=1e-12)

    def test_proximity_mask_reference_semantics(self):
        """Reference compares squared distance < unsquared threshold
        (casadi/main.py:112-113)."""
        x = jnp.array([[0.0, 0.0], [1.2, 1.2], [10.0, 10.0]])
        y = jnp.zeros((3, 2))
        mask = pairs.proximity_mask(x, y, dis_thres=2.0, num_veh=3)
        # pair (0,1): d2 = 1.44 < 2 -> active; others far
        np.testing.assert_array_equal(np.asarray(mask), [True, False, False])
