"""SubsetCoder + canonical keep-order tests."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.special import gammaln

from textmae_tpu.coding.subset import SubsetCoder, ids_restore_from_kept
from textmae_tpu.coding.permutation import PermutationCoder
from textmae_tpu.eval.harness import code_side_info
from textmae_tpu.masking import apply_masking, get_ids_shuffle


def _log2_choose(n, k):
    return (gammaln(n + 1) - gammaln(k + 1) - gammaln(n - k + 1)) / np.log(2)


def test_subset_roundtrip(rng):
    for L, K in [(196, 144), (36, 16), (10, 10), (10, 0), (5, 1)]:
        coder = SubsetCoder(L, K)
        for _ in range(3):
            kept = np.sort(rng.choice(L, K, replace=False))
            data = coder.compress(kept)
            np.testing.assert_array_equal(coder.decompress(data), kept)


def test_subset_near_optimal(rng):
    L, K = 196, 144
    coder = SubsetCoder(L, K)
    bits = len(coder.compress(np.sort(rng.choice(L, K, replace=False)))) * 8
    optimal = _log2_choose(L, K)  # ~164 bits
    assert bits <= optimal * 1.05 + 96  # quantization + flush slack
    # dramatically better than coding the full permutation
    perm_bits = len(PermutationCoder(L).compress(rng.permutation(L))) * 8
    assert bits < perm_bits / 4


def test_subset_rejects_bad_input():
    coder = SubsetCoder(10, 3)
    with pytest.raises(ValueError):
        coder.compress(np.array([1, 1, 2]))
    with pytest.raises(ValueError):
        coder.compress(np.array([1, 2, 99]))


def test_ids_restore_from_kept():
    kept = np.array([0, 2, 3])
    ids = ids_restore_from_kept(kept, 5)
    # ids_shuffle = [0,2,3,1,4]; restore = argsort -> [0,3,1,2,4]
    np.testing.assert_array_equal(ids, [0, 3, 1, 2, 4])


def test_canonical_masking_same_keep_set(rng):
    scores = jnp.asarray(rng.random((3, 36), np.float32))
    ref = np.asarray(get_ids_shuffle(scores, 16, canonical=False))
    can = np.asarray(get_ids_shuffle(scores, 16, canonical=True))
    for i in range(3):
        assert set(ref[i, :16]) == set(can[i, :16])  # same kept SET
        np.testing.assert_array_equal(can[i, :16], np.sort(can[i, :16]))  # ascending
        np.testing.assert_array_equal(can[i, 16:], np.sort(can[i, 16:]))
        # canonical permutation is derivable from the set alone
        np.testing.assert_array_equal(
            ids_restore_from_kept(can[i, :16], 36), np.argsort(can[i])
        )


def test_code_side_info_both_modes(rng):
    scores = jnp.asarray(rng.random((2, 36), np.float32))
    for canonical in (False, True):
        ids_shuffle = np.asarray(get_ids_shuffle(scores, 16, canonical=canonical))
        ids_restore = np.argsort(ids_shuffle, axis=1)
        payloads, decoded = code_side_info(ids_restore, 16, canonical)
        np.testing.assert_array_equal(decoded, ids_restore)
    # canonical side info is much smaller
    ids_c = np.argsort(np.asarray(get_ids_shuffle(scores, 16, canonical=True)), axis=1)
    ids_p = np.argsort(np.asarray(get_ids_shuffle(scores, 16, canonical=False)), axis=1)
    pc, _ = code_side_info(ids_c, 16, True)
    pp, _ = code_side_info(ids_p, 16, False)
    assert len(pc[0]) < len(pp[0])


def test_apply_masking_canonical_gathers_raster_order(rng):
    x = jnp.asarray(rng.random((1, 36, 4), np.float32))
    scores = jnp.asarray(rng.random((1, 36), np.float32))
    x_remain, ids_restore = apply_masking(x, scores, 16, canonical=True)
    ids_shuffle = np.argsort(np.asarray(ids_restore[0]))
    kept = ids_shuffle[:16]
    np.testing.assert_array_equal(kept, np.sort(kept))
    np.testing.assert_allclose(
        np.asarray(x_remain[0]), np.asarray(x[0])[kept], rtol=1e-6
    )
