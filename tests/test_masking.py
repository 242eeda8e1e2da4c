"""Score-guided masking: permutation validity + keep-set parity with a numpy
oracle that follows the reference algorithm (MCM.py:364-423) step by step."""
import numpy as np
import jax.numpy as jnp
import pytest

from textmae_tpu.masking import apply_masking, get_ids_shuffle


def _oracle_keep_set(score: np.ndarray, num_keep: int) -> set:
    """Reference keep-set semantics (distinct scores assumed)."""
    uniq = np.unique(score)
    qs = np.arange(1, 10) * 0.1
    thresholds = np.quantile(uniq, qs, method="linear")
    cats = np.searchsorted(thresholds, score, side="left")
    keep = [i for i in range(len(score)) if cats[i] == 9]
    means = np.array(
        [score[cats == g].mean() if (cats == g).any() else -np.inf for g in range(10)]
    )
    budget = num_keep - len(keep)
    logits = means[:9]
    sm = np.exp(logits - logits.max())
    sm = sm / sm.sum()
    alloc = np.round(sm * budget).astype(int)
    for g in range(9):
        members = [i for i in range(len(score)) if cats[i] == g]
        members.sort(key=lambda i: score[i])
        take = int(alloc[g])
        if take > 0:
            # raw python slice, exactly as the reference's
            # group_score[len - take:] — a negative start keeps take-n
            # elements when take exceeds the group size n (MCM.py:405-408)
            keep.extend(members[len(members) - take:])
    return set(keep[:num_keep]) if len(keep) >= num_keep else set(keep)


class TestGetIdsShuffle:
    def test_is_permutation(self, rng):
        scores = jnp.asarray(rng.uniform(size=(4, 196)), dtype=jnp.float32)
        ids = np.asarray(get_ids_shuffle(scores, 144))
        for row in ids:
            assert sorted(row.tolist()) == list(range(196))

    def test_top_decile_always_kept(self, rng):
        scores = np.asarray(rng.permutation(196), dtype=np.float32)[None] / 196.0
        ids = np.asarray(get_ids_shuffle(jnp.asarray(scores), 144))[0]
        kept = set(ids[:144].tolist())
        top = set(np.argsort(scores[0])[-19:].tolist())  # top decile by unique quantile
        assert top <= kept

    def test_keep_set_matches_oracle(self, rng):
        for trial in range(8):
            score = rng.uniform(size=196).astype(np.float32)
            score = np.unique(score)  # distinct values, len may shrink
            if len(score) < 196:
                score = rng.normal(size=196).astype(np.float32)  # distinct w.h.p.
            rng.shuffle(score)
            expected = _oracle_keep_set(score, 144)
            ids = np.asarray(get_ids_shuffle(jnp.asarray(score[None]), 144))[0]
            got = set(ids[: len(expected)].tolist())
            # keep sets must agree (ordering may differ within the kept block)
            assert got == expected, f"trial {trial}: {got ^ expected}"

    def test_keep_set_matches_torch_reference(self, rng):
        """End-to-end check against a torch implementation of the reference
        algorithm (MCM.py:364-423), including torch.quantile interpolation,
        torch.bucketize and the negative-slice allocation quirk. Distinct
        scores (tie handling is a documented divergence)."""
        torch = pytest.importorskip("torch")

        def torch_keep_set(score_t, num_keep):
            qs = torch.arange(0.1, 0.91, 0.1, dtype=torch.float32)
            thr = torch.quantile(score_t.unique(), qs, dim=0)
            cats = torch.bucketize(score_t, thr)
            kept_vals = score_t[cats == 9].tolist()
            gmeans = torch.tensor(
                [score_t[cats == g].mean() for g in range(10)]
            )
            weights = torch.softmax(gmeans[:-1], dim=0)
            alloc = torch.round(
                weights * (num_keep - len(kept_vals))
            ).int()
            for g in range(9):
                vals = torch.sort(score_t[cats == g]).values
                kept_vals.extend(vals[len(vals) - int(alloc[g]):].tolist())
            kept_idx = [
                int(torch.nonzero(score_t == v)[0]) for v in kept_vals
            ]
            return set(kept_idx[:num_keep])

        for trial in range(6):
            score = rng.normal(size=196).astype(np.float32)  # distinct w.h.p.
            assert len(np.unique(score)) == 196
            expected = torch_keep_set(torch.from_numpy(score), 144)
            ids = np.asarray(get_ids_shuffle(jnp.asarray(score[None]), 144))[0]
            got = set(ids[: len(expected)].tolist())
            assert got == expected, f"trial {trial}: {sorted(got ^ expected)}"

    def test_constant_scores_no_nan(self):
        scores = jnp.full((2, 196), 0.5, jnp.float32)
        ids = np.asarray(get_ids_shuffle(scores, 144))
        for row in ids:
            assert sorted(row.tolist()) == list(range(196))

    def test_deterministic(self, rng):
        scores = jnp.asarray(rng.uniform(size=(2, 196)), dtype=jnp.float32)
        a = np.asarray(get_ids_shuffle(scores, 144))
        b = np.asarray(get_ids_shuffle(scores, 144))
        np.testing.assert_array_equal(a, b)


class TestApplyMasking:
    def test_gather_and_restore(self, rng):
        x = jnp.asarray(rng.normal(size=(2, 196, 8)), dtype=jnp.float32)
        scores = jnp.asarray(rng.uniform(size=(2, 196)), dtype=jnp.float32)
        x_remain, ids_restore = apply_masking(x, scores, 144)
        assert x_remain.shape == (2, 144, 8)
        ids_shuffle = np.asarray(get_ids_shuffle(scores, 144))
        # restore o shuffle == identity
        restored = np.take_along_axis(ids_shuffle, np.asarray(ids_restore), axis=1)
        np.testing.assert_array_equal(restored, np.tile(np.arange(196), (2, 1)))
        # gathered tokens are the kept ones
        np.testing.assert_allclose(
            x_remain[0, 0], np.asarray(x)[0, ids_shuffle[0, 0]]
        )


def test_apply_masking_rejects_mismatched_scores_grid():
    """A scores file from a different patch grid (e.g. 196-entry 224-default
    maps fed to a 96px model) must fail loudly, not gather clamped
    out-of-range tokens into a silently-corrupt stream."""
    import pytest

    x = jnp.zeros((2, 36, 8))
    scores = jnp.zeros((2, 196))
    with pytest.raises(ValueError, match="different grid"):
        apply_masking(x, scores, 16)
