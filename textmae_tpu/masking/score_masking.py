"""Score-guided token selection, fully vectorized for TPU.

Reimplements the semantics of the reference's host-side per-sample loop
(/root/reference/models/Compression/MCM.py:364-423 `get_ids_shuffle` and
:548-588 `random_masking`) as static-shape XLA ops vmapped over the batch —
no device->host sync, no Python loops, jit/vmap/shard_map compatible.

Algorithm (per sample, L patch scores, budget K = num_keep_patches):
  1. decile thresholds from the quantiles of the *unique* score values
     (torch.quantile semantics: linear interpolation),
  2. bucketize scores into 10 groups (value == threshold -> lower bucket,
     torch.bucketize right=False),
  3. keep ALL of the top decile (group 9),
  4. distribute the remaining budget over groups 0..8 proportionally to
     softmax(group means), rounded,
  5. within each group keep the highest-scoring patches up to its allocation,
  6. ids_shuffle = kept indices first (group 9 in index order, then groups
     0..8), remaining indices appended in index order.

Step 5's per-group keep COUNT replicates the reference's Python slice
`sorted_group[len - alloc:]` exactly, including its negative-start quirk:
an allocation `a` for a group of size n keeps
    a          if a <= n,
    a - n      if n < a <= 2n   (negative slice start keeps the LAST a-n),
    n          if a > 2n        (start clamps past the front).
The middle case is common (softmax allocation routinely exceeds a group by a
few), so matching it is required for keep-set parity with reference-trained
checkpoints (verified against a torch implementation of MCM.py:364-423 in
tests/test_masking.py).

Deliberate divergences from the reference (documented per SURVEY.md §7):
  * empty groups get softmax weight 0 instead of propagating NaN,
  * ties inside a group break by original index (stable sort) instead of the
    reference's value-Counter first-occurrence scan (identical on distinct
    scores; real score maps are near-distinct).
The keep-set semantics and the ids_shuffle/ids_restore contract match.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

_NUM_GROUPS = 10


def _unique_quantiles(score: jnp.ndarray) -> jnp.ndarray:
    """Deciles (0.1..0.9, linear interpolation) of the unique values of `score`."""
    l = score.shape[0]
    sorted_vals = jnp.sort(score)
    is_new = jnp.concatenate(
        [jnp.ones((1,), bool), sorted_vals[1:] != sorted_vals[:-1]]
    )
    u = is_new.sum()
    # Compact unique values to the front, preserving ascending order.
    order = jnp.argsort(~is_new, stable=True)
    uniq = sorted_vals[order]
    q = jnp.arange(1, _NUM_GROUPS, dtype=jnp.float32) * 0.1
    pos = q * (u - 1).astype(jnp.float32)
    lo = jnp.floor(pos).astype(jnp.int32).clip(0, l - 1)
    hi = jnp.ceil(pos).astype(jnp.int32).clip(0, l - 1)
    frac = pos - lo.astype(jnp.float32)
    return uniq[lo] * (1.0 - frac) + uniq[hi] * frac


def _ids_shuffle_single(score: jnp.ndarray, num_keep: int) -> jnp.ndarray:
    l = score.shape[0]
    idx = jnp.arange(l, dtype=jnp.float32)

    thresholds = _unique_quantiles(score)
    # torch.bucketize(right=False): value == threshold goes to the lower bucket
    cats = jnp.searchsorted(thresholds, score, side="left").astype(jnp.int32)

    onehot = cats[:, None] == jnp.arange(_NUM_GROUPS, dtype=jnp.int32)[None, :]
    counts = onehot.sum(axis=0)
    sums = (score[:, None] * onehot).sum(axis=0)
    means = jnp.where(counts > 0, sums / jnp.maximum(counts, 1), -jnp.inf)

    budget = num_keep - counts[_NUM_GROUPS - 1]
    sm = jax.nn.softmax(means[: _NUM_GROUPS - 1])
    sm = jnp.where(jnp.isnan(sm), 0.0, sm)
    alloc = jnp.maximum(jnp.round(sm * budget).astype(jnp.int32), 0)
    # reference slice semantics: sorted_group[n - a:] keeps a, a-n, or n
    # elements for a<=n, n<a<=2n, a>2n respectively (see module docstring)
    c9 = counts[: _NUM_GROUPS - 1]
    take = jnp.where(
        alloc <= c9, alloc, jnp.where(alloc <= 2 * c9, alloc - c9, c9)
    )
    alloc_full = jnp.concatenate([take, counts[_NUM_GROUPS - 1 :]])

    # Within-group descending-score rank (ties -> original index order):
    group_order = jnp.lexsort((idx, -score, cats))
    starts = jnp.concatenate([jnp.zeros((1,), counts.dtype), jnp.cumsum(counts)[:-1]])
    rank_sorted = jnp.arange(l, dtype=jnp.int32) - starts[cats[group_order]]
    keep_sorted = rank_sorted < alloc_full[cats[group_order]]
    keep = jnp.zeros((l,), bool).at[group_order].set(keep_sorted)

    # Final permutation: kept first (group 9 by index, then groups 0..8 by
    # ascending score as the reference appends them), then the rest by index.
    is_kept9 = keep & (cats == _NUM_GROUPS - 1)
    primary = jnp.where(keep, 0.0, 1.0)
    secondary = jnp.where(is_kept9, 0.0, jnp.where(keep, 1.0 + cats.astype(jnp.float32), 0.0))
    tertiary = jnp.where(is_kept9, idx, jnp.where(keep, score, idx))
    return jnp.lexsort((idx, tertiary, secondary, primary)).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("num_keep", "canonical"))
def get_ids_shuffle(
    scores: jnp.ndarray, num_keep: int, canonical: bool = False
) -> jnp.ndarray:
    """(N, L) scores -> (N, L) permutation; first `num_keep` entries are the kept ids.

    canonical=True re-orders both segments by ascending patch index. The kept
    SET is unchanged (same score-guided selection), but the permutation then
    carries no information beyond the set, so the ids_restore side info codes
    in log2(C(L, K)) bits (~164 for 196/144) instead of ~log2(L!) (~1243) —
    see coding/subset.py. Ascending order also lays kept tokens out in raster
    order on the sqrt(K) x sqrt(K) latent grid, preserving spatial locality
    for the g_a/h_a convolutions (the reference's score-ordered arrangement
    scatters neighbors). Reference-exact ordering = canonical=False.
    """
    if num_keep > scores.shape[-1]:
        raise ValueError("num_keep must not exceed the number of patches")
    ids_shuffle = jax.vmap(lambda s: _ids_shuffle_single(s, num_keep))(scores)
    if not canonical:
        return ids_shuffle
    l = scores.shape[-1]
    keep = jnp.zeros(scores.shape, bool).at[
        jnp.arange(scores.shape[0])[:, None], ids_shuffle[:, :num_keep]
    ].set(True)
    # stable argsort of (not kept): kept ascending first, then rest ascending
    return jnp.argsort(~keep, axis=-1, stable=True).astype(jnp.int32)


def apply_masking(
    x: jnp.ndarray, scores: jnp.ndarray, num_keep: int, canonical: bool = False
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Gather the kept tokens. x: (N, L, D), scores: (N, L).

    Returns (x_remain (N, num_keep, D), ids_restore (N, L)) with the same
    contract as the reference random_masking (MCM.py:548-588).
    """
    if scores.shape[-1] != x.shape[1]:
        # a scores file generated for a different patch grid (e.g. the
        # default 224/16 = 196-entry maps fed to a 96px model) would
        # otherwise gather out-of-range token indexes — clamped, silently
        # corrupt — and desynchronize every downstream shape
        raise ValueError(
            f"scores length {scores.shape[-1]} != patch count {x.shape[1]}: "
            "the scores file was generated for a different grid / input "
            "size (regenerate with cli.generate_scores for this resolution)"
        )
    ids_shuffle = get_ids_shuffle(scores, num_keep, canonical)
    ids_restore = jnp.argsort(ids_shuffle, axis=1).astype(jnp.int32)
    ids_keep = ids_shuffle[:, :num_keep]
    x_remain = jnp.take_along_axis(x, ids_keep[:, :, None], axis=1)
    return x_remain, ids_restore
