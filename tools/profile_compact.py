"""Micro-profile of the fine_cap score-ranked compaction.

The change_stride bench (103.9 ms/iter) exceeds the stage sum
(87.5 ms); the one block the stage profiler does not time is the
top-`fine_cap` compaction (argsort over nb=3072 rows). This times the
current argsort formulation against candidate selections on the TPU.

Usage: python tools/profile_compact.py
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

NB = 3072  # change_stride pooled grid rows (48*64)
CAP = 1200
BATCH = 2
LO, HI = 2, 16


def marginal(fn, *args, lo=LO, hi=HI):
    def timed(iters):
        float(fn(*args, iters))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(fn(*args, iters))
            best = min(best, time.perf_counter() - t0)
        return best

    return (timed(hi) - timed(lo)) / (hi - lo)


def loopify(body_fn):
    @functools.partial(jax.jit, static_argnums=1)
    def run(x, iters):
        def body(i, carry):
            x, acc = carry
            s = body_fn(x, i)
            bump = (s * 1e-20).astype(x.dtype)
            return x + bump, acc + s.astype(jnp.float32)

        _, acc = jax.lax.fori_loop(0, iters, body, (x, jnp.float32(0.0)))
        return acc

    return run


def _monotone_key(s: jax.Array, valid: jax.Array) -> jax.Array:
    """float32 scores -> int32 keys with the same ordering (invalid
    rows -> INT32_MIN). Standard radix trick: flip the sign bit for
    non-negative floats, all bits for negative ones."""
    bits = jax.lax.bitcast_convert_type(s, jnp.int32)
    key = jnp.where(bits >= 0, bits ^ jnp.int32(-2147483648), ~bits)
    return jnp.where(valid, key, jnp.int32(-2147483648))


def _topcap_order(scores: jax.Array, valid: jax.Array, cap: int) -> jax.Array:
    """Indices of the top-`cap` rows by (valid, score, -index) WITHOUT a
    sort: 31-step integer bisection for the cap-th largest key, then a
    stable cumsum partition. The kept SET equals
    ``argsort(-where(valid, s, -inf))[:cap]`` exactly (stable ties);
    kept rows come out in row order, not score order."""
    b, n = scores.shape
    key = _monotone_key(scores, valid)

    # find T = cap-th largest key: smallest t with count(key > t) < cap
    def bisect(i, lohi):
        lo, hi = lohi  # invariant: count(> hi) < cap <= count(> lo)
        # overflow-safe floor((lo+hi)/2); lo <= mid < hi when lo < hi
        mid = (lo >> 1) + (hi >> 1) + (lo & hi & 1)
        n_gt = jnp.sum(key > mid[:, None], axis=1)
        take_hi = n_gt < cap
        return jnp.where(take_hi, lo, mid), jnp.where(take_hi, mid, hi)

    lo0 = jnp.full((b,), -2147483648, jnp.int32)
    hi0 = jnp.full((b,), 2147483647, jnp.int32)
    lo, hi = jax.lax.fori_loop(0, 32, bisect, (lo0, hi0))
    t = hi  # count(key > t) < cap <= count(key >= t)

    above = key > t[:, None]
    n_above = jnp.sum(above, axis=1, keepdims=True)
    tie = key == t[:, None]
    tie_rank = jnp.cumsum(tie, axis=1)
    keep = above | (tie & (tie_rank <= cap - n_above))
    # stable partition: kept rows to the front (row order), dropped after
    n_keep = jnp.sum(keep, axis=1, keepdims=True)  # == cap when n >= cap
    pos = jnp.where(
        keep,
        jnp.cumsum(keep, axis=1) - 1,
        n_keep + jnp.cumsum(~keep, axis=1) - 1,
    ).astype(jnp.int32)
    inv = jnp.zeros((b, n), jnp.int32)
    inv = jax.vmap(lambda iv, p: iv.at[p].set(jnp.arange(n, dtype=jnp.int32)))(
        inv, pos
    )
    return inv[:, :cap]


def main():
    key = jax.random.PRNGKey(0)
    scores = jax.random.uniform(key, (BATCH, NB), jnp.float32)
    coords = jax.random.uniform(
        jax.random.PRNGKey(1), (BATCH, NB, 4), jnp.float32
    )
    valid = jax.random.uniform(jax.random.PRNGKey(2), (BATCH, NB)) > 0.55

    def gather_all(order, s):
        c = jnp.take_along_axis(coords, order[..., None], axis=1)
        sc = jnp.take_along_axis(s, order, axis=1)
        v = jnp.take_along_axis(valid, order, axis=1)
        return jnp.sum(c) * 1e-9 + jnp.sum(sc) + jnp.sum(v)

    def argsort_compact(s, i):
        rank = jnp.where(valid, s, -jnp.inf)
        order = jnp.argsort(-rank, axis=1)[:, :CAP]
        return gather_all(order, s)

    t = marginal(loopify(argsort_compact), scores)
    print(f"{'argsort compaction':28s} {t * 1e3:8.2f} ms")

    def topk_compact(s, i):
        rank = jnp.where(valid, s, -jnp.inf)
        _, order = jax.lax.top_k(rank, CAP)
        return gather_all(order, s)

    t = marginal(loopify(topk_compact), scores)
    print(f"{'lax.top_k compaction':28s} {t * 1e3:8.2f} ms")

    def threshold_compact(s, i):
        return gather_all(_topcap_order(s, valid, CAP), s)

    t = marginal(loopify(threshold_compact), scores)
    print(f"{'bisect+cumsum compaction':28s} {t * 1e3:8.2f} ms")

    # keep-SET equality vs the argsort formulation
    rank = jnp.where(valid, scores, -jnp.inf)
    ref = np.sort(np.asarray(jnp.argsort(-rank, axis=1)[:, :CAP]), axis=1)
    got = np.sort(np.asarray(_topcap_order(scores, valid, CAP)), axis=1)
    print("bisect keep-set == argsort keep-set:", bool(np.all(ref == got)))


if __name__ == "__main__":
    main()
