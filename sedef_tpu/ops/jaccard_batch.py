"""Batched MinHash-sketch Jaccard scoring on device.

The TPU-side formulation of the sliding-Jaccard statistic (SURVEY §7.1):
instead of rolling an incremental ordered map one position at a time
(sliding.cc), score MANY candidate window compositions at once as a
union-rank reduction over sorted key arrays.

Semantics note: this computes the IDEAL sketch intersection — the number
of keys present in both sets among the |Q| smallest of the union.  The
reference's incremental structure drifts from that ideal through its
boundary-add quirk (a ref bit landing exactly on the boundary element is
not counted, sliding.cc:86), making its value path-dependent on insertion
order — and that drift is one-sided (missed increments only), so the
ideal bounds the reference's counter from above.  This is the core
reduction of the PRODUCTION stage-1 roll prefilter
(ops/prefilter.py::_composition_ideals): intervals whose maximum ideal
over all window compositions is below the relaxed Jaccard cutoff are
proven to fail the gate and never rolled on host.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# int32 keys: JAX runs without x64, and packed (status, hash) keys fit in
# 2k+2 <= 31 bits for k <= 14 (the device-path constraint)
INF = np.int32(2 ** 31 - 1)


@functools.partial(jax.jit, static_argnames=())
def sketch_intersection(q_keys: jax.Array, r_keys: jax.Array,
                        q_size: jax.Array, r_size: jax.Array) -> jax.Array:
    """Ideal sketch intersections, batched.

    q_keys: (B, S) sorted distinct query keys (int32), padded with INF
    r_keys: (B, M) sorted distinct ref keys (HAS_N excluded), INF-padded
    q_size: (B,) true |Q| per row; r_size: (B,) true |R|
    Returns (B,) int32: |{k in Q ∩ R : rank_union(k) < |Q|}| — the count of
    shared keys inside the |Q|-smallest union window (boundary inclusive).
    """

    def one(q, r, s, m):
        # membership of each q-key in R
        pos = jnp.searchsorted(r, q)
        pos_c = jnp.clip(pos, 0, r.shape[0] - 1)
        member = (r[pos_c] == q) & (q < INF)
        # distinct union rank of q_i = i + (#R < q_i) - (#common < q_i)
        r_less = pos  # since r sorted and q not equal below pos
        common_below = jnp.concatenate(
            [jnp.zeros(1, jnp.int32), jnp.cumsum(member.astype(jnp.int32))]
        )[:-1]
        idx = jnp.arange(q.shape[0], dtype=jnp.int32)
        rank = idx + r_less.astype(jnp.int32) - common_below
        inside = member & (rank < s) & (idx < s)
        return inside.sum().astype(jnp.int32)

    return jax.vmap(one)(q_keys, r_keys, q_size, r_size)


def windows_to_arrays(window_key_sets: list[np.ndarray], pad_to: int
                      ) -> tuple[np.ndarray, np.ndarray]:
    """Pack variable-size sorted key sets into an INF-padded matrix."""
    B = len(window_key_sets)
    out = np.full((B, pad_to), INF, dtype=np.int32)
    sizes = np.zeros(B, dtype=np.int32)
    for i, ks in enumerate(window_key_sets):
        k = np.unique(ks)
        k = k[: pad_to]
        out[i, : len(k)] = k
        sizes[i] = len(k)
    return out, sizes
