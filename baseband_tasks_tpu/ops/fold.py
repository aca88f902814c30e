"""Phase-binned accumulation (the fold hot loop).

The reference folds with host ``np.add.at`` scatter (integration.py:380-395).
On TPU, scatter-adds serialize; the fast formulation is a one-hot matmul
that runs on the MXU:  ``profile[b, ...] = sum_t onehot[t, b] * power[t, ...]``
= ``onehot^T @ power``.  For n_phase up to a few hundred this is a tall
skinny matmul XLA tiles perfectly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["fold_accumulate"]


def fold_accumulate(power, bins, n_phase, *, with_counts=True,
                    method="onehot"):
    """Accumulate samples into phase bins.

    Parameters
    ----------
    power : (T, ...) float array
    bins : (T,) int32 array of phase-bin indices in [0, n_phase)
    n_phase : int
    method : 'onehot' (MXU matmul, default) or 'segment' (segment_sum)

    Returns
    -------
    profile : (n_phase, ...) sums
    counts : (n_phase,) float32 sample counts (if ``with_counts``)
    """
    T = power.shape[0]
    if method == "segment":
        prof = jax.ops.segment_sum(power, bins, num_segments=n_phase)
        if not with_counts:
            return prof
        cnt = jax.ops.segment_sum(jnp.ones((T,), jnp.float32), bins,
                                  num_segments=n_phase)
        return prof, cnt
    # one-hot matmul on the MXU
    onehot = (bins[:, None] == jnp.arange(n_phase, dtype=bins.dtype)[None]
              ).astype(power.dtype)
    flat = power.reshape(T, -1)
    prof = jax.lax.dot_general(
        onehot, flat, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    prof = prof.reshape((n_phase,) + power.shape[1:])
    if not with_counts:
        return prof
    cnt = jnp.sum(onehot, axis=0).astype(jnp.float32)
    return prof, cnt
