"""Fixed-capacity circular queues over structure-of-arrays PyTrees.

The reference keeps bombs/flames in ``FixedQueue<T, N>`` circular buffers
(pomcpp include/bboard.hpp:115-188) whose *physical slot reuse* is semantically
load-bearing: ``PlantBombModifiedLife`` (bboard.cpp:125-146) writes id/pos/
strength/time into the next free slot but never resets the direction or moved
fields, so a recycled slot can leak a stale direction into a freshly planted
bomb.  To stay bit-compatible we model queues the same way: fixed-size field
arrays plus ``head``/``count`` scalars, where logical index ``i`` lives at
physical slot ``(head + i) % N``.

All helpers are pure and shape-static, so they vectorize trivially under
``vmap`` (every operation is a gather/where over the N slots).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def slot(head, i, size: int):
    """Physical slot of logical index ``i``."""
    return (head + i) % size


def get(field: jax.Array, head, i):
    """Read logical element ``i`` of one field array."""
    return field[(head + i) % field.shape[0]]


def set_(field: jax.Array, head, i, value):
    """Write logical element ``i`` of one field array."""
    return field.at[(head + i) % field.shape[0]].set(value)


def logical_view(field: jax.Array, head):
    """Return the field rotated so logical index == array index."""
    n = field.shape[0]
    idx = (head + jnp.arange(n)) % n
    return field[idx]


def pop_front(head, count, size: int):
    """Advance the head (FixedQueue::PopElem, bboard.hpp:131-137).

    Slot contents are untouched (stale data stays, as in the reference).
    Returns (new_head, new_count).
    """
    return (head + 1) % size, count - 1


def remove_at_perm(head, count, i, size: int):
    """Per-physical-slot (take_next, keep) masks for FixedQueue::RemoveAt.

    RemoveAt (bboard.hpp:151-160) shifts logical elements (i, count) left by
    one; the vacated tail slot keeps a stale copy of the old last element.
    Returns a boolean mask over physical slots: True where the slot should
    take the value of the *next* physical slot, i.e. ``new[k] = old[(k+1)%N]``.
    """
    k = jnp.arange(size)
    r = (k - head) % size  # logical index of physical slot k
    return (r >= i) & (r < count - 1)


def remove_at(fields, head, count, i, size: int):
    """Remove logical element ``i``; returns (new_fields, head, new_count).

    ``fields`` is any PyTree of arrays whose leading dim is ``size``.
    """
    take = remove_at_perm(head, count, i, size)

    def shift(f):
        mask = take.reshape((size,) + (1,) * (f.ndim - 1))
        return jnp.where(mask, jnp.roll(f, -1, axis=0), f)

    return jax.tree.map(shift, fields), head, count - 1


def append(fields, values, head, count, size: int):
    """Write ``values`` into the next free slot (AddElem, bboard.hpp:144-146).

    ``values`` must mirror the structure of ``fields`` (scalar leaves).
    Fields whose ``values`` leaf is ``None`` are left untouched -- this is how
    we replicate the reference's stale-slot leakage (e.g. bomb direction is
    not reset on plant).  Returns (new_fields, head, new_count).
    """
    s = (head + count) % size

    def write(f, v):
        if v is None:
            return f
        return f.at[s].set(v)

    new_fields = jax.tree.map(
        write, fields, values, is_leaf=lambda x: x is None
    )
    return new_fields, head, count + 1
