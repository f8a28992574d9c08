"""Circular-queue semantics (ports unit_test/bboard/general_test.cpp:8-61).

Verifies our SoA circular buffer reproduces FixedQueue behavior: pop/add under
head offsets, RemoveAt's left-shift, and the stale-slot retention the engine
relies on.
"""

import jax.numpy as jnp

from pomcpp_tpu.core import queue as q

N = 8


def fresh():
    return jnp.zeros((N,), jnp.int32), 0, 0  # field, head, count


def logical(field, head, count):
    return [int(q.get(field, head, i)) for i in range(count)]


def test_add_pop_wraps():
    f, head, count = fresh()
    for v in range(1, 7):
        (f,), head, count = q.append((f,), (jnp.int32(v),), head, count, N)
        f = f[0] if isinstance(f, tuple) else f
    assert logical(f, head, count) == [1, 2, 3, 4, 5, 6]
    # Pop 4, add 4 more: wraps around the physical buffer.
    for _ in range(4):
        head, count = q.pop_front(head, count, N)
    for v in range(7, 11):
        (f,), head, count = q.append((f,), (jnp.int32(v),), head, count, N)
    assert logical(f, head, count) == [5, 6, 7, 8, 9, 10]


def test_remove_at():
    f, head, count = fresh()
    for v in range(1, 6):
        (f,), head, count = q.append((f,), (jnp.int32(v),), head, count, N)
    (f,), head, count = q.remove_at((f,), head, count, 2, N)
    assert logical(f, head, count) == [1, 2, 4, 5]
    (f,), head, count = q.remove_at((f,), head, count, 0, N)
    assert logical(f, head, count) == [2, 4, 5]


def test_remove_at_with_offset_head():
    f, head, count = fresh()
    for v in range(1, 9):
        (f,), head, count = q.append((f,), (jnp.int32(v),), head, count, N)
    for _ in range(5):
        head, count = q.pop_front(head, count, N)
    for v in range(9, 13):
        (f,), head, count = q.append((f,), (jnp.int32(v),), head, count, N)
    assert logical(f, head, count) == [6, 7, 8, 9, 10, 11, 12]
    (f,), head, count = q.remove_at((f,), head, count, 3, N)
    assert logical(f, head, count) == [6, 7, 8, 10, 11, 12]


def test_stale_slot_retention():
    """Popping must not clear slot data; appends that skip fields (None)
    must leave stale values visible -- the engine's plant-bomb quirk."""
    f, head, count = fresh()
    (f,), head, count = q.append((f,), (jnp.int32(42),), head, count, N)
    head, count = q.pop_front(head, count, N)
    # The popped slot still physically holds 42.
    assert int(f[0]) == 42
    # Append with None leaves the target slot untouched.
    f2, head2, count2 = q.append((f,), (None,), head, count, N)
    assert int(f2[0][1]) == int(f[1])
    assert count2 == 1
