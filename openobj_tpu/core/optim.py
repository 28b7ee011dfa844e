"""AdamW with torch semantics and per-object-slot step counts.

The reference uses one torch.optim.AdamW whose param groups are appended as
objects appear (/root/reference/objnerf/train.py:78,240-251), so each
object's Adam state (step count, m, v) starts fresh at its own first frame.
With a stacked [O, ...] param axis we reproduce that exactly:

  * decoupled decay applied BEFORE the step, p *= 1 - lr*wd (torch AdamW);
  * m/v bias correction uses a PER-SLOT step count (count [O] for stacked
    fg leaves, scalar for the bg model);
  * an ``active`` [O] mask freezes dead slots entirely (no decay, no step);
  * ``reset_slot`` zeroes a slot's m/v/count when a new object is allocated.

The PE ``scale`` leaf (a constant, reference embedding.py:44) is excluded
from updates by name.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class AdamWState:
    mu: dict
    nu: dict
    count: jnp.ndarray  # [O] for stacked params, [] for single models


def _trainable(path: tuple) -> bool:
    # path entries are DictKey(...) objects; PE "scale" is a buffer
    return not any(getattr(k, "key", None) == "scale" for k in path)


def init_adamw_state(params: dict, n_slots: int | None = None) -> AdamWState:
    # mu and nu must be DISTINCT buffers (donation breaks on aliased args)
    count = (
        jnp.zeros((n_slots,), jnp.int32) if n_slots is not None
        else jnp.zeros((), jnp.int32)
    )
    return AdamWState(
        mu=jax.tree.map(jnp.zeros_like, params),
        nu=jax.tree.map(jnp.zeros_like, params),
        count=count,
    )


def adamw_update(
    params: dict,
    grads: dict,
    state: AdamWState,
    lr: float,
    weight_decay: float,
    active: jnp.ndarray | None = None,  # [O] bool for stacked params
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
) -> tuple[dict, AdamWState]:
    """One AdamW step. For stacked params (leaves [O, ...]) pass ``active``
    to gate slots; bias correction then uses the per-slot count."""
    if active is not None:
        new_count = state.count + active.astype(jnp.int32)
        gate = active
    else:
        new_count = state.count + 1
        gate = None

    t = new_count.astype(jnp.float32)
    bc1 = 1.0 - b1 ** jnp.maximum(t, 1.0)
    bc2 = 1.0 - b2 ** jnp.maximum(t, 1.0)

    def _expand(v, leaf):
        # broadcast [O] against leaf [O, ...]
        if v.ndim == 0:
            return v
        return v.reshape(v.shape + (1,) * (leaf.ndim - 1))

    def update_leaf(path, p, g, m, v):
        if not _trainable(path):
            return p, m, v
        m_new = b1 * m + (1.0 - b1) * g
        v_new = b2 * v + (1.0 - b2) * g * g
        m_hat = m_new / _expand(bc1, p)
        v_hat = v_new / _expand(bc2, p)
        p_new = p * (1.0 - lr * weight_decay)
        p_new = p_new - lr * m_hat / (jnp.sqrt(v_hat) + eps)
        if gate is not None:
            g_b = _expand(gate, p)
            p_new = jnp.where(g_b, p_new, p)
            m_new = jnp.where(g_b, m_new, m)
            v_new = jnp.where(g_b, v_new, v)
        return p_new, m_new, v_new

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree.structure(params)
    g_leaves = jax.tree.leaves(grads)
    m_leaves = jax.tree.leaves(state.mu)
    v_leaves = jax.tree.leaves(state.nu)

    new_p, new_m, new_v = [], [], []
    for (path, p), g, m, v in zip(flat, g_leaves, m_leaves, v_leaves):
        pn, mn, vn = update_leaf(path, p, g, m, v)
        new_p.append(pn)
        new_m.append(mn)
        new_v.append(vn)

    return (
        jax.tree.unflatten(treedef, new_p),
        AdamWState(
            mu=jax.tree.unflatten(treedef, new_m),
            nu=jax.tree.unflatten(treedef, new_v),
            count=new_count,
        ),
    )


def adamw_update_flat(
    params: dict,
    grads: dict,
    state: AdamWState,
    lr: float,
    weight_decay: float,
    active: jnp.ndarray | None = None,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
) -> tuple[dict, AdamWState]:
    """Exactly ``adamw_update``, but the whole step runs as ONE fused op:
    every trainable leaf is reshaped to [O, -1] (or [-1] for the unstacked
    bg model) and concatenated, the AdamW math runs on the single matrix
    with the per-slot count/active broadcast down the rows, and the result
    is split back. Identical arithmetic per element (concatenation does not
    change any op order), so outputs are bit-equal to the tree impl; the
    win is replacing ~3x n_leaves small fusions per step with one (the
    per-step fusion tail is overhead-bound — docs/PERFORMANCE.md).
    State/params keep their tree form in TrainState, so sharding,
    checkpoints, and slot ops are untouched."""
    stacked = active is not None
    if stacked:
        new_count = state.count + active.astype(jnp.int32)
    else:
        new_count = state.count + 1
    t = new_count.astype(jnp.float32)
    bc1 = 1.0 - b1 ** jnp.maximum(t, 1.0)
    bc2 = 1.0 - b2 ** jnp.maximum(t, 1.0)

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree.structure(params)
    g_leaves = jax.tree.leaves(grads)
    m_leaves = jax.tree.leaves(state.mu)
    v_leaves = jax.tree.leaves(state.nu)

    def _2d(x):
        return x.reshape(x.shape[0], -1) if stacked else x.reshape(-1)

    idx_train, segs_p, segs_g, segs_m, segs_v = [], [], [], [], []
    for i, ((path, p), g, m, v) in enumerate(
        zip(flat, g_leaves, m_leaves, v_leaves)
    ):
        if not _trainable(path):
            continue
        idx_train.append(i)
        segs_p.append(_2d(p))
        segs_g.append(_2d(g))
        segs_m.append(_2d(m))
        segs_v.append(_2d(v))
    ax = 1 if stacked else 0
    P = jnp.concatenate(segs_p, axis=ax)
    G = jnp.concatenate(segs_g, axis=ax)
    M = jnp.concatenate(segs_m, axis=ax)
    V = jnp.concatenate(segs_v, axis=ax)

    def _bcast(x):
        return x[:, None] if stacked else x

    M_new = b1 * M + (1.0 - b1) * G
    V_new = b2 * V + (1.0 - b2) * G * G
    P_new = P * (1.0 - lr * weight_decay)
    P_new = P_new - lr * (M_new / _bcast(bc1)) / (
        jnp.sqrt(V_new / _bcast(bc2)) + eps
    )
    if stacked:
        gate = active[:, None]
        P_new = jnp.where(gate, P_new, P)
        M_new = jnp.where(gate, M_new, M)
        V_new = jnp.where(gate, V_new, V)

    new_p = [p for _, p in flat]
    new_m = list(m_leaves)
    new_v = list(v_leaves)
    ofs = 0
    for i, pseg in zip(idx_train, segs_p):
        k = pseg.shape[-1]
        sl = (slice(None), slice(ofs, ofs + k)) if stacked \
            else slice(ofs, ofs + k)
        shape = flat[i][1].shape
        new_p[i] = P_new[sl].reshape(shape)
        new_m[i] = M_new[sl].reshape(shape)
        new_v[i] = V_new[sl].reshape(shape)
        ofs += k

    return (
        jax.tree.unflatten(treedef, new_p),
        AdamWState(
            mu=jax.tree.unflatten(treedef, new_m),
            nu=jax.tree.unflatten(treedef, new_v),
            count=new_count,
        ),
    )


def reset_slot(state: AdamWState, slot) -> AdamWState:
    """Zero a slot's optimizer state (fresh object in a reused slot)."""
    return AdamWState(
        mu=jax.tree.map(lambda x: x.at[slot].set(0.0), state.mu),
        nu=jax.tree.map(lambda x: x.at[slot].set(0.0), state.nu),
        count=state.count.at[slot].set(0),
    )
