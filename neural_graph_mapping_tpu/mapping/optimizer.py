"""Per-field Adam with gather/scatter slice updates, inside jit.

TPU-native replacement for the reference's manual Adam-state surgery
(run_mapping.py:347-389, 670-707, 1184-1221): where the reference swaps
parameter tensors in and out of a torch.optim.Adam and slices its
``exp_avg``/``exp_avg_sq`` buffers by field id, here the optimizer state is
simply a pytree mirroring the stacked field params (leading field axis) plus a
per-field step counter, and one jitted function gathers the active slice,
applies Adam (torch semantics: weight decay added to the gradient before the
moment updates), and scatters back. Fields masked invalid are left untouched.

One deliberate improvement over the reference: the reference shares a single
scalar Adam step across all fields (run_mapping.py:380, 693) which skews bias
correction for freshly-allocated fields; here steps are per-field.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class AdamConfig(NamedTuple):
    learning_rate: float = 1e-3
    beta1: float = 0.9
    beta2: float = 0.999
    eps: float = 1e-15  # reference config adam_eps (neural_graph_map.yaml)
    weight_decay: float = 1e-5  # reference adam_weight_decay


class AdamState(NamedTuple):
    m: dict  # same pytree structure as params (leading field axis)
    v: dict
    steps: jnp.ndarray  # (num_fields,) int32


def init_adam_state(params) -> AdamState:
    zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
    n = next(iter(jax.tree_util.tree_leaves(params))).shape[0]
    return AdamState(
        m=zeros,
        v=jax.tree_util.tree_map(jnp.zeros_like, params),
        steps=jnp.zeros((n,), jnp.int32),
    )


def grow_adam_state(state: AdamState, grown_params) -> AdamState:
    """Pad optimizer state to a grown field capacity (new slots zeroed),
    mirroring _add_fields' zero init for new fields (run_mapping.py:380-388)."""

    def pad_like(old, new_template):
        pad = new_template.shape[0] - old.shape[0]
        if pad == 0:
            return old
        return jnp.concatenate(
            [old, jnp.zeros((pad,) + old.shape[1:], old.dtype)], axis=0
        )

    n = next(iter(jax.tree_util.tree_leaves(grown_params))).shape[0]
    return AdamState(
        m=jax.tree_util.tree_map(pad_like, state.m, grown_params),
        v=jax.tree_util.tree_map(pad_like, state.v, grown_params),
        steps=pad_like(state.steps, jnp.zeros((n,), jnp.int32)),
    )


def _expand(x: jnp.ndarray, like: jnp.ndarray) -> jnp.ndarray:
    """Broadcast a (F,) vector over a (F, ...) leaf."""
    return x.reshape(x.shape + (1,) * (like.ndim - 1))


def adam_slice_update(
    cfg: AdamConfig,
    params,
    state: AdamState,
    field_ids: jnp.ndarray,  # (F,)
    field_valid: jnp.ndarray,  # (F,)
    grads,  # pytree of gathered-slice grads, leading axis F
    sub_params,  # gathered slice of params (leading axis F)
) -> Tuple[dict, AdamState]:
    """Adam step on the gathered field slice, scattered back into the full
    stacked params/state. Invalid fields keep params and state unchanged."""
    sub_m = jax.tree_util.tree_map(lambda t: t[field_ids], state.m)
    sub_v = jax.tree_util.tree_map(lambda t: t[field_ids], state.v)
    sub_steps = state.steps[field_ids]

    new_steps = sub_steps + field_valid.astype(jnp.int32)
    t = jnp.maximum(new_steps, 1).astype(jnp.float32)
    bc1 = 1.0 - cfg.beta1**t
    bc2 = 1.0 - cfg.beta2**t

    def leaf_update(p, g, m, v):
        g = g + cfg.weight_decay * p  # torch Adam: decay folded into the grad
        m_new = cfg.beta1 * m + (1.0 - cfg.beta1) * g
        v_new = cfg.beta2 * v + (1.0 - cfg.beta2) * g * g
        m_hat = m_new / _expand(bc1, m_new)
        v_hat = v_new / _expand(bc2, v_new)
        p_new = p - cfg.learning_rate * m_hat / (jnp.sqrt(v_hat) + cfg.eps)
        ok = _expand(field_valid, p)
        return (
            jnp.where(ok, p_new, p),
            jnp.where(ok, m_new, m),
            jnp.where(ok, v_new, v),
        )

    new_sub_params, new_sub_m, new_sub_v = {}, {}, {}
    for k in sub_params:
        new_sub_params[k], new_sub_m[k], new_sub_v[k] = leaf_update(
            sub_params[k], grads[k], sub_m[k], sub_v[k]
        )

    # scatter back; invalid slots write their own unchanged values (safe)
    scatter = lambda full, sub: full.at[field_ids].set(sub)
    new_params = jax.tree_util.tree_map(scatter, params, new_sub_params)
    new_m = jax.tree_util.tree_map(scatter, state.m, new_sub_m)
    new_v = jax.tree_util.tree_map(scatter, state.v, new_sub_v)
    steps_full = state.steps.at[field_ids].set(
        jnp.where(field_valid, new_steps, sub_steps)
    )
    return new_params, AdamState(m=new_m, v=new_v, steps=steps_full)
