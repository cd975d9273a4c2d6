"""Multi-layer bidirectional LSTM as pure init/apply functions.

Replaces the reference's packed-sequence torch nn.LSTM encoder
(src/models/sequential.py:11-30) with a `lax.scan` LSTM; variable lengths
are handled by masking (states freeze past each instance's length and the
backward pass runs over a per-instance length-aligned reversal), which is
the jit-friendly equivalent of pack_padded_sequence.
"""

import jax
import jax.numpy as jnp

from action_segmentation_tpu.ops.hsmm import (
    reverse_within_length as _reverse_within_length,
)


def _cell_init(rng, in_dim, hidden, xavier_w=False):
    """torch LSTM default init: U(-1/sqrt(hidden), 1/sqrt(hidden)).

    xavier_w=True replaces the WEIGHT matrices with xavier-uniform
    (fan_in + fan_out) draws while biases keep the torch default — the
    post-state of the reference's dim>1-only override loop
    (semimarkov_modules.py:814-816), which the compound encoder's LSTM
    goes through."""
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    bound = 1.0 / jnp.sqrt(hidden)
    u = lambda k, shape: jax.random.uniform(k, shape, jnp.float32, -bound, bound)
    if xavier_w:
        from action_segmentation_tpu.models.nn import xavier_uniform

        w = lambda k, shape: xavier_uniform(k, shape)
    else:
        w = u
    return {
        "w_ih": w(k1, (in_dim, 4 * hidden)),
        "w_hh": w(k2, (hidden, 4 * hidden)),
        "b_ih": u(k3, (4 * hidden,)),
        "b_hh": u(k4, (4 * hidden,)),
    }


def lstm_init(rng, input_dim, hidden_per_dir, num_layers=2, bidirectional=True,
              xavier_w=False):
    """Param pytree: layers[i] is a list of 1 (uni) or 2 (bi) cell dicts;
    directionality is inferred from the structure so the pytree stays
    all-float (differentiable)."""
    dirs = 2 if bidirectional else 1
    layers = []
    for l in range(num_layers):
        in_dim = input_dim if l == 0 else hidden_per_dir * dirs
        rng, *keys = jax.random.split(rng, dirs + 1)
        layers.append(
            [_cell_init(k, in_dim, hidden_per_dir, xavier_w) for k in keys]
        )
    return {"layers": layers}


def _run_direction(cell, x, mask):
    """x: (B, T, D); mask: (B, T) 1/0 validity. Returns (B, T, H).

    The input projection is hoisted out of the scan: one (B*T, D) x
    (D, 4H) MXU matmul instead of T latency-bound per-step matmuls —
    only the recurrent h @ w_hh stays sequential. Association order
    matches the unhoisted form (b_hh still added after the recurrent
    term)."""
    B, T, _ = x.shape
    H = cell["w_hh"].shape[0]
    xw = x @ cell["w_ih"] + cell["b_ih"]  # (B, T, 4H), one MXU matmul

    def step(carry, inp):
        h, c = carry
        xwt, mt = inp
        gates = xwt + h @ cell["w_hh"] + cell["b_hh"]
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
        mt = mt[:, None]
        h = jnp.where(mt > 0, h_new, h)
        c = jnp.where(mt > 0, c_new, c)
        return (h, c), h

    init = (jnp.zeros((B, H)), jnp.zeros((B, H)))
    _, hs = jax.lax.scan(
        step, init, (jnp.swapaxes(xw, 0, 1), jnp.swapaxes(mask, 0, 1)),
        unroll=8,  # amortize XLA loop overhead over the tiny per-step ops
    )
    return jnp.swapaxes(hs, 0, 1)


def lstm_apply(params, x, lengths, output_padding_value=0.0):
    """x: (B, T, D), lengths: (B,) -> (B, T, H_total)."""
    T = x.shape[1]
    mask = (jnp.arange(T)[None, :] < lengths[:, None]).astype(x.dtype)
    h = x
    for cells in params["layers"]:
        fwd = _run_direction(cells[0], h, mask)
        if len(cells) == 2:  # bidirectional
            h_rev = _reverse_within_length(h, lengths)
            bwd = _run_direction(cells[1], h_rev, mask)
            bwd = _reverse_within_length(bwd, lengths)
            h = jnp.concatenate([fwd, bwd], axis=-1)
        else:
            h = fwd
    return jnp.where(mask[:, :, None] > 0, h, output_padding_value)
