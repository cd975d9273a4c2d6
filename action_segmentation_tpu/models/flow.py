"""NICE coupling-layer flow for emission features.

Re-implementation of the reference's invertible feature projector
(src/models/flow.py:10-126, itself from struct-learning-with-flow), as
pure init/apply functions over a param pytree so it jits and shards with
the rest of the HSMM parameters. The flow maps features x -> h with a
log-Jacobian term that enters the training loss (semimarkov.py:270-272).
"""

import jax
import jax.numpy as jnp

from action_segmentation_tpu.models.nn import linear_init as _linear_init


def add_args(parser):
    parser.add_argument("--flow_hidden_layers", type=int, default=1)
    parser.add_argument("--flow_hidden_units", type=int, default=100)
    parser.add_argument("--flow_couple_layers", type=int, default=4)
    parser.add_argument("--flow_scale", action="store_true")
    parser.add_argument("--flow_scale_no_zero", action="store_true")


def _linear_zero(in_f, out_f):
    return {"w": jnp.zeros((in_f, out_f)), "b": jnp.zeros((out_f,))}


def relu_net_init(rng, args, in_f, out_f, zero=False):
    h = args.flow_hidden_units
    if zero:
        layers = [_linear_zero(in_f, h)]
        layers += [_linear_zero(h, h) for _ in range(args.flow_hidden_layers)]
        layers += [_linear_zero(h, out_f)]
        return {"layers": layers}
    rngs = jax.random.split(rng, args.flow_hidden_layers + 2)
    layers = [_linear_init(rngs[0], in_f, h)]
    layers += [
        _linear_init(rngs[i + 1], h, h) for i in range(args.flow_hidden_layers)
    ]
    layers += [_linear_init(rngs[-1], h, out_f)]
    return {"layers": layers}


def relu_net_apply(params, x):
    layers = params["layers"]
    h = x
    for lyr in layers[:-1]:
        h = jax.nn.relu(h @ lyr["w"] + lyr["b"])
    out = layers[-1]
    return h @ out["w"] + out["b"]


def nice_init(rng, args, features):
    half = features // 2
    cells = []
    scale_cells = []
    rngs = jax.random.split(rng, 2 * args.flow_couple_layers)
    for i in range(args.flow_couple_layers):
        cells.append(relu_net_init(rngs[2 * i], args, half, half))
        if args.flow_scale:
            scale_cells.append(
                relu_net_init(
                    rngs[2 * i + 1], args, half, half,
                    zero=not args.flow_scale_no_zero,
                )
            )
    p = {"cells": cells}
    if args.flow_scale:
        p["scale_cells"] = scale_cells
    return p


def nice_apply(params, x, per_step=False):
    """x: (..., D) -> (h (..., D), log_det).

    Alternating-half additive (or affine, with flow_scale) couplings,
    mirroring flow.py:94-126. By default log_det sums the scale outputs
    over every axis except the leading batch axis -> (B,); with
    ``per_step=True`` it sums over the feature axis only -> x.shape[:-1]
    (so callers can mask padded frames before reducing over time).
    """
    features = x.shape[-1]
    half = features // 2
    batch = x.shape[0]
    log_det = jnp.zeros(x.shape[:-1], jnp.float32)
    h = x
    scale_cells = params.get("scale_cells")
    for i, cell in enumerate(params["cells"]):
        h1 = h[..., :half]
        h2 = h[..., half:]
        if i % 2 == 1:
            h1, h2 = h2, h1
        t = relu_net_apply(cell, h1)
        if scale_cells is not None:
            s = relu_net_apply(scale_cells[i], h1)
            log_det = log_det + s.sum(axis=-1)
            h2p = jnp.exp(s) * h2 + t
        else:
            h2p = h2 + t
        if i % 2 == 1:
            h1, h2p = h2p, h1
        h = jnp.concatenate([h1, h2p], axis=-1)
    if not per_step:
        log_det = log_det.reshape(batch, -1).sum(axis=-1)
    return h, log_det
