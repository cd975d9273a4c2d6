"""Small neural-net building blocks as pure init/apply param-dict functions."""

import jax
import jax.numpy as jnp
import numpy as np


def xavier_uniform(rng, shape):
    fan_in, fan_out = shape[0], shape[-1]
    bound = float(np.sqrt(6.0 / (fan_in + fan_out)))
    return jax.random.uniform(rng, shape, jnp.float32, -bound, bound)


def linear_init(rng, in_f, out_f, xavier=False):
    kw, kb = jax.random.split(rng)
    # torch nn.Linear default bias: U(-1/sqrt(fan_in), 1/sqrt(fan_in)).
    # The xavier path keeps it too: the reference's override loop
    # (semimarkov_modules.py:814-816) xavier-inits only dim>1 params,
    # leaving every bias at the torch default — zero biases would be a
    # different from-scratch init distribution than the reference's.
    bound = 1.0 / float(np.sqrt(in_f))
    b = jax.random.uniform(kb, (out_f,), jnp.float32, -bound, bound)
    if xavier:
        w = xavier_uniform(kw, (in_f, out_f))
    else:
        w = jax.random.uniform(kw, (in_f, out_f), jnp.float32, -bound, bound)
    return {"w": w, "b": b}


def linear(p, x):
    return x @ p["w"] + p["b"]


def mlp_init(rng, dims, xavier=False):
    """Plain ReLU MLP: dims = [in, h1, ..., out]."""
    keys = jax.random.split(rng, len(dims) - 1)
    return {
        "layers": [
            linear_init(k, a, b, xavier)
            for k, a, b in zip(keys, dims[:-1], dims[1:])
        ]
    }


def mlp_apply(p, x, final_activation=False):
    layers = p["layers"]
    for lyr in layers[:-1]:
        x = jax.nn.relu(linear(lyr, x))
    x = linear(layers[-1], x)
    return jax.nn.relu(x) if final_activation else x


def residual_mlp_init(rng, in_dim, hidden, out_dim, n_residual, xavier=True):
    """[Linear, n x ResidualLayer(lin1, lin2), Linear] matching the
    reference's ResidualLayer (semimarkov_modules.py:42-49)."""
    keys = jax.random.split(rng, 2 + 2 * n_residual)
    return {
        "in": linear_init(keys[0], in_dim, hidden, xavier),
        "res": [
            {
                "lin1": linear_init(keys[1 + 2 * i], hidden, hidden, xavier),
                "lin2": linear_init(keys[2 + 2 * i], hidden, hidden, xavier),
            }
            for i in range(n_residual)
        ],
        "out": linear_init(keys[-1], hidden, out_dim, xavier),
    }


def residual_mlp_apply(p, x):
    h = linear(p["in"], x)
    for r in p["res"]:
        h = jax.nn.relu(linear(r["lin2"], jax.nn.relu(linear(r["lin1"], h)))) + h
    return linear(p["out"], h)
