"""Small host-side helpers (parity with reference src/utils/utils.py:4-28)."""

import os
import pickle


def enable_compilation_cache():
    """Persist compiled executables across runs; compiles on this
    platform's remote-compile path take minutes per shape."""
    import jax

    cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.expanduser("~/.cache/action_segmentation_tpu_jax"),
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def all_equal(xs):
    xs = list(xs)
    return all(x == xs[0] for x in xs[1:])


def nested_dict_map(nested_dict, value_map):
    """Apply ``value_map(outer_key, inner_key, value)`` over a 2-level dict."""
    return {
        outer_key: {
            inner_key: value_map(outer_key, inner_key, value)
            for inner_key, value in inner_dict.items()
        }
        for outer_key, inner_dict in nested_dict.items()
    }


def load_pickle(fname):
    with open(fname, "rb") as f:
        return pickle.load(f)
