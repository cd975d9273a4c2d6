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
    except Exception as e:
        # say so loudly: silently losing the persistent cache means
        # every run re-pays the minutes-per-shape remote compiles
        import logging

        logging.getLogger("action_segmentation_tpu").warning(
            "persistent compilation cache disabled ({}); compiles will "
            "not be reused across runs".format(e)
        )


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
