"""Test configuration: run all tests on an 8-device virtual CPU mesh.

Multi-chip sharding is validated without TPU hardware by forcing the host
platform to present 8 devices. The environment's sitecustomize registers
an 'axon' TPU plugin and pins JAX_PLATFORMS, so we override via
jax.config after import (before any backend is initialized).
"""

import os

# Tests run the Pallas kernels in interpret mode, where the manual
# time-loop unroll (ops/hsmm_pallas._UNROLL, default 16 — a compiled-
# Mosaic pipelining win) only multiplies tracing cost. Must be set
# before the package is imported.
os.environ.setdefault("ASEG_SCAN_UNROLL", "1")

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert len(jax.devices()) == 8, jax.devices()


def make_sm_args(batch_size=10, **overrides):
    """THE SemiMarkovModel test-args builder (one copy; the suite had
    ~9 drifting duplicates before round 5). batch_size is the only
    knob the copies varied; everything else overrides by attribute."""
    import argparse

    from action_segmentation_tpu.models.base import add_training_args
    from action_segmentation_tpu.models.semimarkov import SemiMarkovModel

    parser = argparse.ArgumentParser()
    SemiMarkovModel.add_args(parser)
    add_training_args(parser)
    parser.add_argument("--batch_size", type=int, default=batch_size)
    parser.add_argument(
        "--annotate_background_with_previous", action="store_true"
    )
    parser.add_argument("--no_merge_classes", action="store_true")
    args = parser.parse_args([])
    for k, v in overrides.items():
        setattr(args, k, v)
    return args
