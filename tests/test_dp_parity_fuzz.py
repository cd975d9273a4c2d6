"""Standing differential-fuzz slice against the reference's log_hsmm.

Round-3 verdict weak-item 2: the randomized differential sweep
(scripts/dp_parity_fuzz.py — the tool that caught the real bf16 emission
bug on chip) ran only when someone remembered to run it, so a semantic
regression in the kernels/factors could pass the pinned parity configs
(tests/test_reference_dp_parity.py) until the next manual fuzz. This
file makes a deterministic seeded slice of that sweep a standing test:
every pytest run re-verifies logZ / Viterbi / marginals / additional
ends / merges / narration penalties / valid-class subsets against the
reference's own edge-tensor DP (semimarkov_modules.py:416-523), both for
the Gaussian module and for randomized compound (ComponentSemiMarkov)
structures routed through the verified import mapping.

The seeds are FIXED (not time-derived): the slice is a regression
contract, not a hunt. Widen the hunt with the script:
  python scripts/dp_parity_fuzz.py 120 <fresh-seed>
  python scripts/dp_parity_fuzz.py --compound 40 <fresh-seed>
"""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference/src"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference mount not available"
)

# the same RNG stream the one-off sweeps used (seed 0 swept clean in
# round 3, including the post-fix on-chip run), truncated to a slice
# sized for the CPU suite
N_GAUSSIAN = 14
N_COMPOUND = 6
SEED = 0


@pytest.fixture(scope="module")
def fuzz_mod():
    scripts_dir = os.path.join(os.path.dirname(__file__), "..", "scripts")
    sys.path.insert(0, scripts_dir)
    try:
        import dp_parity_fuzz

        yield dp_parity_fuzz
    finally:
        # remove the exact entry: a blind pop(0) would remove whatever
        # another test inserted at index 0 in the meantime
        sys.path.remove(scripts_dir)


@pytest.fixture(scope="module")
def ref_sm():
    # reuse the parity harness's reference-module fixture (fixtures
    # don't cross test files outside conftest, so materialize it here
    # the same way the sweep script does)
    import tests.test_reference_dp_parity as harness

    gen = harness.ref_sm.__wrapped__()
    yield next(gen)
    try:
        next(gen)
    except StopIteration:
        pass


def test_gaussian_fuzz_slice(ref_sm, fuzz_mod):
    import tests.test_reference_dp_parity as harness

    rng = np.random.RandomState(SEED)
    ran = 0
    for i in range(N_GAUSSIAN):
        # marginals every 3rd config (the slow leg), like the sweep
        if fuzz_mod.fuzz_one(harness, ref_sm, rng, i) == "ok":
            ran += 1
    # the stream must actually exercise configs, not skip everything
    assert ran >= N_GAUSSIAN - 3, "too many degenerate configs: {}/{}".format(
        ran, N_GAUSSIAN
    )


def test_compound_fuzz_slice(ref_sm, fuzz_mod):
    import tests.test_reference_dp_parity as harness

    rng = np.random.RandomState(SEED)
    ran = 0
    for i in range(N_COMPOUND):
        if fuzz_mod.compound_fuzz_one(harness, ref_sm, rng, i) == "ok":
            ran += 1
    assert ran >= N_COMPOUND - 2, "too many degenerate configs: {}/{}".format(
        ran, N_COMPOUND
    )
