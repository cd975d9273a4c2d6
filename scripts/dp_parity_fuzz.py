"""Randomized differential fuzzing against the reference's log_hsmm.

Reuses the tests/test_reference_dp_parity.py harness to sweep many
random configurations (C, K, T, batch, ragged lengths, constraint
density, merges, narration penalties, self-transition bans, valid-class
subsets) and compare log-partition + Viterbi score + frame marginals
against the reference's own edge-tensor construction. A one-off hunt
for latent semantic mismatches beyond the pinned test configs.

Run: python scripts/dp_parity_fuzz.py [n_configs] [seed]
Exits nonzero on the first mismatch, printing the offending config.
"""

import sys

sys.path.insert(0, ".")

import numpy as np


def random_config(rng):
    n_classes = int(rng.randint(2, 9))
    T = int(rng.randint(4, 36))
    cfg = {
        "n_classes": n_classes,
        # max_k > padded T hits the reference's K-clamp representability
        # quirk (full-buffer spans unrepresentable in its edge tensor) —
        # a KNOWN pinned divergence
        # (test_k_clamp_divergence_is_only_the_full_buffer_span), so the
        # fuzz space stays below it
        "max_k": int(rng.randint(2, min(8, T + 1))),
        "allow_self_transitions": bool(rng.rand() < 0.5),
        "b": int(rng.randint(1, 5)),
        "T": T,
        "constrained": bool(rng.rand() < 0.5),
        "merged": bool(rng.rand() < 0.4),
        "narration": bool(rng.rand() < 0.4),
        "subset": bool(rng.rand() < 0.6),
    }
    return cfg


def build_constraints(rng, n_classes):
    """Random allowed-transition structure with at least one VALID path:
    ends are drawn from the transition-closure of the starts (an
    unsatisfiable grammar drives logZ to BIG_NEG saturation on both
    sides, where posteriors are numerically arbitrary — the reference
    would be training on a 1e9 loss)."""
    starts = set(
        int(c) for c in rng.choice(n_classes, size=max(1, n_classes // 2),
                                   replace=False)
    )
    transitions = {}
    for src in range(n_classes):
        tgts = rng.choice(n_classes, size=max(1, int(rng.randint(1, n_classes + 1))),
                          replace=False)
        transitions[src] = set(int(t) for t in tgts)
    reachable = set(starts)
    frontier = set(starts)
    while frontier:
        nxt = set()
        for src in frontier:
            nxt |= transitions.get(src, set())
        frontier = nxt - reachable
        reachable |= nxt
    reachable = sorted(reachable)
    k = max(1, int(rng.randint(1, len(reachable) + 1)))
    ends = set(int(c) for c in rng.choice(reachable, size=k, replace=False))
    return starts, transitions, ends


def fuzz_one(harness, ref_mod, rng, i, check_marginals=None):
    """Draw and run ONE random differential config; returns 'ok' or
    'skip'. Raises on any mismatch against the reference edge-DP.
    Shared by the one-off sweep (main) and the standing pytest slice
    (tests/test_dp_parity_fuzz.py)."""
    cfg = random_config(rng)
    n_classes = cfg["n_classes"]
    constraints = merge = None
    if cfg["constrained"]:
        constraints = build_constraints(rng, n_classes)
    if cfg["merged"]:
        merge = {c: c for c in range(n_classes)}
        if n_classes >= 3:
            merge[n_classes - 1] = int(rng.randint(n_classes - 1))
    ref, ours = harness.build_pair(
        ref_mod, rng, n_classes, cfg["max_k"],
        cfg["allow_self_transitions"], constraints=constraints,
        merge=merge,
    )
    b, T = cfg["b"], cfg["T"]
    feats = rng.randn(b, T, harness.D).astype(np.float32)
    lengths = np.maximum(rng.randint(1, T + 1, size=b), 1).astype(np.int64)
    lengths[0] = T
    if cfg["subset"] and n_classes > 2:
        k = int(rng.randint(2, n_classes + 1))
        vc = set(int(c) for c in rng.choice(n_classes, size=k, replace=False))
        if constraints is not None:
            # both sides assert when the subset excludes every
            # allowed end (log_hsmm:470 / _batch_device_args);
            # real task structures guarantee ends are valid classes
            vc.add(int(rng.choice(sorted(constraints[2]))))
            vc.add(int(rng.choice(sorted(constraints[0]))))
        vc = np.sort(np.fromiter(vc, dtype=np.int64))
    elif constraints is not None:
        # the reference's score_features iterates valid_classes to
        # build allowed_ends (semimarkov_modules.py:566-577); its
        # callers always pass explicit indices when constrained
        vc = np.arange(n_classes)
    else:
        vc = None
    classes = list(vc) if vc is not None else list(range(n_classes))
    cons = None
    if cfg["narration"]:
        cons = ((rng.rand(b, T, len(classes)) < 0.3) * -6.0).astype(
            np.float32
        )
    addl = None
    if constraints is not None:
        # per-instance additional ends from the valid set
        addl = [
            [int(rng.choice(classes))] if rng.rand() < 0.5 else []
            for _ in range(b)
        ]
    # skip instances with (numerically) no valid path: marginal /
    # decode comparisons under BIG_NEG saturation compare noise
    import jax
    import jax.numpy as jnp

    from action_segmentation_tpu.ops.hsmm import hsmm_partition

    classes_arr = np.asarray(classes, np.int64)
    end_allowed = np.zeros((b, len(classes)), np.float32)
    if ours.allowed_ends is not None:
        for ii in range(b):
            allowed = set(ours.allowed_ends) | set(addl[ii])
            end_allowed[ii] = np.where(
                np.array([ix in allowed for ix in classes_arr]), 0.0, -1e9
            )
    pots, _, _ = ours.compute_potentials(
        ours.params, jnp.asarray(feats),
        jnp.asarray(lengths, jnp.int32),
        jnp.asarray(classes_arr, jnp.int32),
        jnp.asarray(cons) if cons is not None
        else jnp.zeros((b, T, len(classes)), jnp.float32),
        jnp.asarray(end_allowed), jax.random.PRNGKey(0), False,
    )
    logz = np.asarray(hsmm_partition(pots, jnp.asarray(lengths, jnp.int32)))
    if (logz < -1e8).any():
        # only a legitimately dead config (no feasible path) may skip:
        # the REFERENCE must agree it is dead, otherwise an our-side
        # saturation bug (e.g. every end class masked) would silently
        # classify every constrained draw as 'skip' and the sweep would
        # be blind to exactly the kill-all-paths bug class it hunts
        import torch

        ref_scores, _ = ref.score_features(
            torch.from_numpy(feats), torch.from_numpy(lengths).long(),
            None if vc is None else torch.from_numpy(np.asarray(vc)).long(),
            add_eos=True, use_mean_z=False,
            additional_allowed_ends_per_instance=(
                addl if ref.allowed_ends is not None else None
            ),
            constraints=None if cons is None else torch.from_numpy(cons),
        )
        ref_logz = harness.torch_edge_logz(
            ref_scores.double(), lengths + 1
        ).detach().numpy()
        dead = logz < -1e8
        assert (ref_logz[dead] < -1e7).all(), (
            "our DP saturated where the reference is finite at config "
            "{}: {} ref_logz={} ours={}".format(i, cfg, ref_logz, logz)
        )
        return "skip"
    try:
        harness.run_parity(
            ref_mod, ref, ours, feats, lengths,
            None if vc is None else np.asarray(vc),
            cons, addl,
            check_marginals=(
                (i % 3 == 0) if check_marginals is None else check_marginals
            ),  # marginals are the slow leg
            exact_labels=(merge is None),
        )
    except Exception:
        print("MISMATCH at config {}: {}".format(i, cfg), flush=True)
        raise
    return "ok"


def main(n_configs, seed, budget_s=None):
    import time

    import tests.test_reference_dp_parity as harness

    # materialize the module fixture by hand
    gen = harness.ref_sm.__wrapped__()
    ref_mod = next(gen)

    rng = np.random.RandomState(seed)
    n_ok = n_skip = 0
    t0 = time.perf_counter()
    try:
        for i in range(n_configs):
            if fuzz_one(harness, ref_mod, rng, i) == "skip":
                n_skip += 1
                print(
                    "skip degenerate config {} (dead on BOTH sides)".format(i),
                    flush=True,
                )
            else:
                n_ok += 1
            elapsed = time.perf_counter() - t0
            print(
                "{}/{} configs done ({} compared, {} skipped, {:.0f}s)".format(
                    i + 1, n_configs, n_ok, n_skip, elapsed
                ),
                flush=True,
            )
            # on-chip every random config is a fresh shape set paying
            # ~1-2 min of remote lowering+compile; a budget lets the
            # sweep end ITSELF cleanly (a kill mid-compile risks
            # re-wedging the grant — CLAUDE.md environment quirks)
            if budget_s is not None and elapsed > budget_s:
                print(
                    "budget {}s reached; stopping after {} configs".format(
                        budget_s, i + 1
                    ),
                    flush=True,
                )
                break
    finally:
        # run the fixture's cleanup while the interpreter is intact —
        # including on the mismatch path, or its teardown noise would
        # obscure the real traceback
        try:
            next(gen)
        except BaseException:
            pass
    print(
        "dp parity fuzz: {} configs compared OK, {} skipped (dead)".format(
            n_ok, n_skip
        )
    )




def compound_fuzz_one(harness, ref_mod, rng, i):
    """Draw and run ONE random compound differential config; 'ok' or
    'skip'. Raises on mismatch. Shared by compound_fuzz and the standing
    pytest slice."""
    import torch

    from action_segmentation_tpu.checkpoint import (
        compound_params_from_reference_state_dict,
    )
    from action_segmentation_tpu.models.compound import ComponentHsmm
    from action_segmentation_tpu.ops.hsmm import hsmm_partition, hsmm_viterbi

    import jax
    import jax.numpy as jnp

    D = harness.D  # ONE feature dim; a local copy could desynchronize
    n_classes = int(rng.randint(2, 7))
    T = int(rng.randint(6, 26))
    max_k = int(rng.randint(2, min(7, T + 1)))
    z_dim = int(rng.choice([0, 0, 2, 3]))
    cfg = dict(
        n_classes=n_classes, T=T, max_k=max_k, z_dim=z_dim,
        allow_self=bool(rng.rand() < 0.5),
        compound_structure=bool(rng.rand() < 0.7),
        decompose=bool(rng.rand() < 0.5),
        constrained=bool(rng.rand() < 0.4),
        merged=bool(rng.rand() < 0.3),
    )
    args = harness.make_args(max_k)
    args.cuda = False
    args.sm_component_mean_layers = int(rng.randint(1, 3))
    args.sm_component_length_layers = int(rng.randint(1, 3))
    args.sm_component_embedding_dim = int(rng.randint(4, 13))
    args.sm_component_z_dim = z_dim
    args.sm_component_z_hidden_dim = 8
    args.sm_compound_structure = cfg["compound_structure"]
    args.seq_num_layers = 2
    args.seq_num_layers_component = 2

    if cfg["decompose"]:
        n_components = n_classes + int(rng.randint(0, 4))
        c2c = {
            c: set(
                int(x) for x in rng.choice(
                    n_components,
                    size=int(rng.randint(1, min(4, n_components) + 1)),
                    replace=False,
                )
            )
            for c in range(n_classes)
        }
    else:
        n_components = n_classes
        c2c = {c: {c} for c in range(n_classes)}

    kw = {}
    constraints = None
    if cfg["constrained"]:
        constraints = build_constraints(rng, n_classes)
        kw = dict(allowed_starts=constraints[0],
                  allowed_transitions=constraints[1],
                  allowed_ends=constraints[2])
    merge = None
    if cfg["merged"]:
        merge = {c: c for c in range(n_classes)}
        if n_classes >= 3:
            merge[n_classes - 1] = int(rng.randint(n_classes - 1))

    ref = ref_mod.ComponentSemiMarkovModule(
        args, n_classes, n_components, c2c, D,
        allow_self_transitions=cfg["allow_self"], per_class_bias=True,
        merge_classes=merge, **kw,
    )
    with torch.no_grad():
        for name in ("initial_bias", "transition_bias", "length_bias"):
            getattr(ref, name).copy_(torch.from_numpy(
                rng.randn(n_classes).astype(np.float32) * 0.3))
        ref.emission_mean_bias.copy_(torch.from_numpy(
            rng.randn(D).astype(np.float32)))
        cov = rng.uniform(0.5, 1.5, D).astype(np.float32)
        ref.gaussian_cov.copy_(torch.diag(torch.from_numpy(cov)))

    params, _ = compound_params_from_reference_state_dict({
        k: v.detach().numpy() for k, v in ref.state_dict().items()
    })
    ours = ComponentHsmm(
        args, n_classes, n_components, c2c, D,
        allow_self_transitions=cfg["allow_self"], per_class_bias=True,
        merge_classes=merge, seed=0, **kw,
    )
    ours.params = jax.tree_util.tree_map(jnp.asarray, params)

    b = int(rng.randint(1, 4))
    feats = rng.randn(b, T, D).astype(np.float32)
    if z_dim > 0:
        lengths = np.full(b, T, np.int64)
    else:
        lengths = np.maximum(rng.randint(1, T + 1, size=b), 1).astype(np.int64)
        lengths[0] = T
    # valid-class SUBSETS: the compound decode path gathers per-class
    # parameters by vc in real runs (task-specific classes), so the
    # fuzz must exercise the sliced gathers too; constrained draws keep
    # the full set (ends must stay inside vc — see fuzz_one)
    if not cfg["constrained"] and n_classes > 2 and rng.rand() < 0.5:
        k = int(rng.randint(2, n_classes + 1))
        vc = np.sort(rng.choice(n_classes, size=k, replace=False)).astype(
            np.int64
        )
    else:
        vc = np.arange(n_classes)
    cfg["subset"] = len(vc) < n_classes
    C_sub = len(vc)
    addl = [[] for _ in range(b)]

    ft = torch.from_numpy(feats)
    lt = torch.from_numpy(lengths).long()
    ref.set_z(ft, lt, use_mean=True)
    scores, _ = ref.score_features(
        ft, lt, torch.from_numpy(vc).long(), add_eos=True,
        use_mean_z=True,
        additional_allowed_ends_per_instance=(
            addl if ref.allowed_ends is not None else None
        ),
    )
    scores_np = scores.detach().double().numpy()
    ref_logz = harness.torch_edge_logz(
        scores.double(), lengths + 1).detach().numpy()

    end_allowed = np.zeros((b, C_sub), np.float32)
    if ours.allowed_ends is not None:
        for ii in range(b):
            allowed = set(ours.allowed_ends)
            mask = np.array([ix in allowed for ix in vc])
            end_allowed[ii] = np.where(mask, 0.0, -1e9)
    pots, _, _ = ours.compute_potentials(
        ours.params, jnp.asarray(feats), jnp.asarray(lengths, jnp.int32),
        jnp.asarray(vc, jnp.int32),
        jnp.zeros((b, T, C_sub), jnp.float32),
        jnp.asarray(end_allowed), jax.random.PRNGKey(0), True,
    )
    our_logz = np.asarray(hsmm_partition(pots, jnp.asarray(lengths, jnp.int32)))
    if (our_logz < -1e8).any():
        # skip only when the reference agrees the config is dead (same
        # rationale as fuzz_one) — ref_logz is already computed above
        dead = our_logz < -1e8
        assert (ref_logz[dead] < -1e7).all(), (
            "our compound DP saturated where the reference is finite at "
            "config {}: {} ref_logz={} ours={}".format(
                i, cfg, ref_logz, our_logz
            )
        )
        return "skip"
    try:
        np.testing.assert_allclose(our_logz, ref_logz, rtol=1e-5, atol=5e-3)
        our_spans, our_scores = hsmm_viterbi(
            pots, jnp.asarray(lengths, jnp.int32))
        for ii in range(b):
            L = int(lengths[ii]) + 1
            _, rscore = harness.np_edge_viterbi(scores_np[ii], L)
            np.testing.assert_allclose(
                float(np.asarray(our_scores)[ii]), rscore,
                rtol=1e-5, atol=5e-3,
            )
    except Exception:
        print("COMPOUND MISMATCH at config {}: {}".format(i, cfg), flush=True)
        raise
    return "ok"


def compound_fuzz(n_configs, seed, budget_s=None):
    """Compound-model differential fuzz: random structures (component
    maps incl. decompose-style many-to-many, embedding dims, MLP depths,
    z on/off, compound-structure flag, constraints, merges, subsets)
    flow through the VERIFIED import mapping
    (compound_params_from_reference_state_dict) into ComponentHsmm, and
    partition + Viterbi max-score must match the reference's own
    score_features edge tensor. z_dim > 0 configs use uniform full
    lengths (the reference's pad-pooling quirk is a documented delta).
    """
    import time

    import tests.test_reference_dp_parity as harness

    gen = harness.ref_sm.__wrapped__()
    ref_mod = next(gen)
    rng = np.random.RandomState(seed)
    n_ok = n_skip = 0
    t0 = time.perf_counter()
    try:
        for i in range(n_configs):
            if compound_fuzz_one(harness, ref_mod, rng, i) == "skip":
                n_skip += 1
                print(
                    "skip degenerate compound config {} (dead on BOTH "
                    "sides)".format(i),
                    flush=True,
                )
            else:
                n_ok += 1
            elapsed = time.perf_counter() - t0
            print(
                "{}/{} compound configs done ({} compared, {} skipped, "
                "{:.0f}s)".format(i + 1, n_configs, n_ok, n_skip, elapsed),
                flush=True,
            )
            if budget_s is not None and elapsed > budget_s:
                print(
                    "budget {}s reached; stopping after {} configs".format(
                        budget_s, i + 1
                    ),
                    flush=True,
                )
                break
    finally:
        try:
            next(gen)
        except BaseException:
            pass
    print(
        "compound parity fuzz: {} configs compared OK, {} skipped "
        "(dead)".format(n_ok, n_skip)
    )


def _guarded_backend_init():
    """Claim the JAX backend through bench.py's wedge watchdog BEFORE
    building any harness state: a wedged axon grant blocks the first
    `jax.devices()` indefinitely (CLAUDE.md environment quirks), which
    would turn the whole sweep into a silent hang with zero output.
    Honors BENCH_BUDGET_S like bench.py."""
    from action_segmentation_tpu.utils import enable_compilation_cache

    from bench import _backend_timeout_s, _init_backend_with_watchdog

    enable_compilation_cache()
    kind = _init_backend_with_watchdog(_backend_timeout_s())
    print("dp_parity_fuzz: backend up ({})".format(kind), flush=True)


if __name__ == "__main__":
    budget_s = None
    if "--budget-s" in sys.argv:
        i = sys.argv.index("--budget-s")
        budget_s = float(sys.argv[i + 1])
        del sys.argv[i:i + 2]
    if "--cpu" in sys.argv:
        # full-sweep semantics run fine (and ~50x faster) on CPU: the
        # on-chip sweep is eager-dispatch-bound through the remote
        # tunnel (~100 s/config measured round 5), so the division of
        # labor is: full fresh-seed sweep on CPU, a budgeted slice +
        # scripts/tpu_kernel_check.py for backend numerics on chip.
        # (env-var platform forcing is overridden by sitecustomize —
        # CLAUDE.md environment quirks)
        sys.argv.remove("--cpu")
        import jax

        jax.config.update("jax_platforms", "cpu")
    _guarded_backend_init()
    if "--compound" in sys.argv:
        sys.argv.remove("--compound")
        compound_fuzz(
            int(sys.argv[1]) if len(sys.argv) > 1 else 30,
            int(sys.argv[2]) if len(sys.argv) > 2 else 0,
            budget_s=budget_s,
        )
    else:
        main(
            int(sys.argv[1]) if len(sys.argv) > 1 else 60,
            int(sys.argv[2]) if len(sys.argv) > 2 else 0,
            budget_s=budget_s,
        )
