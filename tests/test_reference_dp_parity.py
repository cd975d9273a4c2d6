"""Differential DP parity against the reference's own ``log_hsmm``.

Round-2 verdict item 1: the riskiest re-derivation in this build folds the
reference's EOS augmentation (semimarkov_modules.py:461-494), constraint
masking (:284-322), valid-class slicing (:294-296,:309,:377,:413) and
class merging into the banded-scan ``end_mask`` formulation of
``ops/hsmm.py``. Until now that folding was verified only against our own
brute-force enumeration. These tests close the loop against the
reference's *code*: they import the reference ``SemiMarkovModule``
(torch-struct stubbed — it is only needed after the edge tensor is
built), build the b x N x K x C x C edge-potential tensor via the
reference's own ``log_hsmm`` on randomized factors, run a simple banded
DP over that tensor, and assert that our ``compute_potentials`` +
``hsmm_partition`` / ``hsmm_viterbi`` / ``hsmm_frame_marginals`` /
``hsmm_gold_score`` produce the same log-partition, decoded labels,
posterior frame marginals, and gold path scores.

The edge-tensor DP's path semantics (segments [n, n+k) with 1 <= k <= K-1
tiling [0, L-1); terminal class at position L-1 whose frame emission rides
on the incoming edge's `to` axis) are themselves validated against the
reference's own ``test_log_hsmm`` expectations
(src/models/test_semimarkov.py:266-323) in
``test_edge_dp_matches_reference_expectations`` — so the arbiter of DP
semantics is the reference's test, not this builder's reading of it.
"""

import os
import sys
import types

import numpy as np
import pytest
import torch

REF = "/root/reference/src"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference mount not available"
)

BIG_NEG = -1e9
D = 8  # feature dim for randomized configs


@pytest.fixture(scope="module")
def ref_sm():
    # torch_struct (the reference's DP engine) is not installed; it is
    # imported at module top but only *used* after log_hsmm has built the
    # edge tensor, so a stub suffices (same pattern as the editdistance
    # shim in test_reference_parity.py).
    stub = types.ModuleType("torch_struct")
    stub.SemiMarkovCRF = type("SemiMarkovCRF", (), {})
    sys.modules.setdefault("torch_struct", stub)
    # the reference's import chain pulls in evaluation/accuracy.py, which
    # imports the pip-only editdistance package; shim with ours
    from action_segmentation_tpu.evaluation import editdistance as our_ed

    ed_shim = types.ModuleType("editdistance")
    ed_shim.eval = our_ed.eval
    sys.modules.setdefault("editdistance", ed_shim)
    sys.path.insert(0, REF)
    try:
        from models.semimarkov import semimarkov_modules as ref_mod

        yield ref_mod
    finally:
        sys.path.remove(REF)


# ---------------------------------------------------------------------------
# Banded DP over the reference's edge tensor (the reference-semantics side)
# ---------------------------------------------------------------------------


def torch_edge_logz(scores, aug_lengths):
    """Log-semiring DP over a torch-struct SemiMarkov edge tensor.

    scores: (b, N, K, C, C) with scores[b, n, k, c_to, c_from] = potential
    of a span of class c_from covering frames [n, n+k) and transitioning
    to c_to at n+k (semimarkov_modules.py:416-523). aug_lengths are the
    EOS-augmented lengths (original + 1). Differentiable in ``scores``.
    """
    b, N, K, C, _ = scores.shape
    L = int(max(aug_lengths))
    beta = [torch.zeros(b, C, dtype=scores.dtype)]
    for n in range(1, L):
        ks = list(range(1, min(K - 1, n) + 1))
        window = torch.stack([beta[n - k] for k in ks], dim=1)  # (b, kn, Cf)
        edge = torch.stack([scores[:, n - k, k] for k in ks], dim=1)
        beta.append(torch.logsumexp(window.unsqueeze(2) + edge, dim=(1, 3)))
    return torch.stack(
        [
            torch.logsumexp(beta[int(l) - 1][i], dim=-1)
            for i, l in enumerate(aug_lengths)
        ]
    )


def np_edge_viterbi(scores_i, L):
    """Max-semiring DP + backtrace for one instance.

    Returns (spans, score): spans is (L,) int64 with the class at each
    span start, -1 on continuations, and the terminal class at L-1 (the
    EOS slot) — the same layout torch-struct's ``from_parts`` produces.
    """
    N, K, C, _ = scores_i.shape
    beta = np.full((L, C), -1e30)
    beta[0] = 0.0
    bp_k = np.zeros((L, C), np.int64)
    bp_c = np.zeros((L, C), np.int64)
    for n in range(1, L):
        ks = np.arange(1, min(K - 1, n) + 1)
        cand = beta[n - ks][:, None, :] + scores_i[n - ks, ks]  # (kn, Ct, Cf)
        flat = cand.transpose(1, 0, 2).reshape(C, -1)
        idx = flat.argmax(axis=1)
        beta[n] = flat[np.arange(C), idx]
        bp_k[n] = ks[idx // C]
        bp_c[n] = idx % C
    c = int(beta[L - 1].argmax())
    score = beta[L - 1, c]
    spans = np.full(L, -1, np.int64)
    spans[L - 1] = c
    n = L - 1
    while n > 0:
        k, cf = int(bp_k[n, c]), int(bp_c[n, c])
        n -= k
        spans[n] = cf
        c = cf
    return spans, score


def _fill(spans):
    """Forward-fill span-start labels over continuations."""
    labels = np.asarray(spans).copy()
    for t in range(1, len(labels)):
        if labels[t] < 0:
            labels[t] = labels[t - 1]
    return labels


def edge_path_score(scores_i, spans_i, l, C_sub):
    """Score a span sequence by summing its edges in the reference
    tensor: segment [n_j, n_{j+1}) of class c_j contributes
    scores[n_j, k_j, c_{j+1}, c_j], with the terminal EOS class C_sub at
    augmented position l. This is what the reference's
    dist.struct().score(log_potentials, parts) computes."""
    bounds = [t for t in range(l) if spans_i[t] >= 0]
    classes = [int(spans_i[t]) for t in bounds]
    bounds.append(l)
    s = 0.0
    for j in range(len(classes)):
        n, n2 = bounds[j], bounds[j + 1]
        c_to = classes[j + 1] if j + 1 < len(classes) else C_sub
        s += scores_i[n, n2 - n, c_to, classes[j]]
    return s


def test_edge_dp_matches_reference_expectations(ref_sm):
    """Reproduce the reference's own test_log_hsmm
    (src/models/test_semimarkov.py:266-323) through our edge-tensor DP:
    this pins the DP's path semantics to what torch-struct actually
    computed for the reference, independent of this builder's reading."""
    b, C, N, K, step_length = 10, 4, 100, 5, 4
    padded_length = N + step_length * 2
    lengths_unpadded = torch.full((b,), N).long()
    lengths_unpadded[0] = padded_length

    trans_scores = torch.zeros(C, C)
    init_scores = torch.full((C,), BIG_NEG)
    init_scores[0] = 0.0
    emission_scores = torch.full((b, padded_length, C), BIG_NEG)
    for n in range(padded_length):
        emission_scores[:, n, (n // step_length) % C] = 1.0
    length_scores = torch.full((K, C), BIG_NEG)
    length_scores[step_length, :] = 0.0

    scores = ref_sm.SemiMarkovModule.log_hsmm(
        trans_scores, emission_scores, init_scores, length_scores,
        lengths_unpadded, add_eos=True,
    )
    scores_np = scores.double().numpy()
    for i in range(b):
        L = int(lengths_unpadded[i]) + 1
        spans, _ = np_edge_viterbi(scores_np[i], L)
        # EOS (class C) in the final augmented position
        assert spans[L - 1] == C
        for step in range((L - 1) // step_length):
            assert spans[step_length * step] == step % C


# ---------------------------------------------------------------------------
# Randomized differential parity harness
# ---------------------------------------------------------------------------


def make_args(max_k):
    return types.SimpleNamespace(
        sm_max_span_length=max_k,
        sm_feature_projection=False,
        sm_init_non_projection_parameters_from=None,
        sm_supervised_state_smoothing=1e-2,
        sm_supervised_length_smoothing=1e-1,
        sm_train_discriminatively=False,
        sm_hidden_markov=False,
    )


def build_pair(ref_mod, rng, n_classes, max_k, allow_self_transitions,
               constraints=None, merge=None):
    """Instantiate the reference module and our GaussianHsmm with
    identical parameters and constraint structure."""
    from action_segmentation_tpu.models.semimarkov import GaussianHsmm
    import jax.numpy as jnp

    args = make_args(max_k)
    kw = dict(allow_self_transitions=allow_self_transitions)
    if constraints is not None:
        starts, transitions, ends = constraints
        kw.update(
            allowed_starts=starts, allowed_transitions=transitions,
            allowed_ends=ends,
        )
    ref = ref_mod.SemiMarkovModule(args, n_classes, D, merge_classes=merge, **kw)

    init = rng.randn(n_classes).astype(np.float32)
    trans = rng.randn(n_classes, n_classes).astype(np.float32)
    rates = rng.uniform(0.0, 1.5, n_classes).astype(np.float32)
    means = rng.randn(n_classes, D).astype(np.float32)
    cov = rng.uniform(0.5, 1.5, D).astype(np.float32)
    with torch.no_grad():
        ref.init_logits.copy_(torch.from_numpy(init))
        ref.transition_logits.copy_(torch.from_numpy(trans))
        ref.poisson_log_rates.copy_(torch.from_numpy(rates))
        ref.gaussian_means.copy_(torch.from_numpy(means))
        ref.gaussian_cov.copy_(torch.diag(torch.from_numpy(cov)))

    ours = GaussianHsmm(args, n_classes, D, merge_classes=merge, **kw)
    ours.params = {
        "init_logits": jnp.asarray(init),
        "transition_logits": jnp.asarray(trans),
        "poisson_log_rates": jnp.asarray(rates),
        "gaussian_means": jnp.asarray(means),
        "gaussian_cov": jnp.asarray(cov),
    }
    return ref, ours


def run_parity(ref_mod, ref, ours, feats, lengths, vc_global, cons_add,
               addl_ends, check_marginals=True, exact_labels=True):
    """Compare logZ / Viterbi / marginals for one randomized config.

    Reference side: factors through the reference's own *_log_probs
    (masking, valid-class slicing, merge), edge tensor through its
    log_hsmm (EOS augmentation, allowed_ends_per_instance), DP over the
    tensor. Our side: the exact arrays models/semimarkov.py feeds to the
    kernels. Returns (edge tensor as float64 numpy, our potentials) for
    follow-on gold-score checks.
    """
    import jax
    import jax.numpy as jnp
    from action_segmentation_tpu.ops.hsmm import (
        hsmm_frame_marginals,
        hsmm_partition,
        hsmm_viterbi,
    )

    b, T, _ = feats.shape
    feats_t = torch.from_numpy(feats)
    lengths_t = torch.from_numpy(lengths).long()
    vc_t = None if vc_global is None else torch.from_numpy(vc_global).long()
    cons_t = None if cons_add is None else torch.from_numpy(cons_add)

    # --- reference side ---
    trans = ref.transition_log_probs(vc_t)
    init = ref.initial_log_probs(vc_t)
    lens_tbl = ref.length_log_probs(vc_t)
    elp = ref.emission_log_probs(feats_t, vc_t, cons_t).detach()
    elp.requires_grad_(True)
    classes = (
        list(range(ref.n_classes)) if vc_global is None else list(vc_global)
    )
    if ref.allowed_ends is not None:
        aepi = [
            [
                i
                for i, ix in enumerate(classes)
                if ix in (set(ref.allowed_ends) | set(extra))
            ]
            for extra in addl_ends
        ]
    else:
        aepi = None
    scores = ref_mod.SemiMarkovModule.log_hsmm(
        trans, elp, init, lens_tbl, lengths_t, add_eos=True,
        allowed_ends_per_instance=aepi,
    )
    # cross-check: the composed call matches score_features itself
    scores2, _ = ref.score_features(
        feats_t, lengths_t, vc_t, add_eos=True, use_mean_z=False,
        additional_allowed_ends_per_instance=(
            addl_ends if ref.allowed_ends is not None else None
        ),
        constraints=cons_t,
    )
    assert torch.allclose(scores, scores2, atol=1e-4)

    ref_logz = torch_edge_logz(scores.double(), lengths + 1)
    if check_marginals:
        ref_logz.sum().backward()
        ref_marg = elp.grad.numpy()

    # --- our side: the arrays models/semimarkov.py builds ---
    C_sub = len(classes)
    vc_np = np.asarray(classes, np.int32)
    cons_np = (
        np.zeros((b, T, C_sub), np.float32) if cons_add is None else cons_add
    )
    end_allowed = np.zeros((b, C_sub), np.float32)
    if ours.allowed_ends is not None:
        for i in range(b):
            allowed = set(ours.allowed_ends) | set(addl_ends[i])
            mask = np.array([ix in allowed for ix in vc_np])
            end_allowed[i] = np.where(mask, 0.0, BIG_NEG)

    pots, _, _ = ours.compute_potentials(
        ours.params,
        jnp.asarray(feats),
        jnp.asarray(lengths, jnp.int32),
        jnp.asarray(vc_np),
        jnp.asarray(cons_np),
        jnp.asarray(end_allowed),
        jax.random.PRNGKey(0),
        False,
    )
    our_logz = np.asarray(hsmm_partition(pots, jnp.asarray(lengths, jnp.int32)))
    np.testing.assert_allclose(
        our_logz, ref_logz.detach().numpy(), rtol=1e-5, atol=5e-3
    )

    scores_np = scores.detach().double().numpy()
    our_spans, our_scores = hsmm_viterbi(pots, jnp.asarray(lengths, jnp.int32))
    our_spans = np.asarray(our_spans)
    our_scores = np.asarray(our_scores)
    for i in range(b):
        L = int(lengths[i]) + 1
        rspans, rscore = np_edge_viterbi(scores_np[i], L)
        assert rspans[L - 1] == C_sub  # terminal EOS class
        np.testing.assert_allclose(our_scores[i], rscore, rtol=1e-5, atol=5e-3)
        if exact_labels:
            np.testing.assert_array_equal(
                _fill(our_spans[i][: L - 1]), _fill(rspans[: L - 1])
            )
        else:
            # class merging creates exact score ties (shared emission +
            # Poisson params across merged classes); assert our decode is
            # *an* argmax path of the reference tensor instead
            ours_on_ref = edge_path_score(scores_np[i], our_spans[i], L - 1, C_sub)
            np.testing.assert_allclose(ours_on_ref, rscore, rtol=1e-5, atol=5e-3)

    if check_marginals:
        our_marg = np.asarray(
            hsmm_frame_marginals(pots, jnp.asarray(lengths, jnp.int32))
        )
        for i in range(b):
            np.testing.assert_allclose(
                our_marg[i, : lengths[i]],
                ref_marg[i, : lengths[i]],
                atol=2e-3,
            )
    return scores_np, pots


def _random_lengths(rng, b, T):
    lengths = rng.randint(max(2, T // 3), T + 1, size=b).astype(np.int64)
    lengths[0] = T  # always exercise the full padded buffer once
    return lengths


def test_parity_unconstrained_subset(ref_sm):
    """Valid-class subsetting + ragged lengths, self-transitions allowed."""
    rng = np.random.RandomState(0)
    ref, ours = build_pair(ref_sm, rng, n_classes=7, max_k=6,
                           allow_self_transitions=True)
    b, T = 4, 40
    feats = rng.randn(b, T, D).astype(np.float32)
    lengths = _random_lengths(rng, b, T)
    vc = np.array([1, 3, 4, 5, 6])
    run_parity(ref_sm, ref, ours, feats, lengths, vc, None, None)


def test_parity_all_classes_no_self(ref_sm):
    """valid_classes=None on the reference side; self-transitions banned
    (the reference's eye-mask at semimarkov_modules.py:313-319)."""
    rng = np.random.RandomState(1)
    ref, ours = build_pair(ref_sm, rng, n_classes=5, max_k=5,
                           allow_self_transitions=False)
    b, T = 3, 32
    feats = rng.randn(b, T, D).astype(np.float32)
    lengths = _random_lengths(rng, b, T)
    run_parity(ref_sm, ref, ours, feats, lengths, None, None, None)


def test_parity_constrained_merged_narration(ref_sm):
    """The full U7-style stack: canonical-order transition/start/end
    constraints, per-instance additional allowed ends, class merging, and
    additive narration penalties, with self-transitions banned."""
    rng = np.random.RandomState(2)
    n_classes = 8
    starts = {1, 2}
    transitions = {1: {3, 4}, 2: {4}, 3: {4, 6}, 4: {6, 1}, 6: {1, 2}}
    ends = {4, 6}
    # the reference builds merge_classes as a total map (identity for
    # unmerged classes; semimarkov.py:58-78)
    merge = {i: i for i in range(n_classes)}
    merge.update({6: 2, 5: 2})
    ref, ours = build_pair(
        ref_sm, rng, n_classes=n_classes, max_k=5,
        allow_self_transitions=False,
        constraints=(starts, transitions, ends), merge=merge,
    )
    b, T = 4, 36
    feats = rng.randn(b, T, D).astype(np.float32)
    lengths = _random_lengths(rng, b, T)
    vc = np.array([1, 2, 3, 4, 6])
    # soft narration penalties (the real pipeline uses (1-allowed)*weight
    # with weight=-1e4; a softer weight keeps every path's mass finite so
    # the comparison is numerically meaningful)
    cons = (rng.rand(b, T, len(vc)) < 0.3).astype(np.float32) * -7.5
    addl = [[], [3], [], [3]]
    run_parity(ref_sm, ref, ours, feats, lengths, vc, cons, addl,
               exact_labels=False)


def test_parity_k_exceeds_padded_length(ref_sm):
    """log_hsmm clamps K to the padded length (semimarkov_modules.py:441-443),
    so its edge tensor can only express durations <= padded_T - 1; our
    scan handles K > T structurally. For instances needing durations
    below that bound the two must agree exactly."""
    rng = np.random.RandomState(3)
    ref, ours = build_pair(ref_sm, rng, n_classes=4, max_k=10,
                           allow_self_transitions=True)
    b, T = 3, 6
    feats = rng.randn(b, T, D).astype(np.float32)
    lengths = np.array([5, 4, 2], np.int64)
    run_parity(ref_sm, ref, ours, feats, lengths, None, None, None)


def test_k_clamp_divergence_is_only_the_full_buffer_span(ref_sm):
    """Known, deliberate divergence: with max_k > padded_T, a length-T
    instance admits a single span covering the whole buffer in our scan
    (duration T <= max_k - 1), but the reference's clamped edge tensor
    (K -> N_1) cannot represent duration N_1 — a padding-dependent
    representability artifact, impossible at real configs (K=20 vs
    500-5000-frame videos). Masking our duration table to the reference's
    clamped band restores exact agreement, proving the band clamp is the
    *only* difference."""
    import jax.numpy as jnp
    from action_segmentation_tpu.ops.hsmm import hsmm_partition

    rng = np.random.RandomState(3)
    ref, ours = build_pair(ref_sm, rng, n_classes=4, max_k=10,
                           allow_self_transitions=True)
    b, T = 2, 6
    feats = rng.randn(b, T, D).astype(np.float32)
    lengths = np.array([6, 6], np.int64)

    feats_t = torch.from_numpy(feats)
    lengths_t = torch.from_numpy(lengths).long()
    scores, _ = ref.score_features(
        feats_t, lengths_t, None, add_eos=True, use_mean_z=False
    )
    ref_logz = torch_edge_logz(scores.double(), lengths + 1).detach().numpy()

    import jax

    C = ref.n_classes
    pots, _, _ = ours.compute_potentials(
        ours.params,
        jnp.asarray(feats),
        jnp.asarray(lengths, jnp.int32),
        jnp.arange(C, dtype=jnp.int32),
        jnp.zeros((b, T, C), jnp.float32),
        jnp.zeros((b, C), jnp.float32),
        jax.random.PRNGKey(0),
        False,
    )
    our_logz = np.asarray(hsmm_partition(pots, jnp.asarray(lengths, jnp.int32)))
    # unmasked: ours admits the extra duration-6 span, so logZ is larger
    assert (our_logz > ref_logz + 1e-4).all()

    lens_clamped = pots.lens.at[:, T:, :].set(BIG_NEG)
    clamped = np.asarray(
        hsmm_partition(pots._replace(lens=lens_clamped),
                       jnp.asarray(lengths, jnp.int32))
    )
    np.testing.assert_allclose(clamped, ref_logz, rtol=1e-5, atol=5e-3)


def test_parity_hidden_markov_k1(ref_sm):
    """max_k=1: the reference emits a 2-row [[0], [-1000]] duration table
    (semimarkov_modules.py:389-391) making every span cost -1000; ours
    reproduces the quirk (ops/distributions.py)."""
    rng = np.random.RandomState(4)
    ref, ours = build_pair(ref_sm, rng, n_classes=5, max_k=1,
                           allow_self_transitions=True)
    b, T = 3, 20
    feats = rng.randn(b, T, D).astype(np.float32)
    lengths = _random_lengths(rng, b, T)
    vc = np.array([0, 2, 3, 4])
    run_parity(ref_sm, ref, ours, feats, lengths, vc, None, None)


def test_gold_score_parity(ref_sm):
    """hsmm_gold_score must equal the edge-tensor sum of the same path —
    the reference's dist.struct().score(log_potentials, parts)
    (semimarkov_modules.py:644-655) is exactly that sum."""
    import jax.numpy as jnp
    from action_segmentation_tpu.ops.hsmm import hsmm_gold_score, hsmm_viterbi

    rng = np.random.RandomState(5)
    ref, ours = build_pair(ref_sm, rng, n_classes=6, max_k=5,
                           allow_self_transitions=True)
    b, T = 4, 30
    feats = rng.randn(b, T, D).astype(np.float32)
    lengths = _random_lengths(rng, b, T)
    vc = np.array([0, 1, 2, 4, 5])
    scores_np, pots = run_parity(
        ref_sm, ref, ours, feats, lengths, vc, None, None,
        check_marginals=False,
    )
    C_sub = len(vc)
    lengths_j = jnp.asarray(lengths, jnp.int32)

    # the Viterbi path's gold score equals its decode score
    vit_spans, vit_scores = hsmm_viterbi(pots, lengths_j)
    gold_vit = np.asarray(hsmm_gold_score(pots, lengths_j, vit_spans))
    np.testing.assert_allclose(gold_vit, np.asarray(vit_scores),
                               rtol=1e-5, atol=5e-3)

    # random valid segmentations: our gold score vs the edge-tensor sum
    for trial in range(5):
        spans = np.full((b, T), -1, np.int64)
        ref_scores = np.zeros(b)
        for i in range(b):
            l = int(lengths[i])
            bounds, t = [], 0
            while t < l:
                bounds.append(t)
                t += rng.randint(1, min(4, l - t) + 1)  # durations <= K-1
            classes = rng.randint(0, C_sub, size=len(bounds))
            for j, n in enumerate(bounds):
                spans[i, n] = classes[j]
            ref_scores[i] = edge_path_score(scores_np[i], spans[i], l, C_sub)
        gold = np.asarray(hsmm_gold_score(pots, lengths_j, jnp.asarray(spans)))
        np.testing.assert_allclose(gold, ref_scores, rtol=1e-5, atol=5e-3)


def test_reference_weights_migration_decode(ref_sm, tmp_path):
    """Migration verified end-to-end, not just name-mapped: a reference
    SemiMarkovModule state_dict (with its (D, D) diagonal covariance
    matrix), imported through scripts/import_reference_model.py, must
    decode frame-for-frame like the reference DP over its own log_hsmm
    edge tensor built from the same weights."""
    if "." not in sys.path:
        sys.path.insert(0, ".")
    from scripts.import_reference_model import main as import_main

    from action_segmentation_tpu.api import Segmenter

    rng = np.random.RandomState(7)
    n_classes, max_k = 5, 6
    ref, _ = build_pair(ref_sm, rng, n_classes, max_k,
                        allow_self_transitions=True)
    sd_path = str(tmp_path / "ref_module.pt")
    torch.save(ref.state_dict(), sd_path)
    out_path = str(tmp_path / "imported.pkl")
    import_main([
        "--state_dict", sd_path, "--output", out_path,
        "--sm_max_span_length", str(max_k),
    ])

    seg = Segmenter.load(out_path)
    feature_list = [
        rng.randn(int(rng.randint(8, 40)), D).astype(np.float32)
        for _ in range(5)
    ]
    got = seg.segment_many(feature_list)

    for feats, labels in zip(feature_list, got):
        T = feats.shape[0]
        scores, _ = ref.score_features(
            torch.from_numpy(feats[None]), torch.tensor([T]), None,
            add_eos=True, use_mean_z=False,
        )
        rspans, _ = np_edge_viterbi(scores.detach().double().numpy()[0], T + 1)
        np.testing.assert_array_equal(np.asarray(labels), _fill(rspans[:T]))


def test_closed_form_fit_and_decode_parity(ref_sm):
    """The S6 path end-to-end: closed-form supervised fit on an
    identical corpus yields the same parameters as the reference's
    fit_supervised (smoothed MLE formulas, merged-class stats,
    semimarkov_modules.py:195-256), and the fitted models decode
    identically through the DP harness."""
    from action_segmentation_tpu.models.semimarkov import GaussianHsmm

    rng = np.random.RandomState(9)
    n_classes, max_k = 4, 6
    args = make_args(max_k)
    merge = {i: i for i in range(n_classes)}
    merge[3] = 1
    ref = ref_sm.SemiMarkovModule(
        args, n_classes, D, allow_self_transitions=True, merge_classes=merge
    )
    ours = GaussianHsmm(
        args, n_classes, D, allow_self_transitions=True, merge_classes=merge
    )

    feats, labels = [], []
    for _ in range(8):
        T = int(rng.randint(15, 40))
        lab = []
        while len(lab) < T:
            lab.extend([int(rng.randint(n_classes))] * int(rng.randint(1, 8)))
        lab = np.array(lab[:T], np.int64)
        feats.append((rng.randn(T, D) + lab[:, None] * 0.5).astype(np.float64))
        labels.append(lab)

    ref.fit_supervised(
        [torch.from_numpy(f) for f in feats],
        [torch.from_numpy(l) for l in labels],
    )
    ours.fit_supervised([f.astype(np.float32) for f in feats], labels)

    np.testing.assert_allclose(
        np.asarray(ours.params["init_logits"]),
        ref.init_logits.detach().numpy(), rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(ours.params["transition_logits"]),
        ref.transition_logits.detach().numpy(), rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(ours.params["poisson_log_rates"]),
        ref.poisson_log_rates.detach().numpy(), rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(ours.params["gaussian_means"]),
        ref.gaussian_means.detach().numpy(), rtol=1e-3, atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(ours.params["gaussian_cov"]),
        np.diag(ref.gaussian_cov.detach().numpy()), rtol=1e-3, atol=1e-4,
    )

    # decode the fitted models on fresh features through the DP harness
    b, T = 3, 30
    test_feats = rng.randn(b, T, D).astype(np.float32)
    lengths = np.array([30, 22, 17], np.int64)
    run_parity(ref_sm, ref, ours, test_feats, lengths, None, None, None,
               check_marginals=False, exact_labels=False)


def test_compound_module_parity(ref_sm):
    """Weight-matched differential parity for the compound model: copy a
    reference ComponentSemiMarkovModule's state (EmbeddingBag tables,
    transposed Linears, residual-MLP layers, per-class biases) into our
    ComponentHsmm and assert identical partition and decode through the
    reference's own score_features edge tensor — covering the neural
    factor heads (mean-of-component embeddings, f(embed(from)).embed(to)
    transitions, residual-MLP means and length rates), constraint
    masking, merged-class embedding gathers, and valid-class slicing.
    (z_dim=0: the VAE z path draws RNG and is covered by behavioral
    tests; the factor heads are what transfer weight-for-weight.)"""
    import jax
    import jax.numpy as jnp

    from action_segmentation_tpu.models.compound import ComponentHsmm
    from action_segmentation_tpu.ops.hsmm import hsmm_partition, hsmm_viterbi

    rng = np.random.RandomState(11)
    n_classes, n_components, Dm, e = 6, 9, 8, 12
    class_to_components = {
        0: {0}, 1: {1, 2}, 2: {3}, 3: {4, 5, 0}, 4: {6}, 5: {7, 8},
    }
    starts = {0, 1}
    transitions = {0: {2, 3}, 1: {3}, 2: {4, 5}, 3: {5, 0}, 4: {0, 1}, 5: {1}}
    ends = {4, 5}
    merge = {i: i for i in range(n_classes)}
    merge[5] = 2

    args = make_args(max_k=5)
    args.sm_component_mean_layers = 2
    args.sm_component_length_layers = 1
    args.sm_component_embedding_dim = e
    args.sm_component_z_dim = 0
    args.sm_component_z_hidden_dim = 16
    args.sm_compound_structure = True
    args.seq_num_layers_component = 1

    ref = ref_sm.ComponentSemiMarkovModule(
        args, n_classes, n_components, class_to_components, Dm,
        allow_self_transitions=False, per_class_bias=True,
        allowed_starts=starts, allowed_transitions=transitions,
        allowed_ends=ends, merge_classes=merge,
    )
    # randomize the flat parameters torch leaves at zero
    with torch.no_grad():
        for name in ("initial_bias", "transition_bias", "length_bias"):
            getattr(ref, name).copy_(torch.from_numpy(
                rng.randn(n_classes).astype(np.float32) * 0.3))
        ref.emission_mean_bias.copy_(torch.from_numpy(
            rng.randn(Dm).astype(np.float32)))
        cov = rng.uniform(0.5, 1.5, Dm).astype(np.float32)
        ref.gaussian_cov.copy_(torch.diag(torch.from_numpy(cov)))

    ours = ComponentHsmm(
        args, n_classes, n_components, class_to_components, Dm,
        allow_self_transitions=False, per_class_bias=True,
        allowed_starts=starts, allowed_transitions=transitions,
        allowed_ends=ends, merge_classes=merge,
    )

    def lin(mod):
        return {
            "w": jnp.asarray(mod.weight.detach().numpy().T),
            "b": jnp.asarray(mod.bias.detach().numpy()),
        }

    def res_mlp(seq):
        layers = list(seq)
        return {
            "in": lin(layers[0]),
            "res": [
                {"lin1": lin(r.lin1), "lin2": lin(r.lin2)}
                for r in layers[1:-1]
            ],
            "out": lin(layers[-1]),
        }

    ours.params.update({
        "initial_embeddings": jnp.asarray(
            ref.initial_embeddings.weight.detach().numpy()),
        "transition_embeddings": jnp.asarray(
            ref.transition_embeddings.weight.detach().numpy()),
        "emission_embeddings": jnp.asarray(
            ref.emission_embeddings.weight.detach().numpy()),
        "length_embeddings": jnp.asarray(
            ref.length_embeddings.weight.detach().numpy()),
        "initial_weights": lin(ref.initial_weights),
        "transition_weights": lin(ref.transition_weights),
        "emission_mean_mlp": res_mlp(ref.emission_mean_mlp),
        "length_mlp": res_mlp(ref.length_mlp),
        "emission_mean_bias": jnp.asarray(
            ref.emission_mean_bias.detach().numpy()),
        "initial_bias": jnp.asarray(ref.initial_bias.detach().numpy()),
        "transition_bias": jnp.asarray(ref.transition_bias.detach().numpy()),
        "length_bias": jnp.asarray(ref.length_bias.detach().numpy()),
        "gaussian_cov": jnp.asarray(cov),
    })

    b, T = 3, 24
    feats = rng.randn(b, T, Dm).astype(np.float32)
    lengths = np.array([24, 18, 11], np.int64)
    vc = np.array([0, 1, 2, 3, 4, 5])
    C_sub = len(vc)

    # reference edge tensor (batched factor heads -> all_batched path)
    ref.set_z(torch.from_numpy(feats), torch.from_numpy(lengths), use_mean=True)
    scores, _ = ref.score_features(
        torch.from_numpy(feats), torch.from_numpy(lengths).long(),
        torch.from_numpy(vc).long(), add_eos=True, use_mean_z=True,
        additional_allowed_ends_per_instance=[[], [], []],
    )
    scores_np = scores.detach().double().numpy()
    ref_logz = torch_edge_logz(scores.double(), lengths + 1).detach().numpy()

    end_allowed = np.where(
        np.isin(vc, sorted(ends)), 0.0, BIG_NEG
    )[None].repeat(b, axis=0).astype(np.float32)
    pots, _, _ = ours.compute_potentials(
        ours.params,
        jnp.asarray(feats),
        jnp.asarray(lengths, jnp.int32),
        jnp.asarray(vc, jnp.int32),
        jnp.zeros((b, T, C_sub), jnp.float32),
        jnp.asarray(end_allowed),
        jax.random.PRNGKey(0),
        True,
    )
    our_logz = np.asarray(hsmm_partition(pots, jnp.asarray(lengths, jnp.int32)))
    np.testing.assert_allclose(our_logz, ref_logz, rtol=1e-5, atol=5e-3)

    our_spans, our_scores = hsmm_viterbi(pots, jnp.asarray(lengths, jnp.int32))
    for i in range(b):
        L = int(lengths[i]) + 1
        rspans, rscore = np_edge_viterbi(scores_np[i], L)
        np.testing.assert_allclose(
            float(np.asarray(our_scores)[i]), rscore, rtol=1e-5, atol=5e-3
        )
        # merged classes tie only emission/length; transitions still
        # distinguish them, so labels are generically unique here
        np.testing.assert_array_equal(
            _fill(np.asarray(our_spans)[i][: L - 1]), _fill(rspans[: L - 1])
        )


def test_compound_reference_weights_migration_decode(ref_sm, tmp_path):
    """Compound-model migration end-to-end: a reference
    ComponentSemiMarkovModule state_dict (identity class->component map,
    the reference's default) imported through
    scripts/import_reference_model.py decodes frame-for-frame like the
    reference DP over its own edge tensor."""
    if "." not in sys.path:
        sys.path.insert(0, ".")
    from scripts.import_reference_model import main as import_main

    from action_segmentation_tpu.api import Segmenter

    rng = np.random.RandomState(13)
    n_classes, Dm, e, max_k = 5, 8, 10, 6
    args = make_args(max_k)
    args.sm_component_mean_layers = 2
    args.sm_component_length_layers = 1
    args.sm_component_embedding_dim = e
    args.sm_component_z_dim = 0
    args.sm_component_z_hidden_dim = 16
    args.sm_compound_structure = True

    ref = ref_sm.ComponentSemiMarkovModule(
        args, n_classes, n_classes, {c: {c} for c in range(n_classes)}, Dm,
        allow_self_transitions=True, per_class_bias=True,
    )
    with torch.no_grad():
        for name in ("initial_bias", "transition_bias", "length_bias"):
            getattr(ref, name).copy_(torch.from_numpy(
                rng.randn(n_classes).astype(np.float32) * 0.3))
        ref.emission_mean_bias.copy_(torch.from_numpy(
            rng.randn(Dm).astype(np.float32)))
        cov = rng.uniform(0.5, 1.5, Dm).astype(np.float32)
        ref.gaussian_cov.copy_(torch.diag(torch.from_numpy(cov)))

    sd_path = str(tmp_path / "ref_compound.pt")
    torch.save(ref.state_dict(), sd_path)
    out_path = str(tmp_path / "imported.pkl")
    import_main([
        "--state_dict", sd_path, "--output", out_path,
        "--sm_max_span_length", str(max_k),
    ])

    seg = Segmenter.load(out_path)
    feature_list = [
        rng.randn(int(rng.randint(8, 30)), Dm).astype(np.float32)
        for _ in range(4)
    ]
    got = seg.segment_many(feature_list)

    for feats, labels in zip(feature_list, got):
        T = feats.shape[0]
        ft = torch.from_numpy(feats[None])
        lt = torch.tensor([T])
        ref.set_z(ft, lt, use_mean=True)
        # the reference's compound heads crash on valid_classes=None
        # (transition_bias[None] adds a dim, semimarkov_modules.py:934);
        # its callers always pass explicit indices — do the same
        scores, _ = ref.score_features(
            ft, lt, torch.arange(n_classes), add_eos=True, use_mean_z=True,
        )
        rspans, _ = np_edge_viterbi(scores.detach().double().numpy()[0], T + 1)
        np.testing.assert_array_equal(np.asarray(labels), _fill(rspans[:T]))


def test_compound_decomposed_pickle_migration(ref_sm, tmp_path):
    """--reference_pickle migration of a decompose-steps compound model:
    the corpus-derived class->components structure rides the pickled
    module (not the state_dict) and must transfer; decode of the
    imported model matches the reference DP."""
    import pickle as pkl

    if "." not in sys.path:
        sys.path.insert(0, ".")
    from scripts.import_reference_model import main as import_main

    from action_segmentation_tpu.api import Segmenter

    rng = np.random.RandomState(17)
    n_classes, n_components, Dm, e, max_k = 5, 7, 8, 10, 6
    class_to_components = {0: {0}, 1: {1, 2}, 2: {3}, 3: {4, 5}, 4: {6, 0}}
    args = make_args(max_k)
    args.cuda = False  # the reference wrapper's __init__ checks it
    args.sm_component_model = True
    args.sm_component_decompose_steps = True
    args.sm_component_mean_layers = 1
    args.sm_component_length_layers = 1
    args.sm_component_embedding_dim = e
    args.sm_component_z_dim = 0
    args.sm_component_z_hidden_dim = 16
    args.sm_compound_structure = True

    ref = ref_sm.ComponentSemiMarkovModule(
        args, n_classes, n_components, class_to_components, Dm,
        allow_self_transitions=True, per_class_bias=True,
    )
    with torch.no_grad():
        ref.emission_mean_bias.copy_(torch.from_numpy(
            rng.randn(Dm).astype(np.float32)))
        cov = rng.uniform(0.5, 1.5, Dm).astype(np.float32)
        ref.gaussian_cov.copy_(torch.diag(torch.from_numpy(cov)))

    # the reference pickles its SemiMarkovModel wrapper (main.py:239-264)
    from models.semimarkov.semimarkov import SemiMarkovModel as RefModel

    wrapper = RefModel(args, n_classes, Dm, ref)
    pkl_path = str(tmp_path / "ref_full.pkl")
    with open(pkl_path, "wb") as f:
        pkl.dump(wrapper, f)

    out_path = str(tmp_path / "imported.pkl")
    import_main([
        "--reference_pickle", pkl_path, "--reference_src", REF,
        "--output", out_path,
    ])

    seg = Segmenter.load(out_path)
    assert seg.model.module.n_components == n_components
    feats = rng.randn(20, Dm).astype(np.float32)
    got = seg.segment_many([feats])[0]

    ft = torch.from_numpy(feats[None])
    lt = torch.tensor([20])
    ref.set_z(ft, lt, use_mean=True)
    scores, _ = ref.score_features(
        ft, lt, torch.arange(n_classes), add_eos=True, use_mean_z=True,
    )
    rspans, _ = np_edge_viterbi(scores.detach().double().numpy()[0], 21)
    np.testing.assert_array_equal(np.asarray(got), _fill(rspans[:20]))


@pytest.mark.parametrize("flow_scale", [False, True])
def test_nice_flow_import_parity(ref_sm, flow_scale):
    """flow_params_from_reference_state_dict maps reference NICETrans
    weights exactly: projected features and log-Jacobians match the
    reference forward for both additive and affine (--flow_scale)
    couplings."""
    import jax.numpy as jnp

    sys.path.insert(0, REF)
    try:
        from models.flow import NICETrans
    finally:
        sys.path.remove(REF)

    from action_segmentation_tpu.checkpoint import (
        flow_params_from_reference_state_dict,
    )
    from action_segmentation_tpu.models import flow as our_flow

    rng = np.random.RandomState(19)
    Df = 8
    args = make_args(5)
    args.flow_hidden_layers = 2
    args.flow_hidden_units = 12
    args.flow_couple_layers = 3
    args.flow_scale = flow_scale
    args.flow_scale_no_zero = True  # nonzero scale nets: a real test

    ref = NICETrans(args, features=Df)
    sd = {
        "feature_projector." + k: v.detach().numpy()
        for k, v in ref.state_dict().items()
    }
    params = flow_params_from_reference_state_dict(sd)
    assert ("scale_cells" in params) == flow_scale

    x = rng.randn(2, 15, Df).astype(np.float32)
    want_h, want_jac = ref(torch.from_numpy(x))
    got_h, got_jac = our_flow.nice_apply(params, jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(got_h), want_h.detach().numpy(), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(got_jac), want_jac.detach().numpy(), rtol=1e-5, atol=1e-4
    )


def test_flow_model_migration_decode(ref_sm, tmp_path):
    """A reference SemiMarkovModule trained WITH the NICE projector
    imports end-to-end (previously refused) and decodes like the
    reference DP over its own projected-feature edge tensor."""
    if "." not in sys.path:
        sys.path.insert(0, ".")
    from scripts.import_reference_model import main as import_main

    from action_segmentation_tpu.api import Segmenter

    rng = np.random.RandomState(23)
    n_classes, Dm, max_k = 4, 8, 5
    args = make_args(max_k)
    args.sm_feature_projection = True
    args.flow_hidden_layers = 1
    args.flow_hidden_units = 10
    args.flow_couple_layers = 2
    args.flow_scale = True
    args.flow_scale_no_zero = True

    ref = ref_sm.SemiMarkovModule(args, n_classes, Dm,
                                  allow_self_transitions=True)
    with torch.no_grad():
        ref.gaussian_means.copy_(torch.from_numpy(
            rng.randn(n_classes, Dm).astype(np.float32)))
        cov = rng.uniform(0.5, 1.5, Dm).astype(np.float32)
        ref.gaussian_cov.copy_(torch.diag(torch.from_numpy(cov)))
        ref.transition_logits.copy_(torch.from_numpy(
            rng.randn(n_classes, n_classes).astype(np.float32)))

    sd_path = str(tmp_path / "ref_flow.pt")
    torch.save(ref.state_dict(), sd_path)
    out_path = str(tmp_path / "imported.pkl")
    import_main([
        "--state_dict", sd_path, "--output", out_path,
        "--sm_max_span_length", str(max_k),
    ])

    seg = Segmenter.load(out_path)
    assert "feature_projector" in seg.model.module.params
    feature_list = [
        rng.randn(int(rng.randint(8, 25)), Dm).astype(np.float32)
        for _ in range(3)
    ]
    got = seg.segment_many(feature_list)

    for feats, labels in zip(feature_list, got):
        T = feats.shape[0]
        scores, _ = ref.score_features(
            torch.from_numpy(feats[None]), torch.tensor([T]), None,
            add_eos=True, use_mean_z=False,
        )
        rspans, _ = np_edge_viterbi(scores.detach().double().numpy()[0], T + 1)
        np.testing.assert_array_equal(np.asarray(labels), _fill(rspans[:T]))


def test_vae_encoder_import_parity(ref_sm):
    """lstm_params_from_reference_state_dict maps a torch bidirectional
    multi-layer nn.LSTM exactly: on unpadded sequences our scan LSTM's
    outputs match torch's (same equations, same i/f/g/o gate order).
    (On PADDED batches the downstream pooling deliberately diverges: the
    reference max-pools over zero-padded frames, clamping at >= 0;
    ours masks to real frames — documented in checkpoint.py.)"""
    import jax.numpy as jnp

    sys.path.insert(0, REF)
    try:
        from models.sequential import Encoder
    finally:
        sys.path.remove(REF)

    from action_segmentation_tpu.checkpoint import (
        lstm_params_from_reference_state_dict,
    )
    from action_segmentation_tpu.models import rnn

    rng = np.random.RandomState(29)
    Df, H = 6, 8  # output_dim = H (H//2 per direction)
    args = types.SimpleNamespace(seq_num_layers=2)
    enc = Encoder(args, Df, H)
    sd = {
        "encoder.encoder." + k: v.detach().numpy()
        for k, v in enc.encoder.state_dict().items()
    }
    params = lstm_params_from_reference_state_dict(sd, "encoder.encoder.")
    assert len(params["layers"]) == 2
    assert len(params["layers"][0]) == 2  # bidirectional

    B, T = 3, 12
    x = rng.randn(B, T, Df).astype(np.float32)
    lengths = np.full(B, T, np.int64)  # unpadded: pooling quirk dormant
    want = enc(
        torch.from_numpy(x), torch.from_numpy(lengths), output_padding_value=0
    ).detach().numpy()
    got = np.asarray(rnn.lstm_apply(params, jnp.asarray(x), jnp.asarray(lengths)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_compound_vae_migration_decode(ref_sm, tmp_path):
    """Full compound + VAE migration (the last former refusal): encoder
    and factor heads import from a reference state_dict, and mean-z
    decode on unpadded videos matches the reference DP."""
    if "." not in sys.path:
        sys.path.insert(0, ".")
    from scripts.import_reference_model import main as import_main

    from action_segmentation_tpu.api import Segmenter

    rng = np.random.RandomState(31)
    n_classes, Dm, e, max_k = 4, 6, 8, 5
    args = make_args(max_k)
    args.sm_component_mean_layers = 1
    args.sm_component_length_layers = 1
    args.sm_component_embedding_dim = e
    args.sm_component_z_dim = 3
    args.sm_component_z_hidden_dim = 8
    args.sm_compound_structure = True
    args.seq_num_layers = 2

    ref = ref_sm.ComponentSemiMarkovModule(
        args, n_classes, n_classes, {c: {c} for c in range(n_classes)}, Dm,
        allow_self_transitions=True, per_class_bias=True,
    )
    with torch.no_grad():
        ref.emission_mean_bias.copy_(torch.from_numpy(
            rng.randn(Dm).astype(np.float32)))
        cov = rng.uniform(0.5, 1.5, Dm).astype(np.float32)
        ref.gaussian_cov.copy_(torch.diag(torch.from_numpy(cov)))

    sd_path = str(tmp_path / "ref_vae.pt")
    torch.save(ref.state_dict(), sd_path)
    out_path = str(tmp_path / "imported.pkl")
    import_main([
        "--state_dict", sd_path, "--output", out_path,
        "--sm_max_span_length", str(max_k),
    ])

    seg = Segmenter.load(out_path)
    assert seg.model.module.z_dim == 3
    # one video per segment_many call -> unpadded (the reference's
    # pad-pooling quirk is dormant; see test_vae_encoder_import_parity)
    for _ in range(3):
        T = int(rng.randint(10, 25))
        feats = rng.randn(T, Dm).astype(np.float32)
        labels = seg.segment_many([feats])[0]

        ft = torch.from_numpy(feats[None])
        lt = torch.tensor([T])
        ref.set_z(ft, lt, use_mean=True)
        scores, _ = ref.score_features(
            ft, lt, torch.arange(n_classes), add_eos=True, use_mean_z=True,
        )
        rspans, _ = np_edge_viterbi(scores.detach().double().numpy()[0], T + 1)
        np.testing.assert_array_equal(np.asarray(labels), _fill(rspans[:T]))


def test_export_to_reference_roundtrip():
    """reference_state_dict_from_params is the exact inverse of the
    import mappings (Gaussian + flow round-trips through the reference
    naming)."""
    import jax
    import jax.numpy as jnp

    from action_segmentation_tpu.checkpoint import (
        params_from_reference_state_dict,
        reference_state_dict_from_params,
    )
    from action_segmentation_tpu.models.semimarkov import GaussianHsmm

    args = make_args(5)
    args.sm_feature_projection = True
    args.flow_hidden_layers = 1
    args.flow_hidden_units = 6
    args.flow_couple_layers = 2
    args.flow_scale = True
    args.flow_scale_no_zero = True
    ours = GaussianHsmm(args, 4, 8, allow_self_transitions=True, seed=3)

    sd = reference_state_dict_from_params(ours.params)
    back, _ = params_from_reference_state_dict(sd)
    flat_a = jax.tree_util.tree_leaves_with_path(ours.params)
    flat_b = dict(
        (jax.tree_util.keystr(k), v)
        for k, v in jax.tree_util.tree_leaves_with_path(
            jax.tree_util.tree_map(jnp.asarray, back)
        )
    )
    for key, val in flat_a:
        np.testing.assert_allclose(
            np.asarray(val), np.asarray(flat_b[jax.tree_util.keystr(key)]),
            err_msg=jax.tree_util.keystr(key),
        )


def test_export_to_reference_decode(ref_sm, tmp_path):
    """Bidirectional migration, the hard direction: OUR compound + VAE +
    flow weights exported through scripts/export_reference_model.py load
    into the reference's OWN ComponentSemiMarkovModule (strict
    state_dict), and the reference DP decodes identically to us."""
    import pickle as pkl

    import jax

    if "." not in sys.path:
        sys.path.insert(0, ".")
    from scripts.export_reference_model import main as export_main

    from action_segmentation_tpu.api import Segmenter
    from action_segmentation_tpu.models.compound import ComponentHsmm
    from action_segmentation_tpu.models.semimarkov import SemiMarkovModel

    rng = np.random.RandomState(37)
    n_classes, Dm, e, max_k = 4, 6, 8, 5
    args = make_args(max_k)
    args.sm_component_model = True
    args.sm_component_mean_layers = 1
    args.sm_component_length_layers = 1
    args.sm_component_embedding_dim = e
    args.sm_component_z_dim = 3
    args.sm_component_z_hidden_dim = 8
    args.seq_num_layers_component = 2
    args.seq_num_layers = 2
    args.sm_compound_structure = True
    args.cuda = False
    args.sm_feature_projection = True
    args.flow_hidden_layers = 1
    args.flow_hidden_units = 6
    args.flow_couple_layers = 2
    args.flow_scale = False

    module = ComponentHsmm(
        args, n_classes, n_classes, {c: {c} for c in range(n_classes)}, Dm,
        allow_self_transitions=True, seed=7,
    )
    ours = SemiMarkovModel(args, n_classes, Dm, module)
    model_path = str(tmp_path / "ours.pkl")
    with open(model_path, "wb") as f:
        pkl.dump(ours, f)
    sd_path = str(tmp_path / "exported.pt")
    export_main(["--model", model_path, "--output", sd_path])

    ref = ref_sm.ComponentSemiMarkovModule(
        args, n_classes, n_classes, {c: {c} for c in range(n_classes)}, Dm,
        allow_self_transitions=True, per_class_bias=True,
    )
    missing = ref.load_state_dict(torch.load(sd_path), strict=True)
    assert not missing.missing_keys and not missing.unexpected_keys

    seg = Segmenter(ours)
    for _ in range(2):
        T = int(rng.randint(10, 22))
        feats = rng.randn(T, Dm).astype(np.float32)
        labels = np.asarray(seg.segment_many([feats])[0])

        ft = torch.from_numpy(feats[None])
        lt = torch.tensor([T])
        ref.set_z(ft, lt, use_mean=True)
        scores, _ = ref.score_features(
            ft, lt, torch.arange(n_classes), add_eos=True, use_mean_z=True,
        )
        scores_np = scores.detach().double().numpy()[0]
        _, rscore = np_edge_viterbi(scores_np, T + 1)
        # fresh xavier weights give near-uniform factors, so boundary
        # placements tie within float noise (and with self-transitions
        # allowed, frame labels cannot reconstruct the internal span
        # boundaries); the meaningful invariant is the max path score
        # of the exported weights matching on both constructions
        import jax.numpy as jnp
        from action_segmentation_tpu.ops.hsmm import hsmm_viterbi

        pots, _, _ = module.compute_potentials(
            module.params,
            jnp.asarray(feats[None]),
            jnp.asarray([T], jnp.int32),
            jnp.arange(n_classes, dtype=jnp.int32),
            jnp.zeros((1, T, n_classes), jnp.float32),
            jnp.zeros((1, n_classes), jnp.float32),
            jax.random.PRNGKey(0),
            True,
        )
        our_spans, our_score = hsmm_viterbi(pots, jnp.asarray([T], jnp.int32))
        np.testing.assert_allclose(
            float(np.asarray(our_score)[0]), rscore, rtol=1e-5, atol=1e-3
        )
        # and our decoded path, scored on the REFERENCE edge tensor,
        # attains that same max
        ours_on_ref = edge_path_score(
            scores_np, np.asarray(our_spans)[0], T, n_classes
        )
        np.testing.assert_allclose(ours_on_ref, rscore, rtol=1e-5, atol=1e-3)


def test_training_gradient_parity(ref_sm):
    """The full unsupervised training gradient, differentially: d logZ /
    d {init_logits, transition_logits, poisson_log_rates,
    gaussian_means} computed by torch autograd through the reference's
    own factor heads + log_hsmm + edge DP must match jax.grad through
    our compute_potentials + hsmm_partition — the gradient every
    training step consumes, end-to-end across the masked softmaxes,
    Poisson table, Gaussian matmul, EOS folding and valid-class
    slicing."""
    import jax
    import jax.numpy as jnp

    from action_segmentation_tpu.ops.hsmm import hsmm_partition

    rng = np.random.RandomState(41)
    n_classes, max_k = 6, 5
    ref, ours = build_pair(ref_sm, rng, n_classes, max_k,
                           allow_self_transitions=True)
    b, T = 3, 28
    feats = rng.randn(b, T, D).astype(np.float32)
    lengths = _random_lengths(rng, b, T)
    vc = np.array([0, 1, 3, 4, 5])
    vc_t = torch.from_numpy(vc).long()
    lengths_t = torch.from_numpy(lengths).long()

    # torch side: grads through the reference's own module
    for p in (ref.init_logits, ref.transition_logits,
              ref.poisson_log_rates, ref.gaussian_means):
        p.requires_grad_(True)
    scores, _ = ref.score_features(
        torch.from_numpy(feats), lengths_t, vc_t,
        add_eos=True, use_mean_z=False,
    )
    logz = torch_edge_logz(scores.double(), lengths + 1)
    logz.sum().backward()

    # our side: jax.grad through compute_potentials + hsmm_partition
    C_sub = len(vc)
    def total(params):
        pots, _, _ = ours.compute_potentials(
            params,
            jnp.asarray(feats),
            jnp.asarray(lengths, jnp.int32),
            jnp.asarray(vc, jnp.int32),
            jnp.zeros((b, T, C_sub), jnp.float32),
            jnp.zeros((b, C_sub), jnp.float32),
            jax.random.PRNGKey(0),
            False,
        )
        return hsmm_partition(pots, jnp.asarray(lengths, jnp.int32)).sum()

    grads = jax.grad(total)(ours.params)
    for ours_key, ref_param in (
        ("init_logits", ref.init_logits),
        ("transition_logits", ref.transition_logits),
        ("poisson_log_rates", ref.poisson_log_rates),
        ("gaussian_means", ref.gaussian_means),
    ):
        np.testing.assert_allclose(
            np.asarray(grads[ours_key]),
            ref_param.grad.numpy(),
            rtol=1e-4, atol=2e-4,
            err_msg=ours_key,
        )


def test_no_compound_structure_migration(ref_sm, tmp_path):
    """--no_sm_compound_structure + z_dim > 0: the structure heads take
    e-dim inputs (no z); the importer must detect the flag from
    initial_weights' input dim instead of building mismatched heads."""
    if "." not in sys.path:
        sys.path.insert(0, ".")
    from scripts.import_reference_model import main as import_main

    from action_segmentation_tpu.api import Segmenter

    rng = np.random.RandomState(43)
    n_classes, Dm, e, max_k = 4, 6, 8, 5
    args = make_args(max_k)
    args.sm_component_mean_layers = 1
    args.sm_component_length_layers = 1
    args.sm_component_embedding_dim = e
    args.sm_component_z_dim = 3
    args.sm_component_z_hidden_dim = 8
    args.sm_compound_structure = False  # --no_sm_compound_structure
    args.seq_num_layers = 2

    ref = ref_sm.ComponentSemiMarkovModule(
        args, n_classes, n_classes, {c: {c} for c in range(n_classes)}, Dm,
        allow_self_transitions=True, per_class_bias=True,
    )
    with torch.no_grad():
        cov = rng.uniform(0.5, 1.5, Dm).astype(np.float32)
        ref.gaussian_cov.copy_(torch.diag(torch.from_numpy(cov)))

    sd_path = str(tmp_path / "ref_nostruct.pt")
    torch.save(ref.state_dict(), sd_path)
    out_path = str(tmp_path / "imported.pkl")
    import_main([
        "--state_dict", sd_path, "--output", out_path,
        "--sm_max_span_length", str(max_k),
    ])

    seg = Segmenter.load(out_path)
    assert seg.model.module.structure_uses_z is False
    T = 16
    feats = rng.randn(T, Dm).astype(np.float32)
    labels = seg.segment_many([feats])[0]

    ft = torch.from_numpy(feats[None])
    lt = torch.tensor([T])
    ref.set_z(ft, lt, use_mean=True)
    scores, _ = ref.score_features(
        ft, lt, torch.arange(n_classes), add_eos=True, use_mean_z=True,
    )
    rspans, _ = np_edge_viterbi(scores.detach().double().numpy()[0], T + 1)
    np.testing.assert_array_equal(np.asarray(labels), _fill(rspans[:T]))


def test_compound_reference_pooling_ragged_batch(ref_sm):
    """--sm_reference_pooling reproduces the reference's zero-pad
    max-pool (semimarkov_modules.py:832-838 via pad_packed_sequence's
    padding_value=0) on a RAGGED batch, so a migrated compound model's
    z — hence its decode — matches the reference frame-for-frame even
    when videos are batched with padding. Also asserts the default
    masked pooling actually DIFFERS on this batch (the flag is not a
    no-op: the quirk is exercised)."""
    import jax
    import jax.numpy as jnp

    from action_segmentation_tpu.checkpoint import (
        compound_params_from_reference_state_dict,
    )
    from action_segmentation_tpu.models.compound import ComponentHsmm
    from action_segmentation_tpu.ops.hsmm import hsmm_partition, hsmm_viterbi

    rng = np.random.RandomState(41)
    n_classes, Dm, e, max_k = 4, 6, 8, 5
    args = make_args(max_k)
    args.cuda = False
    args.sm_component_mean_layers = 1
    args.sm_component_length_layers = 1
    args.sm_component_embedding_dim = e
    args.sm_component_z_dim = 3
    args.sm_component_z_hidden_dim = 8
    args.sm_compound_structure = True
    args.seq_num_layers = 2
    args.seq_num_layers_component = 2

    ref = ref_sm.ComponentSemiMarkovModule(
        args, n_classes, n_classes, {c: {c} for c in range(n_classes)}, Dm,
        allow_self_transitions=True, per_class_bias=True,
    )
    with torch.no_grad():
        ref.emission_mean_bias.copy_(torch.from_numpy(
            rng.randn(Dm).astype(np.float32)))
        cov = rng.uniform(0.5, 1.5, Dm).astype(np.float32)
        ref.gaussian_cov.copy_(torch.diag(torch.from_numpy(cov)))
    params, _ = compound_params_from_reference_state_dict({
        k: v.detach().numpy() for k, v in ref.state_dict().items()
    })

    # ragged batch: the zero-pad clamp is live for the short videos
    b, T = 3, 18
    lengths = np.array([T, 11, 7], np.int64)
    feats = rng.randn(b, T, Dm).astype(np.float32)
    for i in range(b):
        feats[i, lengths[i]:] = 0.0
    # push encoder outputs negative so max(., 0) clamping actually bites
    ft = torch.from_numpy(feats)
    lt = torch.from_numpy(lengths)
    ref.set_z(ft, lt, use_mean=True)
    ref_z = ref.z.detach().numpy()
    scores, _ = ref.score_features(
        ft, lt, torch.arange(n_classes), add_eos=True, use_mean_z=True,
    )
    scores_np = scores.detach().double().numpy()
    ref_logz = torch_edge_logz(scores.double(), lengths + 1).detach().numpy()

    vc = jnp.arange(n_classes, dtype=jnp.int32)
    cons = jnp.zeros((b, T, n_classes), jnp.float32)
    endm = jnp.zeros((b, n_classes), jnp.float32)

    def run(reference_pooling, pad_extra=0):
        import argparse
        a2 = argparse.Namespace(**vars(args))
        a2.sm_reference_pooling = reference_pooling
        ours = ComponentHsmm(
            a2, n_classes, n_classes, {c: {c} for c in range(n_classes)},
            Dm, allow_self_transitions=True, per_class_bias=True, seed=0,
        )
        ours.params = jax.tree_util.tree_map(jnp.asarray, params)
        f = feats
        c = np.asarray(cons)
        if pad_extra:
            # bucket padding wider than the batch max must not change z
            f = np.pad(feats, ((0, 0), (0, pad_extra), (0, 0)))
            c = np.pad(c, ((0, 0), (0, pad_extra), (0, 0)))
        pots, _, kl = ours.compute_potentials(
            ours.params, jnp.asarray(f), jnp.asarray(lengths, jnp.int32),
            vc, jnp.asarray(c), endm, jax.random.PRNGKey(0), True,
        )
        z, _ = ours._get_z_and_kl(
            ours.params, jnp.asarray(f), jnp.asarray(lengths, jnp.int32),
            jax.random.PRNGKey(0), True,
        )
        logz = np.asarray(hsmm_partition(pots, jnp.asarray(lengths, jnp.int32)))
        _, vscores = hsmm_viterbi(pots, jnp.asarray(lengths, jnp.int32))
        return np.asarray(z), logz, np.asarray(vscores)

    z_flag, logz_flag, vs_flag = run(True)
    np.testing.assert_allclose(z_flag, ref_z, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(logz_flag, ref_logz, rtol=1e-5, atol=5e-3)
    for ii in range(b):
        _, rscore = np_edge_viterbi(scores_np[ii], int(lengths[ii]) + 1)
        np.testing.assert_allclose(vs_flag[ii], rscore, rtol=1e-5, atol=5e-3)

    # wider bucket padding leaves the reference-pooling z unchanged
    z_pad, logz_pad, _ = run(True, pad_extra=6)
    np.testing.assert_allclose(z_pad, z_flag, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(logz_pad, logz_flag, rtol=1e-6, atol=1e-4)

    # the default masked pooling diverges on the clamped (short) videos
    z_default, _, _ = run(False)
    assert np.abs(z_default[1:] - z_flag[1:]).max() > 1e-4, (
        "flag is a no-op: masked and reference pooling agree on a "
        "ragged batch that should clamp"
    )
    # ...but agrees on the full-length video (no padding inside the
    # batch-max window for it)
    np.testing.assert_allclose(z_default[0], z_flag[0], rtol=1e-5, atol=1e-5)
