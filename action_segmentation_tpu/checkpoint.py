"""Checkpointing: orbax pytree checkpoints + pickle parity format.

The reference pickles whole model objects with their args
(main.py:239-264) and reconciles command-line vs serialized args on load
(main.py:445-469); we keep that format (models define __getstate__ to
strip compiled closures and store numpy leaves). This module adds the
TPU-native path: orbax checkpoints of the parameter pytree + JSON args,
with resume support and the reference's "init a subset of params from
another checkpoint" feature (--sm_init_non_projection_parameters_from,
semimarkov_modules.py:90-94).
"""

import json
import os
import pickle

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp

    HAVE_ORBAX = True
except Exception:  # pragma: no cover
    HAVE_ORBAX = False


def save_pickle(model, path):
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(model, f)


def load_pickle(path):
    with open(path, "rb") as f:
        return pickle.load(f)


def _args_to_jsonable(args):
    return {
        k: v
        for k, v in vars(args).items()
        if isinstance(v, (int, float, str, bool, list, type(None)))
    }


def save_orbax(params, args, step, directory, lr=None, sched_state=None):
    """Write an orbax checkpoint of a pytree plus args metadata.

    `params` may be a bare parameter pytree or a full train state
    ({"params": ..., "opt_state": ...}); `lr` (the live learning rate,
    which the host-side plateau scheduler mutates) is stored in the
    sidecar json so resume restarts from it. `sched_state` is the
    plateau controller's POST-step state dict (lr/best/num_bad) — the
    state that governs epoch step+1 — so a resumed run reproduces the
    uninterrupted LR trajectory even when interrupted mid-plateau
    (restoring only the rate would reset best/num_bad and skip a
    pending cut)."""
    assert HAVE_ORBAX, "orbax not available"
    directory = os.path.abspath(directory)
    os.makedirs(directory, exist_ok=True)
    with ocp.StandardCheckpointer() as ckptr:
        # force=True: a re-launched run (crash without --resume) hitting
        # an existing step dir must overwrite, not abort the whole
        # training run with 'destination already exists'
        ckptr.save(
            os.path.join(directory, f"step_{step}"),
            jax.tree_util.tree_map(np.asarray, params),
            force=True,
        )
    meta = {"step": step, "args": _args_to_jsonable(args)}
    if lr is not None:
        meta["lr"] = float(lr)
    if sched_state:
        meta["sched"] = {
            "lr": float(sched_state["lr"]),
            "best": float(sched_state["best"]),
            "num_bad": int(sched_state["num_bad"]),
        }
    with open(os.path.join(directory, f"step_{step}.args.json"), "w") as f:
        json.dump(meta, f, indent=2)


def latest_step(directory):
    if not os.path.isdir(directory):
        return None
    steps = []
    for name in os.listdir(directory):
        if name.startswith("step_") and not name.endswith(".json"):
            try:
                steps.append(int(name.split("_")[1]))
            except ValueError:
                pass
    return max(steps) if steps else None


def load_orbax(directory, step=None, target=None):
    """Restore (params, args_dict, step). `target` is an example pytree
    (required by orbax to reconstruct structure/dtypes)."""
    assert HAVE_ORBAX, "orbax not available"
    directory = os.path.abspath(directory)
    if step is None:
        step = latest_step(directory)
        assert step is not None, f"no checkpoints in {directory}"
    with ocp.StandardCheckpointer() as ckptr:
        if target is not None:
            params = ckptr.restore(
                os.path.join(directory, f"step_{step}"),
                jax.tree_util.tree_map(np.asarray, target),
            )
        else:
            params = ckptr.restore(os.path.join(directory, f"step_{step}"))
    meta_path = os.path.join(directory, f"step_{step}.args.json")
    args_dict = None
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            args_dict = json.load(f)["args"]
    return params, args_dict, step


def load_meta(directory, step):
    """The sidecar json for a step (args + saved lr), or None."""
    meta_path = os.path.join(os.path.abspath(directory), f"step_{step}.args.json")
    if not os.path.exists(meta_path):
        return None
    with open(meta_path) as f:
        return json.load(f)


def init_subset_from(params, source_params, exclude_prefixes=("feature_projector",)):
    """Copy every matching non-excluded entry from source into params
    (the reference's strict-filtered warm start)."""
    out = dict(params)
    for key, val in source_params.items():
        if any(key.startswith(p) for p in exclude_prefixes):
            continue
        if key in out:
            out[key] = val
    return out


REFERENCE_PARAM_KEYS = (
    "poisson_log_rates",
    "gaussian_means",
    "gaussian_cov",
    "transition_logits",
    "init_logits",
)
# constraint masks are derived from args/corpus on this side, not weights
REFERENCE_BUFFER_KEYS = ("init_constraints", "transition_constraints")



def _diag_from_reference_cov(val):
    """The reference stores the tied diagonal covariance as a full
    (D, D) matrix (semimarkov_modules.py:149-151); keep the diagonal."""
    off_diag = val - np.diag(np.diag(val))
    assert np.abs(off_diag).max() <= 1e-6 * max(1.0, np.abs(val).max()), (
        "reference gaussian_cov is not diagonal"
    )
    return np.diag(val).copy()


def params_from_reference_state_dict(state_dict):
    """Map a reference SemiMarkovModule state_dict to our param pytree.

    The reference's parameter names (semimarkov_modules.py:142-159)
    match this framework's one-for-one; values may be torch tensors or
    numpy arrays, and an optional 'model.' prefix is stripped. NICE
    flow-projector weights map through
    flow_params_from_reference_state_dict. Returns (params,
    skipped_keys).
    """
    params = {}
    skipped = []
    flow_sd = {}
    for key, val in state_dict.items():
        name = key[len("model."):] if key.startswith("model.") else key
        if hasattr(val, "detach"):
            val = val.detach().cpu().numpy()
        val = np.asarray(val, np.float32)
        if name.startswith("feature_projector."):
            flow_sd[name] = val
        elif name in REFERENCE_PARAM_KEYS:
            if name == "gaussian_cov" and val.ndim == 2:
                val = _diag_from_reference_cov(val)
            params[name] = val
        else:
            skipped.append(key)
    if flow_sd:
        params["feature_projector"] = flow_params_from_reference_state_dict(
            flow_sd
        )
    missing = [k for k in REFERENCE_PARAM_KEYS if k not in params]
    assert not missing, "state_dict missing reference params: {}".format(missing)
    return params, skipped


def compound_params_from_reference_state_dict(state_dict):
    """Map a reference ComponentSemiMarkovModule state_dict
    (semimarkov_modules.py:755-812) to ComponentHsmm params.

    torch Linear weights transpose ((out, in) -> (in, out)); the
    EmbeddingBag tables carry over (our dense row-normalized membership
    matmul reproduces mode='mean'); residual-MLP Sequentials map
    layer-for-layer; the (D, D) diagonal covariance flattens; NICE flow
    weights map through flow_params_from_reference_state_dict. VAE
    encoder (BiLSTM) weights import via
    lstm_params_from_reference_state_dict — exact on unpadded
    sequences; the padded-batch pooling delta is documented there and
    pinned by tests/test_reference_dp_parity.py::
    test_vae_encoder_import_parity (factor heads:
    test_compound_module_parity).

    Returns (params, meta) with meta carrying the architecture the
    shapes imply: n_components, embedding_dim, mean_layers,
    length_layers, feature_dim, n_classes (None without per-class
    biases), per_class_bias.
    """
    sd = {}
    for key, val in state_dict.items():
        name = key[len("model."):] if key.startswith("model.") else key
        if hasattr(val, "detach"):
            val = val.detach().cpu().numpy()
        sd[name] = np.asarray(val, np.float32)
    flow_sd = {k: v for k, v in sd.items() if k.startswith("feature_projector.")}
    has_encoder = any(k.startswith("encoder.") for k in sd)

    def lin(prefix):
        return {
            "w": np.ascontiguousarray(sd[prefix + ".weight"].T),
            "b": sd[prefix + ".bias"],
        }

    def res_mlp(prefix):
        idxs = sorted({
            int(k[len(prefix) + 1:].split(".")[0])
            for k in sd
            if k.startswith(prefix + ".")
        })
        return {
            "in": lin("{}.0".format(prefix)),
            "res": [
                {
                    "lin1": lin("{}.{}.lin1".format(prefix, i)),
                    "lin2": lin("{}.{}.lin2".format(prefix, i)),
                }
                for i in idxs[1:-1]
            ],
            "out": lin("{}.{}".format(prefix, idxs[-1])),
        }

    cov = sd["gaussian_cov"]
    if cov.ndim == 2:
        cov = _diag_from_reference_cov(cov)

    params = {
        "initial_embeddings": sd["initial_embeddings.weight"],
        "transition_embeddings": sd["transition_embeddings.weight"],
        "emission_embeddings": sd["emission_embeddings.weight"],
        "length_embeddings": sd["length_embeddings.weight"],
        "initial_weights": lin("initial_weights"),
        "transition_weights": lin("transition_weights"),
        "emission_mean_mlp": res_mlp("emission_mean_mlp"),
        "length_mlp": res_mlp("length_mlp"),
        "emission_mean_bias": sd["emission_mean_bias"],
        "gaussian_cov": cov,
    }
    per_class_bias = "initial_bias" in sd
    if per_class_bias:
        params["initial_bias"] = sd["initial_bias"]
        params["transition_bias"] = sd["transition_bias"]
        params["length_bias"] = sd["length_bias"]
    if flow_sd:
        params["feature_projector"] = flow_params_from_reference_state_dict(
            flow_sd
        )
    z_dim = 0
    z_hidden_dim = 0
    encoder_layers = 0
    if has_encoder:
        params["encoder"] = lstm_params_from_reference_state_dict(
            sd, "encoder.encoder."
        )
        params["encoder_to_params"] = {
            "w": np.ascontiguousarray(sd["encoder_to_params.weight"].T),
            "b": sd["encoder_to_params.bias"],
        }
        z_dim = sd["encoder_to_params.weight"].shape[0] // 2
        z_hidden_dim = 2 * sd["encoder.encoder.weight_hh_l0"].shape[1]
        encoder_layers = len(params["encoder"]["layers"])

    emb = params["initial_embeddings"]
    meta = {
        "n_components": emb.shape[0],
        "embedding_dim": emb.shape[1],
        "mean_layers": len(params["emission_mean_mlp"]["res"]),
        "length_layers": len(params["length_mlp"]["res"]),
        "feature_dim": params["emission_mean_bias"].shape[0],
        "n_classes": sd["initial_bias"].shape[0] if per_class_bias else None,
        "per_class_bias": per_class_bias,
        "z_dim": z_dim,
        "z_hidden_dim": z_hidden_dim,
        "encoder_layers": encoder_layers,
        # --no_sm_compound_structure models take z out of the structure
        # heads: their input dim is e, not e+z (indistinguishable and
        # irrelevant when z_dim == 0)
        "compound_structure": (
            sd["initial_weights.weight"].shape[1] == emb.shape[1] + z_dim
            if z_dim > 0
            else True
        ),
    }
    return params, meta


def flow_params_from_reference_state_dict(sd, prefix="feature_projector."):
    """Map the reference NICETrans weights (flow.py:59-126) under
    ``prefix`` in a (numpy-leaf) state_dict to our flow pytree.

    The architectures are identical — ReLUNet is in_layer + N hidden
    cells + out_layer, NICETrans is `flow_couple_layers` coupling cells
    (+ scale cells with --flow_scale) applied with the same
    alternating-half schedule — so the mapping is Linear transposes.
    Equivalence is pinned by
    tests/test_reference_dp_parity.py::test_nice_flow_import_parity.
    """
    import re

    def lin(p):
        return {
            "w": np.ascontiguousarray(sd[p + ".weight"].T),
            "b": sd[p + ".bias"],
        }

    def relu_net(p):
        hidden = sorted({
            int(m.group(1))
            for k in sd
            for m in [re.match(r"cell(\d+)\.", k[len(p) + 1:])]
            if k.startswith(p + ".") and m
        })
        layers = [lin(p + ".in_layer")]
        layers += [lin("{}.cell{}".format(p, j)) for j in hidden]
        layers += [lin(p + ".out_layer")]
        return {"layers": layers}

    def cell_indices(kind):
        pat = re.compile(re.escape(prefix) + kind + r"(\d+)\.")
        return sorted({
            int(m.group(1)) for k in sd for m in [pat.match(k)] if m
        })

    idxs = cell_indices("cell")
    params = {
        "cells": [relu_net("{}cell{}".format(prefix, i)) for i in idxs]
    }
    scale_idxs = cell_indices("scale_cell")
    if scale_idxs:
        params["scale_cells"] = [
            relu_net("{}scale_cell{}".format(prefix, i)) for i in scale_idxs
        ]
    return params


def lstm_params_from_reference_state_dict(sd, prefix):
    """Map torch nn.LSTM (bidirectional, batch_first) weights under
    ``prefix`` to our scan-LSTM pytree (models/rnn.py): the equations
    and the i/f/g/o gate order are torch's own, so the mapping is
    weight transposes per layer per direction.

    Padding caveat (documented delta): the reference max-pools encoder
    outputs over zero-PADDED frames (sequential.py:26-30 +
    semimarkov_modules.py:834, clamping every dimension at >= 0 when a
    batch is padded); our pooling masks to real frames. On unpadded
    sequences the imported encoder is exact
    (tests/test_reference_dp_parity.py::test_vae_encoder_import_parity).
    """
    layers = []
    l = 0
    while prefix + "weight_ih_l{}".format(l) in sd:
        cells = []
        for suffix in ("", "_reverse"):
            key = prefix + "weight_ih_l{}{}".format(l, suffix)
            if key not in sd:
                continue
            cells.append({
                "w_ih": np.ascontiguousarray(
                    sd[prefix + "weight_ih_l{}{}".format(l, suffix)].T),
                "w_hh": np.ascontiguousarray(
                    sd[prefix + "weight_hh_l{}{}".format(l, suffix)].T),
                "b_ih": sd[prefix + "bias_ih_l{}{}".format(l, suffix)],
                "b_hh": sd[prefix + "bias_hh_l{}{}".format(l, suffix)],
            })
        layers.append(cells)
        l += 1
    return {"layers": layers}


def _lin_to_reference(p, prefix):
    return {
        prefix + ".weight": np.ascontiguousarray(np.asarray(p["w"]).T),
        prefix + ".bias": np.asarray(p["b"]),
    }


def _res_mlp_to_reference(p, prefix):
    out = _lin_to_reference(p["in"], "{}.0".format(prefix))
    for i, r in enumerate(p["res"]):
        out.update(_lin_to_reference(r["lin1"], "{}.{}.lin1".format(prefix, i + 1)))
        out.update(_lin_to_reference(r["lin2"], "{}.{}.lin2".format(prefix, i + 1)))
    out.update(_lin_to_reference(p["out"], "{}.{}".format(prefix, 1 + len(p["res"]))))
    return out


def _relu_net_to_reference(p, prefix):
    layers = p["layers"]
    out = _lin_to_reference(layers[0], prefix + ".in_layer")
    for j, lyr in enumerate(layers[1:-1]):
        out.update(_lin_to_reference(lyr, "{}.cell{}".format(prefix, j)))
    out.update(_lin_to_reference(layers[-1], prefix + ".out_layer"))
    return out


def _lstm_to_reference(p, prefix):
    """Inverse of lstm_params_from_reference_state_dict."""
    out = {}
    for l, cells in enumerate(p["layers"]):
        for cell, suffix in zip(cells, ("", "_reverse")):
            out[prefix + "weight_ih_l{}{}".format(l, suffix)] = (
                np.ascontiguousarray(cell["w_ih"].T))
            out[prefix + "weight_hh_l{}{}".format(l, suffix)] = (
                np.ascontiguousarray(cell["w_hh"].T))
            out[prefix + "bias_ih_l{}{}".format(l, suffix)] = cell["b_ih"]
            out[prefix + "bias_hh_l{}{}".format(l, suffix)] = cell["b_hh"]
    return out


def reference_state_dict_from_params(params):
    """Inverse of the import mappings: serialize a module's param pytree
    as a reference-named numpy state_dict that the reference's own
    ``load_state_dict`` accepts (Gaussian SemiMarkovModule or
    ComponentSemiMarkovModule, including NICE flow and VAE encoder) —
    migration is bidirectional. Round-trip and reference-decode parity:
    tests/test_reference_dp_parity.py::test_export_to_reference_*.
    """
    params = jax.tree_util.tree_map(lambda x: np.asarray(x), params)
    sd = {}
    compound = "initial_embeddings" in params
    if compound:
        for name in ("initial", "transition", "emission", "length"):
            sd[name + "_embeddings.weight"] = params[name + "_embeddings"]
        sd.update(_lin_to_reference(params["initial_weights"], "initial_weights"))
        sd.update(_lin_to_reference(params["transition_weights"], "transition_weights"))
        sd.update(_res_mlp_to_reference(params["emission_mean_mlp"], "emission_mean_mlp"))
        sd.update(_res_mlp_to_reference(params["length_mlp"], "length_mlp"))
        sd["emission_mean_bias"] = params["emission_mean_bias"]
        for name in ("initial_bias", "transition_bias", "length_bias"):
            if name in params:
                sd[name] = params[name]
        if "encoder" in params:
            sd.update(_lstm_to_reference(params["encoder"], "encoder.encoder."))
            sd.update(_lin_to_reference(params["encoder_to_params"], "encoder_to_params"))
    else:
        for name in ("poisson_log_rates", "gaussian_means",
                     "transition_logits", "init_logits"):
            sd[name] = params[name]
    cov = params["gaussian_cov"]
    sd["gaussian_cov"] = np.diag(cov) if cov.ndim == 1 else cov
    if "feature_projector" in params:
        flow = params["feature_projector"]
        for i, cell in enumerate(flow["cells"]):
            sd.update(_relu_net_to_reference(
                cell, "feature_projector.cell{}".format(i)))
        for i, cell in enumerate(flow.get("scale_cells", [])):
            sd.update(_relu_net_to_reference(
                cell, "feature_projector.scale_cell{}".format(i)))
    return sd
