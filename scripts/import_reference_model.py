"""Import a model trained with the reference (dpfried/action-segmentation)
into this framework's serialized format.

Two input forms:

  # a torch state_dict of the reference's SemiMarkovModule
  python scripts/import_reference_model.py \
      --state_dict ref_module.pt --output out/all.pkl [model flags...]

  # a full reference pickle (main.py:239-264 format). Needs the
  # reference checkout on disk; its heavy deps (torch_struct, genbmm,
  # editdistance) are stubbed for unpickling only.
  python scripts/import_reference_model.py \
      --reference_pickle expts/ref/all.pkl --reference_src /path/to/ref/src \
      --output out/all.pkl

The output pickle drops into --model_input_path / api.Segmenter.load.
Scope: the semimarkov family (Gaussian / compound, incl. NICE flow and
VAE encoder — the paper's models). The baseline classifiers
(framewise/sequential) are minutes to retrain and have no import path.
Model flags (e.g. --sm_max_span_length) follow this framework's CLI;
with --reference_pickle, the pickled args' shared flag values are
applied automatically unless overridden.
"""

import argparse
import pickle
import sys
import types

sys.path.insert(0, ".")


def _stub(name):
    mod = types.ModuleType(name)
    sys.modules[name] = mod
    return mod


def load_reference_pickle(path, reference_src):
    sys.path.insert(0, reference_src)
    for name in ("torch_struct", "genbmm", "editdistance"):
        if name not in sys.modules:
            mod = _stub(name)
            if name == "torch_struct":
                mod.SemiMarkovCRF = type("SemiMarkovCRF", (), {})
    with open(path, "rb") as f:
        model = pickle.load(f)
    return model


def main(argv=None):
    # weight-format conversion needs no accelerator; under the
    # force-registered axon plugin the default backend CLAIMS the TPU
    # (one process at a time — a concurrent bench would hang, and a
    # Ctrl-C mid-claim can wedge the grant; CLAUDE.md quirks)
    import jax

    jax.config.update("jax_platforms", "cpu")

    from action_segmentation_tpu.models.base import add_training_args
    from action_segmentation_tpu.models.semimarkov import (
        SemiMarkovModel,
        semimarkov_from_reference_state_dict,
    )

    parser = argparse.ArgumentParser()
    parser.add_argument("--state_dict", help="torch.save'd SemiMarkovModule state_dict")
    parser.add_argument("--reference_pickle", help="full reference model pickle")
    parser.add_argument("--reference_src", help="reference src/ dir (for --reference_pickle)")
    parser.add_argument("--output", required=True)
    SemiMarkovModel.add_args(parser)
    add_training_args(parser)
    parser.add_argument("--batch_size", type=int, default=5)
    parser.add_argument("--annotate_background_with_previous", action="store_true")
    parser.add_argument("--no_merge_classes", action="store_true")
    args = parser.parse_args(argv)
    assert bool(args.state_dict) != bool(args.reference_pickle), (
        "pass exactly one of --state_dict / --reference_pickle"
    )

    class_to_components = None
    if args.reference_pickle:
        assert args.reference_src, "--reference_pickle needs --reference_src"
        ref_model = load_reference_pickle(args.reference_pickle, args.reference_src)
        state_dict = ref_model.model.state_dict()
        # decompose-steps compound models carry the corpus-derived
        # component structure on the module
        class_to_components = getattr(
            ref_model.model, "class_to_components", None
        )
        # carry over the flags both CLIs share (max span length etc.),
        # UNLESS the user passed the flag explicitly — match both the
        # "--flag value" and "--flag=value" spellings (the bare
        # membership test missed the latter and silently clobbered
        # explicit overrides)
        cli = argv if argv is not None else sys.argv[1:]
        explicit = {
            tok.split("=", 1)[0].lstrip("-")
            for tok in cli
            if tok.startswith("--")
        }
        for key, val in vars(ref_model.args).items():
            if hasattr(args, key) and key not in explicit:
                setattr(args, key, val)
    else:
        import torch

        state_dict = torch.load(args.state_dict, map_location="cpu")

    model = semimarkov_from_reference_state_dict(
        args, state_dict, class_to_components=class_to_components
    )
    with open(args.output, "wb") as f:
        pickle.dump(model, f)
    print(
        "imported reference model: {} classes, {}-d features -> {}".format(
            model.n_classes, model.feature_dim, args.output
        )
    )


if __name__ == "__main__":
    main()
