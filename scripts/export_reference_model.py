"""Export a model trained with THIS framework to a reference-loadable
torch state_dict (the inverse of scripts/import_reference_model.py):

  python scripts/export_reference_model.py \
      --model expts/.../all.pkl --output ref_module.pt

The output loads into the reference's SemiMarkovModule /
ComponentSemiMarkovModule via ``module.load_state_dict(torch.load(f))``
— migration is bidirectional (reference-decode parity is pinned by
tests/test_reference_dp_parity.py::test_export_to_reference_decode).
"""

import argparse
import pickle
import sys

sys.path.insert(0, ".")


def main(argv=None):
    import torch

    from action_segmentation_tpu.checkpoint import (
        reference_state_dict_from_params,
    )

    parser = argparse.ArgumentParser()
    parser.add_argument("--model", required=True, help="this framework's model pickle")
    parser.add_argument("--output", required=True, help="torch state_dict path")
    args = parser.parse_args(argv)

    with open(args.model, "rb") as f:
        model = pickle.load(f)
    params = model.module.params if hasattr(model, "module") else model
    sd = reference_state_dict_from_params(params)
    torch.save({k: torch.from_numpy(v.copy()) for k, v in sd.items()}, args.output)
    print("exported {} tensors -> {}".format(len(sd), args.output))


if __name__ == "__main__":
    main()
