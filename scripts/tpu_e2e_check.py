"""Full-framework end-to-end check on real TPU hardware.

The pytest pipeline suite drives the CLI on an 8-device CPU mesh; this
script drives the SAME CLI paths on the actual chip: data loading,
closed-form supervised fit, gradient-based supervised training,
unsupervised (marginal-likelihood) training with transition and
narration constraints, Viterbi decode, and Hungarian-matched
evaluation — proving the whole experiment loop (not just the kernels)
runs on TPU. Videos are generated longer than the CI ones so the
Pallas paths do real work, while the label/feature construction keeps
frame accuracy checkable.

Run: python scripts/tpu_e2e_check.py   (~4-8 min, mostly compiles)
"""

import json
import sys
import tempfile
import time

sys.path.insert(0, ".")

import numpy as np


def run(argv_extra, root, epochs=2):
    from action_segmentation_tpu import main as main_mod
    from action_segmentation_tpu.data.minigen import DIM_PER_GROUP

    argv = [
        "--classifier", "semimarkov",
        "--dataset", "crosstask",
        "--features", "pca",
        "--pca_components_per_group", str(DIM_PER_GROUP),
        "--data_root", root,
        "--mix_tasks",
        "--task_specific_steps",
        "--epochs", str(epochs),
    ] + argv_extra
    start = time.perf_counter()
    stats = main_mod.main(argv)
    elapsed = time.perf_counter() - start
    mofs = {}
    for task, s in stats["all"].items():
        mofs[task] = s["mof"][0] / s["mof"][1]
    return mofs, elapsed


def main():
    from action_segmentation_tpu.data.minigen import write_mini_crosstask

    with tempfile.TemporaryDirectory() as root:
        rng = np.random.RandomState(0)
        # longer segments than CI: videos of a few hundred frames
        write_mini_crosstask(
            root, rng, bkg_range=(10, 30), step_range=(30, 80), gap_range=(5, 20)
        )

        results = {}
        mofs, dt = run(
            ["--training", "supervised", "--sm_supervised_method", "closed-form"],
            root,
        )
        for task, mof in mofs.items():
            assert mof > 0.6, ("closed-form", task, mof)
        results["supervised_closed_form_mof"] = round(min(mofs.values()), 3)
        results["supervised_closed_form_sec"] = round(dt, 1)

        mofs, dt = run(
            [
                "--training", "supervised",
                "--sm_supervised_method", "gradient-based",
                "--lr", "1e-2",
            ],
            root,
            epochs=3,
        )
        for task, mof in mofs.items():
            assert mof > 0.5, ("gradient", task, mof)
        results["supervised_gradient_mof"] = round(min(mofs.values()), 3)
        results["supervised_gradient_sec"] = round(dt, 1)

        mofs, dt = run(
            [
                "--training", "unsupervised",
                "--sm_constrain_transitions",
                "--sm_constrain_with_narration", "train",
                "--annotate_background_with_previous",
                "--lr", "1e-2",
            ],
            root,
            epochs=5,
        )
        # constrained-unsupervised on separable features should beat chance
        for task, mof in mofs.items():
            assert mof > 0.3, ("unsupervised", task, mof)
        results["unsupervised_constrained_mof"] = round(min(mofs.values()), 3)
        results["unsupervised_constrained_sec"] = round(dt, 1)

        # the paper's U7 row uses the neural/compound module
        # (--sm_component_model: embedding-MLP heads + VAE latent)
        mofs, dt = run(
            [
                "--training", "unsupervised",
                "--sm_constrain_transitions",
                "--sm_constrain_with_narration", "train",
                "--annotate_background_with_previous",
                "--sm_component_model",
                "--lr", "1e-2",
            ],
            root,
            epochs=3,
        )
        for task, mof in mofs.items():
            assert mof > 0.2, ("compound", task, mof)
        results["unsupervised_compound_mof"] = round(min(mofs.values()), 3)
        results["unsupervised_compound_sec"] = round(dt, 1)

        # Breakfast (BASELINE.json config 4): longer fisher-vector
        # videos through the 4-fold participant splits
        from action_segmentation_tpu import main as main_mod
        from action_segmentation_tpu.data.minigen import write_mini_breakfast

        write_mini_breakfast(root, rng, dur_range=(40, 90))
        start = time.perf_counter()
        stats = main_mod.main(
            [
                "--classifier", "semimarkov",
                "--dataset", "breakfast",
                "--features", "raw",
                "--data_root", root,
                "--training", "supervised",
                "--sm_supervised_method", "closed-form",
                "--sm_max_span_length", "100",
                "--epochs", "1",
            ]
        )
        dt = time.perf_counter() - start
        assert set(stats.keys()) == {"s1", "s2", "s3", "s4"}
        worst = min(
            s["mof"][0] / s["mof"][1]
            for by_task in stats.values()
            for s in by_task.values()
        )
        assert worst > 0.4, worst
        results["breakfast_closed_form_mof"] = round(worst, 3)
        results["breakfast_closed_form_sec"] = round(dt, 1)

        print(json.dumps(results))
        print("TPU end-to-end check OK", flush=True)


if __name__ == "__main__":
    main()
