"""Differential loader parity on REAL CrossTask/Breakfast files.

The strongest real-data check available before full Table-2 runs: build
BOTH data layers — ours (action_segmentation_tpu.data) and the
reference's own (/root/reference/src/data, imported in-process the same
way tests/test_reference_parity.py does) — over the SAME mounted files,
and require them to agree exactly on everything the model consumes:

  * split membership (videos_by_task) and the label index map;
  * per-video features (bit-exact: both read the same .npy and apply
    the same group slicing), gt_single labels, task_indices, and
    narration constraint matrices;
  * the canonical-ordering constraint sets U7 trains with
    (get_allowed_starts_and_transitions), when
    --annotate_background_with_previous / --task_specific_steps apply.

Exit 0 = parity; exit 1 = any mismatch (printed); exit 3 = data not
mounted (the caller treats that as "kit not applicable yet").

Usage:
  python scripts/realdata_loader_parity.py --dataset crosstask \
      [--data_root data] [--features raw|pca] [--n_videos 3] [--splits train val]

Reference anchors: src/data/corpus.py:315-380 (__getitem__ payload),
src/data/crosstask.py:179-388 (datasplit + constraint sets),
src/data/breakfast.py:16-155 (splits/blacklist).
"""

import argparse
import os
import sys
import types

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF = "/root/reference/src"


def _to_np(x):
    try:
        import torch

        if isinstance(x, torch.Tensor):
            return x.detach().cpu().numpy()
    except ImportError:
        pass
    return np.asarray(x)


def _import_reference():
    from action_segmentation_tpu.evaluation import editdistance as our_ed

    shim = types.ModuleType("editdistance")
    shim.eval = our_ed.eval
    sys.modules.setdefault("editdistance", shim)
    sys.path.insert(0, REF)
    import data.breakfast as ref_breakfast
    import data.crosstask as ref_crosstask

    return ref_crosstask, ref_breakfast


def _build_pair(cli):
    """(ours, reference) corpus objects over the same files."""
    from action_segmentation_tpu.data import breakfast as our_breakfast
    from action_segmentation_tpu.data import crosstask as our_crosstask

    ref_crosstask, ref_breakfast = _import_reference()
    root = cli.data_root
    if cli.dataset == "crosstask":
        if cli.features == "pca":
            feature_root = os.path.join(
                root,
                "crosstask/crosstask_processed/"
                "crosstask_primary_pca-200_with-bkg_by-task",
            )
            dims = {g: cli.pca_components for g in ("i3d", "resnet", "audio")}
        else:
            feature_root = os.path.join(root, "crosstask/crosstask_features")
            dims = None
        kwargs = dict(
            release_root=os.path.join(root, "crosstask/crosstask_release"),
            feature_root=feature_root,
            dimensions_per_feature_group=dims,
            features_contain_background=True,
            task_specific_steps=cli.task_specific_steps,
            annotate_background_with_previous=cli.annotate_bkg,
            use_secondary=False,
            constraints_root=os.path.join(
                root, "crosstask/crosstask_constraints"
            ),
            load_constraints=True,
        )
        if not os.path.isdir(kwargs["release_root"]) or not os.path.isdir(
            feature_root
        ):
            print(
                "realdata_loader_parity: crosstask files not mounted "
                "under {} (need crosstask_release + {})".format(
                    root, os.path.basename(feature_root)
                )
            )
            sys.exit(3)
        return (
            our_crosstask.CrosstaskCorpus(**kwargs),
            ref_crosstask.CrosstaskCorpus(**kwargs),
        )
    mapping = os.path.join(root, "breakfast", "mapping.txt")
    feature_root = os.path.join(root, "breakfast", "reduced_fv_64")
    label_root = os.path.join(root, "breakfast", "BreakfastII_15fps_qvga_sync")
    if not (
        os.path.exists(mapping)
        and os.path.isdir(feature_root)
        and os.path.isdir(label_root)
    ):
        print(
            "realdata_loader_parity: breakfast files not mounted under "
            "{}/breakfast".format(root)
        )
        sys.exit(3)
    args = (mapping, feature_root, label_root)
    return (
        our_breakfast.BreakfastCorpus(*args),
        ref_breakfast.BreakfastCorpus(*args),
    )


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", choices=["crosstask", "breakfast"],
                   default="crosstask")
    p.add_argument("--data_root", default="data")
    p.add_argument("--features", choices=["raw", "pca"], default="pca")
    p.add_argument("--pca_components", type=int, default=200)
    p.add_argument("--n_videos", type=int, default=3,
                   help="videos sampled per task per split")
    p.add_argument("--splits", nargs="*", default=None,
                   help="default: train val (crosstask) / s1..s4 (breakfast)")
    p.add_argument("--task_specific_steps", action="store_true")
    p.add_argument("--annotate_bkg", action="store_true",
                   help="--annotate_background_with_previous (U7 config)")
    cli = p.parse_args(argv)
    if cli.splits is None:
        cli.splits = (
            ["train", "val"]
            if cli.dataset == "crosstask"
            else ["s1", "s2", "s3", "s4"]
        )

    ours, ref = _build_pair(cli)
    failures = []

    def check(name, ok, detail=""):
        status = "OK " if ok else "FAIL"
        print("  [{}] {} {}".format(status, name, detail))
        if not ok:
            failures.append(name)

    check(
        "label2index parity",
        dict(ours.label2index) == dict(ref.label2index),
        "({} labels)".format(len(ours.label2index)),
    )

    for split in cli.splits:
        if cli.dataset == "crosstask":
            ds_a = ours.get_datasplit(
                remove_background=False, task_sets=["primary"], split=split,
                full=(split == "train"),
            )
            ds_b = ref.get_datasplit(
                remove_background=False, task_sets=["primary"], split=split,
                full=(split == "train"),
            )
        else:
            ds_a = ours.get_datasplit(
                remove_background=False, splits=[split], full=True
            )
            ds_b = ref.get_datasplit(
                remove_background=False, splits=[split], full=True
            )
        tasks_a = {t: sorted(v) for t, v in ds_a.videos_by_task.items()}
        tasks_b = {
            t: sorted(v) for t, v in ds_b._videos_by_task.items()
        }
        check(
            "{}: split membership".format(split),
            tasks_a == tasks_b,
            "({} tasks, {} videos)".format(
                len(tasks_a), sum(len(v) for v in tasks_a.values())
            ),
        )
        if tasks_a != tasks_b:
            continue
        n_cmp = 0
        n_fail_before = len(failures)
        for task in sorted(tasks_a):
            for name in tasks_a[task][: cli.n_videos]:
                a = ds_a[(task, name)]
                b = ds_b[(task, name)]
                if a is None or b is None:
                    check(
                        "{}/{}/{}: loadable".format(split, task, name),
                        a is None and b is None,
                        "(ours={}, ref={})".format(a is not None, b is not None),
                    )
                    continue
                fa, fb = np.asarray(a["features"]), _to_np(b["features"])
                if fa.shape != fb.shape or not np.allclose(
                    fa, fb, rtol=0, atol=0
                ):
                    check(
                        "{}/{}/{}: features".format(split, task, name),
                        False,
                        "shapes {} vs {}".format(fa.shape, fb.shape),
                    )
                    continue
                # presence must agree BEFORE comparing (an asymmetric
                # payload is itself the parity failure to report)
                ok = ("gt_single" in a) == ("gt_single" in b)
                if ok and "gt_single" in a:
                    ok = np.array_equal(
                        np.asarray(a["gt_single"]), _to_np(b["gt_single"])
                    )
                ok &= np.array_equal(
                    np.asarray(a["task_indices"]), _to_np(b["task_indices"])
                )
                ca, cb = a.get("constraints"), b.get("constraints")
                ok &= (ca is None) == (cb is None)
                if ca is not None and cb is not None:
                    # our loader deliberately truncates/zero-pads narration
                    # matrices to the feature count (corpus.py __getitem__,
                    # the documented fix-forward for the <=50-frame
                    # annotation/feature length mismatch the reference
                    # crashes on); apply the same alignment to the
                    # reference matrix before requiring bit-equality, and
                    # flag a non-zero trimmed overhang separately (that
                    # would mean the truncation discards real narration
                    # signal, not just padding).
                    ca, cb = np.asarray(ca), _to_np(cb)
                    n_feat = fa.shape[0]
                    if cb.shape[0] > n_feat:
                        if np.any(cb[n_feat:]):
                            check(
                                "{}/{}/{}: constraint overhang rows are "
                                "zero".format(split, task, name),
                                False,
                                "({} trimmed rows carry signal)".format(
                                    cb.shape[0] - n_feat
                                ),
                            )
                        cb = cb[:n_feat]
                    elif cb.shape[0] < n_feat:
                        cb = np.concatenate(
                            [
                                cb,
                                np.zeros(
                                    (n_feat - cb.shape[0], cb.shape[1]),
                                    cb.dtype,
                                ),
                            ]
                        )
                    ok &= np.array_equal(ca, cb)
                if not ok:
                    check(
                        "{}/{}/{}: payload".format(split, task, name), False
                    )
                    continue
                n_cmp += 1
        check(
            "{}: sampled payloads bit-equal".format(split),
            n_cmp > 0 and len(failures) == n_fail_before,
            "({} videos compared)".format(n_cmp),
        )
        if cli.dataset == "crosstask" and hasattr(
            ds_b, "get_allowed_starts_and_transitions"
        ):
            def _norm(s):
                starts, trans, ends, ordered = s
                return (
                    tuple(sorted(starts)),
                    tuple(sorted(
                        (k, tuple(sorted(v))) for k, v in trans.items()
                    )),
                    tuple(sorted(ends)),
                    # step ORDER is the constraint; do not sort values
                    tuple(sorted(
                        (k, tuple(v)) for k, v in ordered.items()
                    )),
                )

            check(
                "{}: canonical-ordering constraint sets".format(split),
                _norm(ds_a.get_allowed_starts_and_transitions())
                == _norm(ds_b.get_allowed_starts_and_transitions()),
            )

    if failures:
        print("realdata_loader_parity: {} FAILURES: {}".format(
            len(failures), failures
        ))
        return 1
    print("realdata_loader_parity: all checks passed")
    return 0


if __name__ == "__main__":
    sys.exit(main())
