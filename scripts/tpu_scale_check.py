"""Realistic-scale TPU integration check.

Trains and decodes at CrossTask-like scale on synthetic data (C=19
classes, 300-d features, videos up to 512 frames): closed-form
supervised fit, a few epochs of unsupervised marginal-likelihood
training through the custom-VJP Pallas path, and batched Viterbi decode.
Prints throughput (vids/sec — the reference's headline training log
metric, semimarkov.py:294-304) and token accuracy.

Run: python scripts/tpu_scale_check.py
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np

from action_segmentation_tpu.data.synthetic import SyntheticDatasplit
from action_segmentation_tpu.models.base import add_training_args
from action_segmentation_tpu.models.semimarkov import SemiMarkovModel
from action_segmentation_tpu.utils import enable_compilation_cache


def make_args(**overrides):
    parser = argparse.ArgumentParser()
    SemiMarkovModel.add_args(parser)
    add_training_args(parser)
    parser.add_argument("--batch_size", type=int, default=16)
    parser.add_argument("--annotate_background_with_previous", action="store_true")
    parser.add_argument("--no_merge_classes", action="store_true")
    args = parser.parse_args([])
    for k, v in overrides.items():
        setattr(args, k, v)
    return args


def accuracy(model, data):
    preds = model.predict(data)
    match = total = 0
    for name, pred in preds.items():
        gold = data.gt_single(name)
        match += int((np.asarray(pred) == gold).sum())
        total += len(gold)
    return match / total


def main():
    enable_compilation_cache()
    train = SyntheticDatasplit(
        num_videos=60, n_classes=19, max_len=512, span_k=20, feature_dim=300,
        shift=1.5, seed=0,
    )
    test = SyntheticDatasplit(
        num_videos=20, n_classes=19, max_len=512, span_k=20, feature_dim=300,
        shift=1.5, seed=1,
    )
    total_frames = sum(len(s["gt_single"]) for s in train._samples.values())
    print(f"train: {len(train)} videos, {total_frames} frames", flush=True)

    # supervised closed form + decode
    args = make_args(sm_max_span_length=20, sm_supervised_method="closed-form")
    model = SemiMarkovModel.from_args(args, train)
    t0 = time.time()
    model.fit(train, use_labels=True)
    print(f"closed-form fit: {time.time() - t0:.2f}s", flush=True)
    t0 = time.time()
    acc = accuracy(model, test)
    dt = time.time() - t0
    test_frames = sum(len(s["gt_single"]) for s in test._samples.values())
    print(
        f"decode: acc {acc:.3f}, {len(test) / dt:.1f} vids/sec "
        f"({test_frames / dt:.0f} frames/sec incl host I/O + compile)",
        flush=True,
    )
    t0 = time.time()
    accuracy(model, test)
    dt = time.time() - t0
    print(
        f"decode (warm): {len(test) / dt:.1f} vids/sec "
        f"({test_frames / dt:.0f} frames/sec incl host I/O)",
        flush=True,
    )
    assert acc > 0.6, acc

    # unsupervised gradient training (custom-VJP Pallas partition on TPU)
    args = make_args(sm_max_span_length=20, epochs=3, lr=1e-2, batch_size=16)
    model = SemiMarkovModel.from_args(args, train)
    losses = []
    epoch_times = []
    t_prev = time.time()

    def cb(e, s):
        nonlocal t_prev
        losses.append(s["train_loss"])
        epoch_times.append(time.time() - t_prev)
        t_prev = time.time()

    model.fit(train, use_labels=False, callback_fn=cb)
    print(f"unsup losses: {[round(l, 1) for l in losses]}", flush=True)
    print(
        f"unsup epochs: {[round(t, 1) for t in epoch_times]}s; warm epoch "
        f"throughput {len(train) / epoch_times[-1]:.1f} vids/sec",
        flush=True,
    )
    assert losses[-1] < losses[0]
    print("TPU scale check OK", flush=True)


if __name__ == "__main__":
    main()
