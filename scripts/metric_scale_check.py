"""Measure the host-side metric pass at CrossTask scale (VERDICT r2 #8).

The reference evaluates per epoch (src/main.py:207-244), and our device
decode is ~1000x faster than its DP, so the numpy Accuracy/F1 pass is
the candidate next bottleneck. This script times the full per-task
metric sweep (the exact call sequence of Datasplit.accuracy_corpus:
mof -> mof_classes -> iou_classes -> levenshtein -> single_step_recall
plus F1Score) on a synthetic ~1M-frame corpus with a realistic shape:
~18 tasks x ~65 videos x ~900 frames, C~10 steps per task, ~2% of
frames carrying multiple gt labels.

Usage: python scripts/metric_scale_check.py [n_frames_millions]
Prints one ms/phase table and a ms-per-1e6-frames summary.

Measured (round 3, this host): the reference-faithful per-frame Python
loops cost 118,500 ms per 1e6 frames (F1 mask building 103 s, mof frame
loop 10.5 s, single_step_recall remap 2.1 s). After vectorization
(same RNG stream, same (num, den) outputs): 2,985 ms per 1e6 frames —
mof 853 ms, f1 975 ms (dominated by the 50x per-segment bounded randint
draws the parity contract fixes), single_step_recall 474 ms,
add_labels 457 ms, levenshtein 145 ms.

Round 4 (store ragged gt as (counts, flat) arrays at add time, cache
the concatenated flats, argsort-group single_step_recall, precompute
the F1 frame-agreement mask, choice->randint with an identical
stream): ~1,850-2,300 ms per 1e6 frames (+-20% host variance) — mof
290-350 ms, ssr ~330 ms, f1 850-1070 ms of which ~670 ms is the
bounded randint draws the stream-parity contract makes irreducible.
NOTE this script still feeds F1 through the Python-list set_gt path;
corpus.accuracy_corpus itself reuses the accumulator's cached arrays
(f1.set_gt_single) and skips the million-element long_gt/long_pr list
builds entirely.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

from action_segmentation_tpu.evaluation.accuracy import Accuracy
from action_segmentation_tpu.evaluation.f1 import F1Score


class FakeCorpus:
    def __init__(self, background_indices, n):
        self._background_indices = list(background_indices)
        self.index2label = {i: str(i) for i in range(n)}


def make_task(rng, n_videos, mean_len, classes):
    gts, preds = [], []
    for _ in range(n_videos):
        T = int(rng.randint(mean_len // 2, mean_len * 3 // 2))
        gt = np.zeros(T, np.int64)
        t = 0
        while t < T:
            c = classes[rng.randint(len(classes))]
            d = int(rng.randint(8, 60))
            gt[t : t + d] = c
            t += d
        # predictions: 70% correct, rest random within task
        noise = rng.rand(T) < 0.3
        pred = gt.copy()
        pred[noise] = np.asarray(classes)[rng.randint(len(classes), size=noise.sum())]
        # ~2% multi-label frames (background frames stay single-label:
        # the corpus invariant is all-or-none background per frame)
        multi = (rng.rand(T) < 0.02) & (gt != 0)
        nonbg = [c for c in classes if c != 0]
        gt_multi = [
            [int(g), int(nonbg[rng.randint(len(nonbg))])] if m else [int(g)]
            for g, m in zip(gt, multi)
        ]
        gts.append(gt_multi)
        preds.append(pred)
    return gts, preds


def main():
    target_frames = float(sys.argv[1]) * 1e6 if len(sys.argv) > 1 else 1e6
    rng = np.random.RandomState(0)
    n_tasks = 18
    mean_len = 900
    n_videos = max(1, int(target_frames / (n_tasks * mean_len)))
    n_classes_total = n_tasks * 10 + 1

    tasks = []
    for ti in range(n_tasks):
        classes = [0] + list(range(1 + ti * 10, 1 + (ti + 1) * 10))
        tasks.append((classes, *make_task(rng, n_videos, mean_len, classes)))

    total_frames = sum(len(g) for _, gts, _ in tasks for g in gts)
    phases = {}

    def tick(name, t0):
        phases[name] = phases.get(name, 0.0) + (time.perf_counter() - t0)

    t_all = time.perf_counter()
    for classes, gts, preds in tasks:
        acc = Accuracy(verbose=False, corpus=FakeCorpus([0], n_classes_total))
        t0 = time.perf_counter()
        for gt, pred in zip(gts, preds):
            acc.add_gt_labels(gt)
            acc.add_predicted_labels(pred)
        tick("add_labels", t0)

        t0 = time.perf_counter()
        acc.mof(optimal_assignment=True, possible_gt_labels=classes)
        tick("mof (per-frame loop)", t0)
        t0 = time.perf_counter()
        acc.mof_classes()
        acc.iou_classes()
        tick("mof/iou_classes", t0)
        t0 = time.perf_counter()
        acc.levenshtein()
        tick("levenshtein", t0)
        t0 = time.perf_counter()
        acc.single_step_recall()
        tick("single_step_recall", t0)

        t0 = time.perf_counter()
        f1 = F1Score(K=len(classes), n_videos=len(gts), verbose=False)
        long_gt = [g for gt in gts for g in gt]
        long_pr = [int(p) for pred in preds for p in pred]
        f1.set_gt(long_gt)
        f1.set_pr(long_pr)
        f1.set_gt2pr(acc._gt2cluster)
        f1.f1()
        tick("f1 (boundaries+sampling)", t0)
    wall = time.perf_counter() - t_all

    print(f"corpus: {total_frames} frames, {n_tasks} tasks x {n_videos} videos")
    for name, sec in phases.items():
        print(f"  {name:28s} {sec * 1e3:9.1f} ms")
    print(
        f"TOTAL {wall * 1e3:.1f} ms = {wall * 1e9 / total_frames:.0f} ms per 1e6 frames"
    )


if __name__ == "__main__":
    main()
