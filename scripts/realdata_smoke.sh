#!/bin/bash
# Real-data readiness kit (round-5 verdict item 5): the FIRST time the
# CrossTask files are mounted, run this from the repo root. It walks the
# full reference pipeline (README.md:28-57) end to end on the real
# files and checks every stage against the reference's own code:
#
#   stage 0  data layout sanity (release/features/constraints present)
#   stage 1  differential loader parity on RAW features (ours vs the
#            reference's loaders imported from /root/reference/src)
#   stage 2  PCA-200 preprocessing (skipped when the processed dir
#            already exists), then loader parity again on PCA features
#   stage 3  S6: supervised semimarkov, closed-form fit + decode
#            (reference README Table-2 row S6), few-epoch smoke
#   stage 4  U7: unsupervised + narration + ordering constraints
#            (Table-2 row U7), short leg
#   stage 5  STAT_KEYS comparison against docs/realdata_expected.json —
#            bootstrap: the first green run WRITES the file; later runs
#            must match it (tolerances in scripts/realdata_stats_check.py)
#
# Exit codes: 0 = all applicable stages green; 3 = data not mounted
# (nothing to do yet); anything else = a real failure.
#
# What must match (see PARITY.md "Real-data readiness"):
#   * stage 1/2: loaders bit-equal (split membership, features,
#     gt_single, constraints, canonical-ordering sets)
#   * stage 3/4: losses finite and decreasing; decode produces labels
#     for every video; STAT_KEYS within tolerance of expectations once
#     recorded, and of the paper's Table 2 on full-epoch runs.
set -u -o pipefail
cd "$(dirname "$0")/.."

DATA_ROOT="${DATA_ROOT:-data}"
EPOCHS="${SMOKE_EPOCHS:-3}"
OUT_ROOT="expts/realdata_smoke"

if [ ! -d "$DATA_ROOT/crosstask/crosstask_release" ]; then
    echo "realdata_smoke: $DATA_ROOT/crosstask/crosstask_release not" \
         "mounted; see /root/reference/README.md:28-41 for the layout"
    exit 3
fi
for d in crosstask_features crosstask_constraints; do
    if [ ! -d "$DATA_ROOT/crosstask/$d" ]; then
        echo "realdata_smoke: missing $DATA_ROOT/crosstask/$d"; exit 3
    fi
done
echo "== stage 0 OK: data layout present =="

echo "== stage 1: loader parity on raw features =="
python scripts/realdata_loader_parity.py --dataset crosstask \
    --data_root "$DATA_ROOT" --features raw || exit 1

PCA_DIR="$DATA_ROOT/crosstask/crosstask_processed/crosstask_primary_pca-200_with-bkg_by-task"
if [ ! -d "$PCA_DIR" ]; then
    echo "== stage 2: PCA-200 preprocessing (reference README.md:43-49) =="
    DATA_ROOT="$DATA_ROOT" bash scripts/preprocess_crosstask_pca.sh || exit 1
else
    echo "== stage 2: PCA output already present, skipping preprocess =="
fi
python scripts/realdata_loader_parity.py --dataset crosstask \
    --data_root "$DATA_ROOT" --features pca || exit 1

mkdir -p "$OUT_ROOT"

echo "== stage 3: S6 closed-form supervised + decode ($EPOCHS epochs) =="
# EXACTLY the Table-2 S6 flags (README.md "paper rows"; reference
# README Table 2): --task_specific_steps + --annotate_background_with_
# previous define the S6 class space — omitting them fits a different
# model family and records wrong expectations (round-5 review)
mkdir -p "$OUT_ROOT/s6"
python -u -m action_segmentation_tpu.main \
    --dataset crosstask --data_root "$DATA_ROOT" \
    --crosstask_feature_groups i3d resnet audio \
    --classifier semimarkov --training supervised \
    --task_specific_steps --annotate_background_with_previous \
    --epochs "$EPOCHS" \
    --model_output_path "$OUT_ROOT/s6" \
    | tee "$OUT_ROOT/s6/log.txt" || exit 1

echo "== stage 4: U7 unsupervised + narration + ordering (short leg) =="
# EXACTLY the Table-2 U7 flags: the row is the COMPOUND model
# (--sm_component_model), and the reference command has no --mix_tasks
mkdir -p "$OUT_ROOT/u7"
python -u -m action_segmentation_tpu.main \
    --dataset crosstask --data_root "$DATA_ROOT" \
    --crosstask_feature_groups i3d resnet audio \
    --classifier semimarkov --training unsupervised \
    --task_specific_steps --sm_constrain_transitions \
    --annotate_background_with_previous \
    --sm_component_model \
    --sm_constrain_with_narration train \
    --epochs "$EPOCHS" \
    --model_output_path "$OUT_ROOT/u7" \
    | tee "$OUT_ROOT/u7/log.txt" || exit 1

echo "== stage 5: STAT_KEYS vs recorded expectations =="
python scripts/realdata_stats_check.py \
    --s6_log "$OUT_ROOT/s6/log.txt" --u7_log "$OUT_ROOT/u7/log.txt" \
    --expected docs/realdata_expected.json || exit 1

echo "realdata_smoke: ALL STAGES GREEN"
