#!/bin/bash
# Train on CrossTask with i3d+resnet+audio PCA features.
# Usage: scripts/run_crosstask_i3d-resnet-audio.sh <output_name> [extra flags...]
# Mirrors the reference's run_crosstask_i3d-resnet-audio.sh.

output_name=$1
shift
output_path="expts/crosstask_i3d-resnet-audio/${output_name}"
mkdir -p $output_path

python -u -m action_segmentation_tpu.main \
    --dataset crosstask \
    --crosstask_feature_groups i3d resnet audio \
    --model_output_path $output_path \
    $@ \
    | tee ${output_path}/log.txt
