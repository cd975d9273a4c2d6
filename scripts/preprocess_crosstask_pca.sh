#!/bin/bash
# PCA-200 preprocessing of raw CrossTask features per task and group.
python -u -m action_segmentation_tpu.data.crosstask
