#!/bin/bash
# PCA-64 preprocessing of Breakfast fisher-vector features.
python -u -m action_segmentation_tpu.data.breakfast
