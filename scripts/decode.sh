#!/bin/bash
# Re-run evaluation with a trained model: extracts the original training
# command from the experiment's log.txt and flips model_output_path to
# model_input_path (mirrors the reference's decode.sh).

expt_folder=$1

line=$(grep "action_segmentation_tpu.main" ${expt_folder}/log.txt | head -n1)

if [[ -z $line ]]
then
        echo "command not found in ${expt_folder}/log.txt"
        exit 1;
fi

decode_line=${line/model_output_path/model_input_path}

python -u -m $decode_line | tee ${expt_folder}/decode.out
