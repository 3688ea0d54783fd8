#!/bin/bash
# Table-1 reproduction (reference scripts/test/eval_2dmetrics_ffhq.sh): CelebA-HQ
# test-split 2D reconstruction metrics -> scores.json.
python scripts/eval.py --data "${1:?need CelebA-HQ test dir}" --mode metrics \
  --out runs/eval_2dmetrics "${@:2}"
