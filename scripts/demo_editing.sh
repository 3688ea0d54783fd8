#!/bin/bash
# Semantic editing demo (reference scripts/test/demo_editing.sh): +smile by default.
python scripts/eval.py --data "${1:-assets/demo_imgs}" --mode edit --smile "${2:-1.0}" \
  --boundaries "${3:-assets/boundaries}" --out runs/demo_editing "${@:4}"
