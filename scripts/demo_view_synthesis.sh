#!/bin/bash
# Novel-view synthesis demo (reference scripts/test/demo_view_synthesis.sh):
# invert the input images and render an azimuth sweep through the E1 hybrid path.
python scripts/eval.py --data "${1:-assets/demo_imgs}" --mode video --views "${2:-16}" \
  --out runs/demo_view_synthesis "${@:3}"
