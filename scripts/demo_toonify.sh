#!/bin/bash
# 3D toonification demo (reference scripts/test/demo_toonify.sh): pass the toonified
# generator checkpoint to swap in domain-transferred weights.
python scripts/eval.py --data "${1:-assets/demo_imgs}" --mode metrics \
  --torch-ckpt "${2:?need toonify generator .pt}" --out runs/demo_toonify "${@:3}"
