#!/bin/bash
# One-shot driver for every measurement waiting on the TPU tunnel's
# return (the "pending" notes in BENCHES.md, round 3):
#   1. banded/halo block_rows sweep — the grouped single-pass kernel
#      redesign (kernels/flash_attention.py) was only CPU-interpret
#      validated; its on-chip table replaces the round-2 numbers.
#   2. FCT-256 batch-2 end-to-end forward — confirms the flash
#      (512, 2048) k-block default's kernel-level win survives in the
#      full model.
#   3. headline bench x3 — rep spread for the BENCHES.md variance note.
# Run from anywhere with the ambient axon env intact (do NOT overwrite
# PYTHONPATH). Results go to stdout; paste into BENCHES.md.
set -e
cd "$(dirname "$0")/.."
echo "== tunnel check =="
timeout 120 python -c "import jax; print(jax.devices())" || {
  echo "tunnel still down"; exit 1; }
echo "== banded/halo block_rows sweep (redesigned kernels) =="
timeout 3600 python benchmarks/band_block_sweep.py
echo "== FCT-256 end-to-end forward (new flash k-block default) =="
timeout 3600 python benchmarks/fct_forward_bench.py
echo "== headline bench x3 (variance) =="
for i in 1 2 3; do timeout 1800 python bench.py; done
