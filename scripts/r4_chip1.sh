#!/bin/bash
# Round-4 chip session 1: the unrecorded perf rows (VERDICT r3 items 3-5).
# Serialized — one process on the tunnel at a time.
set -x
cd /root/repo
T=2400
timeout $T python bench.py --no-dense                      2>&1 | tail -3
timeout $T python bench.py --no-dense --a8                 2>&1 | tail -3
timeout $T python bench.py --no-dense --mode spec          2>&1 | tail -4
timeout $T python bench.py --no-dense --mode spec --draft-layers 4 2>&1 | tail -4
timeout $T python bench.py --no-dense --batch 8            2>&1 | tail -3
timeout $T python scripts/decode_budget.py --batch 8 --prompt 1024 2>&1 | tail -25
timeout $T python bench.py --artifact /root/art_7b8l --no-dense 2>&1 | tail -3
echo CHIP1_DONE
timeout 2400 python scripts/headline_ab.py 2>&1 | tail -8
