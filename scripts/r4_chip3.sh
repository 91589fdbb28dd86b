#!/bin/bash
set -x
cd /root/repo
timeout 2400 python bench.py --artifact /root/art_7b32l --no-dense 2>&1 | tail -3
timeout 1200 python scripts/tinylm/train.py --layers 2 --steps 8000 --out /root/tinylm/params_2l.npz 2>&1 | tail -4
echo CHIP3_DONE
