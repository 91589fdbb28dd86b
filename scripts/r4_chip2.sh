#!/bin/bash
# Round-4 chip session 2: long-context/batch attention budget (reduced
# shapes — batch 8 x prompt 1024 prefill OOMs in AOT compile, see
# /root/r4_chip1.log) + exact-path artifact row for the one-artifact table.
set -x
cd /root/repo
T=2400
timeout $T python scripts/decode_budget.py --batch 8 --prompt 512 --variants full,no_attn,kv_int8,a8 2>&1 | tail -10
timeout $T python scripts/decode_budget.py --batch 2 --prompt 1024 --variants full,no_attn,kv_int8 2>&1 | tail -8
timeout $T python bench.py --artifact /root/art_7b8l --no-dense --exact 2>&1 | tail -3
echo CHIP2_DONE
timeout $T python bench.py --no-dense --perms identity 2>&1 | tail -3
timeout $T python bench.py --no-dense --perms identity --lm-head ternary 2>&1 | tail -3
echo CHIP2B_DONE
timeout 1800 python scripts/attn_layout_probe.py 2>&1 | tail -6
