"""Build a local text corpus + BPE tokenizer for the tiny-LM quality gate.

The reference's whole point is a perplexity table on real language
(ref README (3).md:137-143; eval protocol ref utils.py:128-186).  This
zero-egress environment has no WikiText-2 — but it has ~500 MB of real
English+code text on disk (library sources, docs, guides).  This script
assembles a deterministic train/heldout split from that text, trains a
byte-level BPE tokenizer on it, and pre-tokenizes both splits to ``.npy``
token streams that BOTH pipelines (pt2tpu CLI and the torch reference
driver) consume identically — so the fp-vs-ternary ppl delta comparison
has no tokenizer/dataloader confound.

Outputs (under --out, default /root/tinylm):
  corpus_train.txt / corpus_heldout.txt   raw text (heldout = distinct FILES)
  tokenizer/                              HF PreTrainedTokenizerFast dir
  train_tokens.npy / heldout_tokens.npy   int32 token streams
"""

import argparse
import hashlib
import os
import random
import sys

ROOTS = [
    "/opt/venv/lib/python3.12/site-packages",
    "/usr/lib/python3.11",
    "/opt/skills",
    "/root/repo",
]
EXTS = (".py", ".md", ".rst", ".txt", ".pyi")
MAX_FILE_BYTES = 256_000  # skip generated monsters
MIN_FILE_BYTES = 256


def collect_files():
    files = []
    for root in ROOTS:
        for dirpath, dirnames, filenames in os.walk(root):
            dirnames[:] = sorted(
                d for d in dirnames
                if d not in ("__pycache__", "node_modules", ".git")
            )
            for f in sorted(filenames):
                if f.endswith(EXTS):
                    p = os.path.join(dirpath, f)
                    try:
                        sz = os.path.getsize(p)
                    except OSError:
                        continue
                    if MIN_FILE_BYTES <= sz <= MAX_FILE_BYTES:
                        files.append(p)
    return files


def read_text(path):
    try:
        with open(path, "rb") as f:
            raw = f.read()
        if b"\x00" in raw:
            return None
        text = raw.decode("utf-8")
    except (OSError, UnicodeDecodeError):
        return None
    # mostly-printable filter (drops embedded-binary oddities)
    if sum(c < " " and c not in "\n\t\r" for c in text[:4096]) > 16:
        return None
    return text


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/root/tinylm")
    ap.add_argument("--train-mb", type=float, default=96.0)
    ap.add_argument("--heldout-mb", type=float, default=3.0)
    ap.add_argument("--vocab", type=int, default=8192)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    files = collect_files()
    print(f"{len(files)} candidate files")
    rng = random.Random(args.seed)
    rng.shuffle(files)

    seen = set()  # content-hash dedup (dist-info duplicates etc.)
    train_parts, held_parts = [], []
    train_bytes = held_bytes = 0
    held_cap = int(args.heldout_mb * 1e6)
    train_cap = int(args.train_mb * 1e6)
    for p in files:
        if train_bytes >= train_cap and held_bytes >= held_cap:
            break
        text = read_text(p)
        if text is None:
            continue
        h = hashlib.sha1(text.encode()).digest()
        if h in seen:
            continue
        seen.add(h)
        # heldout gets whole distinct files first (no train overlap)
        if held_bytes < held_cap:
            held_parts.append(text)
            held_bytes += len(text)
        elif train_bytes < train_cap:
            train_parts.append(text)
            train_bytes += len(text)
    print(f"train {train_bytes/1e6:.1f} MB ({len(train_parts)} files), "
          f"heldout {held_bytes/1e6:.1f} MB ({len(held_parts)} files)")

    train_path = os.path.join(args.out, "corpus_train.txt")
    held_path = os.path.join(args.out, "corpus_heldout.txt")
    # reference calibration concatenates documents with \n\n (ref utils.py:59-63)
    with open(train_path, "w") as f:
        f.write("\n\n".join(train_parts))
    with open(held_path, "w") as f:
        f.write("\n\n".join(held_parts))

    # ---- tokenizer: byte-level BPE, vocab 8192 --------------------------
    from tokenizers import Tokenizer, models, pre_tokenizers, decoders, trainers
    from transformers import PreTrainedTokenizerFast

    tok = Tokenizer(models.BPE())
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=args.vocab,
        special_tokens=["<unk>", "<s>", "</s>"],
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet(),
    )
    tok.train([train_path], trainer)
    fast = PreTrainedTokenizerFast(
        tokenizer_object=tok,
        unk_token="<unk>",
        bos_token="<s>",
        eos_token="</s>",
        pad_token="</s>",
        model_max_length=1 << 20,
    )
    tok_dir = os.path.join(args.out, "tokenizer")
    fast.save_pretrained(tok_dir)
    print(f"tokenizer: vocab {fast.vocab_size} -> {tok_dir}")

    import numpy as np

    for name, path in (("train", train_path), ("heldout", held_path)):
        with open(path) as f:
            text = f.read()
        ids = np.asarray(
            fast(text, add_special_tokens=False)["input_ids"], np.int32
        )
        np.save(os.path.join(args.out, f"{name}_tokens.npy"), ids)
        print(f"{name}: {len(ids)/1e6:.2f} M tokens "
              f"({len(text)/len(ids):.2f} bytes/token)")


if __name__ == "__main__":
    main()
