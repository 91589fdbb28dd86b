"""Worker for the 2-process multihost engine test (test_multihost.py).

Runs one process of a local jax.distributed CPU cluster: process 0 submits
the requests; both processes run the engine in lockstep (admission plans
broadcast with multihost_utils) and print their finished outputs as JSON.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("XLA_FLAGS", None)

import jax  # noqa: E402

# sitecustomize may have imported jax already (JAX_PLATFORMS=axon); the env
# var alone is then too late — force CPU before any jax op.
jax.config.update("jax_platforms", "cpu")

port, arg = sys.argv[1], sys.argv[2]
single = arg == "single"  # reference mode: same env, no cluster
pid = 0 if single else int(arg)
if not single:
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}", num_processes=2,
        process_id=pid,
    )

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from pt2tpu.models import decoder as dec  # noqa: E402
from pt2tpu.models import get_config  # noqa: E402
from pt2tpu.serve.engine import ServeEngine  # noqa: E402
from pt2tpu.serve.sampling import SamplingConfig  # noqa: E402

cfg = get_config("tiny-llama")
params = dec.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
eng = ServeEngine(
    cfg, params, max_batch=2, max_len=64, multihost=not single
)

rng = np.random.default_rng(0)
prompts = [
    rng.integers(0, cfg.vocab_size, size=n).astype(np.int32)
    for n in (3, 5, 9, 4)
]
max_news = [6, 4, 5, 7]
if jax.process_index() == 0:
    for i, (p, m) in enumerate(zip(prompts, max_news)):
        eng.submit(
            p, m,
            sampling=SamplingConfig(temperature=0.8, top_k=16)
            if i == 2 else None,
        )
eng.run(max_steps=200)

outs = {str(r.uid): r.out for r in eng.finished}
print("RESULT " + json.dumps({"pid": pid, "outs": outs}), flush=True)
