"""HTTP serving front-end: concurrent requests through a real socket must
match lockstep greedy decoding."""

import json
import threading
import urllib.request

import numpy as np
import jax
import jax.numpy as jnp

from pt2tpu.models import decoder as dec
from pt2tpu.models import get_config
from pt2tpu.serve import greedy_generate
from pt2tpu.serve.server import ServingServer

pytestmark = __import__('pytest').mark.slow  # XLA-compile-heavy (fast tier: -m 'not slow')


def _post(port, path, obj):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(obj).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=120) as r:
        return json.loads(r.read())


def test_http_server_end_to_end():
    cfg = get_config("tiny-llama")
    params = dec.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    srv = ServingServer(cfg, params, port=0, max_batch=2, max_len=64).start()
    try:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{srv.port}/health", timeout=30
        ) as r:
            health = json.loads(r.read())
        assert health["status"] == "ok"

        rng = np.random.default_rng(0)
        prompts = [rng.integers(0, cfg.vocab_size, size=l).tolist() for l in (3, 6, 4)]
        results = {}

        def client(i, p):
            results[i] = _post(
                srv.port, "/generate", {"prompt_ids": p, "max_new": 5}
            )

        threads = [
            threading.Thread(target=client, args=(i, p))
            for i, p in enumerate(prompts)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()

        for i, p in enumerate(prompts):
            want = np.asarray(
                greedy_generate(
                    cfg, params, jnp.asarray([p], jnp.int32), max_new=5, max_len=64
                )
            )[0].tolist()
            assert results[i]["ids"] == want, (i, results[i], want)

        # probe: malformed request -> 400, wrong path -> 404
        try:
            _post(srv.port, "/generate", {"nope": 1})
            assert False, "expected HTTPError"
        except urllib.error.HTTPError as e:
            assert e.code == 400
        try:
            _post(srv.port, "/elsewhere", {})
            assert False, "expected HTTPError"
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        srv.stop()


def test_http_server_sampling_and_paged_engine():
    """Sampled requests through the HTTP API, served by the PAGED engine."""
    from pt2tpu.serve.paged import PagedServeEngine

    cfg = get_config("tiny-llama")
    params = dec.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    eng = PagedServeEngine(cfg, params, max_batch=2, max_len=64,
                           page_size=16, seed=3)
    srv = ServingServer(cfg, params, port=0, engine=eng).start()
    try:
        r = _post(srv.port, "/generate", {
            "prompt_ids": [3, 7, 11], "max_new": 6,
            "temperature": 0.9, "top_k": 10,
        })
        assert len(r["ids"]) == 6
        assert all(0 <= t < cfg.vocab_size for t in r["ids"])
        # greedy through the same paged engine matches lockstep greedy
        g = _post(srv.port, "/generate", {
            "prompt_ids": [3, 7, 11], "max_new": 6,
        })
        want = np.asarray(greedy_generate(
            cfg, params, jnp.asarray([[3, 7, 11]], jnp.int32),
            max_new=6, max_len=64,
        ))[0].tolist()
        assert g["ids"] == want
    finally:
        srv.stop()
