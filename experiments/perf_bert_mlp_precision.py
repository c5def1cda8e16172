"""BERT-base S=512: the mlp_precision knob's speed/fidelity on the real TPU.
CPU-f32 reference computed in-process (jax CPU backend alongside axon)."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import numpy as np
import jax
import jax.numpy as jnp

from transformer_explainability_tpu.models.bert import BertConfig, init_params
from transformer_explainability_tpu.explain.bert_generator import make_explain_fn

cfg = BertConfig()
params = init_params(jax.random.PRNGKey(0), cfg)
rng = np.random.RandomState(0)
S, B = 512, 8
ids = jnp.asarray(rng.randint(0, cfg.vocab_size, (B, S)), jnp.int32)
mask = np.ones((B, S), np.float32)
mask[1, 300:] = 0
mask[5, 450:] = 0
mask = jnp.asarray(mask)
idx = jnp.asarray(rng.randint(0, cfg.num_labels, B), jnp.int32)

import subprocess
TRUTH = "/tmp/bert_fidelity_truth.npz"
if not _os.path.exists(TRUTH):
    code = (
        "import jax, numpy as np\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "import jax.numpy as jnp\n"
        "from transformer_explainability_tpu.models.bert import BertConfig, init_params\n"
        "from transformer_explainability_tpu.explain.bert_generator import make_explain_fn\n"
        "cfg = BertConfig()\n"
        "params = init_params(jax.random.PRNGKey(0), cfg)\n"
        "rng = np.random.RandomState(0)\n"
        "S, B = 512, 8\n"
        "ids = jnp.asarray(rng.randint(0, cfg.vocab_size, (B, S)), jnp.int32)\n"
        "mask = np.ones((B, S), np.float32)\n"
        "mask[1, 300:] = 0\n"
        "mask[5, 450:] = 0\n"
        "idx = jnp.asarray(rng.randint(0, cfg.num_labels, B), jnp.int32)\n"
        "fn = make_explain_fn(cfg, matmul_precision='float32')\n"
        "out = np.asarray(fn(params, ids, jnp.asarray(mask), idx))\n"
        "np.savez('%s', truth=out)\n" % "TRUTH".replace("TRUTH", TRUTH))
    subprocess.run([_sys.executable, "-c", code], check=True,
                   cwd=_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
truth = np.load(TRUTH)["truth"]
print("cpu truth done", flush=True)

mvalid = np.asarray(mask)


def corr(a, b, m):
    a, b = a[m > 0], b[m > 0]
    a = a - a.mean(); b = b - b.mean()
    return float((a * b).sum() / np.sqrt((a * a).sum() * (b * b).sum()))


MODES = [
    ("tf32+f32attn", dict(matmul_precision="tensorfloat32",
                          attn_precision="float32")),
    ("tf32+f32attn+mlp=bf16", dict(matmul_precision="tensorfloat32",
                                   attn_precision="float32",
                                   mlp_precision="bfloat16")),
    ("bf16", dict(matmul_precision="bfloat16")),
]
print(f"{'mode':26s} {'expl/s':>8s} {'med':>8s} {'mean':>8s} {'min':>8s}")
for name, kw in MODES:
    fn = make_explain_fn(cfg, "transformer_attribution", **kw)
    out = np.asarray(fn(params, ids, mask, idx))
    cs = np.asarray([corr(out[i].astype(np.float64),
                          truth[i].astype(np.float64), mvalid[i])
                     for i in range(B)])
    n_iter = 8
    t0 = time.perf_counter()
    outs = [fn(params, ids, mask, idx) for _ in range(n_iter)]
    for o in outs:
        np.asarray(o)
    rate = B * n_iter / (time.perf_counter() - t0)
    print(f"{name:26s} {rate:8.1f} {np.median(cs):8.5f} {cs.mean():8.5f} "
          f"{cs.min():8.5f}", flush=True)
