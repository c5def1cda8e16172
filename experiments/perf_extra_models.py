"""Re-measure the bench's extra-model rows (ViT-L, BERT S=512/S=128) with
the round-4d steady-state windows — the BENCH_r4d full run timed these at
the old 2-batch windows (the window fix missed the extra-model sites).

Usage (TPU): python experiments/perf_extra_models.py
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import json

import numpy as np


def main():
    import jax
    assert jax.default_backend() == "tpu"
    import bench
    out = bench._bench_extra_models(["vit_l", "bert_s512", "bert_s128"],
                                    np.random.RandomState(0))
    print(json.dumps(out, indent=1))
    path = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                         "data", "perf_extra_models.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"# wrote {path}")


if __name__ == "__main__":
    main()
