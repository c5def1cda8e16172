"""Notebook-form walkthroughs (examples/*.ipynb — the analogs of the
reference's four documented notebooks, README.md:22-47: example.ipynb,
DeiT_example.ipynb, Transformer_explainability.ipynb,
BERT_explainability.ipynb).

Fast tier: the committed notebooks parse, carry executed outputs (figures /
colored-text HTML), and contain no error outputs. Slow tier: each notebook
re-executes clean on the CPU backend (nbclient)."""
import glob
import json
import os

import pytest

EXAMPLES = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "examples")
NOTEBOOKS = ["example.ipynb", "DeiT_example.ipynb",
             "Transformer_explainability.ipynb", "BERT_explainability.ipynb"]


@pytest.mark.parametrize("name", NOTEBOOKS)
def test_notebook_committed_with_clean_outputs(name):
    path = os.path.join(EXAMPLES, name)
    assert os.path.exists(path), f"missing walkthrough notebook {name}"
    with open(path) as f:
        nb = json.load(f)
    code = [c for c in nb["cells"] if c["cell_type"] == "code"]
    assert len(code) >= 4
    outputs = [o for c in code for o in c.get("outputs", [])]
    assert outputs, "notebook committed unexecuted"
    errors = [o for o in outputs if o.get("output_type") == "error"]
    assert not errors, errors[:1]
    rich = [o for o in outputs
            if "image/png" in o.get("data", {})
            or "text/html" in o.get("data", {})]
    assert rich, "no rendered figure/HTML output embedded"


@pytest.mark.slow
@pytest.mark.parametrize("name", NOTEBOOKS)
def test_notebook_executes_clean_on_cpu(name):
    nbformat = pytest.importorskip("nbformat")
    nbclient = pytest.importorskip("nbclient")
    nb = nbformat.read(os.path.join(EXAMPLES, name), as_version=4)
    client = nbclient.NotebookClient(
        nb, timeout=900, kernel_name="python3",
        resources={"metadata": {"path": EXAMPLES}})
    client.execute()     # raises CellExecutionError on any failing cell
