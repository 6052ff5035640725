"""Execute the notebook surface end-to-end (ports of the reference's three
notebooks over the synthetic scene). Slow (zero-shot inference inside) —
gated behind BEACH_SEG_RUN_SLOW=1."""

import os
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]

pytestmark = pytest.mark.skipif(
    not os.environ.get("BEACH_SEG_RUN_SLOW"),
    reason="executes full notebooks (~minutes); set BEACH_SEG_RUN_SLOW=1",
)


@pytest.mark.parametrize(
    "name", ["pipeline_walkthrough", "prediction_inspection", "shoreline_eval", "quickstart"]
)
def test_notebook_executes(name):
    import nbformat
    from nbclient import NotebookClient

    nb = nbformat.read(REPO / "notebooks" / f"{name}.ipynb", as_version=4)
    client = NotebookClient(
        nb, timeout=900, kernel_name="python3",
        resources={"metadata": {"path": str(REPO / "notebooks")}},
    )
    client.execute()
    errors = [
        out for cell in nb.cells if cell.cell_type == "code"
        for out in cell.get("outputs", []) if out.get("output_type") == "error"
    ]
    assert not errors, errors
