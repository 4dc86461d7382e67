"""
Smoke-execute the example notebooks (reference L5 parity: the reference
ships its workflows as executable notebooks,
/root/reference/examples/notebooks/*.ipynb). Each notebook honors
GPIM_TPU_NB_ITERS, so the full narrative executes cell-by-cell with a
tiny iteration budget (nbclient, Agg matplotlib, one subprocess kernel
per notebook).
"""

import glob
import os

import pytest

nbformat = pytest.importorskip("nbformat")
nbclient = pytest.importorskip("nbclient")

HERE = os.path.dirname(os.path.abspath(__file__))
NB_DIR = os.path.abspath(os.path.join(HERE, "..", "examples", "notebooks"))
NOTEBOOKS = sorted(
    p for p in glob.glob(os.path.join(NB_DIR, "*.ipynb"))
    if ".ipynb_checkpoints" not in p)


def test_notebooks_exist():
    assert len(NOTEBOOKS) >= 7, NOTEBOOKS


@pytest.mark.parametrize("path", NOTEBOOKS,
                         ids=[os.path.basename(p) for p in NOTEBOOKS])
def test_notebook_executes(path, tmp_path, monkeypatch):
    monkeypatch.setenv("GPIM_TPU_NB_ITERS", "2")
    monkeypatch.setenv("MPLBACKEND", "Agg")
    monkeypatch.setenv("GPIM_TPU_REPO", os.path.join(HERE, ".."))
    monkeypatch.delenv("DISPLAY", raising=False)
    # the kernel is a fresh interpreter whose sitecustomize may pre-import
    # jax (making the JAX_PLATFORMS env var too late); the notebooks'
    # setup cell forces the backend through jax.config when this is set
    monkeypatch.setenv("GPIM_TPU_NB_PLATFORM", "cpu")
    nb = nbformat.read(path, as_version=4)
    client = nbclient.NotebookClient(
        nb, timeout=600, kernel_name="python3",
        resources={"metadata": {"path": str(tmp_path)}})
    client.execute()
    # every code cell ran (nbclient raises on errors, but assert the
    # execution counts anyway - a skipped cell would be silent)
    codes = [c for c in nb.cells if c.cell_type == "code"]
    assert all(c.execution_count is not None for c in codes)
