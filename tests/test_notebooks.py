"""Execute the tutorial notebooks (reference tests/test_notebooks.py style:
convert each .ipynb's code cells to a script and exec it — "just running is
enough"). The notebooks fall back to tiny random-init models when released
weights are absent, so they execute fully on CPU.
"""

import json
import pathlib

import pytest

pytestmark = pytest.mark.slow  # heavy example/notebook compiles

NB_DIR = pathlib.Path(__file__).parent.parent / "examples" / "notebooks"
NOTEBOOKS = sorted(NB_DIR.glob("*.ipynb"))


def _code(nb_path):
    doc = json.loads(nb_path.read_text())
    chunks = []
    for cell in doc["cells"]:
        if cell["cell_type"] == "code":
            chunks.append("".join(cell["source"]))
    return "\n\n".join(chunks)


def test_notebooks_exist():
    assert len(NOTEBOOKS) == 10, [p.name for p in NOTEBOOKS]


@pytest.mark.parametrize("nb_path", NOTEBOOKS, ids=lambda p: p.stem)
def test_notebook_runs(nb_path):
    src = _code(nb_path)
    assert src.strip()
    exec(compile(src, str(nb_path), "exec"), {"__name__": f"nb_{nb_path.stem}"})
