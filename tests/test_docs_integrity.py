"""PARITY.md is the parity audit trail: every citation must resolve.

Round-4 verdict found a Tests-column citation pointing at a file that
does not exist (tests/test_pint_stub.py); this pins all of them.
"""

import re
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
PARITY = (REPO / "PARITY.md").read_text()


def test_parity_test_citations_exist():
    """Every test_*.py file named in PARITY.md exists under tests/."""
    names = set(re.findall(r"\btest_\w+\.py\b", PARITY))
    assert names, "PARITY.md should cite test files"
    missing = sorted(n for n in names if not (REPO / "tests" / n).exists())
    assert not missing, f"PARITY.md cites nonexistent test files: {missing}"


def test_parity_module_citations_exist():
    """Every `baseband_tasks_tpu/...py`-style path in PARITY.md exists."""
    paths = set(re.findall(r"\bbaseband_tasks_tpu/[\w/]+\.py\b", PARITY))
    missing = sorted(p for p in paths if not (REPO / p).exists())
    assert not missing, f"PARITY.md cites nonexistent modules: {missing}"


def test_parity_our_module_dotted_names_import():
    """Dotted `ours` names of the form pkg.module (first two levels)
    resolve as attributes/submodules of the package."""
    import importlib
    import baseband_tasks_tpu as bt

    dotted = set(re.findall(
        r"`((?:base|dm|pfb|functions|conversion|integration|shaping|"
        r"combining|sampling|dispersion|channelize|convolution|"
        r"generators|registry|rfi|timing|faraday|polarization|fourier|"
        r"phases|io|utils|models|parallel|ops)(?:\.\w+)+)`", PARITY))
    dotted = {d for d in dotted if not d.endswith(".py")}
    assert dotted
    for name in sorted(dotted):
        obj = bt
        for i, p in enumerate(name.split(".")):
            try:
                obj = getattr(obj, p)
            except AttributeError:
                obj = importlib.import_module(
                    "baseband_tasks_tpu."
                    + ".".join(name.split(".")[:i + 1]))
