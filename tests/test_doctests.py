"""Docstring examples as tests (the reference runs doctests over all
docstrings and docs, /root/reference/tox.ini:38-50 + pyproject
pytest-doctestplus options; this is the framework's equivalent gate)."""

import doctest

import numpy as np
import pytest

import baseband_tasks_tpu.dm
import baseband_tasks_tpu.fourier.base
import baseband_tasks_tpu.phases.phase
import baseband_tasks_tpu.generators

MODULES = [
    baseband_tasks_tpu.dm,
    baseband_tasks_tpu.fourier.base,
    baseband_tasks_tpu.phases.phase,
    baseband_tasks_tpu.generators,
]


@pytest.mark.parametrize("module", MODULES,
                         ids=[m.__name__ for m in MODULES])
def test_module_doctests(module):
    result = doctest.testmod(
        module, optionflags=doctest.ELLIPSIS
        | doctest.NORMALIZE_WHITESPACE, verbose=False)
    assert result.failed == 0, f"{result.failed} doctest failures"
    assert result.attempted > 0, "module has no doctest examples"


DOC_FILES = ["index.md", "helpers.md"]


@pytest.mark.parametrize("name", DOC_FILES)
def test_docs_doctests(name):
    import os
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", name)
    result = doctest.testfile(
        path, module_relative=False,
        optionflags=doctest.ELLIPSIS | doctest.NORMALIZE_WHITESPACE)
    assert result.failed == 0, f"{result.failed} doc example failures"
    assert result.attempted > 0, f"docs/{name} has no examples"


def test_tutorial_blocks():
    """docs/tutorial.md runs end-to-end: every ```python block executes
    in one shared namespace (the reference doctests its rst tutorials;
    this is the markdown equivalent)."""
    import os
    import re
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "tutorial.md")
    with open(path) as fh:
        text = fh.read()
    blocks = re.findall(r"```python\n(.*?)```", text, re.DOTALL)
    assert len(blocks) >= 6
    ns = {}
    for i, block in enumerate(blocks):
        try:
            exec(compile(block, f"tutorial.md[block {i}]", "exec"), ns)
        except Exception as exc:
            raise AssertionError(
                f"tutorial block {i} failed: {exc}\n{block}") from exc
