"""Golden-tutorial gate: every ``python`` code block in tutorials/*.md is
executed in order (one shared namespace per file) and its embedded
assertions must hold -- the tutorials ARE executable behavior specs, the
analog of the reference's expected-output tutorials
(reference tutorials/*.md)."""

import os
import re
from pathlib import Path

import pytest

TUTORIALS = sorted(
    Path(__file__).resolve().parent.parent.joinpath("tutorials").glob("*.md")
)

CODE_BLOCK = re.compile(r"```python\n(.*?)```", re.DOTALL)


@pytest.mark.parametrize("path", TUTORIALS, ids=lambda p: p.stem)
def test_tutorial_executes_with_assertions(path):
    blocks = CODE_BLOCK.findall(path.read_text())
    assert blocks, f"{path.name} has no python blocks"
    assert any("assert" in b for b in blocks), (
        f"{path.name} has no assertions -- tutorials must be golden specs"
    )
    cwd = os.getcwd()
    os.chdir(path.parent.parent)  # tutorials reference tutorials/accounts.csv
    ns = {}
    try:
        for i, block in enumerate(blocks):
            try:
                exec(compile(block, f"{path.name}[block {i}]", "exec"), ns)
            except AssertionError:
                raise
            except Exception as e:  # pragma: no cover - diagnostic clarity
                raise AssertionError(
                    f"{path.name} block {i} raised {type(e).__name__}: {e}"
                ) from e
    finally:
        os.chdir(cwd)
