"""Demo programs diffed against committed expected output — the
reference's Demo-as-integration-test tier (SURVEY.md §4.1: cs_demo.out,
kludemo.out diffs).  Numeric tokens compare with tolerance (tiny residuals
only need to stay tiny); all other text must match exactly."""
import contextlib
import importlib.util
import io
import pathlib
import re

import pytest

DEMOS = ["cholmod_demo", "klu_demo", "cs_demo", "umfpack_demo",
         "graphblas_demo"]
ROOT = pathlib.Path(__file__).resolve().parents[1] / "demos"

_NUM = re.compile(r"^[-+]?(\d+\.?\d*|\.\d+)([eE][-+]?\d+)?$")


def _run_demo(name: str) -> str:
    spec = importlib.util.spec_from_file_location(name, ROOT / f"{name}.py")
    mod = importlib.util.module_from_spec(spec)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        spec.loader.exec_module(mod)
        mod.main()
    return buf.getvalue()


def _tokens_match(exp: str, got: str) -> bool:
    if exp == got:
        return True
    if not (_NUM.match(exp) and _NUM.match(got)):
        return False
    e, g = float(exp), float(got)
    if abs(e) < 1e-10:           # residual-class value: must stay tiny
        return abs(g) < 1e-9
    return abs(e - g) <= 1e-3 * max(abs(e), abs(g))


@pytest.mark.parametrize("name", DEMOS)
def test_demo_output(name):
    expected = (ROOT / "expected" / f"{name}.out").read_text()
    got = _run_demo(name)
    elines = expected.strip().splitlines()
    glines = got.strip().splitlines()
    assert len(elines) == len(glines), f"{name}: line count differs\n{got}"
    for le, lg in zip(elines, glines):
        te, tg = le.split(), lg.split()
        assert len(te) == len(tg), f"{name}: {le!r} vs {lg!r}"
        for a, b in zip(te, tg):
            assert _tokens_match(a, b), f"{name}: {le!r} vs {lg!r}"
