"""Packaging sanity (reference: Make/common.py:8-16, Make/build_*.py —
the rebuild ships as a PEP 517 wheel; these tests pin the wheel's
ingredients without invoking a full build)."""

from pathlib import Path

try:  # stdlib on 3.11+; the package itself supports >=3.10
    import tomllib
except ModuleNotFoundError:  # pragma: no cover - py3.10 fallback
    import pytest

    tomllib = pytest.importorskip("tomli")

REPO = Path(__file__).resolve().parent.parent
PKG = REPO / "signalizer_tpu"


def _project():
    with open(REPO / "pyproject.toml", "rb") as fh:
        return tomllib.load(fh)


def test_pyproject_parses_and_names_the_cli():
    data = _project()
    assert data["project"]["name"] == "signalizer-tpu"
    target = data["project"]["scripts"]["signalizer-tpu"]
    mod, _, fn = target.partition(":")
    import importlib

    assert callable(getattr(importlib.import_module(mod), fn))


def test_package_data_globs_cover_the_shipped_files():
    data = _project()
    globs = data["tool"]["setuptools"]["package-data"]["signalizer_tpu"]
    shipped = [
        p.relative_to(PKG)
        for p in PKG.rglob("*")
        if p.is_file()
        and p.suffix not in (".py", ".pyc", ".so")
        and "__pycache__" not in p.parts
    ]
    assert shipped, "expected non-Python package data"
    for rel in shipped:
        assert any(rel.match(g) for g in globs), f"{rel} not covered by {globs}"
    # the corpus the editor depends on
    assert sum(1 for r in shipped if r.suffix == ".sgz") == 20
    assert any(r.name == "host_runtime.cpp" for r in shipped)


def test_native_source_lives_inside_the_package():
    # installed wheels have no repo root; the bindings must resolve the
    # C++ source relative to the package (native_bindings._SRC)
    from signalizer_tpu import native_bindings as nb

    assert nb._SRC.is_relative_to(PKG)
    assert nb._SRC.exists()
    assert nb._LIB.parent == nb._SRC.parent


def test_ci_workflow_runs_the_cpu_suite():
    text = (REPO / ".github" / "workflows" / "ci.yml").read_text()
    assert "pytest tests/" in text
    assert "xla_force_host_platform_device_count=8" in text
