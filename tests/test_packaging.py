"""Packaging parity (VERDICT r6 task 3; reference pyproject.toml:26-27
exposes `pgwarehouse = pgwarehouse.__main__:main`). The full
`pip install -e .` round-trip was proven in a clean
--system-site-packages venv (console script runs `queries` from /tmp,
277 rows); these tests pin the pieces that make that work plus the two
live install round-trips (VERDICT r7 task 2): the PEP 660 path when the
interpreter's tooling supports it (needs `wheel` or setuptools>=70,
loudly skipped otherwise), and the `setup.py develop` fallback that
works on this container's wheel-less default interpreter.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
import tomllib

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _editable_tooling_available() -> bool:
    """PEP 660 editable metadata generation under setuptools<70 shells
    out to bdist_wheel, which lives in the `wheel` package; setuptools
    70+ ships it built-in. Offline build isolation cannot fetch either,
    so the real `pip install -e .` only works when one is present."""
    try:
        import wheel  # noqa: F401

        return True
    except ImportError:
        pass
    try:
        import setuptools

        return int(setuptools.__version__.split(".")[0]) >= 70
    except Exception:
        return False


def _fresh_src_tree(tmp_path) -> str:
    """Copy just the installable pieces to a scratch dir so install
    side effects (egg-info, build/) never land in the repo."""
    src = os.path.join(str(tmp_path), "src")
    os.makedirs(src)
    for f in ("pyproject.toml", "setup.py", "README.md"):
        shutil.copy(os.path.join(_REPO, f), src)
    shutil.copytree(
        os.path.join(_REPO, "pgwarehouse_spark"),
        os.path.join(src, "pgwarehouse_spark"),
        ignore=shutil.ignore_patterns("__pycache__"),
    )
    return src


def _make_venv(tmp_path) -> str:
    venv_dir = os.path.join(str(tmp_path), "venv")
    proc = subprocess.run(
        [sys.executable, "-m", "venv", "--system-site-packages", venv_dir],
        capture_output=True,
        text=True,
        timeout=180,
    )
    assert proc.returncode == 0, proc.stderr[-1000:]
    return venv_dir


def _assert_console_script_works(venv_dir: str) -> None:
    script = os.path.join(venv_dir, "bin", "pgwarehouse-spark")
    assert os.path.exists(script), "console script not installed"
    proc = subprocess.run(
        [script, "--help"],
        capture_output=True,
        text=True,
        timeout=120,
        cwd="/tmp",
    )
    assert proc.returncode == 0, proc.stderr[-1000:]
    assert "sync" in proc.stdout and "queries" in proc.stdout


def test_pip_editable_install_roundtrip(tmp_path):
    """The real `pip install -e .` in a clean venv, when the tooling
    can do PEP 660 offline. On an interpreter without `wheel` and with
    setuptools<70 this skips LOUDLY — that environment is covered by
    the `setup.py develop` fallback test below (README 'Install')."""
    if not _editable_tooling_available():
        pytest.skip(
            "pip install -e . needs the `wheel` package or setuptools>=70 "
            "(PEP 660 editable builds); this interpreter has neither — "
            "covered by test_setup_py_develop_fallback_roundtrip"
        )
    src = _fresh_src_tree(tmp_path)
    venv_dir = _make_venv(tmp_path)
    proc = subprocess.run(
        [
            os.path.join(venv_dir, "bin", "pip"),
            "install", "-e", src,
            "--no-build-isolation", "--no-index", "-q",
        ],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    _assert_console_script_works(venv_dir)


def test_setup_py_develop_fallback_roundtrip(tmp_path):
    """The documented fallback for wheel-less interpreters (this
    container's pyenv default): `python setup.py develop` needs only
    setuptools, and must yield working console scripts."""
    src = _fresh_src_tree(tmp_path)
    venv_dir = _make_venv(tmp_path)
    proc = subprocess.run(
        [os.path.join(venv_dir, "bin", "python"), "setup.py", "develop", "-q"],
        capture_output=True,
        text=True,
        timeout=300,
        cwd=src,
    )
    assert proc.returncode == 0, (proc.stdout + proc.stderr)[-2000:]
    # install side effects must stay inside the venv/source scratch dirs
    assert not os.path.exists(os.path.join(_REPO, "pgwarehouse_spark.egg-info"))
    _assert_console_script_works(venv_dir)


def _pyproject() -> dict:
    with open(os.path.join(_REPO, "pyproject.toml"), "rb") as f:
        return tomllib.load(f)


def test_pyproject_metadata_complete():
    meta = _pyproject()
    proj = meta["project"]
    assert proj["name"] == "pgwarehouse-spark"
    assert any(d.startswith("pyspark") for d in proj["dependencies"])
    assert "test" in proj.get("optional-dependencies", {})
    assert meta["build-system"]["build-backend"] == "setuptools.build_meta"


def test_console_script_entry_points_resolve():
    """Every declared console script must point at an importable
    callable — a typo'd entry point only fails at install time
    otherwise, which no suite run would catch."""
    import importlib

    scripts = _pyproject()["project"]["scripts"]
    assert "pgwarehouse-spark" in scripts
    for name, target in scripts.items():
        mod_name, _, attr = target.partition(":")
        mod = importlib.import_module(mod_name)
        fn = getattr(mod, attr)
        assert callable(fn), f"{name} -> {target} is not callable"


def test_python_dash_m_package_entry():
    """`python -m pgwarehouse_spark --help` must work from any cwd (the
    reference's __main__ route)."""
    proc = subprocess.run(
        [sys.executable, "-m", "pgwarehouse_spark", "--help"],
        capture_output=True,
        text=True,
        timeout=60,
        cwd="/tmp",
        env={**os.environ, "PYTHONPATH": _REPO},
    )
    assert proc.returncode == 0, proc.stderr[-1000:]
    assert "sync" in proc.stdout and "queries" in proc.stdout


def test_setup_py_is_a_pure_shim():
    """setup.py exists only for offline legacy-editable installs; all
    metadata must stay single-sourced in pyproject.toml."""
    with open(os.path.join(_REPO, "setup.py")) as f:
        body = f.read()
    assert "setup()" in body
    assert "name=" not in body and "version=" not in body


def test_minimal_install_imports_without_duckdb(tmp_path):
    """ADVICE r8 (medium): cli.py unconditionally imports
    sync.fake_engine → sync.fakes; fakes.py had a module-level
    `import duckdb`, so a minimal install (pyspark+pyyaml only — duckdb
    is a test extra) crashed on EVERY warehouse command, including
    `sync` against the default parquet lake. Simulate the minimal
    install by blocking duckdb at the meta-path and prove (a) the CLI
    module tree imports, (b) the routing isinstance checks work, and
    (c) constructing a fake fails loudly only at USE time."""
    probe = tmp_path / "probe.py"
    probe.write_text(
        """
import sys
import importlib.abc


class _BlockDuckdb(importlib.abc.MetaPathFinder):
    def find_spec(self, name, path=None, target=None):
        if name == "duckdb" or name.startswith("duckdb."):
            raise ImportError("duckdb blocked: minimal-install simulation")
        return None


sys.meta_path.insert(0, _BlockDuckdb())
sys.modules.pop("duckdb", None)

# (a) the whole CLI import tree must load without duckdb
from pgwarehouse_spark import cli  # noqa: F401
from pgwarehouse_spark.sync import fake_engine, fakes
from pgwarehouse_spark.sync.duckdb_sink import DuckDBSyncEngine  # noqa: F401

# (b) isinstance routing against the fake engine class works un-imported
assert not isinstance(object(), fake_engine.FakeWarehouseSyncEngine)

# (c) fakes fail loudly at construction (first duckdb use), not import
for cls in (fakes.FakeSnowflake, fakes.FakeClickHouse):
    try:
        cls()
    except ImportError as exc:
        assert "duckdb" in str(exc)
    else:
        raise SystemExit(f"{cls.__name__}() should need duckdb")
print("MINIMAL_OK")
"""
    )
    proc = subprocess.run(
        [sys.executable, str(probe)],
        capture_output=True,
        text=True,
        timeout=120,
        cwd="/tmp",
        env={**os.environ, "PYTHONPATH": _REPO},
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "MINIMAL_OK" in proc.stdout
