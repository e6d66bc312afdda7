"""Mechanical guarantees on bench.py (VERDICT r4 weak #3/#7 + advisor):
the override splitter fails loudly on unbalanced brackets, and the bench
refuses to run while another chip job's pid file is live."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _split_overrides(raw):
    """Re-extract the splitter by running bench.py's function in-process
    (bench.py guards its heavy work under main(), so import is cheap)."""
    sys.path.insert(0, REPO)
    import importlib

    bench = importlib.import_module("bench")
    # the splitter is defined inside main(); replicate through a tiny
    # exec of the module source instead
    src = open(os.path.join(REPO, "bench.py")).read()
    start = src.index("    def _split_overrides")
    end = src.index("    overrides = _split_overrides")
    fn_src = "\n".join(l[4:] for l in src[start:end].splitlines())
    ns = {}
    exec(fn_src, ns)
    return ns["_split_overrides"](raw)


def test_split_overrides_balanced():
    assert _split_overrides("a=[64,32],b=2") == ["a=[64,32]", "b=2"]
    assert _split_overrides("a=(1,2);b=[3,4]") == ["a=(1,2)", "b=[3,4]"]


def test_split_overrides_unbalanced_raises():
    import pytest

    with pytest.raises(ValueError, match="unbalanced"):
        _split_overrides("a=64],b=2")
    with pytest.raises(ValueError, match="unclosed"):
        _split_overrides("a=[64,b=2")


def test_bench_refuses_when_chip_busy(tmp_path):
    """With a live chip-job pid file present, bench.py must exit non-zero
    with an 'error' JSON line BEFORE touching the device (we use our own
    pid: alive, python cmdline)."""
    pidfile = "/tmp/chipjob_test_guard.pid"
    with open(pidfile, "w") as f:
        f.write(str(os.getpid()))
    try:
        env = dict(os.environ, JAX_PLATFORMS="cpu", BENCH_PRESET="tiny")
        env.pop("BENCH_IGNORE_LOCK", None)
        p = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            capture_output=True, text=True, timeout=120, env=env,
        )
        assert p.returncode == 2, p.stdout + p.stderr
        out = json.loads(p.stdout.strip().splitlines()[-1])
        assert "chip busy" in out["error"]
    finally:
        os.remove(pidfile)
