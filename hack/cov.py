#!/usr/bin/env python
"""In-repo line coverage for the test suite (the coverage-threshold role of
the reference's CI, hack/common.mk:372-381 — this image has no coverage.py
and installs are disallowed, so measurement uses sys.monitoring, PEP 669).

Runs pytest in-process with a LINE-event tracker over saprobe_alac_tpu/ and
reports per-file percentages.  Each (code, line) disables itself after the
first hit, so steady-state overhead is near zero.

    python hack/cov.py [--min 80] [pytest args...]

Exit 1 if total coverage is below --min or pytest fails.
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
PKG = ROOT / "saprobe_alac_tpu"
sys.path.insert(0, str(ROOT))

TOOL = sys.monitoring.COVERAGE_ID

hit: dict[str, set[int]] = {}


def _on_line(code, lineno):
    fn = code.co_filename
    if fn.startswith(str(PKG)):
        hit.setdefault(fn, set()).add(lineno)
    return sys.monitoring.DISABLE


def executable_lines(path: Path) -> set[int]:
    """All line numbers that carry bytecode, via recursive co_lines()."""
    try:
        top = compile(path.read_text(), str(path), "exec")
    except SyntaxError:
        return set()
    lines: set[int] = set()
    stack = [top]
    while stack:
        code = stack.pop()
        lines |= {ln for _, _, ln in code.co_lines() if ln is not None}
        stack.extend(c for c in code.co_consts if hasattr(c, "co_lines"))
    return lines


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--min", type=float, default=80.0, help="total %% threshold")
    ap.add_argument("pytest_args", nargs="*", default=[])
    args = ap.parse_args()

    sys.monitoring.use_tool_id(TOOL, "saprobe-cov")
    sys.monitoring.register_callback(TOOL, sys.monitoring.events.LINE, _on_line)
    sys.monitoring.set_events(TOOL, sys.monitoring.events.LINE)

    import pytest

    rc = pytest.main(args.pytest_args or ["tests/", "-q", "-p", "no:cacheprovider"])
    sys.monitoring.set_events(TOOL, 0)

    total_exec = total_hit = 0
    rows = []
    for path in sorted(PKG.rglob("*.py")):
        ex = executable_lines(path)
        if not ex:
            continue
        got = hit.get(str(path), set()) & ex
        rows.append((path.relative_to(ROOT), len(got), len(ex)))
        total_exec += len(ex)
        total_hit += len(got)

    print(f"\n{'file':<48}{'lines':>8}{'cover':>8}")
    for rel, got, ex in rows:
        print(f"{str(rel):<48}{ex:>8}{100 * got / ex:>7.1f}%")
    pct = 100 * total_hit / max(total_exec, 1)
    print(f"{'TOTAL':<48}{total_exec:>8}{pct:>7.1f}%")

    if rc != 0:
        return int(rc)
    if pct < args.min:
        print(f"coverage {pct:.1f}% below threshold {args.min:.1f}%")
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
