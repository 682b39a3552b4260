#!/usr/bin/env python
"""Mutation testing: break one semantic line per implementation, confirm the
test suite catches it.

The conformance story is differential (three in-repo implementations
cross-checked) plus hand-derived golden vectors; this script validates the
differential net itself: each mutation below flips one load-bearing piece of
codec math in exactly one implementation, runs the relevant test subset, and
requires it to FAIL.  If a mutated tree passes, the suite has a blind spot.

Usage: python hack/mutation.py          (requires a clean git tree)
Files are restored with `git checkout --` after each mutation.
"""
import os
import subprocess
import sys

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))

# (impl label, file, old-line substring, replacement, pytest targets)
MUTATIONS = [
    (
        "oracle/golomb mean update",
        "saprobe_alac_tpu/codec/golomb.py",
        "mean = u32(pb * ndecode + mean - ((pb * mean & 0xFFFFFFFF) >> QB_SHIFT))",
        "mean = u32(pb * ndecode + mean - ((pb * mean & 0xFFFFFFFF) >> (QB_SHIFT + 1)))",
        ["tests/test_golden.py", "tests/test_roundtrip_scalar.py"],
    ),
    (
        "oracle/predictor rounding",
        "saprobe_alac_tpu/codec/predictor.py",
        "sum1 = sshr32(s32(acc + den_half), den_shift)",
        "sum1 = sshr32(s32(acc), den_shift)",
        ["tests/test_golden.py", "tests/test_roundtrip_scalar.py"],
    ),
    (
        "device/walk zero-run k",
        "saprobe_alac_tpu/ops/walk.py",
        "k32 = jnp.maximum(clz(mean) - 24 + s(jax.lax.shift_right_logical(u(mean + 16), U32(6))), 0)",
        "k32 = jnp.maximum(clz(mean) - 24 + s(jax.lax.shift_right_logical(u(mean + 15), U32(6))), 0)",
        ["tests/test_golden.py", "tests/test_jax_batch.py"],
    ),
    (
        "device/lpc rounding",
        "saprobe_alac_tpu/ops/lpc.py",
        "sum1 = sshr(acc + den_half, den)",
        "sum1 = sshr(acc, den)",
        ["tests/test_golden.py", "tests/test_jax_batch.py"],
    ),
    (
        "native/predictor rounding",
        "native/alac_core.cpp",
        "const int32_t sum1 = sshr32(acc + den_half, den_shift);",
        "const int32_t sum1 = sshr32(acc, den_shift);",
        ["tests/test_golden.py", "tests/test_native.py"],
    ),
    (
        "device/fused 16-bit pair pack",
        "saprobe_alac_tpu/ops/epilogue.py",
        "(planes[2 * i] & 0xFFFF)\n        | s(jax.lax.shift_left(u(planes[2 * i + 1]), U32(16)))",
        "(planes[2 * i + 1] & 0xFFFF)\n        | s(jax.lax.shift_left(u(planes[2 * i]), U32(16)))",
        ["tests/test_jax_batch.py"],
    ),
    (
        # NOTE: a zext here is invisible in final PCM (the <= cb-bit output
        # packs truncate exactly the bits it corrupts) — the catcher is the
        # res-level differential against the sext-ing XLA gather.
        "device/in-kernel raw escape sign extension",
        "saprobe_alac_tpu/ops/walk_kernel.py",
        "sh = _sshr if raw_signed else _ushr",
        "sh = _ushr if raw_signed else _sshr",
        ["tests/test_parse_kernel.py"],
    ),
    (
        # A value-visible escape mutation: mis-stride the raw cursor (CPE
        # interleave reads the wrong bit positions from sample 2 on).
        "device/in-kernel raw escape stride",
        "saprobe_alac_tpu/ops/walk_kernel.py",
        "off = jnp.where(rawact == 1, off + rstep, off)",
        "off = jnp.where(rawact == 1, off + rstep + 1, off)",
        ["tests/test_walk_kernel.py"],
    ),
    # KEEP LAST: resolved dynamically below via MUTATIONS[-1].
    (
        "encoder/sign mapping",
        "saprobe_alac_tpu/encoder/encode.py",
        None,  # resolved below: flips residual sign mapping
        None,
        ["tests/test_roundtrip_scalar.py"],
    ),
]


def read(path: str) -> str:
    with open(os.path.join(REPO, path)) as f:
        return f.read()


def write(path: str, text: str) -> None:
    with open(os.path.join(REPO, path), "w") as f:
        f.write(text)


def restore(path: str) -> None:
    subprocess.run(["git", "checkout", "--", path], cwd=REPO, check=True)


def run_tests(targets: list[str]) -> int:
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", "-x", "-q", *targets],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=1200,
    )
    return proc.returncode


def main() -> int:
    # Only the files this script mutates (and restores with git checkout)
    # must be clean — the driver keeps e.g. PROGRESS.jsonl perpetually
    # dirty, and that must not block mutation runs.
    mutated_files = {m[1] for m in MUTATIONS}
    dirty = subprocess.run(
        ["git", "status", "--porcelain"], cwd=REPO, capture_output=True, text=True
    ).stdout.splitlines()
    blocking = [ln for ln in dirty if ln[3:].strip() in mutated_files]
    if blocking:
        print("refusing to run: mutated files are dirty:", blocking)
        return 2

    # Resolve the encoder mutation dynamically (the exact expression is an
    # implementation detail; any sign-map flip works).
    enc = read("saprobe_alac_tpu/encoder/encode.py")
    for old, new in [
        # Desync the encoder's adaptive-mean mirror from the decoder's: the
        # emitted codewords then parse under different k values downstream.
        (
            "mean = u32(pb * n + mean - ((pb * mean & 0xFFFFFFFF) >> QB_SHIFT))",
            "mean = u32(pb * n + mean - ((pb * mean & 0xFFFFFFFF) >> (QB_SHIFT + 1)))",
        ),
    ]:
        if old in enc:
            MUTATIONS[-1] = MUTATIONS[-1][:2] + (old, new) + MUTATIONS[-1][4:]
            break

    failures = 0
    for label, path, old, new, targets in MUTATIONS:
        text = read(path)
        if old is None or old not in text:
            print(f"SKIP  {label}: mutation site not found in {path}")
            continue
        write(path, text.replace(old, new, 1))
        try:
            rc = run_tests(targets)
        finally:
            restore(path)
        if rc == 0:
            print(f"MISS  {label}: suite PASSED with mutated {path} — blind spot!")
            failures += 1
        else:
            print(f"CAUGHT {label}: suite failed as required (rc={rc})")

    print("PASS: every mutation was caught" if failures == 0 else f"FAIL: {failures} blind spots")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
